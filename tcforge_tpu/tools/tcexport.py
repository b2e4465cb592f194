"""tcexport — threadless export-layer driver (tools/tcexport.c analogue).

The reference's tcexport proves the export engine runs without the
threaded core (rawsource -> tc_export_loop).  Here it drives the same
Pipeline synchronously with raw/file sources — a thin frontend over the
engine with tcexport's option surface.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tcexport",
                                description="threadless export driver")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-o", dest="output", required=True)
    p.add_argument("-m", dest="audio_out")
    p.add_argument("-P", dest="profile", default="",
                   help="export profile")
    p.add_argument("-g", dest="geometry", help="raw input WxH")
    p.add_argument("-f", dest="fps", type=float)
    p.add_argument("--range", "-c", dest="range",
                   help="frame range start-end (tcexport -c)")
    p.add_argument("-p", dest="audio_in",
                   help="audio input file")
    p.add_argument("-y", dest="modules",
                   help="video[,audio[,mux]] export modules")
    p.add_argument("-N", dest="codecs",
                   help="v_codec[,a_codec] target codecs")
    p.add_argument("-w", dest="vbitrate", type=int,
                   help="video bitrate kbps")
    p.add_argument("-b", dest="abitrate",
                   help="audio bitrate[,vbr[,quality]]")
    p.add_argument("-R", dest="multipass",
                   help="n[,logfile] multipass mode")
    p.add_argument("-D", dest="dry_run", action="store_true",
                   help="dry run: load/validate modules only")
    p.add_argument("-d", dest="verbose", type=int, default=1,
                   help="verbosity (parity)")
    args = p.parse_args(argv)

    if args.dry_run:
        # -D: validate the module chain without running the engine
        import tcforge_tpu.modules  # register
        from tcforge_tpu.modules.registry import ModuleKind, lookup
        names = (args.modules or "").split(",")
        kinds = (ModuleKind.ENCODER, ModuleKind.ENCODER,
                 ModuleKind.MULTIPLEXOR)
        ok = True
        for name, kind in zip(names, kinds):
            if not name:
                continue
            try:
                lookup(kind, name)
                print(f"tcexport: {kind.value} {name}: OK")
            except KeyError as e:
                print(f"tcexport: {e}", file=sys.stderr)
                ok = False
        return 0 if ok else 1

    cli = ["-i", args.input, "-o", args.output, "--progress_off"]
    if args.audio_out:
        cli += ["-m", args.audio_out]
    if args.audio_in:
        cli += ["-p", args.audio_in]
    if args.profile:
        cli += ["--export_prof", args.profile]
    if args.geometry:
        cli += ["-g", args.geometry]
    if args.fps:
        cli += ["-f", str(args.fps)]
    if args.range:
        cli += ["-c", args.range]
    if args.modules:
        cli += ["-y", args.modules]
    if args.codecs:
        cli += ["-N", args.codecs]
    if args.vbitrate:
        cli += ["-w", str(args.vbitrate)]
    if args.abitrate:
        cli += ["-b", args.abitrate]
    if args.multipass:
        cli += ["-R", args.multipass]
    from tcforge_tpu.cli import main as tc_main
    return tc_main(cli)


if __name__ == "__main__":
    sys.exit(main())
