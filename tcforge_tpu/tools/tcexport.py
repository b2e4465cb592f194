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
    p.add_argument("--range", dest="range",
                   help="frame range start-end")
    args = p.parse_args(argv)

    cli = ["-i", args.input, "-o", args.output, "--progress_off"]
    if args.audio_out:
        cli += ["-m", args.audio_out]
    if args.profile:
        cli += ["--export_prof", args.profile]
    if args.geometry:
        cli += ["-g", args.geometry]
    if args.fps:
        cli += ["-f", str(args.fps)]
    if args.range:
        cli += ["-c", args.range]
    from tcforge_tpu.cli import main as tc_main
    return tc_main(cli)


if __name__ == "__main__":
    sys.exit(main())
