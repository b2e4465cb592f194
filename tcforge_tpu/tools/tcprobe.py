"""tcprobe — probe input streams (import/tcprobe.c analogue).

Prints a human summary by default or machine-readable JSON with -B
(the analogue of the reference's binary ProbeInfo dump consumed by the
engine, src/probe.c:336-393).
"""

from __future__ import annotations

import argparse

from tcforge_tpu.tools._cli import pipe_main
import dataclasses
import json
import sys
from typing import List, Optional


def _main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tcprobe",
                                description="probe media streams")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-B", dest="machine", action="store_true",
                   help="machine-readable JSON output")
    p.add_argument("-R", dest="raw", action="store_true",
                   help="raw mode: mplayer-identify-style KEY=value "
                        "lines (tcprobe.c:757-787 dump_info_raw)")
    args = p.parse_args(argv)

    from tcforge_tpu.io.probe import probe_file
    try:
        info = probe_file(args.input)
    except FileNotFoundError:
        print(f"tcprobe: no such file: {args.input}", file=sys.stderr)
        return 1
    if args.raw:
        # dump_info_raw (tcprobe.c:757-787): one KEY=value per line,
        # mplayer -identify compatible; codec ids mirror tccodecs.h
        print(f'ID_FILENAME="{args.input}"')
        print(f'ID_FILETYPE="{info.magic.value}"')
        print(f"ID_VIDEO_WIDTH={info.width}")
        print(f"ID_VIDEO_HEIGHT={info.height}")
        print(f"ID_VIDEO_FPS={info.fps:.3f}")
        print(f"ID_VIDEO_FRC={info.frc}")
        print(f"ID_VIDEO_ASR={info.asr}")
        vcodec = info.lavf_vcodec or info.codec.name.lower()
        print(f"ID_VIDEO_FORMAT={vcodec}")
        print(f"ID_VIDEO_BITRATE={info.bitrate if hasattr(info, 'bitrate') else 0}")
        for i, t in enumerate(info.tracks):
            ext = f"_{i}" if i > 0 else ""
            if t.channels <= 0:
                continue
            acodec = t.lavf_codec or t.codec.name.lower()
            print(f"ID_AUDIO_CODEC{ext}={acodec}")
            print(f"ID_AUDIO_FORMAT{ext}={t.codec.value}")
            print(f"ID_AUDIO_BITRATE{ext}={t.bitrate}")
            print(f"ID_AUDIO_RATE{ext}={t.samplerate}")
            print(f"ID_AUDIO_NCH{ext}={t.channels}")
            print(f"ID_AUDIO_BITS{ext}={t.bits}")
        duration = (info.num_frames / info.fps) if info.fps else 0.0
        print(f"ID_LENGTH={duration:.2f}")
    elif args.machine:
        d = dataclasses.asdict(info)
        d["magic"] = info.magic.value
        d["codec"] = info.codec.name.lower()
        d["format"] = info.format.value
        for t, src in zip(d["tracks"], info.tracks):
            t["codec"] = src.codec.name.lower()
        print(json.dumps(d))
    else:
        print(f"[tcprobe] file: {args.input}")
        print(info.describe())
    return 0



main = pipe_main(_main, implicit_stdin=False)


if __name__ == "__main__":
    sys.exit(main())
