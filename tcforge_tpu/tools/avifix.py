"""avifix / aviindex — repair AVI headers and rebuild indexes
(tools/avifix.c + tools/aviindex.c analogues).

Reads the movi chunks directly (ignoring a possibly-broken idx1/header)
and rewrites a clean file.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def fix(input_path: str, output_path: str,
        fps: Optional[float] = None) -> int:
    from tcforge_tpu.io.avi import (AviAudioStream, AviReader,
                                    AviVideoStream, AviWriter)
    r = AviReader(input_path)     # reader rebuilds index when idx1 broken
    audio = [AviAudioStream(rate=a.rate, channels=a.channels, bits=a.bits,
                            format_tag=a.format_tag) for a in r.audio]
    with AviWriter(output_path, AviVideoStream(
            fourcc=r.video.fourcc, width=r.video.width,
            height=r.video.height, fps=fps or r.video.fps), audio) as w:
        for i in range(r.video_frames):
            data, key = r.read_video_frame(i)
            w.write_video_frame(data, key)
        for t in range(len(r.audio)):
            for chunk in r.read_audio_chunks(t):
                w.write_audio(chunk, t)
    n = r.video_frames
    r.close()
    return n


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="avifix",
                                description="fix AVI header/index")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-o", dest="output", required=True)
    p.add_argument("-f", dest="fps", type=float, help="override fps")
    args = p.parse_args(argv)
    n = fix(args.input, args.output, args.fps)
    print(f"[avifix] rewrote {n} frames -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
