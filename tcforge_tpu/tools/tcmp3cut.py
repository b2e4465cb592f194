"""tcmp3cut — split an MP3 stream at millisecond cut points
(tools/tcmp3cut.c analogue).

Cuts fall on frame boundaries: the stream walks header to header
(no decode), accumulating each frame's duration, and rolls to the next
``base-NNNN.mp3`` once the running time passes a cut point.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        prog="tcmp3cut",
        description="split an MP3 at millisecond positions "
        "(frame-accurate, no re-encode)")
    p.add_argument("-i", dest="input", required=True,
                   help="input MP3 file")
    p.add_argument("-o", dest="base", required=True,
                   help="output file name base")
    p.add_argument("-t", dest="cuts", required=True,
                   help="cut points in milliseconds, comma separated")
    p.add_argument("-d", dest="verbose", type=int, default=0)
    p.add_argument("-e", dest="params", default="",
                   help="MP3 stream parameters rate[,bits[,channels]]"
                        " (parity; the frame walk reads the headers)")
    args = p.parse_args(argv)

    from tcforge_tpu.io.mp3 import iter_frames

    cuts = [int(c) for c in args.cuts.split(",") if c.strip()]
    if not cuts:
        print("tcmp3cut: no cut points", file=sys.stderr)
        return 1

    with open(args.input, "rb") as f:
        data = f.read()

    song = 0
    out = open(f"{args.base}-{song:04d}.mp3", "wb")
    ms = 0.0
    frames = 0
    written = [0]
    try:
        for off, fr in iter_frames(data):
            if song < len(cuts) and ms >= cuts[song]:
                out.close()
                song += 1
                out = open(f"{args.base}-{song:04d}.mp3", "wb")
                written.append(0)
            out.write(data[off:off + fr.size])
            written[-1] += 1
            ms += fr.duration_ms
            frames += 1
    finally:
        out.close()
    if frames == 0:
        print("tcmp3cut: no MP3 frames found (corrupt file?)",
              file=sys.stderr)
        return 1
    print(f"tcmp3cut: {frames} frames, {ms:.0f} ms -> "
          f"{song + 1} files " +
          " ".join(f"{args.base}-{k:04d}.mp3({n})"
                   for k, n in enumerate(written)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
