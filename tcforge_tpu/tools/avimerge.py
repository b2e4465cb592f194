"""avimerge — concatenate AVI files (tools/avimerge.c analogue).

Streams must share geometry/fourcc/rate; video chunks and audio chunks
are appended in order, the index is rebuilt by the writer.  This is the
join step of cluster mode (docs/README.cluster).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def merge(inputs: List[str], output: str) -> int:
    from tcforge_tpu.io.avi import (AviAudioStream, AviReader,
                                    AviVideoStream, AviWriter)
    readers = [AviReader(p) for p in inputs]
    v0 = readers[0].video
    for r, path in zip(readers, inputs):
        if (r.video.width, r.video.height, r.video.fourcc) != \
                (v0.width, v0.height, v0.fourcc):
            raise ValueError(
                f"{path}: stream geometry/codec mismatch "
                f"({r.video.width}x{r.video.height} {r.video.fourcc} vs "
                f"{v0.width}x{v0.height} {v0.fourcc})")
    audio = [AviAudioStream(rate=a.rate, channels=a.channels, bits=a.bits,
                            format_tag=a.format_tag,
                            byte_rate=a.byte_rate)
             for a in readers[0].audio]
    total = 0
    with AviWriter(output, AviVideoStream(
            fourcc=v0.fourcc, width=v0.width, height=v0.height,
            fps=v0.fps), audio) as w:
        for r in readers:
            for i in range(r.video_frames):
                data, key = r.read_video_frame(i)
                w.write_video_frame(data, key)
                total += 1
            for t in range(len(r.audio)):
                for chunk in r.read_audio_chunks(t):
                    w.write_audio(chunk, t)
            r.close()
    return total


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="avimerge",
                                description="merge AVI files")
    p.add_argument("-o", dest="output", required=True)
    p.add_argument("-i", dest="inputs", nargs="+", required=True)
    args = p.parse_args(argv)
    n = merge(args.inputs, args.output)
    print(f"[avimerge] wrote {n} frames -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
