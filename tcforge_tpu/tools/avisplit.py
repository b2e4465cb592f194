"""avisplit — split an AVI into chunks (tools/avisplit.c analogue)."""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def split(input_path: str, frames_per_chunk: int,
          output_base: Optional[str] = None) -> List[str]:
    from tcforge_tpu.io.avi import (AviAudioStream, AviReader,
                                    AviVideoStream, AviWriter)
    from tcforge_tpu.parallel.split import chunk_output_name
    base = output_base or input_path
    r = AviReader(input_path)
    outputs = []
    n = r.video_frames
    chunk = 0
    audio_chunks = [list(r.read_audio_chunks(t)) for t in range(len(r.audio))]
    per_chunk_audio = [len(ac) // max(1, -(-n // frames_per_chunk))
                       for ac in audio_chunks]
    pos = 0
    while pos < n:
        out_path = chunk_output_name(base, chunk)
        audio = [AviAudioStream(rate=a.rate, channels=a.channels,
                                bits=a.bits, format_tag=a.format_tag,
                            byte_rate=a.byte_rate)
                 for a in r.audio]
        with AviWriter(out_path, AviVideoStream(
                fourcc=r.video.fourcc, width=r.video.width,
                height=r.video.height, fps=r.video.fps), audio) as w:
            end = min(pos + frames_per_chunk, n)
            for i in range(pos, end):
                data, key = r.read_video_frame(i)
                w.write_video_frame(data, key)
            # distribute audio chunks proportionally to video frames
            for t, ac in enumerate(audio_chunks):
                a0 = pos * len(ac) // n
                a1 = end * len(ac) // n
                for c in ac[a0:a1]:
                    w.write_audio(c, t)
        outputs.append(out_path)
        pos = end
        chunk += 1
    r.close()
    return outputs


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="avisplit", description="split AVI")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-s", dest="frames", type=int, required=True,
                   help="frames per chunk")
    p.add_argument("-o", dest="output", help="output base name")
    args = p.parse_args(argv)
    outs = split(args.input, args.frames, args.output)
    for o in outs:
        print(o)
    return 0


if __name__ == "__main__":
    sys.exit(main())
