"""avisync — shift audio against video in an AVI (tools/avisync.c
analogue): positive -n N makes audio start with chunk N (drops the
leading chunks, advancing audio); negative prepends -N padding
chunks (delaying audio) — avisync.c's documented convention."""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def sync_shift(input_path: str, output_path: str, shift: int,
               track: Optional[int] = None,
               comments: Optional[dict] = None) -> int:
    from tcforge_tpu.io.avi import (AviAudioStream, AviReader,
                                    AviVideoStream, AviWriter)
    r = AviReader(input_path)
    audio = [AviAudioStream(rate=a.rate, channels=a.channels, bits=a.bits,
                            format_tag=a.format_tag,
                            byte_rate=a.byte_rate) for a in r.audio]
    with AviWriter(output_path, AviVideoStream(
            fourcc=r.video.fourcc, width=r.video.width,
            height=r.video.height, fps=r.video.fps), audio,
            comments=comments) as w:
        for i in range(r.video_frames):
            data, key = r.read_video_frame(i)
            w.write_video_frame(data, key)
        for t in range(len(r.audio)):
            chunks = list(r.read_audio_chunks(t))
            if (track is None or t == track):
                if shift > 0:
                    # audio starts with chunk 'count': drop leading
                    chunks = chunks[shift:]
                elif shift < 0 and chunks:
                    # prepend 'count' padding chunks: delay audio
                    pad = [b"\0" * len(chunks[0])] * (-shift)
                    chunks = pad + chunks
            for c in chunks:
                w.write_audio(c, t)
    n = r.video_frames
    r.close()
    return n


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="avisync",
                                description="shift A/V sync in AVI")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-o", dest="output", required=True)
    p.add_argument("-n", dest="shift", type=int, default=0,
                   help="shift audio by count frames: count>0 makes "
                        "audio start with chunk count (advance); "
                        "count<0 prepends padding (delay) — "
                        "avisync.c -n")
    p.add_argument("-b", dest="vbr", type=int, default=1,
                   help="handle vbr audio (accepted for parity)")
    p.add_argument("-a", dest="track", type=int, default=None,
                   help="audio track number [all]")
    p.add_argument("-f", dest="comfile",
                   help="read AVI comments from FILE")
    p.add_argument("-q", dest="quiet", action="store_true")
    args = p.parse_args(argv)
    comments = None
    if args.comfile:
        from tcforge_tpu.tools.avisplit import _read_comments
        comments = _read_comments(args.comfile)
    n = sync_shift(args.input, args.output, args.shift,
                   track=args.track, comments=comments)
    if not args.quiet:
        print(f"[avisync] rewrote {n} frames, audio shift "
              f"{args.shift}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
