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
        fps: Optional[float] = None, fourcc: Optional[str] = None,
        audio_fmt: Optional[int] = None,
        audio_params: Optional[tuple] = None,
        audio_kbps: Optional[int] = None, track: int = 0) -> int:
    from tcforge_tpu.io.avi import (AviAudioStream, AviReader,
                                    AviVideoStream, AviWriter)
    r = AviReader(input_path)     # reader rebuilds index when idx1 broken
    audio = [AviAudioStream(rate=a.rate, channels=a.channels, bits=a.bits,
                            format_tag=a.format_tag) for a in r.audio]
    # avifix.c header overrides: -N audio format id, -e rate,bits,
    # channels, -b audio bitrate (byte_rate = kbps*1000/8)
    if audio and track < len(audio):
        a = audio[track]
        if audio_fmt is not None:
            a.format_tag = audio_fmt
        if audio_params:
            a.rate = audio_params[0] or a.rate
            if len(audio_params) > 1 and audio_params[1]:
                a.bits = audio_params[1]
            if len(audio_params) > 2 and audio_params[2]:
                a.channels = audio_params[2]
        if audio_kbps:
            a.byte_rate = audio_kbps * 1000 // 8
    with AviWriter(output_path, AviVideoStream(
            fourcc=fourcc or r.video.fourcc, width=r.video.width,
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
    p.add_argument("-f", dest="fps",
                   help="frame rate (val or val1,val2)")
    p.add_argument("-F", dest="fourcc", help="video codec FOURCC")
    p.add_argument("-N", dest="audio_fmt",
                   help="audio format identifier (0xnn)")
    p.add_argument("-e", dest="audio_params",
                   help="audio params rate[,bits[,channels]]")
    p.add_argument("-b", dest="audio_kbps", type=int,
                   help="audio bitrate (kbps)")
    p.add_argument("-a", dest="track", type=int, default=0,
                   help="audio track number")
    args = p.parse_args(argv)
    fps = None
    if args.fps:
        parts = str(args.fps).split(",")
        fps = (float(parts[0]) / float(parts[1]) if len(parts) == 2
               else float(parts[0]))
    afmt = (int(args.audio_fmt.replace("0x", "").replace("0X", ""),
                16) if args.audio_fmt else None)   # avifix.c strtol base 16
    aparams = tuple(int(x) for x in args.audio_params.split(",")) \
        if args.audio_params else None
    n = fix(args.input, args.output, fps, fourcc=args.fourcc,
            audio_fmt=afmt, audio_params=aparams,
            audio_kbps=args.audio_kbps, track=args.track)
    print(f"[avifix] rewrote {n} frames -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
