"""tcextract — payload extraction by container+codec
(import/tcextract.c analogue).

Supported paths: MPEG-PS video/audio ES, AVI video payload stream, AVI
audio track, WAV PCM, Y4M raw planes.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tcextract",
                                description="extract stream payloads")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-o", dest="output", help="output file (default stdout)")
    p.add_argument("-x", dest="codec", default="video",
                   help="payload: video|audio|pcm|yuv")
    p.add_argument("-a", dest="track", type=int, default=0,
                   help="audio track")
    args = p.parse_args(argv)

    from tcforge_tpu.core.codecs import ContainerFormat
    from tcforge_tpu.io.probe import sniff_magic

    magic = sniff_magic(args.input)
    out = open(args.output, "wb") if args.output else sys.stdout.buffer
    written = 0
    try:
        if magic == ContainerFormat.MPEG_PS:
            from tcforge_tpu.io.mpeg import iter_pes_packets
            lo, hi = ((0xE0, 0xEF) if args.codec == "video"
                      else (0xC0, 0xDF))
            for sid, payload in iter_pes_packets(args.input):
                if lo <= sid <= hi:
                    out.write(payload)
                    written += len(payload)
        elif magic == ContainerFormat.AVI:
            from tcforge_tpu.io.avi import AviReader
            with AviReader(args.input) as r:
                if args.codec == "video":
                    for i in range(r.video_frames):
                        data, _ = r.read_video_frame(i)
                        out.write(data)
                        written += len(data)
                else:
                    for chunk in r.read_audio_chunks(args.track):
                        out.write(chunk)
                        written += len(chunk)
        elif magic == ContainerFormat.WAV:
            from tcforge_tpu.io.wav import WavReader
            with WavReader(args.input) as r:
                while True:
                    s = r.read_samples(1 << 16)
                    if s is None:
                        break
                    raw = s.tobytes()
                    out.write(raw)
                    written += len(raw)
        elif magic == ContainerFormat.DV_FILE:
            # extract_dv.c raw mode: frame-aligned passthrough; -x
            # audio emits the audio DIF payloads per frame
            from tcforge_tpu.io import dv as dvio
            with open(args.input, "rb") as f:
                for frame in dvio.iter_frames(f):
                    if args.codec in ("video", "dv"):
                        out.write(frame)
                        written += len(frame)
                    else:
                        payload = dvio.extract_payload(frame,
                                                       dvio.SCT_AUDIO)
                        out.write(payload)
                        written += len(payload)
        elif magic == ContainerFormat.YUV4MPEG:
            from tcforge_tpu.io.y4m import Y4MReader
            with Y4MReader(args.input) as r:
                for planes in r:
                    for pl in planes:
                        out.write(pl.tobytes())
                        written += pl.nbytes
        else:
            print(f"tcextract: unsupported container {magic.value}",
                  file=sys.stderr)
            return 1
    finally:
        if args.output:
            out.close()
    print(f"[tcextract] wrote {written} bytes", file=sys.stderr)
    return 0 if written else 1


if __name__ == "__main__":
    sys.exit(main())
