"""tcextract — payload extraction by container+codec
(import/tcextract.c analogue).

Supported paths: MPEG-PS video/audio ES + private-stream-1 substreams
(ac3/dts per -a track: extract_ac3.c; lpcm raw data; ps1 packets;
vag), AVI video payload stream (incl. rgb/lzo passthrough modes:
extract_rgb.c, extract_lzo.c), AVI audio track, WAV PCM, Y4M raw
planes, DV frames, Ogg/OGM (vorbis -> standalone Ogg re-page; OGM
video -> raw ES with packet headers stripped: extract_ogm.c).
"""

from __future__ import annotations

import argparse

from tcforge_tpu.tools._cli import pipe_main
import sys
from typing import List, Optional


def _extract_ogg(path: str, codec: str, out) -> int:
    """Ogg/OGM extraction (extract_ogm.c roles)."""
    from tcforge_tpu.io import ogg as oggio
    written = 0
    with open(path, "rb") as f:
        streams = oggio.identify_streams(f)
        f.seek(0)
        if codec in ("vorbis", "ogg", "audio"):
            ser = next((s.serial for s in streams
                        if s.codec == "vorbis"), None)
            if ser is None:
                print("tcextract: no vorbis stream", file=sys.stderr)
                return 0
            # standalone Ogg: verbatim page copy of one logical
            # stream stays a valid physical stream
            for pg in oggio.iter_pages(f):
                if pg.serial == ser:
                    out.write(pg.raw)
                    written += len(pg.raw)
            return written
        if codec in ("video", "theora", "ogm"):
            vid = next((s for s in streams if s.kind == "video"),
                       None)
            if vid is None:
                print("tcextract: no video stream", file=sys.stderr)
                return 0
            if vid.codec == "theora":
                for pg in oggio.iter_pages(f):
                    if pg.serial == vid.serial:
                        out.write(pg.raw)
                        written += len(pg.raw)
                return written
            for _ser, pkt in oggio.pages_to_packets(
                    oggio.iter_pages(f), vid.serial):
                # skip OGM header/comment packets (type bits 1/3,
                # extract_ogm.c:198-212)
                if not pkt or (pkt[0] & 3) in (1, 3):
                    continue
                payload, _, _ = oggio.ogm_parse_data_packet(pkt)
                out.write(payload)
                written += len(payload)
            return written
    print(f"tcextract: unsupported ogg codec {codec}", file=sys.stderr)
    return 0




def _main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tcextract",
                                description="extract stream payloads")
    p.add_argument("-i", dest="input", default="-", help="input file (default stdin)")
    p.add_argument("-o", dest="output", help="output file (default stdout)")
    p.add_argument("-x", dest="codec", default="video",
                   help="payload: video|audio|pcm|yuv|ac3|dts|lpcm|"
                        "ps1|vag|rgb|lzo|vorbis|ogg|mpeg2|mp3")
    p.add_argument("-a", dest="track", type=int, default=0,
                   help="audio track")
    p.add_argument("-t", dest="magic", default="",
                   help="file type override [autodetect]")
    p.add_argument("-d", dest="verbose", type=int, default=0,
                   help="verbosity mode (parity)")
    p.add_argument("-C", dest="range",
                   help="s-e: emit only this byte range of the "
                        "extracted payload")
    args = p.parse_args(argv)

    from tcforge_tpu.core.codecs import ContainerFormat
    from tcforge_tpu.io.probe import sniff_magic

    _T_MAGIC = {"vob": ContainerFormat.MPEG_PS,
                "mpeg2": ContainerFormat.MPEG_PS,
                "mpg": ContainerFormat.MPEG_PS,
                "ps": ContainerFormat.MPEG_PS,
                "es": ContainerFormat.MPEG_ES,
                "mpeg-es": ContainerFormat.MPEG_ES,
                "m2v": ContainerFormat.MPEG_ES,
                "ts": ContainerFormat.MPEG_TS,
                "avi": ContainerFormat.AVI,
                "wav": ContainerFormat.WAV,
                "yuv4mpeg": ContainerFormat.YUV4MPEG,
                "y4m": ContainerFormat.YUV4MPEG,
                "ogg": ContainerFormat.OGG,
                "ogm": ContainerFormat.OGG,
                "mov": ContainerFormat.MOV,
                "dv": ContainerFormat.DV_FILE,
                "mp3": ContainerFormat.MP3_FILE,
                "ac3": ContainerFormat.AC3_FILE,
                "nuv": ContainerFormat.NUV}
    if args.magic:
        try:
            magic = _T_MAGIC[args.magic.lower()]
        except KeyError:
            print(f"tcextract: unknown -t magic {args.magic!r} "
                  f"(known: {sorted(_T_MAGIC)})", file=sys.stderr)
            return 1
    else:
        magic = sniff_magic(args.input)
    out = open(args.output, "wb") if args.output else sys.stdout.buffer
    if args.range:
        # -C s-e (tcextract.c): byte-range window over the payload
        lo_s, _, hi_s = args.range.partition("-")
        lo = int(lo_s or 0)
        hi = int(hi_s) if hi_s else None

        class _RangeOut:
            def __init__(self, inner):
                self.inner = inner
                self.pos = 0

            emitted = 0

            def write(self, data):
                start, end = self.pos, self.pos + len(data)
                self.pos = end
                a = max(start, lo)
                b = min(end, hi) if hi is not None else end
                if a < b:
                    self.inner.write(data[a - start:b - start])
                    self.emitted += b - a
                return len(data)       # consumed (file contract)

            def close(self):
                self.inner.close()

        out = _RangeOut(out)
    written = 0
    codec = args.codec
    cdxa_tmp = None
    if magic == ContainerFormat.CDXA:
        from tcforge_tpu.io import cdxa as cdxaio
        if codec == "raw":
            # reference behavior: dump the data chunk verbatim
            # (avilib AVI_dump mode 2)
            for blk in cdxaio.iter_data_chunks(args.input):
                out.write(blk)
                written += len(blk)
            if args.output:
                out.close()
            if args.range:
                written = out.emitted
            print(f"[tcextract] wrote {written} bytes",
                  file=sys.stderr)
            return 0 if written else 1
        import tempfile
        fd, cdxa_tmp = tempfile.mkstemp(suffix=".mpg")
        import os as _os
        with _os.fdopen(fd, "wb") as f:
            f.write(cdxaio.cdxa_to_ps(args.input))
        args.input = cdxa_tmp
        magic = ContainerFormat.MPEG_PS
    try:
        if magic in (ContainerFormat.OGG,):
            written = _extract_ogg(args.input, codec, out) or 0
        elif magic == ContainerFormat.MPEG_PS:
            from tcforge_tpu.io.mpeg import (iter_pes_packets,
                                             parse_ac3_payload,
                                             parse_vag_payload)
            track = args.track & 7
            for sid, payload in iter_pes_packets(args.input):
                chunk = None
                if codec in ("video", "mpeg2", "m2v", "mpeg"):
                    if 0xE0 <= sid <= 0xEF:
                        chunk = payload
                elif codec in ("audio", "mp3", "mp2", "mpa"):
                    # -a selects the MPEG audio substream id
                    if sid == 0xC0 + track:
                        chunk = payload
                elif codec == "ps1":
                    # raw private-stream-1 packets (subtitles etc.)
                    if sid == 0xBD:
                        chunk = payload
                elif codec in ("ac3", "a52"):
                    if sid == 0xBD:
                        chunk = parse_ac3_payload(payload, track)
                elif codec == "dts":
                    # DTS substreams start at 0x88 (extract_ac3.c:522)
                    if (sid == 0xBD and len(payload) >= 4
                            and payload[0] == 0x88 + track):
                        chunk = payload[4:]
                elif codec in ("lpcm", "pcm"):
                    # raw big-endian LPCM data after the 7-byte
                    # private header (sub-stream 0xA0+track)
                    if (sid == 0xBD and len(payload) >= 7
                            and payload[0] == 0xA0 + track):
                        chunk = payload[7:]
                elif codec == "vag":
                    if sid == 0xBD:
                        chunk = parse_vag_payload(payload)
                else:
                    print(f"tcextract: unsupported PS codec {codec}",
                          file=sys.stderr)
                    return 1
                if chunk:
                    out.write(chunk)
                    written += len(chunk)
        elif magic == ContainerFormat.AVI:
            from tcforge_tpu.io.avi import AviReader
            with AviReader(args.input) as r:
                if codec in ("video", "rgb", "lzo", "mpeg4", "raw"):
                    # extract_rgb.c / extract_lzo.c: the stored video
                    # payload bytes, whatever the compressor
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
            # anything else libavformat demuxes (mov/mkv/asf/mxf/ts:
            # the extract_mxf.c role): stored packet payloads out
            try:
                from tcforge_tpu.native.av import AvFilePackets
                stream = (-2 if codec in ("audio", "pcm", "mp3",
                                          "ac3", "aac", "vorbis")
                          else -1)
                pk = AvFilePackets(args.input, stream)
            except (NotImplementedError, ValueError):
                print(f"tcextract: unsupported container "
                      f"{magic.value}", file=sys.stderr)
                return 1
            print(f"[tcextract] lavf: {pk.codec} packets",
                  file=sys.stderr)
            for payload in pk:
                out.write(payload)
                written += len(payload)
            pk.close()
    finally:
        if args.output:
            out.close()
        if cdxa_tmp:
            import os as _os
            try:
                _os.unlink(cdxa_tmp)
            except OSError:
                pass
    if args.range:
        written = out.emitted          # -C: bytes actually emitted
    print(f"[tcextract] wrote {written} bytes", file=sys.stderr)
    return 0 if written else 1




main = pipe_main(_main)


if __name__ == "__main__":
    sys.exit(main())
