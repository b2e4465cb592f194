"""tcdecode — decode elementary streams to raw video/audio
(import/tcdecode.c analogue).

Codecs decoded in-process: mpeg2 (native bitstream decoder + batched
IDCT), yuv420p (verbatim), ulaw (G.711 mu-law -> S16LE), ogg-vorbis
(native io/vorbis.py); ac3/a52, dv and mp3 ride the FFmpeg bridge
(the decode_a52.c/decode_dv.c/decode_mp3.c roles).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import numpy as np


def _ulaw_decode(data: bytes) -> np.ndarray:
    """G.711 mu-law -> int16 (decode_ulaw.c analogue)."""
    u = ~np.frombuffer(data, np.uint8)
    sign = (u & 0x80) != 0
    exponent = (u.astype(np.int32) >> 4) & 7
    mantissa = u.astype(np.int32) & 0x0F
    mag = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _decode_mpeg2(data: bytes, out, fmt: str) -> int:
    """Full I/P/B + field-picture decode (iter_decode_full) when the
    native library is built; intra-only pure-Python fallback."""
    from tcforge_tpu import native
    from tcforge_tpu.io.mpeg2codec import (Mpeg2Decoder,
                                           iter_decode_full)
    dec = Mpeg2Decoder()
    if native.available():
        frames = iter_decode_full(data)
        bs = native.NativeMpeg2Bitstream(data)
        dec.width, dec.height, dec.fps = bs.width, bs.height, bs.fps
        bs.close()
    else:
        frames = iter(dec.decode_stream(data))
    n = 0
    wr = None
    for y, u, v in frames:
        if fmt == "y4m" and wr is None:
            from tcforge_tpu.io.y4m import Y4MHeader, Y4MWriter
            h, w = y.shape
            num, den = int(round((dec.fps or 25.0) * 1000)), 1000
            wr = Y4MWriter(out, Y4MHeader(width=w, height=h,
                                          fps_num=num, fps_den=den))
        if wr is not None:
            wr.write_frame(y, u, v)
        else:
            out.write(y.tobytes())
            out.write(u.tobytes())
            out.write(v.tobytes())
        n += 1
    if wr is not None:
        wr.close()
    return n


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        prog="tcdecode", description="decode an ES to raw video/audio")
    p.add_argument("-i", dest="input", default=None,
                   help="input file [stdin]")
    p.add_argument("-o", dest="output", default=None,
                   help="output file [stdout]")
    p.add_argument("-x", dest="codec", required=True,
                   help="source codec (mpeg2, yuv420p, ulaw, mp3, "
                        "mp2, ogg, ac3, dv, lzo, mov)")
    p.add_argument("-y", dest="format", default="yuv420p",
                   help="output format (yuv420p, y4m, pcm)")
    p.add_argument("-g", dest="geometry", default=None,
                   help="WxH geometry (rtjpeg)")
    p.add_argument("-d", dest="verbose", type=int, default=0)
    p.add_argument("-t", dest="package", default="",
                   help="codec package (parity; decoders are "
                        "auto-selected)")
    p.add_argument("-Q", dest="quality", type=int, default=5,
                   help="decoding quality (parity; always best)")
    p.add_argument("-s", dest="gains", default="1,1,1",
                   help="audio gain c,f,r for ac3 downmixing")
    p.add_argument("-A", dest="a52_flags", type=int, default=0,
                   help="A52 decoder flags (parity)")
    p.add_argument("-z", dest="zoom", default="",
                   help="zoom to WxH (parity)")
    args = p.parse_args(argv)

    if args.input:
        with open(args.input, "rb") as f:
            data = f.read()
    else:
        data = sys.stdin.buffer.read()

    if args.codec == "mpeg2" and args.format == "y4m" and args.output:
        n = _decode_mpeg2(data, args.output, "y4m")
        print(f"tcdecode: {n} frames", file=sys.stderr)
        return 0

    out = open(args.output, "wb") if args.output else sys.stdout.buffer
    try:
        if args.codec == "mpeg2":
            n = _decode_mpeg2(data, out, args.format)
            print(f"tcdecode: {n} frames", file=sys.stderr)
        elif args.codec in ("yuv420p", "raw"):
            out.write(data)
        elif args.codec == "ulaw":
            out.write(_ulaw_decode(data).tobytes())
        elif args.codec == "rtjpeg":
            print("tcdecode: RTjpeg frames carry their quant tables in "
                  "the NUV container; decode through the nuv importer "
                  "(-i file.nuv) instead", file=sys.stderr)
            return 1
        elif args.codec == "mp3":
            try:
                from tcforge_tpu.io.mp3 import decode_stream
            except ImportError:
                print("tcdecode: mp3 decode not built", file=sys.stderr)
                return 1
            pcm, rate, ch = decode_stream(data)
            print(f"tcdecode: mp3 {rate} Hz, {ch} ch", file=sys.stderr)
            out.write(pcm.tobytes())
        elif args.codec == "ogg":
            # Ogg Vorbis -> interleaved s16 PCM (decode_ogg.c role,
            # native io/vorbis.py decoder)
            import io as _io

            from tcforge_tpu.io.ogg import (identify_streams, iter_pages,
                                            pages_to_packets)
            from tcforge_tpu.io.vorbis import VorbisDecoder
            streams = identify_streams(_io.BytesIO(data))
            vorb = next((s for s in streams if s.codec == "vorbis"),
                        None)
            if vorb is None:
                print("tcdecode: no vorbis stream in ogg input",
                      file=sys.stderr)
                return 1
            dec = VorbisDecoder()
            nsamp = 0
            for _, pkt in pages_to_packets(
                    iter_pages(_io.BytesIO(data)), serial=vorb.serial):
                if not pkt:
                    continue
                if len(pkt) >= 7 and pkt[1:7] == b"vorbis" \
                        and pkt[0] & 0x01:
                    dec.header_packet(pkt)
                    continue
                pcm = dec.audio_packet(pkt)
                if pcm is not None and len(pcm):
                    nsamp += len(pcm)
                    out.write(np.clip(np.rint(pcm * 32768.0), -32768,
                                      32767).astype("<i2").tobytes())
            print(f"tcdecode: vorbis {dec.rate} Hz, {dec.channels} ch, "
                  f"{nsamp} samples", file=sys.stderr)
        elif args.codec in ("ac3", "a52"):
            # decode_a52.c role via the FFmpeg bridge
            from tcforge_tpu.native import av
            if not av.available():
                print("tcdecode: ac3 needs the FFmpeg bridge "
                      "(make -C native)", file=sys.stderr)
                return 1
            dec = av.AvAudioDecoder("ac3")
            dec.feed(data)
            dec.flush()
            total = 0
            while True:
                chunk = dec.read()
                if chunk is None or not len(chunk):
                    break
                out.write(np.asarray(chunk, np.int16).tobytes())
                total += len(chunk)
            print(f"tcdecode: ac3 {dec.rate} Hz, {dec.channels} ch, "
                  f"{total} samples", file=sys.stderr)
        elif args.codec == "mp2":
            # decode_mp2 handler (tcdecode.c:68, codec intentionally
            # identical to mp3) via the bridge's mp2 decoder
            from tcforge_tpu.native import av
            if not av.available():
                print("tcdecode: mp2 needs the FFmpeg bridge "
                      "(make -C native)", file=sys.stderr)
                return 1
            dec = av.AvAudioDecoder("mp2")
            dec.feed(data)
            dec.flush()
            total = 0
            while True:
                chunk = dec.read()
                if chunk is None or not len(chunk):
                    break
                out.write(np.asarray(chunk, np.int16).tobytes())
                total += len(chunk)
            print(f"tcdecode: mp2 {dec.rate} Hz, {dec.channels} ch, "
                  f"{total} samples", file=sys.stderr)
        elif args.codec == "lzo":
            # decode_lzo.c role: walk tc_lzo_header_t-framed records,
            # inflating each (or copying NOT_COMPRESSIBLE stores)
            from tcforge_tpu.io.tclzo import unpack_frame
            pos = 0
            n = 0
            while pos + 16 <= len(data):
                size = int.from_bytes(data[pos + 4:pos + 8], "little")
                frame = data[pos:pos + 16 + size]
                if len(frame) < 16 + size:
                    print("tcdecode: truncated lzo frame",
                          file=sys.stderr)
                    return 1
                payload, _ = unpack_frame(frame, 64 << 20)
                out.write(payload)
                pos += 16 + size
                n += 1
            print(f"tcdecode: lzo {n} frames", file=sys.stderr)
        elif args.codec == "mov":
            # decode_mov.c role (quicktime lib there): demux+decode
            # any lavf-supported container to raw planar frames
            import os as _os
            import tempfile
            src = args.input
            tmp = None
            if src is None:
                tmp = tempfile.NamedTemporaryFile(suffix=".mov",
                                                  delete=False)
                tmp.write(data)
                tmp.close()
                src = tmp.name
            try:
                import cv2
                cap = cv2.VideoCapture(src)
                n = 0
                while True:
                    ok, bgr = cap.read()
                    if not ok:
                        break
                    # planar I420 raw frames (decode_mov.c emits raw)
                    out.write(cv2.cvtColor(
                        bgr, cv2.COLOR_BGR2YUV_I420).tobytes())
                    n += 1
                cap.release()
            finally:
                if tmp is not None:
                    _os.unlink(tmp.name)
            print(f"tcdecode: mov {n} frames", file=sys.stderr)
        elif args.codec == "dv":
            # decode_dv.c role: fixed-size DV frames; in-tree DV25
            # PAL decoder, dvvideo bridge otherwise
            from tcforge_tpu.io import dv as dvio
            from tcforge_tpu.native import av
            info = dvio.parse_frame_info(data[:dvio.PAL_FRAME])
            fsize = dvio.PAL_FRAME if info.is_pal else dvio.NTSC_FRAME
            if av.available():
                vdec = av.AvVideoDecoder("dvvideo")
            elif info.is_pal and info.sampling == "4:2:0":
                from tcforge_tpu.io.dvdec import DVDecoder
                vdec = DVDecoder()
            else:
                print("tcdecode: the in-tree DV decoder covers DV25 "
                      "PAL 4:2:0 only; this stream needs the FFmpeg "
                      "bridge (make -C native)", file=sys.stderr)
                return 1
            n = 0
            for pos in range(0, len(data) - fsize + 1, fsize):
                got = vdec.decode(data[pos:pos + fsize])
                if got is None:
                    continue
                y, u, v = got
                out.write(y.tobytes())
                out.write(u.tobytes())
                out.write(v.tobytes())
                n += 1
            print(f"tcdecode: dv {info.width}x{info.height}, {n} "
                  "frames", file=sys.stderr)
        else:
            print(f"tcdecode: unknown codec {args.codec!r}",
                  file=sys.stderr)
            return 1
    finally:
        if args.output:
            out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
