"""tcscan — stream statistics (import/tcscan.c analogue).

Scan modes (auto-selected by file magic, or forced with -x):

- Y4M video: frame count, duration, luma range/mean
- WAV PCM: peak/RMS amplitude + suggested volume rescale
  (tcscan.c:440-492)
- MPEG program streams: the scan_pes.c walk — PES packet counts per
  stream id, private-stream-1 substream census (AC-3/DTS/LPCM/VAG/
  subpicture tracks), video sequence count and min/avg/max bitrate
  from the sequence headers (scan_pes.c:159-181)
- MP3 byte streams: chunk walk with per-frame bitrate accounting
  (cbr/vbr detection, estimated duration; tcscan.c:496-580)
- AC-3 byte streams: syncframe walk (rate, bitrate range, duration)
- AVI: per-track summary (AVI_scan role)
"""

from __future__ import annotations

import argparse

from tcforge_tpu.tools._cli import pipe_main
import math
import sys
from typing import List, Optional

import numpy as np


def _scan_wav(path: str) -> None:
    from tcforge_tpu.io.wav import WavReader
    with WavReader(path) as r:
        peak = 0
        sq = 0.0
        count = 0
        while True:
            s = r.read_samples(1 << 16)
            if s is None:
                break
            a = s.astype(np.float64)
            peak = max(peak, float(np.abs(a).max()))
            sq += float((a ** 2).sum())
            count += a.size
        rms = math.sqrt(sq / max(1, count))
        secs = r.total_samples / r.info.rate
    rescale = 32767.0 / peak if peak else 1.0
    print(f"[tcscan] A: {secs:.2f} s @ {r.info.rate} Hz, "
          f"peak {peak / 32768:.3f}, RMS {rms / 32768:.4f}, "
          f"suggested volume rescale {rescale:.3f}")


def _scan_pcm_raw(path: str, rate: int, bits: int,
                  channels: int) -> None:
    """Headerless PCM scan (tcscan.c -x pcm with -e params): volume
    stats + suggested rescale, no RIFF header required."""
    if bits not in (8, 16):
        raise ValueError(
            f"tcscan: only 8/16-bit raw PCM supported (got {bits})")
    dtype = np.int16 if bits == 16 else np.uint8
    peak = 0
    sq = 0.0
    count = 0
    with open(path, "rb") as f:
        while True:
            blk = f.read(1 << 20)
            if not blk:
                break
            a = np.frombuffer(
                blk[:len(blk) // dtype().itemsize
                    * dtype().itemsize], dtype).astype(np.float64)
            if bits == 8:
                a = (a - 128.0) * 256.0
            peak = max(peak, float(np.abs(a).max()) if a.size else 0)
            sq += float((a ** 2).sum())
            count += a.size
    secs = count / max(1, rate * channels)
    rms = math.sqrt(sq / max(1, count))
    rescale = 32767.0 / peak if peak else 1.0
    print(f"[tcscan] A: {secs:.2f} s @ {rate} Hz x{channels} "
          f"{bits}-bit, peak {peak / 32768:.3f}, "
          f"RMS {rms / 32768:.4f}, "
          f"suggested volume rescale {rescale:.3f}")


def _scan_y4m(path: str) -> None:
    from tcforge_tpu.io.y4m import Y4MReader
    with Y4MReader(path) as r:
        n = 0
        lo, hi, acc = 255, 0, 0.0
        for planes in r:
            y = planes[0]
            lo = min(lo, int(y.min()))
            hi = max(hi, int(y.max()))
            acc += float(y.mean())
            n += 1
    fps = r.header.fps or 25.0
    print(f"[tcscan] V: {n} frames, {n / fps:.2f} s @ {fps:.3f} fps, "
          f"luma range [{lo},{hi}] mean {acc / max(1, n):.1f}")


def _scan_mpeg(path: str) -> None:
    """scan_pes.c role: stream census + sequence-header bitrates."""
    from tcforge_tpu.io.mpeg import iter_pes_packets
    pes_count: dict = {}
    sub_count: dict = {}
    seq_ctr = 0
    brs: List[int] = []
    for sid, payload in iter_pes_packets(path):
        pes_count[sid] = pes_count.get(sid, 0) + 1
        if sid == 0xBD and payload:
            sub_count[payload[0]] = sub_count.get(payload[0], 0) + 1
        if 0xE0 <= sid <= 0xEF:
            # sequence headers inside this packet: 12+18-bit geometry
            # then the 18-bit bit_rate field in units of 400 bps
            i = payload.find(b"\x00\x00\x01\xB3")
            while i >= 0:
                if i + 11 <= len(payload):
                    seq_ctr += 1
                    word = int.from_bytes(payload[i + 8:i + 11], "big")
                    brs.append((word >> 6) * 400)
                i = payload.find(b"\x00\x00\x01\xB3", i + 4)
    total = sum(pes_count.values())
    for sid in sorted(pes_count):
        print(f"[tcscan] stream id [0x{sid:x}] {pes_count[sid]:6d}")
    print(f"[tcscan] {total} packetized elementary stream(s) PES "
          "packets found")
    for sub in sorted(sub_count):
        if 0x80 <= sub <= 0x87:
            kind = f"AC3 audio track {sub - 0x80}"
        elif 0x88 <= sub <= 0x8F:
            kind = f"DTS audio track {sub - 0x88}"
        elif 0xA0 <= sub <= 0xA7:
            kind = f"LPCM audio track {sub - 0xA0}"
        elif 0x20 <= sub <= 0x3F:
            kind = f"subpicture track {sub - 0x20}"
        elif sub == 0xFF:
            kind = "VAG audio track"
        else:
            kind = "unknown substream"
        print(f"[tcscan] found {kind} [0x{sub:02x}] "
              f"({sub_count[sub]} packets)")
    if seq_ctr:
        print(f"[tcscan] {seq_ctr} MPEG video sequence(s)")
        print(f"[tcscan] Average Bitrate is {sum(brs) // len(brs)}. "
              f"Min Bitrate is {min(brs)}, max is {max(brs)} "
              f"({'cbr' if min(brs) == max(brs) else 'vbr'})")


def _scan_mp3(path: str) -> None:
    from tcforge_tpu.io.mp3 import iter_frames
    with open(path, "rb") as f:
        data = f.read()
    chunks = 0
    br_sum = 0
    br_min, br_max = 10 ** 9, 0
    ms = 0.0
    rate = chans = 0
    for _, fr in iter_frames(data):
        chunks += 1
        br_sum += fr.bitrate
        br_min = min(br_min, fr.bitrate)
        br_max = max(br_max, fr.bitrate)
        ms += fr.duration_ms
        rate, chans = fr.rate, fr.channels
    if not chunks:
        print("[tcscan] no MP3 frames found")
        return
    tag = "(cbr)" if br_min == br_max else f"({br_min}-{br_max})"
    print(f"[tcscan] MPEG layer-3 stream. Info: -e {rate},16,{chans}")
    print(f"[tcscan] Found {chunks} MP3 chunks. Average bitrate is "
          f"{br_sum / chunks:.2f} kbps {tag}")
    print(f"[tcscan] Estimated time is {ms:.0f} ms "
          f"({int(ms / 3600000):02d}:{int(ms / 60000) % 60:02d}:"
          f"{int(ms / 1000) % 60:02d}.{int(ms) % 1000:02d})")


def _scan_ac3(path: str) -> None:
    from tcforge_tpu.io.ac3 import iter_frames
    with open(path, "rb") as f:
        data = f.read()
    chunks = 0
    br_min, br_max = 10 ** 9, 0
    ms = 0.0
    rate = chans = 0
    for _, fr in iter_frames(data):
        chunks += 1
        br_min = min(br_min, fr.bitrate)
        br_max = max(br_max, fr.bitrate)
        ms += fr.duration_ms
        rate, chans = fr.rate, fr.channels
    if not chunks:
        print("[tcscan] no AC-3 syncframes found")
        return
    tag = "(cbr)" if br_min == br_max else f"({br_min}-{br_max})"
    print(f"[tcscan] AC-3 stream. Info: -e {rate},16,{chans}")
    print(f"[tcscan] Found {chunks} AC3 frames, bitrate {br_max} "
          f"kbps {tag}, estimated time {ms:.0f} ms")


def _scan_avi(path: str) -> None:
    from tcforge_tpu.io.avi import AviReader
    with AviReader(path) as r:
        v = r.video
        fps = v.fps or 25.0
        vbytes = sum(len(r.read_video_frame(i)[0])
                     for i in range(r.video_frames))
        print(f"[tcscan] V: {r.video_frames} frames "
              f"{v.width}x{v.height} '{v.fourcc}' @ {fps:.3f} "
              f"fps, {r.video_frames / fps:.2f} s, {vbytes} bytes")
        for t, a in enumerate(r.audio):
            total = sum(len(c) for c in r.read_audio_chunks(t))
            print(f"[tcscan] A[{t}]: tag 0x{a.format_tag:04x} "
                  f"{a.rate} Hz {a.channels} ch, {total} bytes")




def _main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tcscan",
                                description="scan stream statistics")
    p.add_argument("-i", dest="input", default="-", help="input file (default stdin)")
    p.add_argument("-x", dest="codec", default="",
                   help="force scan mode: mpeg2|mp3|ac3|pcm|y4m|avi")
    p.add_argument("-e", dest="pcm_params", default="48000,16,2",
                   help="PCM stream parameters rate[,bits[,channels]]")
    p.add_argument("-f", dest="fps", type=float, default=25.0,
                   help="frame rate for -w")
    p.add_argument("-w", dest="frames", type=int, default=0,
                   help="estimate video bitrate for num frames")
    p.add_argument("-b", dest="abitrate", type=int, default=128,
                   help="audio encoder bitrate kbps")
    p.add_argument("-c", dest="cdsize", type=int, default=0,
                   help="user-defined CD size in MB")
    args = p.parse_args(argv)

    if args.frames:
        # enc_bitrate (tcscan.c:113): recommended video bitrate so
        # audio+video fit the target disc size(s)
        time_s = max(1.0, args.frames / max(args.fps, 1e-6))
        audiosize = args.abitrate * 1000 / 8 * time_s
        print(f"[tcscan] V: {args.frames} frames, {int(time_s)} sec "
              f"@ {args.fps:.3f} fps")
        print(f"[tcscan] A: {audiosize / (1 << 20):.2f} MB @ "
              f"{args.abitrate} kbps")
        sizes = [args.cdsize] if args.cdsize else [650, 700, 1300,
                                                   1400]
        for mb in sizes:
            videosize = mb * (1 << 20) - audiosize
            vbitrate = videosize / time_s * 8
            print(f"USER CDSIZE: {mb:4d} MB | V: "
                  f"{videosize / (1 << 20):6.1f} MB @ "
                  f"{vbitrate / 1024:.1f} kbps")
        return 0

    from tcforge_tpu.core.codecs import ContainerFormat
    from tcforge_tpu.io.probe import probe_file, sniff_magic

    codec = args.codec
    magic = sniff_magic(args.input)
    if codec in ("mpeg2", "mpeg", "vob") \
            or (not codec and magic in (ContainerFormat.MPEG_PS,
                                        ContainerFormat.MPEG_ES)):
        _scan_mpeg(args.input)
    elif codec == "mp3" \
            or (not codec and magic == ContainerFormat.MP3_FILE):
        _scan_mp3(args.input)
    elif codec in ("ac3", "a52") \
            or (not codec and magic == ContainerFormat.AC3_FILE):
        _scan_ac3(args.input)
    elif codec == "avi" or (not codec and magic == ContainerFormat.AVI):
        _scan_avi(args.input)
    elif codec == "y4m" \
            or (not codec and magic == ContainerFormat.YUV4MPEG):
        _scan_y4m(args.input)
    elif codec == "pcm" and magic != ContainerFormat.WAV:
        # headerless PCM: -e rate,bits,channels describes the stream
        parts = [int(x) for x in str(args.pcm_params).split(",")]
        rate = parts[0] if parts else 48000
        bits = parts[1] if len(parts) > 1 else 16
        chans = parts[2] if len(parts) > 2 else 2
        _scan_pcm_raw(args.input, rate, bits, chans)
    elif codec == "pcm" or (not codec and magic == ContainerFormat.WAV):
        _scan_wav(args.input)
    else:
        info = probe_file(args.input)
        print(info.describe())
    return 0




main = pipe_main(_main)


if __name__ == "__main__":
    sys.exit(main())
