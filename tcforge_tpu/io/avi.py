"""AVI container reader/writer.

Rebuild of ``avilib/avilib.[ch]``: byte-level AVI 1.0 container handling —
the codec payloads are opaque (exactly like avilib; decoding is the
import/export modules' job).  Features mirrored from avilib.h:324-389:

- video stream + multiple audio tracks,
- keyframe flags in the idx1 index,
- index rebuild by scanning the movi list when idx1 is missing,
- header fixup on close.

OpenDML (>1GB odml/indx) is deferred; the writer enforces the AVI 1.0
size limit explicitly.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import BinaryIO, List, Optional, Tuple, Union

import numpy as np

AVIF_HASINDEX = 0x00000010
AVIF_ISINTERLEAVED = 0x00000100
AVIIF_KEYFRAME = 0x00000010

AVI10_LIMIT = (1 << 31) - (1 << 20)   # stay under 2GB like avilib


class AviError(ValueError):
    pass


@dataclass
class AviVideoStream:
    fourcc: str = "I420"
    width: int = 0
    height: int = 0
    fps: float = 25.0
    frames: int = 0


@dataclass
class AviAudioStream:
    format_tag: int = 1          # PCM
    channels: int = 2
    rate: int = 48000
    bits: int = 16
    bytes_total: int = 0

    @property
    def block_align(self) -> int:
        return max(1, self.channels * self.bits // 8)


@dataclass
class _IndexEntry:
    ckid: bytes
    flags: int
    offset: int       # absolute file offset of chunk header
    size: int


def _fourcc(s: str) -> bytes:
    return s.encode("ascii").ljust(4, b" ")[:4]


class AviWriter:
    """AVI 1.0 writer (AVI_open_output_file + AVI_write_frame analogue)."""

    def __init__(self, path: Union[str, os.PathLike],
                 video: AviVideoStream,
                 audio_tracks: Optional[List[AviAudioStream]] = None):
        self._f: BinaryIO = open(path, "w+b")
        self.video = video
        self.audio = list(audio_tracks or [])
        self._index: List[_IndexEntry] = []
        self._frames = 0
        self._audio_bytes = [0] * len(self.audio)
        self._audio_chunks = [0] * len(self.audio)
        # reserve header space; rewritten on close
        self._headers_size = self._compute_headers_size()
        self._f.write(b"\0" * self._headers_size)
        self._movi_start = self._f.tell()
        self._f.write(b"LIST\0\0\0\0movi")

    def _compute_headers_size(self) -> int:
        # RIFF(12) + hdrl LIST hdr(12) + avih(8+56)
        n = 12 + 12 + 64
        n += 12 + 8 + 56 + 8 + 40     # video strl LIST + strh + strf(BITMAPINFO)
        for _ in self.audio:
            n += 12 + 8 + 56 + 8 + 16  # audio strl + strh + strf(WAVEFORMATEX-)
        n += 8 + 260                   # JUNK padding for alignment/growth
        return n

    # ------------------------------------------------------------------ #

    def _write_chunk(self, ckid: bytes, data: bytes, flags: int) -> None:
        pos = self._f.tell()
        if pos + len(data) + 8 > AVI10_LIMIT:
            raise AviError("AVI 1.0 size limit reached (OpenDML TODO)")
        self._f.write(ckid + struct.pack("<I", len(data)))
        self._f.write(data)
        if len(data) & 1:
            self._f.write(b"\0")
        self._index.append(_IndexEntry(ckid, flags, pos, len(data)))

    def write_video_frame(self, data: bytes, keyframe: bool = True) -> None:
        self._write_chunk(b"00dc" if self.video.fourcc not in
                          ("I420", "YV12", "YUY2", "UYVY", "RGB ", "DIB ")
                          else b"00db",
                          data, AVIIF_KEYFRAME if keyframe else 0)
        self._frames += 1

    def write_audio(self, data: bytes, track: int = 0) -> None:
        if track >= len(self.audio):
            raise AviError(f"no audio track {track}")
        ckid = b"%02dwb" % (track + 1)
        self._write_chunk(ckid, data, AVIIF_KEYFRAME)
        self._audio_bytes[track] += len(data)
        self._audio_chunks[track] += 1

    # ------------------------------------------------------------------ #

    def _build_headers(self) -> bytes:
        v = self.video
        fps = v.fps if v.fps > 0 else 25.0
        usec_per_frame = int(round(1_000_000 / fps))
        max_bytes_per_sec = int(v.width * v.height * 3 * fps)
        num_streams = 1 + len(self.audio)

        avih = struct.pack(
            "<14I", usec_per_frame, max_bytes_per_sec, 0,
            AVIF_HASINDEX | AVIF_ISINTERLEAVED, self._frames, 0,
            num_streams, 0, v.width, v.height, 0, 0, 0, 0)

        # video strl (fps = dwRate/dwScale = 1e6/usec_per_frame)
        strh_v = struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"vids", _fourcc(v.fourcc), 0, 0, 0, 0,
            usec_per_frame, 1_000_000,
            0, self._frames, 0, 0xFFFFFFFF, 0,
            0, 0, v.width & 0x7FFF, v.height & 0x7FFF)
        bits = {"I420": 12, "YV12": 12, "YUY2": 16, "UYVY": 16}.get(
            v.fourcc, 24)
        bmih = struct.pack(
            "<IiiHH4sIiiII", 40, v.width, v.height, 1, bits,
            _fourcc(v.fourcc), v.width * v.height * bits // 8, 0, 0, 0, 0)
        strl_v = (b"LIST" + struct.pack("<I", 4 + 8 + len(strh_v) + 8
                                        + len(bmih))
                  + b"strl"
                  + b"strh" + struct.pack("<I", len(strh_v)) + strh_v
                  + b"strf" + struct.pack("<I", len(bmih)) + bmih)

        strl_a = b""
        for t, a in enumerate(self.audio):
            ba = a.block_align
            length = self._audio_bytes[t] // ba
            strh = struct.pack(
                "<4s4sIHHIIIIIIIIhhhh",
                b"auds", b"\0\0\0\0", 0, 0, 0, 0,
                ba, a.rate * ba, 0, length, 0, 0, ba, 0, 0, 0, 0)
            strf = struct.pack("<HHIIHH", a.format_tag, a.channels,
                               a.rate, a.rate * ba, ba, a.bits)
            strl_a += (b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8
                                             + len(strf))
                       + b"strl"
                       + b"strh" + struct.pack("<I", len(strh)) + strh
                       + b"strf" + struct.pack("<I", len(strf)) + strf)

        hdrl_body = (b"avih" + struct.pack("<I", len(avih)) + avih
                     + strl_v + strl_a)
        hdrl = (b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl"
                + hdrl_body)
        return hdrl

    def close(self) -> None:
        movi_end = self._f.tell()
        # idx1
        idx = bytearray()
        for e in self._index:
            idx += e.ckid
            idx += struct.pack("<III", e.flags,
                               e.offset - (self._movi_start + 8), e.size)
        self._f.write(b"idx1" + struct.pack("<I", len(idx)) + bytes(idx))
        file_end = self._f.tell()

        # patch movi LIST size
        self._f.seek(self._movi_start)
        self._f.write(b"LIST" + struct.pack("<I", movi_end
                                            - self._movi_start - 8) + b"movi")
        # headers
        hdrl = self._build_headers()
        self._f.seek(0)
        self._f.write(b"RIFF" + struct.pack("<I", file_end - 8) + b"AVI ")
        self._f.write(hdrl)
        pad = self._headers_size - (self._f.tell())
        if pad < 8:
            raise AviError("header area overflow (internal)")
        self._f.write(b"JUNK" + struct.pack("<I", pad - 8) + b"\0" * (pad - 8))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class AviReader:
    """AVI reader (AVI_open_input_file analogue) with index rebuild."""

    def __init__(self, path: Union[str, os.PathLike]):
        self._f: BinaryIO = open(path, "rb")
        self.video = AviVideoStream()
        self.audio: List[AviAudioStream] = []
        self._video_index: List[Tuple[int, int, int]] = []  # (off, size, flags)
        self._audio_index: List[List[Tuple[int, int]]] = []
        self._movi_start = 0
        self._parse()

    # ------------------------------------------------------------------ #

    def _parse(self) -> None:
        f = self._f
        riff = f.read(12)
        if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"AVI ":
            raise AviError("not an AVI file")
        idx1_data = None
        stream_types: List[bytes] = []
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            if cid == b"LIST":
                ltype = f.read(4)
                if ltype == b"movi":
                    self._movi_start = f.tell() - 4
                    f.seek(size - 4, 1)
                elif ltype in (b"hdrl", b"strl"):
                    continue  # descend
                else:
                    f.seek(size - 4, 1)
            elif cid == b"avih":
                data = f.read(size + (size & 1))
                vals = struct.unpack("<14I", data[:56])
                self.video.width, self.video.height = vals[8], vals[9]
                if vals[0]:
                    self.video.fps = 1_000_000 / vals[0]
                self.video.frames = vals[4]
            elif cid == b"strh":
                data = f.read(size + (size & 1))
                fcc_type = data[:4]
                stream_types.append(fcc_type)
                if fcc_type == b"vids":
                    self.video.fourcc = data[4:8].decode("ascii",
                                                         "replace").strip()
                    scale, rate = struct.unpack("<II", data[20:28])
                    if scale:
                        self.video.fps = rate / scale
                elif fcc_type == b"auds":
                    self.audio.append(AviAudioStream())
                    self._audio_index.append([])
            elif cid == b"strf":
                data = f.read(size + (size & 1))
                if stream_types and stream_types[-1] == b"auds" and self.audio:
                    (tag, ch, rate, _br, _ba,
                     bits) = struct.unpack("<HHIIHH", data[:16])
                    a = self.audio[-1]
                    a.format_tag, a.channels, a.rate, a.bits = (tag, ch,
                                                                rate, bits)
                elif stream_types and stream_types[-1] == b"vids" and size >= 40:
                    # BITMAPINFOHEADER compression fourcc wins over strh
                    comp = data[16:20]
                    if comp.strip(b"\0"):
                        self.video.fourcc = comp.decode("ascii",
                                                        "replace").strip()
            elif cid == b"idx1":
                idx1_data = f.read(size + (size & 1))
            else:
                f.seek(size + (size & 1), 1)

        if idx1_data:
            self._load_idx1(idx1_data)
        if not self._video_index:
            self._scan_movi()
        self.video.frames = len(self._video_index)

    def _load_idx1(self, data: bytes) -> None:
        # idx1 offsets are relative to the 'movi' fourcc position
        # (self._movi_start records exactly that position)
        base = self._movi_start
        n = len(data) // 16
        # Detect absolute-offset indexes (some writers store them)
        absolute = False
        if n:
            first_off = struct.unpack("<I", data[8:12])[0]
            probe = base + first_off
            here = self._f.tell()
            for cand, is_abs in ((probe, False), (first_off, True)):
                self._f.seek(cand)
                if self._f.read(4) == data[0:4]:
                    absolute = is_abs
                    break
            self._f.seek(here)
        for i in range(n):
            ckid, flags, off, size = struct.unpack_from("<4sIII", data,
                                                        i * 16)
            pos = off if absolute else base + off
            stream = ckid[:2]
            if stream == b"00":
                self._video_index.append((pos + 8, size, flags))
            elif ckid[2:] == b"wb":
                t = int(ckid[:2]) - 1
                if 0 <= t < len(self._audio_index):
                    self._audio_index[t].append((pos + 8, size))

    def _scan_movi(self) -> None:
        """Index rebuild by walking movi chunks (avilib idx_fix path)."""
        f = self._f
        f.seek(self._movi_start + 4)
        end = os.fstat(f.fileno()).st_size
        while f.tell() + 8 <= end:
            pos = f.tell()
            hdr = f.read(8)
            cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            if cid in (b"idx1",):
                break
            if cid[:2] == b"00":
                self._video_index.append((pos + 8, size, AVIIF_KEYFRAME))
            elif cid[2:] == b"wb":
                t = int(cid[:2]) - 1
                if 0 <= t < len(self._audio_index):
                    self._audio_index[t].append((pos + 8, size))
            f.seek(size + (size & 1), 1)

    # ------------------------------------------------------------------ #

    @property
    def video_frames(self) -> int:
        return len(self._video_index)

    def audio_bytes(self, track: int = 0) -> int:
        return sum(s for _, s in self._audio_index[track])

    def read_video_frame(self, idx: int) -> Tuple[bytes, bool]:
        """(payload, keyframe) for frame idx (AVI_read_frame)."""
        off, size, flags = self._video_index[idx]
        self._f.seek(off)
        return self._f.read(size), bool(flags & AVIIF_KEYFRAME)

    def read_audio_chunks(self, track: int = 0):
        for off, size in self._audio_index[track]:
            self._f.seek(off)
            yield self._f.read(size)

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
