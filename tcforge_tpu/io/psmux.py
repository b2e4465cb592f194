"""MPEG-2 program stream WRITER (the missing native 'mplex' role).

The reference reached .mpg/.vob output through libavformat
(multiplex/multiplex_lavf.c); this is the in-tree equivalent for the
streams this framework encodes natively: one MPEG video elementary
stream (0xE0) plus optional DVD-style LPCM audio (private stream 1,
sub-stream 0xA0) — the exact layout tcforge_tpu's own importer,
tcprobe, and tcdemux read back (io/mpeg.py), and the LPCM form real
DVD players use.

Layout per ISO 13818-1: pack header (SCR in 27 MHz, program mux
rate), one system header at the start, then PES packets.  Video PES
carry PTS when the payload starts an access unit (picture start code
at offset 0); LPCM packets carry the 7-byte private header
(sub_stream_id, frame count, first access unit pointer, flags,
dynamic range) ahead of big-endian samples.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

PACK_RATE = 10080          # program_mux_rate in 50 B/s units (DVD-ish)
PES_CHUNK = 2018           # payload bytes per video PES packet
LPCM_SAMPLES = 480         # samples per LPCM packet (DVD: 1/100 s)

_LPCM_RATE_CODE = {48000: 0, 96000: 1, 44100: 2, 32000: 3}


def _pts_bits(pts: int, prefix: int) -> bytes:
    """5-byte PTS/DTS field ('0010'/'0011' prefix form)."""
    return bytes([
        (prefix << 4) | (((pts >> 30) & 7) << 1) | 1,
        (pts >> 22) & 0xFF,
        (((pts >> 15) & 0x7F) << 1) | 1,
        (pts >> 7) & 0xFF,
        ((pts & 0x7F) << 1) | 1,
    ])


def pack_header(scr: int) -> bytes:
    """MPEG-2 pack header: SCR base (90 kHz) with ext 0."""
    base = scr & ((1 << 33) - 1)
    b = bytearray(b"\x00\x00\x01\xba")
    v = (0b01 << 46) | (((base >> 30) & 7) << 43) | (1 << 42) \
        | (((base >> 15) & 0x7FFF) << 27) | (1 << 26) \
        | ((base & 0x7FFF) << 11) | (1 << 10) | (0 << 1) | 1
    b += v.to_bytes(6, "big")
    b += (((PACK_RATE << 2) | 0b11)).to_bytes(3, "big")  # rate+markers
    b += bytes([0xF8])                     # reserved + stuffing len 0
    return bytes(b)


def system_header(have_audio: bool) -> bytes:
    streams = bytearray()
    streams += bytes([0xE0, 0xC0 | 0x20, 0x2E])   # video: 46 KB bound
    if have_audio:
        streams += bytes([0xBD, 0xC0, 0x3A])      # private 1: 58 B
    body = bytes([0x80 | (PACK_RATE >> 15), (PACK_RATE >> 7) & 0xFF,
                  ((PACK_RATE & 0x7F) << 1) | 1,
                  (1 << 2) | (0 << 1) | 1,        # audio bound 1, CSPS
                  0x20 | 1,                       # video bound 1
                  0xFF]) + bytes(streams)
    return b"\x00\x00\x01\xbb" + struct.pack(">H", len(body)) + body


def pes_packet(sid: int, payload: bytes,
               pts: Optional[int] = None) -> bytes:
    """MPEG-2 PES packet ('10' flags form)."""
    if pts is not None:
        hdr = bytes([0x80, 0x80, 5]) + _pts_bits(pts, 0b0010)
    else:
        hdr = bytes([0x80, 0x00, 0])
    body = hdr + payload
    return (b"\x00\x00\x01" + bytes([sid])
            + struct.pack(">H", len(body)) + body)


def lpcm_packet(samples: np.ndarray, rate: int, frame_no: int,
                pts: Optional[int] = None) -> bytes:
    """Private-stream-1 LPCM packet: 16-bit big-endian samples."""
    channels = samples.shape[1]
    info = (0 << 6) | (_LPCM_RATE_CODE.get(rate, 0) << 4) \
        | ((channels - 1) & 7)
    priv = bytes([0xA0, 1, 0, 7, frame_no & 0x1F, info, 0x80]) \
        + samples.astype(">i2").tobytes()
    return pes_packet(0xBD, priv, pts)


class PsWriter:
    """Interleaved program-stream writer.

    write_video(payload) takes ONE coded picture (or header run) per
    call; write_audio_pcm takes int16 (S, C) samples.  Packets are
    interleaved in arrival order — the engine feeds audio per video
    batch, which keeps A/V within a pack of each other like the
    reference demuxer expects."""

    def __init__(self, f, fps: float = 25.0, audio_rate: int = 0):
        self._f = f
        self.fps = fps or 25.0
        self.audio_rate = audio_rate
        self._video_frames = 0
        self._audio_samples = 0
        self._audio_frame_no = 0
        self._packs = 0
        self._wrote_sys = False
        self._abuf: Optional[np.ndarray] = None

    def _scr(self) -> int:
        # SCR tracks the leading stream position (video PTS - delay)
        return max(0, int(self._video_frames * 90000 / self.fps))

    def _emit_pack(self, pes: bytes) -> int:
        out = pack_header(self._scr())
        if not self._wrote_sys:
            out += system_header(bool(self.audio_rate))
            self._wrote_sys = True
        out += pes
        self._f.write(out)
        self._packs += 1
        return len(out)

    def write_video(self, payload: bytes) -> int:
        pts = int((self._video_frames + 1) * 90000 / self.fps) + 3600
        self._video_frames += 1
        total = 0
        first = True
        for off in range(0, len(payload), PES_CHUNK):
            chunk = payload[off:off + PES_CHUNK]
            # PTS only on the packet that starts the access unit
            p = pts if (first and chunk[:3] == b"\x00\x00\x01") else None
            total += self._emit_pack(pes_packet(0xE0, chunk, p))
            first = False
        return total

    def write_audio_pcm(self, samples: np.ndarray) -> int:
        if self._abuf is not None:
            samples = np.concatenate([self._abuf, samples])
            self._abuf = None
        total = 0
        pos = 0
        while samples.shape[0] - pos >= LPCM_SAMPLES:
            chunk = samples[pos:pos + LPCM_SAMPLES]
            pos += LPCM_SAMPLES
            pts = int(self._audio_samples * 90000
                      / max(1, self.audio_rate)) + 3600
            self._audio_samples += chunk.shape[0]
            self._audio_frame_no += 1
            total += self._emit_pack(
                lpcm_packet(chunk, self.audio_rate,
                            self._audio_frame_no, pts))
        if pos < samples.shape[0]:
            self._abuf = samples[pos:].copy()
        return total

    def close(self) -> None:
        if self._abuf is not None and len(self._abuf):
            self._emit_pack(lpcm_packet(
                self._abuf, self.audio_rate, self._audio_frame_no + 1))
            self._abuf = None
        self._f.write(b"\x00\x00\x01\xb9")
