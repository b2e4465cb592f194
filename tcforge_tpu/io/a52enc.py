"""Native A/52 (AC-3) encoder.

The reference encodes AC-3 through external liba52-era tooling (the
export/encode_a52.c role routes through ffmpeg; the bridge path here
uses libavcodec).  This is a from-scratch spec encoder so DVD audio
encodes with no external library at all:

- 512-tap KBD MDCT sharing io/a52dec.py's transform matrices — the
  forward transform is ``IM.T @ (win * x) / 512`` (probed to ~260 dB
  perfect reconstruction against the decoder's IMDCT + overlap-add);
- one D15 exponent set per frame (block 0 transmits, blocks 1-5
  REUSE) with the |delta| <= 2 limit enforced by a forward+backward
  lowering pass (lowering exponents is always spec-safe);
- the SAME parametric bit allocation the decoder runs
  (a52dec._bit_alloc), with the csnroffst/fsnroffst pair chosen by
  bisection so the frame exactly fits its CBR size;
- mantissa quantization to the decoder's reconstruction levels,
  including the grouped bap-1/2/4 triplet/pair codes whose group
  state is shared across channels within a block;
- CRC1 solved over GF(2) (it sits *before* the region it covers) and
  CRC2 by the append property, so strict decoders accept the frames.

Scope: mono and 2/0 stereo, no coupling/rematrixing/LFE (all
optional spec tools an encoder may omit); blksw=0, dithflag=0 so the
decoded result is deterministic.  Validated by round-trip SNR
through the in-tree oracle-validated decoder AND libavcodec
(tests/test_a52enc.py).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .a52dec import (DB_PER_BIT, FAST_DECAY, FAST_GAIN, FLOOR_TAB,
                     FRAME_SIZES, QNTZ_BITS, SAMPLE_RATES, SLOW_DECAY,
                     SLOW_GAIN, _bit_alloc, _IM512, _win512)
from .mpeg2codec import BitWriter

__all__ = ["A52Encoder", "NativeAc3Encoder"]

_BITRATES = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320, 384, 448, 512, 576, 640)

# bit-allocation parameter codes transmitted in block 0:
# sdcycod, fdcycod, sgaincod, dbkneecod, floorcod
_BACODS = (2, 1, 1, 2, 7)
_FGAINCOD = 4


# ------------------------------------------------------------------ #
# CRC16 (poly 0x8005, init 0) — crc2 uses the append property
# (crc(msg || crc(msg)) == 0); crc1 sits BEFORE its region so it is
# solved by GF(2) linearity over a 16-vector basis.
# ------------------------------------------------------------------ #

_CRCTBL: List[int] = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 \
            else (_c << 1) & 0xFFFF
    _CRCTBL.append(_c)


def _crc16(data: bytes) -> int:
    crc = 0
    for byt in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRCTBL[((crc >> 8) ^ byt) & 0xFF]
    return crc


_BASIS_CACHE = {}


def _solve_crc1(rest: bytes) -> int:
    ln = len(rest)
    if ln not in _BASIS_CACHE:
        eff = [_crc16((1 << (15 - i)).to_bytes(2, "big")
                      + b"\x00" * ln) for i in range(16)]
        basis = []
        for i, vec in enumerate(eff):
            v, t = vec, 1 << i
            for bv, bt in basis:
                if v ^ bv < v:
                    v ^= bv
                    t ^= bt
            if v:
                basis.append((v, t))
        _BASIS_CACHE[ln] = sorted(basis, reverse=True)
    v, t = _crc16(b"\x00\x00" + rest), 0
    for bv, bt in _BASIS_CACHE[ln]:
        if v ^ bv < v:
            v ^= bv
            t ^= bt
    if v:
        raise AssertionError("a52enc: crc1 not solvable (region "
                             "shorter than 16 bits?)")
    crc1 = 0
    for i in range(16):
        if t & (1 << i):
            crc1 |= 1 << (15 - i)
    return crc1


class _Prm:
    __slots__ = ("sdcy", "fdcy", "sgain", "dbknee", "floor")

    def __init__(self):
        self.sdcy = SLOW_DECAY[_BACODS[0]]
        self.fdcy = FAST_DECAY[_BACODS[1]]
        self.sgain = SLOW_GAIN[_BACODS[2]]
        self.dbknee = DB_PER_BIT[_BACODS[3]]
        self.floor = FLOOR_TAB[_BACODS[4]]


class _Counter:
    """BitWriter-shaped bit counter for the side-info dry run."""

    def __init__(self):
        self.nbits = 0

    def put(self, _v: int, nb: int) -> None:
        self.nbits += nb


def _quantize(coefs: np.ndarray, exps: np.ndarray, bap: np.ndarray
              ) -> List[tuple]:
    """Scan-order (bap, code) list for one channel's block."""
    m = np.clip(coefs[:len(bap)] * np.exp2(exps.astype(np.float64)),
                -1.0, 1.0)
    out = []
    for i, bp in enumerate(bap):
        if bp == 0:
            continue
        if bp in (1, 2, 3, 4, 5):
            lv = (0, 3, 5, 7, 11, 15)[bp]
            c = int(np.floor((m[i] * lv + lv - 1) / 2.0 + 0.5))
            out.append((bp, min(max(c, 0), lv - 1)))
        else:
            nb = QNTZ_BITS[bp]
            half = 1 << (nb - 1)
            c = int(np.floor(m[i] * half + 0.5))
            c = min(max(c, -half), half - 1)
            out.append((bp, c & ((1 << nb) - 1)))
    return out


def _mant_bits(bap_lists: List[np.ndarray]) -> int:
    """Mantissa bits for ONE block (grouped codes share state across
    channels; leftover groups complete at block end)."""
    n = np.zeros(16, np.int64)
    for bap in bap_lists:
        cnt = np.bincount(bap, minlength=16)
        n += cnt
    bits = 5 * ((n[1] + 2) // 3) + 7 * ((n[2] + 2) // 3) \
        + 3 * n[3] + 7 * ((n[4] + 1) // 2) + 4 * n[5]
    for bp in range(6, 16):
        bits += QNTZ_BITS[bp] * n[bp]
    return int(bits)


def _exp_groups(exps: List[int]) -> List[int]:
    """D15 7-bit exponent groups (3 diffs each, +2 biased)."""
    out = []
    pre = exps[0]
    i = 1
    nm = len(exps)
    ngrps = (nm - 1 + 2) // 3
    for _ in range(ngrps):
        ds = []
        for _j in range(3):
            e = exps[i] if i < nm else pre
            d = e - pre
            assert -2 <= d <= 2, "exponent limit pass failed"
            ds.append(d + 2)
            pre = e
            i += 1
        out.append(ds[0] * 25 + ds[1] * 5 + ds[2])
    return out


class A52Encoder:
    """Stateful AC-3 encoder: the 256-sample MDCT history carries
    across frames; feed exactly 1536 samples per call."""

    def __init__(self, rate: int, channels: int, bitrate_kbps: int):
        if rate not in SAMPLE_RATES:
            raise ValueError(f"a52enc: unsupported rate {rate} "
                             f"(AC-3: {SAMPLE_RATES})")
        if channels not in (1, 2):
            raise ValueError("a52enc: mono/stereo only (coupling and "
                             "3+ channel modes not implemented)")
        self.rate = rate
        self.channels = channels
        self.fscod = SAMPLE_RATES.index(rate)
        kbps = min(_BITRATES, key=lambda b: (abs(b - int(bitrate_kbps)),
                                             b))
        self.bitrate_kbps = kbps
        self.frmsizecod = 2 * _BITRATES.index(kbps)
        self.frame_bytes = 2 * FRAME_SIZES[self.frmsizecod * 3
                                           + self.fscod]
        self.acmod = 1 if channels == 1 else 2
        per_ch = kbps // channels
        if per_ch >= 128:
            self.chbwcod = 60
        elif per_ch >= 96:
            self.chbwcod = 54
        elif per_ch >= 64:
            self.chbwcod = 48
        elif per_ch >= 48:
            self.chbwcod = 40
        else:
            self.chbwcod = 32
        self.endmant = (self.chbwcod + 12) * 3 + 37
        self._hist = np.zeros((channels, 256))
        self._prm = _Prm()
        self._F = _IM512.T / 512.0
        self._win = _win512()

    # -------------------------------------------------------------- #

    def _exponents(self, coefs: np.ndarray) -> np.ndarray:
        """coefs (6, endmant) -> frame exponent set (endmant,)."""
        mag = np.abs(coefs).max(axis=0)
        with np.errstate(divide="ignore"):
            e = np.floor(-np.log2(np.maximum(mag, 1e-30)))
        e = np.clip(e, 0, 24).astype(np.int64)
        e[0] = min(e[0], 15)
        for i in range(1, len(e)):         # d <= 2
            e[i] = min(e[i], e[i - 1] + 2)
        for i in range(len(e) - 2, -1, -1):  # d >= -2
            e[i] = min(e[i], e[i + 1] + 2)
        return e

    def _pack(self, w, exps, grps, baps, codes_blocks,
              csnr: int, fsnr: int) -> None:
        """Everything from bsid through the last mantissa."""
        nch = self.channels
        w.put(8, 5)                        # bsid
        w.put(0, 3)                        # bsmod
        w.put(self.acmod, 3)
        if self.acmod == 2:
            w.put(0, 2)                    # dsurmod
        w.put(0, 1)                        # lfeon
        w.put(31, 5)                       # dialnorm
        for _ in range(3):
            w.put(0, 1)                    # compre langcode audprodie
        w.put(0, 1)                        # copyrightb
        w.put(1, 1)                        # origbs
        for _ in range(3):
            w.put(0, 1)                    # timecod1e/2e addbsie
        for blk in range(6):
            for _c in range(nch):
                w.put(0, 1)                # blksw
            for _c in range(nch):
                w.put(0, 1)                # dithflag
            w.put(0, 1)                    # dynrnge
            if blk == 0:
                w.put(1, 1)                # cplstre
                w.put(0, 1)                # cplinu
                if self.acmod == 2:
                    w.put(1, 1)            # rematstr
                    for _ in range(4):
                        w.put(0, 1)        # rematflg
                for _c in range(nch):
                    w.put(1, 2)            # chexpstr = D15
                for _c in range(nch):
                    w.put(self.chbwcod, 6)
                for c in range(nch):
                    w.put(int(exps[c][0]), 4)
                    for g in grps[c]:
                        w.put(g, 7)
                    w.put(0, 2)            # gainrng
                w.put(1, 1)                # baie
                w.put(_BACODS[0], 2)
                w.put(_BACODS[1], 2)
                w.put(_BACODS[2], 2)
                w.put(_BACODS[3], 2)
                w.put(_BACODS[4], 3)
                w.put(1, 1)                # snroffste
                w.put(csnr, 6)
                for _c in range(nch):
                    w.put(fsnr, 4)
                    w.put(_FGAINCOD, 3)
            else:
                w.put(0, 1)                # cplstre
                if self.acmod == 2:
                    w.put(0, 1)            # rematstr
                for _c in range(nch):
                    w.put(0, 2)            # chexpstr REUSE
                w.put(0, 1)                # baie
                w.put(0, 1)                # snroffste
            w.put(0, 1)                    # deltbaie
            w.put(0, 1)                    # skiple
            codes = codes_blocks[blk] if codes_blocks else []
            q1 = [c for bp, c in codes if bp == 1]
            q2 = [c for bp, c in codes if bp == 2]
            q4 = [c for bp, c in codes if bp == 4]
            i1 = i2 = i4 = g1 = g2 = g4 = 0
            for bp, c in codes:
                if bp == 1:
                    if g1 == 0:
                        t = q1[i1:i1 + 3] + [0] * (3 - len(q1[i1:i1 + 3]))
                        w.put(t[0] * 9 + t[1] * 3 + t[2], 5)
                        g1, i1 = 3, i1 + 3
                    g1 -= 1
                elif bp == 2:
                    if g2 == 0:
                        t = q2[i2:i2 + 3] + [0] * (3 - len(q2[i2:i2 + 3]))
                        w.put(t[0] * 25 + t[1] * 5 + t[2], 7)
                        g2, i2 = 3, i2 + 3
                    g2 -= 1
                elif bp == 4:
                    if g4 == 0:
                        t = q4[i4:i4 + 2] + [0] * (2 - len(q4[i4:i4 + 2]))
                        w.put(t[0] * 11 + t[1], 7)
                        g4, i4 = 2, i4 + 2
                    g4 -= 1
                else:
                    w.put(c, QNTZ_BITS[bp] if bp >= 6
                          else (0, 0, 0, 3, 0, 4)[bp])

    def encode_frame(self, pcm: np.ndarray) -> bytes:
        if pcm.shape != (1536, self.channels):
            raise ValueError(f"a52enc: need (1536, {self.channels}) "
                             f"samples, got {pcm.shape}")
        if pcm.dtype.kind in "iu":
            x = pcm.astype(np.float64) / 32768.0
        else:
            x = pcm.astype(np.float64)
        nch, nm = self.channels, self.endmant

        full = np.concatenate((self._hist, x.T), axis=1)  # (nch, 1792)
        self._hist = np.ascontiguousarray(x.T[:, -256:])
        coefs = np.empty((nch, 6, nm))
        for ch in range(nch):
            for blk in range(6):
                xw = full[ch, 256 * blk:256 * blk + 512] * self._win
                coefs[ch, blk] = (self._F @ xw)[:nm]

        exps = [self._exponents(coefs[ch]) for ch in range(nch)]
        grps = [_exp_groups(list(exps[ch])) for ch in range(nch)]

        # side-info bits (mantissas excluded) via a dry-run count
        cnt = _Counter()
        self._pack(cnt, exps, grps, None, None, 0, 0)
        avail = 8 * self.frame_bytes - 40 - 18 - cnt.nbits

        def baps_for(s: int) -> List[np.ndarray]:
            snroff = s << 2
            return [np.asarray(_bit_alloc(
                list(exps[ch]), 0, nm, self.fscod, snroff,
                FAST_GAIN[_FGAINCOD], self._prm), np.int64)
                for ch in range(nch)]

        lo, hi = -240, 783
        if 6 * _mant_bits(baps_for(lo)) > avail:
            raise ValueError("a52enc: frame cannot fit even at the "
                             "minimum SNR offset — bitrate too low "
                             "for this bandwidth")
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if 6 * _mant_bits(baps_for(mid)) <= avail:
                lo = mid
            else:
                hi = mid - 1
        s = lo
        q, r = divmod(s, 16)
        csnr, fsnr = 15 + q, r
        baps = baps_for(s)

        codes_blocks = []
        for blk in range(6):
            codes = []
            for ch in range(nch):
                codes.extend(_quantize(coefs[ch, blk], exps[ch],
                                       baps[ch]))
            codes_blocks.append(codes)

        w = BitWriter()
        self._pack(w, exps, grps, baps, codes_blocks, csnr, fsnr)
        body = w.bytes()
        room = self.frame_bytes - 5 - 2    # sync+crc1+hdr byte, crc2
        if len(body) > room:
            raise AssertionError(f"a52enc: frame overflow {len(body)} "
                                 f"> {room}")
        body += b"\x00" * (room - len(body))
        frame = bytearray(b"\x0b\x77\x00\x00")
        frame.append((self.fscod << 6) | self.frmsizecod)
        frame += body
        words58 = (self.frame_bytes >> 1) * 5 // 8
        crc1 = _solve_crc1(bytes(frame[4:2 * words58]))
        frame[2:4] = crc1.to_bytes(2, "big")
        frame += _crc16(bytes(frame[2:])).to_bytes(2, "big")
        assert len(frame) == self.frame_bytes
        return bytes(frame)


class NativeAc3Encoder:
    """AvAudioEncoder-shaped streaming wrapper (feed/read_packets/
    flush/frame_size/extradata) so the ac3enc module can fall back to
    the native encoder when the FFmpeg bridge is absent."""

    frame_size = 1536
    extradata = b""

    def __init__(self, rate: int, channels: int, bitrate_bps: int):
        self._enc = A52Encoder(rate, channels,
                               max(32, bitrate_bps // 1000))
        self._pend = np.zeros((0, channels), np.int16)
        self._out: List[bytes] = []

    def set_framed(self, framed: bool = True) -> None:
        pass                               # always framed

    def feed(self, pcm: np.ndarray) -> None:
        pcm = np.asarray(pcm, np.int16).reshape(-1,
                                                self._enc.channels)
        self._pend = np.concatenate((self._pend, pcm))
        while self._pend.shape[0] >= 1536:
            self._out.append(self._enc.encode_frame(self._pend[:1536]))
            self._pend = self._pend[1536:]

    def flush(self) -> None:
        if self._pend.shape[0]:
            pad = np.zeros((1536 - self._pend.shape[0],
                            self._enc.channels), np.int16)
            self._out.append(self._enc.encode_frame(
                np.concatenate((self._pend, pad))))
            self._pend = self._pend[:0]

    def read_packets(self) -> List[bytes]:
        out = self._out
        self._out = []
        return out

    def close(self) -> None:
        self._out = []
