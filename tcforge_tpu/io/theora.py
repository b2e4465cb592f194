"""Native Theora (VP3.2 family) video decoder.

Bitstream per the Theora I specification: header triple parse
(identification / comment / setup), coded-block flags, macroblock
modes, motion vectors, block-level qi, DCT token decode with
stream-carried Huffman tables, VP3 DC prediction, dequantization,
the 16-bit integer inverse DCT, half-pel motion compensation and the
VP3 loop filter.

The reference decodes theora by LINKING libtheora
(/root/reference/import/import_ogg.c hands packets to the external
lib) — there is no in-tree decoder to port.  This is a from-scratch
implementation; the fixed spec tables (DC predictor weights, Hilbert
block traversal, run-length / motion-vector / mode VLC code lengths,
iDCT cosine constants) are numeric constants of the public spec,
recovered from the public libtheora/libavcodec binaries shipped in
this container, and every decode path is validated BIT-EXACT against
the bundled libavcodec decoder on bridge-encoded streams
(tests/test_theora.py) — the same oracle-validated method used for
io/tclzo.py.

All three pixel formats decode (4:2:0, 4:2:2 with full-vertical
chroma and per-row 4MV chroma averaging, 4:4:4 with per-block chroma
vectors) — each oracle-validated bit-exact (r5).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["TheoraInfo", "parse_ident", "TheoraDecoder"]


# ------------------------------------------------------------------ #
# MSB-first bit reader
# ------------------------------------------------------------------ #

class Bits:
    """MSB-first bit reader; reads past the end return zero bits
    (spec 5.2: the packet is treated as padded with zeros).

    The packet is pre-split into big-endian 32-bit words held as
    python ints so any <= 32-bit read is two word fetches and a
    shift — the token loop reads hundreds of thousands of fields
    per frame."""

    __slots__ = ("words", "pos", "nbits", "raw8")

    def __init__(self, data: bytes):
        pad = data + b"\x00" * 8
        self.words = np.frombuffer(
            pad[:len(pad) // 4 * 4], ">u4").tolist()
        self.pos = 0                       # bit position
        self.nbits = 8 * len(data)
        # raw byte view for the native token decoder
        self.raw8 = np.frombuffer(data, np.uint8)

    def read(self, n: int) -> int:
        p = self.pos
        self.pos = p + n
        if p >= self.nbits:
            return 0                   # zero-fill past the end
        i = p >> 5
        w = (self.words[i] << 32) | self.words[i + 1]
        return (w >> (64 - (p & 31) - n)) & ((1 << n) - 1)

    def read1(self) -> int:
        p = self.pos
        self.pos = p + 1
        if p >= self.nbits:
            return 0
        return (self.words[p >> 5] >> (31 - (p & 31))) & 1

    @property
    def eof(self) -> bool:
        return self.pos >= self.nbits


def _ilog(v: int) -> int:
    return v.bit_length()


# ------------------------------------------------------------------ #
# Fixed spec tables (recovered from the public binaries; see module
# docstring).  All are constants of the published Theora I spec.
# ------------------------------------------------------------------ #

# Block traversal within a 4x4-block superblock, (x, y) offsets.
HILBERT = ((0, 0), (1, 0), (1, 1), (0, 1), (0, 2), (0, 3), (1, 3),
           (1, 2), (2, 2), (2, 3), (3, 3), (3, 2), (3, 1), (2, 1),
           (2, 0), (3, 0))

# Macroblock traversal within a superblock's 2x2 quad, (x, y).
MB_QUAD = ((0, 0), (0, 1), (1, 1), (1, 0))

# DC predictor weights [UL, U, UR, L], index = L | UR<<1 | U<<2 | UL<<3
PRED_W = ((0, 0, 0, 0), (0, 0, 0, 128), (0, 0, 128, 0),
          (0, 0, 53, 75), (0, 128, 0, 0), (0, 64, 0, 64),
          (0, 128, 0, 0), (0, 0, 53, 75), (128, 0, 0, 0),
          (0, 0, 0, 128), (64, 0, 64, 0), (0, 0, 53, 75),
          (0, 128, 0, 0), (-104, 116, 0, 116), (24, 80, 24, 0),
          (-104, 116, 0, 116))

# Reference-frame class per coding mode (0 intra, 1 prev, 2 golden).
MODE_NO_MV, MODE_INTRA, MODE_MV, MODE_LAST, MODE_LAST2, \
    MODE_GOLDEN, MODE_GOLDEN_MV, MODE_FOURMV = range(8)
FRAME_CLASS = (1, 0, 1, 1, 1, 2, 2, 1)

# Mode alphabets for coding schemes 1..6 (scheme 0 = custom, 7 = CLC).
MODE_ALPHABETS = (
    (MODE_LAST, MODE_LAST2, MODE_MV, MODE_NO_MV, MODE_INTRA,
     MODE_GOLDEN, MODE_GOLDEN_MV, MODE_FOURMV),
    (MODE_LAST, MODE_LAST2, MODE_NO_MV, MODE_MV, MODE_INTRA,
     MODE_GOLDEN, MODE_GOLDEN_MV, MODE_FOURMV),
    (MODE_LAST, MODE_MV, MODE_LAST2, MODE_NO_MV, MODE_INTRA,
     MODE_GOLDEN, MODE_GOLDEN_MV, MODE_FOURMV),
    (MODE_LAST, MODE_MV, MODE_NO_MV, MODE_LAST2, MODE_INTRA,
     MODE_GOLDEN, MODE_GOLDEN_MV, MODE_FOURMV),
    (MODE_NO_MV, MODE_LAST, MODE_LAST2, MODE_MV, MODE_INTRA,
     MODE_GOLDEN, MODE_GOLDEN_MV, MODE_FOURMV),
    (MODE_NO_MV, MODE_GOLDEN, MODE_LAST, MODE_LAST2, MODE_MV,
     MODE_INTRA, MODE_GOLDEN_MV, MODE_FOURMV),
)

# Long-run (superblock flag) code: canonical code from the length
# array {1,3,3,4,4,6,6,6,6,8*8,10*16,6}; symbol 33 is the escape
# (12 extra bits, runs 34..4129, and a maximum-length run does not
# toggle the flag).
_SB_RUN_LENS = (1, 3, 3, 4, 4, 6, 6, 6, 6) + (8,) * 8 + (10,) * 16 + (6,)
LONG_RUN_MAX = 4129

# Short-run (block flag) code lengths, runs 1..30.
_FRAG_RUN_LENS = (2, 2, 3, 3, 4, 4, 6, 6, 6, 6, 7, 7, 7, 7) + (9,) * 16
SHORT_RUN_MAX = 30

# Mode VLC: unary, lengths {1,2,3,4,5,6,7,7} over alphabet ranks.
_MODE_LENS = (1, 2, 3, 4, 5, 6, 7, 7)

# Motion-vector VLC (sym, len) pairs in canonical code order; the
# symbol is the MV value + 31.
_MV_SYMS_LENS = (
    (31, 3), (32, 3), (30, 3), (33, 4), (29, 4), (34, 4), (28, 4),
    (35, 6), (27, 6), (36, 6), (26, 6), (37, 6), (25, 6), (38, 6),
    (24, 6), (39, 7), (23, 7), (40, 7), (22, 7), (41, 7), (21, 7),
    (42, 7), (20, 7), (43, 7), (19, 7), (44, 7), (18, 7), (45, 7),
    (17, 7), (46, 7), (16, 7), (47, 8), (15, 8), (48, 8), (14, 8),
    (49, 8), (13, 8), (50, 8), (12, 8), (51, 8), (11, 8), (52, 8),
    (10, 8), (53, 8), (9, 8), (54, 8), (8, 8), (55, 8), (7, 8),
    (56, 8), (6, 8), (57, 8), (5, 8), (58, 8), (4, 8), (59, 8),
    (3, 8), (60, 8), (2, 8), (61, 8), (1, 8), (62, 8), (0, 8))

ZIGZAG = (0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21,
          28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30,
          37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61,
          54, 47, 55, 62, 63)

# iDCT cosine constants (16-bit approximations, spec 7.9.3.5).
xC1S7, xC2S6, xC3S5, xC4S4 = 64277, 60547, 54491, 46341
xC5S3, xC6S2, xC7S1 = 36410, 25080, 12785

# Coefficient index -> AC Huffman table group (group 0 is DC).
_COEF_GROUP = [0] + [1] * 5 + [2] * 9 + [3] * 13 + [4] * 36

# Debug switch: interpret setup base matrices as zigzag-ordered
# instead of raster (resolved against the oracle; see tests).
_QMAT_ZIGZAG = False


def _canonical_lut(syms_lens):
    """(symbol, length) pairs in canonical code order -> LUT lists
    (sym, len) indexed by the next `maxlen` bits (python lists: the
    decode loop indexes them millions of times)."""
    maxlen = max(ln for _, ln in syms_lens)
    lut_sym = [0] * (1 << maxlen)
    lut_len = [0] * (1 << maxlen)
    code32 = 0                       # left-aligned accumulator, so a
    for sym, ln in syms_lens:        # shorter code may follow longer
        code = code32 >> (32 - ln)   # ones (the long-run escape does)
        lo = code << (maxlen - ln)
        for k in range(lo, lo + (1 << (maxlen - ln))):
            lut_sym[k] = sym
            lut_len[k] = ln
        code32 += 1 << (32 - ln)
    return lut_sym, lut_len, maxlen


_SB_LUT = _canonical_lut(tuple((i, l) for i, l in
                                enumerate(_SB_RUN_LENS)))
_FRAG_LUT = _canonical_lut(tuple((i, l) for i, l in
                                 enumerate(_FRAG_RUN_LENS)))
_MODE_LUT = _canonical_lut(tuple((i, l) for i, l in
                                 enumerate(_MODE_LENS)))
_MV_LUT = _canonical_lut(_MV_SYMS_LENS)


def _read_lut(bits: Bits, lut) -> int:
    lut_sym, lut_len, maxlen = lut
    p = bits.pos
    v = bits.read(maxlen)                 # peek
    bits.pos = p + lut_len[v]             # consume the real length
    return lut_sym[v]


def _read_long_run(bits: Bits) -> int:
    sym = _read_lut(bits, _SB_LUT)
    if sym == 33:
        return 34 + bits.read(12)
    return sym + 1


def _read_short_run(bits: Bits) -> int:
    return _read_lut(bits, _FRAG_LUT) + 1


def _read_mv_vlc(bits: Bits) -> int:
    return _read_lut(bits, _MV_LUT) - 31


# ------------------------------------------------------------------ #
# Headers
# ------------------------------------------------------------------ #

@dataclass
class TheoraInfo:
    version: Tuple[int, int, int]
    fmbw: int                     # frame width in macroblocks
    fmbh: int
    pic_w: int
    pic_h: int
    pic_x: int
    pic_y: int
    fps_num: int
    fps_den: int
    par_num: int
    par_den: int
    colorspace: int
    pixel_format: int             # 0 = 4:2:0, 2 = 4:2:2, 3 = 4:4:4
    nombr: int = 0
    quality: int = 0
    kfgshift: int = 6

    @property
    def frame_w(self) -> int:
        return self.fmbw * 16

    @property
    def frame_h(self) -> int:
        return self.fmbh * 16


def parse_ident(pkt: bytes) -> TheoraInfo:
    """Identification header (spec 6.2)."""
    if len(pkt) < 42 or pkt[0] != 0x80 or pkt[1:7] != b"theora":
        raise ValueError("not a theora identification header")
    b = Bits(pkt[7:])
    vmaj, vmin, vrev = b.read(8), b.read(8), b.read(8)
    if vmaj != 3 or vmin != 2:
        raise ValueError(f"unsupported theora version {vmaj}.{vmin}")
    fmbw = b.read(16)
    fmbh = b.read(16)
    pic_w = b.read(24)
    pic_h = b.read(24)
    pic_x = b.read(8)
    pic_y = b.read(8)
    frn = b.read(32)
    frd = b.read(32)
    parn = b.read(24)
    pard = b.read(24)
    cs = b.read(8)
    nombr = b.read(24)
    qual = b.read(6)
    kfgshift = b.read(5)
    pf = b.read(2)
    if fmbw == 0 or fmbh == 0 or pic_w > fmbw * 16 or pic_h > fmbh * 16:
        raise ValueError("theora: bad frame geometry")
    if fmbw * 16 > 4096 or fmbh * 16 > 4096:
        # not a spec limit — a defensive cap so a crafted header
        # cannot demand minutes of block-map construction before any
        # data arrives (4096px is far beyond any real theora stream)
        raise ValueError("theora: frame dimensions beyond the "
                         "4096-px defensive cap")
    return TheoraInfo((vmaj, vmin, vrev), fmbw, fmbh, pic_w, pic_h,
                      pic_x, pic_y, frn, frd, parn, pard, cs, pf,
                      nombr, qual, kfgshift)


@dataclass
class _Setup:
    lflims: np.ndarray            # (64,)
    acscale: np.ndarray           # (64,)
    dcscale: np.ndarray           # (64,)
    base_mats: np.ndarray         # (nbms, 64)
    qr_counts: list               # [qti][pli] -> nranges
    qr_sizes: list                # [qti][pli] -> list
    qr_bmis: list                 # [qti][pli] -> list
    huff: list                    # 80 entries of (lut_sym, lut_len, maxlen) or tree
    huff_leaves: list             # 80 lists of (code, len, token)


def _read_huff_tree(b: Bits, leaves: list, code: int, ln: int) -> None:
    if ln > 32:
        raise ValueError("theora: huffman tree too deep")
    if b.read1():
        leaves.append((code, ln, b.read(5)))
    else:
        _read_huff_tree(b, leaves, code << 1, ln + 1)
        _read_huff_tree(b, leaves, (code << 1) | 1, ln + 1)


def parse_setup(pkt: bytes) -> _Setup:
    """Setup header (spec 6.4): loop-filter limits, quantizer scales
    and base matrices, quant ranges, 80 Huffman tables."""
    if len(pkt) < 7 or pkt[0] != 0x82 or pkt[1:7] != b"theora":
        raise ValueError("not a theora setup header")
    b = Bits(pkt[7:])
    nbits = b.read(3)
    lflims = np.array([b.read(nbits) for _ in range(64)], np.int32)
    nbits = b.read(4) + 1
    acscale = np.array([b.read(nbits) for _ in range(64)], np.int64)
    nbits = b.read(4) + 1
    dcscale = np.array([b.read(nbits) for _ in range(64)], np.int64)
    nbms = b.read(9) + 1
    if nbms > 384:
        raise ValueError("theora: too many base matrices")
    base = np.array([[b.read(8) for _ in range(64)]
                     for _ in range(nbms)], np.int64)
    qr_counts = [[0] * 3, [0] * 3]
    qr_sizes = [[None] * 3, [None] * 3]
    qr_bmis = [[None] * 3, [None] * 3]
    for qti in range(2):
        for pli in range(3):
            newqr = 1 if (qti, pli) == (0, 0) else b.read1()
            if not newqr:
                rpqr = b.read1() if qti > 0 else 0
                if rpqr:
                    qtj, plj = qti - 1, pli
                else:
                    qtj = (3 * qti + pli - 1) // 3
                    plj = (pli + 2) % 3
                qr_counts[qti][pli] = qr_counts[qtj][plj]
                qr_sizes[qti][pli] = qr_sizes[qtj][plj]
                qr_bmis[qti][pli] = qr_bmis[qtj][plj]
                continue
            sizes = []
            bmis = [b.read(_ilog(nbms - 1))]
            qi = 0
            while qi < 63:
                sz = b.read(_ilog(62 - qi)) + 1
                sizes.append(sz)
                qi += sz
                bmis.append(b.read(_ilog(nbms - 1)))
            if qi != 63:
                raise ValueError("theora: quant ranges overrun")
            qr_counts[qti][pli] = len(sizes)
            qr_sizes[qti][pli] = sizes
            qr_bmis[qti][pli] = bmis
    huff = []
    all_leaves = []
    for _ in range(80):
        leaves: list = []
        _read_huff_tree(b, leaves, 0, 0)
        all_leaves.append(leaves)
        if len(leaves) == 1 and leaves[0][1] == 0:
            # degenerate single-leaf tree: zero-length code
            huff.append(([leaves[0][2]], [0], 0))
            continue
        maxlen = max(ln for _, ln, _ in leaves)
        if maxlen > 16:
            # a maximally skewed 32-leaf tree can reach depth 31; a
            # flat LUT would need 2^31 entries.  Real tables are
            # shallow — beyond 16 bits fall back to a (code,len)
            # dict walked bit by bit (correct, just slower, and only
            # ever reached by hostile streams).
            huff.append(({(c, ln): tok for c, ln, tok in leaves},
                         None, maxlen))
            continue
        lut_sym = [0] * (1 << maxlen)
        lut_len = [0] * (1 << maxlen)
        for code, ln, tok in leaves:
            lo = code << (maxlen - ln)
            for k in range(lo, lo + (1 << (maxlen - ln))):
                lut_sym[k] = tok
                lut_len[k] = ln
        huff.append((lut_sym, lut_len, maxlen))
    return _Setup(lflims, acscale, dcscale, base, qr_counts,
                  qr_sizes, qr_bmis, huff, all_leaves)


# ------------------------------------------------------------------ #
# Dequant matrices
# ------------------------------------------------------------------ #

def _build_qmat(setup: _Setup, qti: int, pli: int, qi: int
                ) -> np.ndarray:
    """(64,) int32 quantizer matrix in ZIGZAG-index order is NOT used;
    matrices are in natural (raster) coefficient order like the base
    matrices (spec 6.4.3)."""
    sizes = setup.qr_sizes[qti][pli]
    bmis = setup.qr_bmis[qti][pli]
    qlo = 0
    for ri, sz in enumerate(sizes):
        qhi = qlo + sz
        if qi <= qhi:
            break
        qlo = qhi
    else:
        ri = len(sizes) - 1
        qlo = 63 - sizes[-1]
        qhi = 63
    bm_lo = setup.base_mats[bmis[ri]]
    bm_hi = setup.base_mats[bmis[ri + 1]]
    d = qhi - qlo
    bm = (2 * (qhi - qi) * bm_lo + 2 * (qi - qlo) * bm_hi + d) // (2 * d)
    qmat = np.empty(64, np.int64)
    for ci in range(64):
        qscale = setup.dcscale[qi] if ci == 0 else setup.acscale[qi]
        qmin = 8 << ((1 if qti else 0) + (1 if ci == 0 else 0))
        v = (qscale * bm[ci] // 100) * 4
        qmat[ci] = max(qmin, min(int(v), 4096))
    return qmat.astype(np.int32)


# ------------------------------------------------------------------ #
# Integer iDCT (spec 7.9.3)
# ------------------------------------------------------------------ #

def _idct_1d(x: np.ndarray) -> np.ndarray:
    """One 1D pass over the last axis of an int32 array of 8-vectors.
    Each cosine product is truncated to (a*b)>>16 individually."""
    def M(c, v):
        return (c * v) >> 16
    x0, x1, x2, x3 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    x4, x5, x6, x7 = x[..., 4], x[..., 5], x[..., 6], x[..., 7]
    A = M(xC1S7, x1) + M(xC7S1, x7)
    B = M(xC7S1, x1) - M(xC1S7, x7)
    C = M(xC3S5, x3) + M(xC5S3, x5)
    D = M(xC3S5, x5) - M(xC5S3, x3)
    Ad = M(xC4S4, A - C)
    Bd = M(xC4S4, B - D)
    Cd = A + C
    Dd = B + D
    E = M(xC4S4, x0 + x4)
    F = M(xC4S4, x0 - x4)
    G = M(xC2S6, x2) + M(xC6S2, x6)
    H = M(xC6S2, x2) - M(xC2S6, x6)
    Ed = E - G
    Gd = E + G
    Add = F + Ad
    Bdd = Bd - H
    Fd = F - Ad
    Hd = Bd + H
    out = np.empty_like(x)
    out[..., 0] = Gd + Cd
    out[..., 7] = Gd - Cd
    out[..., 1] = Add + Hd
    out[..., 2] = Add - Hd
    out[..., 3] = Ed + Dd
    out[..., 4] = Ed - Dd
    out[..., 5] = Fd + Bdd
    out[..., 6] = Fd - Bdd
    return out


def idct8x8(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) int32 dequantized coefficients -> (n, 8, 8) residuals.
    Row pass, column pass, then (v + 8) >> 4."""
    t = _idct_1d(blocks)                       # rows
    t = _idct_1d(t.transpose(0, 2, 1)).transpose(0, 2, 1)  # columns
    return (t + 8) >> 4


# ------------------------------------------------------------------ #
# Frame geometry
# ------------------------------------------------------------------ #

class _Geometry:
    """Block/superblock/macroblock layout for one pixel format."""

    def __init__(self, info: TheoraInfo):
        fmt = info.pixel_format
        if fmt not in (0, 2, 3):
            raise NotImplementedError(
                "theora: reserved pixel format "
                f"{fmt}")
        self.fmt = fmt
        fw, fh = info.frame_w, info.frame_h
        if fmt == 0:
            self.plane_w = (fw, fw // 2, fw // 2)
            self.plane_h = (fh, fh // 2, fh // 2)
        elif fmt == 2:                 # 4:2:2: full vertical chroma
            self.plane_w = (fw, fw // 2, fw // 2)
            self.plane_h = (fh, fh, fh)
        else:                          # 4:4:4
            self.plane_w = (fw, fw, fw)
            self.plane_h = (fh, fh, fh)
        self.bw = tuple(w // 8 for w in self.plane_w)
        self.bh = tuple(h // 8 for h in self.plane_h)
        self.nblocks = tuple(self.bw[p] * self.bh[p] for p in range(3))
        self.plane_off = (0, self.nblocks[0],
                          self.nblocks[0] + self.nblocks[1])
        self.total_blocks = sum(self.nblocks)
        self.sbw = tuple((w + 3) // 4 for w in self.bw)
        self.sbh = tuple((h + 3) // 4 for h in self.bh)
        self.nsbs = tuple(self.sbw[p] * self.sbh[p] for p in range(3))
        self.total_sbs = sum(self.nsbs)

        # superblock -> list of global block ids in coded order
        self.sb_blocks: List[List[int]] = []
        # global coded order list of block ids
        coded_order = []
        # block id -> (plane, by, bx)
        self.block_pos = np.zeros((self.total_blocks, 3), np.int32)
        for p in range(3):
            for by in range(self.bh[p]):
                for bx in range(self.bw[p]):
                    bid = self.plane_off[p] + by * self.bw[p] + bx
                    self.block_pos[bid] = (p, by, bx)
            for sby in range(self.sbh[p]):
                for sbx in range(self.sbw[p]):
                    blocks = []
                    for hx, hy in HILBERT:
                        bx = 4 * sbx + hx
                        by = 4 * sby + hy
                        if bx < self.bw[p] and by < self.bh[p]:
                            blocks.append(self.plane_off[p]
                                          + by * self.bw[p] + bx)
                    self.sb_blocks.append(blocks)
                    coded_order.extend(blocks)
        self.coded_order = np.array(coded_order, np.int32)
        # position of each block id in coded order
        self.coded_rank = np.zeros(self.total_blocks, np.int32)
        self.coded_rank[self.coded_order] = np.arange(
            self.total_blocks, dtype=np.int32)

        # macroblocks in coded order: luma superblock raster, 2x2 quad
        # pattern, skipping out-of-bounds MBs
        self.mbw, self.mbh = info.fmbw, info.fmbh
        self.mb_order: List[Tuple[int, int]] = []
        for sby in range((self.mbh + 1) // 2):
            for sbx in range((self.mbw + 1) // 2):
                for qx, qy in MB_QUAD:
                    mbx = 2 * sbx + qx
                    mby = 2 * sby + qy
                    if mbx < self.mbw and mby < self.mbh:
                        self.mb_order.append((mbx, mby))
        # MB -> 4 luma block ids (raster within MB) + 2 chroma ids
        self.mb_luma = {}
        self.mb_chroma = {}
        for mbx, mby in self.mb_order:
            luma = []
            for j in range(2):
                for i in range(2):
                    bx, by = 2 * mbx + i, 2 * mby + j
                    luma.append(by * self.bw[0] + bx)
            self.mb_luma[(mbx, mby)] = luma
            if fmt == 0:
                ch = (self.plane_off[1] + mby * self.bw[1] + mbx,
                      self.plane_off[2] + mby * self.bw[2] + mbx)
            elif fmt == 2:
                # two vertically stacked chroma blocks per plane;
                # index order: plane 1 top/bottom, plane 2 ditto
                ch = tuple(
                    self.plane_off[p] + (2 * mby + j)
                    * self.bw[p] + mbx
                    for p in (1, 2) for j in (0, 1))
            else:
                # 4:4:4: the same 2x2 block quad as luma, per plane
                ch = tuple(
                    self.plane_off[p] + (2 * mby + j)
                    * self.bw[p] + (2 * mbx + i)
                    for p in (1, 2) for j in (0, 1)
                    for i in (0, 1))
            self.mb_chroma[(mbx, mby)] = ch


# ------------------------------------------------------------------ #
# The decoder
# ------------------------------------------------------------------ #

class TheoraDecoder:
    """Stateful frame decoder: feed data packets in stream order."""

    def __init__(self, header_packets: List[bytes]):
        if len(header_packets) < 3:
            raise ValueError("theora: need 3 header packets")
        self.info = parse_ident(header_packets[0])
        self.setup = parse_setup(header_packets[2])
        self.geo = _Geometry(self.info)
        self._qmat_cache: dict = {}
        self.last: Optional[list] = None      # 3 planes
        self.golden: Optional[list] = None
        self.frame_no = 0
        # native token/DC path (built lazily from the raw leaves)
        self._th_lib = None
        self._th_huff = None
        self._th_tried = False

    def _native(self):
        """(lib, huff_handle) for the C token decoder, or None."""
        if self._th_tried:
            return (self._th_lib, self._th_huff) \
                if self._th_huff else None
        self._th_tried = True
        import os
        if os.environ.get("TCFORGE_NATIVE_THEORA_TOKENS") == "0":
            return None
        from tcforge_tpu import native as _nat
        lib = _nat.load()
        if lib is None or not hasattr(lib, "tc_th_tokens"):
            return None
        codes, lens, toks, counts = [], [], [], []
        for leaves in self.setup.huff_leaves:
            counts.append(len(leaves))
            for code, ln, tok in leaves:
                codes.append(code)
                lens.append(ln)
                toks.append(tok)
        h = lib.tc_th_huff_new(
            np.ascontiguousarray(codes, np.uint32),
            np.ascontiguousarray(lens, np.uint8),
            np.ascontiguousarray(toks, np.uint8),
            np.ascontiguousarray(counts, np.int32))
        if not h:
            return None
        self._th_lib, self._th_huff = lib, h
        return (lib, h)

    def __del__(self):
        try:
            if self._th_huff:
                self._th_lib.tc_th_huff_free(self._th_huff)
                self._th_huff = None
        except Exception:
            pass

    # -------------------------------------------------------------- #

    def _qmat(self, qti: int, pli: int, qi: int) -> np.ndarray:
        key = (qti, pli, qi)
        m = self._qmat_cache.get(key)
        if m is None:
            m = _build_qmat(self.setup, qti, pli, qi)
            self._qmat_cache[key] = m
        return m

    def decode(self, pkt: bytes
               ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Decode one data packet -> cropped (y, u, v) uint8 planes."""
        if not pkt:
            # 0-length packet: duplicate frame
            if self.last is None:
                return None
            return self._crop()
        if pkt[0] & 0x80:
            return None                       # stray header packet
        b = Bits(pkt)
        if b.read1() != 0:
            raise ValueError("theora: bad packet type bit")
        ftype = b.read1()
        qis = [b.read(6)]
        if b.read1():
            qis.append(b.read(6))
            if b.read1():
                qis.append(b.read(6))
        if ftype == 0:
            if b.read(3) != 0:
                raise ValueError("theora: nonzero keyframe reserved bits")
            self._decode_intra(b, qis)
        else:
            if self.last is None:
                raise ValueError("theora: inter frame before keyframe")
            self._decode_inter(b, qis)
        self.frame_no += 1
        return self._crop()

    def _crop(self):
        # the frame is coded bottom-up (VP3 heritage): flip to display
        # orientation, then cut the picture region.  PICY counts from
        # the BOTTOM of the frame, so the display-space top offset is
        # frame_h - pic_y - pic_h (chroma: >>1), verified against the
        # oracle on non-multiple-of-16 geometry.
        info = self.info
        top = info.frame_h - info.pic_y - info.pic_h
        out = []
        for p, plane in enumerate(self.last):
            if p == 0:
                px, pw, ph, ty = (info.pic_x, info.pic_w,
                                  info.pic_h, top)
            elif self.geo.fmt == 0:
                px, pw = info.pic_x // 2, (info.pic_w + 1) // 2
                ph, ty = (info.pic_h + 1) // 2, top >> 1
            elif self.geo.fmt == 2:
                px, pw = info.pic_x // 2, (info.pic_w + 1) // 2
                ph, ty = info.pic_h, top
            else:
                px, pw, ph, ty = (info.pic_x, info.pic_w,
                                  info.pic_h, top)
            disp = plane[::-1]
            out.append(disp[ty:ty + ph, px:px + pw].copy())
        return tuple(out)

    # ------------------------------------------------------------- #
    # Coded-block flags (spec 7.3)
    # ------------------------------------------------------------- #

    def _read_block_flags(self, b: Bits) -> np.ndarray:
        geo = self.geo
        coded = np.zeros(geo.total_blocks, bool)
        nsb = geo.total_sbs
        # pass 1: partially-coded superblock flags, long runs
        partial = np.zeros(nsb, bool)
        flag = b.read1()
        i = 0
        while i < nsb:
            run = _read_long_run(b)
            partial[i:i + run] = flag
            i += run
            if i < nsb:
                flag = b.read1() if run == LONG_RUN_MAX else flag ^ 1
        # pass 2: fully-coded flags for the non-partial superblocks
        full = np.zeros(nsb, bool)
        rest = np.nonzero(~partial)[0]
        if len(rest):
            flag = b.read1()
            i = 0
            while i < len(rest):
                run = _read_long_run(b)
                full[rest[i:i + run]] = flag
                i += run
                if i < len(rest):
                    flag = b.read1() if run == LONG_RUN_MAX else flag ^ 1
        for sb in np.nonzero(full)[0]:
            coded[geo.sb_blocks[sb]] = True
        # pass 3: block flags within partial superblocks, short runs
        # (state carries across superblocks; a maximum-length run is
        # followed by an explicit flag bit instead of a toggle)
        psbs = np.nonzero(partial)[0]
        if len(psbs):
            flag = b.read1()
            run = _read_short_run(b)
            last_max = run == SHORT_RUN_MAX
            for sb in psbs:
                for bid in geo.sb_blocks[sb]:
                    if run == 0:
                        flag = b.read1() if last_max else flag ^ 1
                        run = _read_short_run(b)
                        last_max = run == SHORT_RUN_MAX
                    coded[bid] = flag
                    run -= 1
        return coded

    # ------------------------------------------------------------- #
    # Modes + motion vectors (spec 7.4 / 7.5)
    # ------------------------------------------------------------- #

    def _read_modes(self, b: Bits, coded: np.ndarray):
        geo = self.geo
        scheme = b.read(3)
        if scheme == 0:
            alphabet = [0] * 8
            for mode in range(8):
                alphabet[b.read(3)] = mode
        elif scheme < 7:
            alphabet = MODE_ALPHABETS[scheme - 1]
        mb_modes = {}
        for mb in geo.mb_order:
            luma = geo.mb_luma[mb]
            if not any(coded[bid] for bid in luma):
                mb_modes[mb] = -1             # uncoded MB
                continue
            if scheme == 7:
                mb_modes[mb] = b.read(3)
            else:
                mb_modes[mb] = alphabet[_read_lut(b, _MODE_LUT)]
        return mb_modes

    def _read_mv(self, b: Bits, vlc: bool) -> Tuple[int, int]:
        if vlc:
            return _read_mv_vlc(b), _read_mv_vlc(b)
        x = b.read(5)
        if b.read1():
            x = -x
        y = b.read(5)
        if b.read1():
            y = -y
        return x, y

    def _read_motion(self, b: Bits, coded, mb_modes):
        geo = self.geo
        vlc = b.read1() == 0
        last = (0, 0)
        last2 = (0, 0)
        mb_mvs = {}
        for mb in geo.mb_order:
            mode = mb_modes[mb]
            if mode < 0:
                continue
            if mode == MODE_MV:
                mv = self._read_mv(b, vlc)
                last2 = last
                last = mv
                mb_mvs[mb] = mv
            elif mode == MODE_GOLDEN_MV:
                mb_mvs[mb] = self._read_mv(b, vlc)
            elif mode == MODE_FOURMV:
                mvs = []
                for bid in geo.mb_luma[mb]:
                    if coded[bid]:
                        mvs.append(self._read_mv(b, vlc))
                    else:
                        mvs.append((0, 0))
                mb_mvs[mb] = mvs
                # the "last MV" after FOURMV is the last CODED block's
                last2 = last
                for k in (3, 2, 1, 0):
                    if coded[geo.mb_luma[mb][k]]:
                        last = mvs[k]
                        break
            elif mode == MODE_LAST:
                mb_mvs[mb] = last
            elif mode == MODE_LAST2:
                mb_mvs[mb] = last2
                last, last2 = last2, last
            else:
                mb_mvs[mb] = (0, 0)           # NO_MV / INTRA / GOLDEN
        return mb_mvs

    # ------------------------------------------------------------- #
    # Block qi (spec 7.6)
    # ------------------------------------------------------------- #

    def _read_block_qis(self, b: Bits, coded, nqis: int) -> np.ndarray:
        geo = self.geo
        qi_idx = np.zeros(geo.total_blocks, np.int32)
        if nqis == 1:
            return qi_idx
        coded_list = [bid for bid in geo.coded_order if coded[bid]]
        for pass_i in range(nqis - 1):
            blocks = [bid for bid in coded_list if qi_idx[bid] == pass_i]
            if not blocks:
                break
            flag = b.read1()
            i = 0
            while i < len(blocks):
                run = _read_long_run(b)
                if flag:
                    for bid in blocks[i:i + run]:
                        qi_idx[bid] += 1
                i += run
                if i < len(blocks):
                    flag = b.read1() if run == LONG_RUN_MAX else flag ^ 1
        return qi_idx

    # ------------------------------------------------------------- #
    # DCT token decode (spec 7.7)
    # ------------------------------------------------------------- #

    def _read_tok(self, b: Bits, lut) -> int:
        lut_sym, lut_len, maxlen = lut
        if maxlen == 0:
            return lut_sym[0]
        if lut_len is None:            # deep hostile tree: bit-walk
            code = 0
            ln = 0
            while ln <= maxlen:
                code = (code << 1) | b.read1()
                ln += 1
                tok = lut_sym.get((code, ln))
                if tok is not None:
                    return tok
            raise ValueError("theora: corrupt huffman stream")
        save = b.pos
        v = b.read(maxlen)
        b.pos = save + lut_len[v]
        return lut_sym[v]

    def _decode_tokens(self, b: Bits, coded: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns coeffs (nblocks, 64) int32 in ZIGZAG order.

        Blocks waiting for coefficient ci sit in per-ci buckets of
        coded-order ranks (kept sorted, so processing order matches
        the spec's coded order at every index); the whole loop is
        pure-python ints with the value/run token classes inlined —
        this path decodes hundreds of thousands of tokens per
        second."""
        geo = self.geo
        huff = self.setup.huff
        blocks = geo.coded_order[coded[geo.coded_order]]
        nat = self._native()
        if nat is not None:
            lib, handle = nat
            base = blocks.astype(np.int64) * 64
            islv = (geo.block_pos[blocks, 0] != 0).astype(np.uint8)
            out = np.zeros(geo.total_blocks * 64, np.int32)
            end = lib.tc_th_tokens(
                handle, b.raw8, b.nbits, b.pos,
                np.ascontiguousarray(base),
                np.ascontiguousarray(islv), len(blocks), out)
            if end >= 0:
                b.pos = int(end)
                return out.reshape(geo.total_blocks, 64)
            raise ValueError("theora: corrupt huffman stream")
        blocks_l = blocks.tolist()
        isl = (geo.block_pos[blocks, 0] != 0).astype(int).tolist()
        nb = len(blocks_l)
        cflat = [0] * (geo.total_blocks * 64)
        base_l = [bid * 64 for bid in blocks_l]
        eob_run = 0

        buckets: list = [[] for _ in range(64)]
        buckets[0] = list(range(nb))
        hti_dc = [b.read(4), b.read(4)]       # luma, chroma
        luts = (huff[hti_dc[0]], huff[hti_dc[1]])
        words = b.words
        nbits = b.nbits
        read = b.read

        for ci in range(64):
            if ci == 1:
                hti_ac = [b.read(4), b.read(4)]
            if ci in (1, 6, 15, 28):      # AC group boundaries
                group = _COEF_GROUP[ci]
                luts = (huff[16 * group + hti_ac[0]],
                        huff[16 * group + hti_ac[1]])
            cand = buckets[ci]
            if not cand:
                continue
            cand.sort()                   # coded order at this ci
            k = 0
            if eob_run > 0:               # pending run closes blocks
                k = eob_run if eob_run < len(cand) else len(cand)
                eob_run -= k
            ls0, ll0, ml0 = luts[0]
            ls1, ll1, ml1 = luts[1]
            for n_i in range(k, len(cand)):
                idx = cand[n_i]
                if eob_run > 0:
                    eob_run -= 1
                    continue
                if isl[idx]:
                    lut_sym, lut_len, maxlen = ls1, ll1, ml1
                else:
                    lut_sym, lut_len, maxlen = ls0, ll0, ml0
                if lut_len is None:    # deep hostile tree: slow path
                    tok = self._read_tok(
                        b, (lut_sym, lut_len, maxlen))
                else:
                    pp = b.pos
                    if pp < nbits:
                        i = pp >> 5
                        w = (words[i] << 32) | words[i + 1]
                        v = (w >> (64 - (pp & 31) - maxlen)) \
                            & ((1 << maxlen) - 1)
                    else:
                        v = 0             # zero-fill past packet end
                    tok = lut_sym[v]
                    b.pos = pp + lut_len[v]
                if tok >= 9:
                    if tok <= 22:         # single value
                        if tok <= 12:
                            val = (1, -1, 2, -2)[tok - 9]
                        elif tok <= 16:
                            mag = tok - 10
                            val = -mag if b.read1() else mag
                        else:
                            ex = (1, 2, 3, 4, 5, 9)[tok - 17]
                            base = (7, 9, 13, 21, 37, 69)[tok - 17]
                            sign = b.read1()
                            mag = base + read(ex)
                            val = -mag if sign else mag
                        cflat[base_l[idx] + ci] = val
                        if ci < 63:
                            buckets[ci + 1].append(idx)
                        continue
                    # combined zero run + value (23..31)
                    if tok <= 27:
                        run = tok - 22
                        val = -1 if b.read1() else 1
                    elif tok == 28:
                        sign = b.read1()
                        run = 6 + read(2)
                        val = -1 if sign else 1
                    elif tok == 29:
                        sign = b.read1()
                        run = 10 + read(3)
                        val = -1 if sign else 1
                    elif tok == 30:
                        sign = b.read1()
                        mag = 2 + b.read1()
                        run = 1
                        val = -mag if sign else mag
                    else:                 # 31
                        sign = b.read1()
                        mag = 2 + b.read1()
                        run = 2 + b.read1()
                        val = -mag if sign else mag
                    npos = ci + run
                    if npos <= 63:
                        cflat[base_l[idx] + npos] = val
                    if npos < 63:
                        buckets[npos + 1].append(idx)
                    continue
                if tok <= 6:              # EOB run token
                    if tok <= 2:
                        eob_run = tok
                    elif tok == 3:
                        eob_run = 3 + read(2)
                    elif tok == 4:
                        eob_run = 7 + read(3)
                    elif tok == 5:
                        eob_run = 15 + read(4)
                    else:
                        vv = read(12)
                        eob_run = (vv - 1) if vv else (1 << 30)
                    continue
                # zero runs (7, 8)
                run = (read(3) if tok == 7 else read(6)) + 1
                npos = ci + run
                if npos < 64:
                    buckets[npos].append(idx)
        return np.array(cflat, np.int32).reshape(
            geo.total_blocks, 64)

    # ------------------------------------------------------------- #
    # DC prediction (spec 7.9.2)
    # ------------------------------------------------------------- #

    def _predict_dc(self, coefs: np.ndarray, coded: np.ndarray,
                    bclass: np.ndarray) -> None:
        geo = self.geo
        nat = self._native()
        if nat is not None and coefs.dtype == np.int32 \
                and coefs.flags["C_CONTIGUOUS"]:
            lib, _ = nat
            lib.tc_th_predict_dc(
                coefs, np.ascontiguousarray(coded, np.uint8),
                np.ascontiguousarray(bclass, np.uint8),
                np.ascontiguousarray(geo.plane_off[:3], np.int32),
                np.ascontiguousarray(geo.bw[:3], np.int32),
                np.ascontiguousarray(geo.bh[:3], np.int32))
            return
        for p in range(3):
            off = geo.plane_off[p]
            bw, bh = geo.bw[p], geo.bh[p]
            last_dc = [0, 0, 0]
            for by in range(bh):
                for bx in range(bw):
                    bid = off + by * bw + bx
                    if not coded[bid]:
                        continue
                    fc = bclass[bid]
                    idx = 0
                    vals = [0, 0, 0, 0]       # UL, U, UR, L
                    if bx > 0:
                        nb = bid - 1
                        if coded[nb] and bclass[nb] == fc:
                            idx |= 1
                            vals[3] = int(coefs[nb, 0])
                    if by > 0:
                        nb = bid - bw
                        if coded[nb] and bclass[nb] == fc:
                            idx |= 4
                            vals[1] = int(coefs[nb, 0])
                        if bx > 0:
                            nb = bid - bw - 1
                            if coded[nb] and bclass[nb] == fc:
                                idx |= 8
                                vals[0] = int(coefs[nb, 0])
                        if bx < bw - 1:
                            nb = bid - bw + 1
                            if coded[nb] and bclass[nb] == fc:
                                idx |= 2
                                vals[2] = int(coefs[nb, 0])
                    if idx == 0:
                        pred = last_dc[fc]
                    else:
                        w = PRED_W[idx]
                        s = (w[0] * vals[0] + w[1] * vals[1]
                             + w[2] * vals[2] + w[3] * vals[3])
                        # C integer division truncates toward zero
                        pred = s // 128 if s >= 0 else -((-s) // 128)
                        if idx & 4 and idx & 8 and idx & 1:
                            # U, UL, L all present: outlier correction
                            if abs(pred - vals[1]) > 128:
                                pred = vals[1]
                            elif abs(pred - vals[3]) > 128:
                                pred = vals[3]
                            elif abs(pred - vals[0]) > 128:
                                pred = vals[0]
                    coefs[bid, 0] += pred
                    last_dc[fc] = int(coefs[bid, 0])

    # ------------------------------------------------------------- #
    # Reconstruction
    # ------------------------------------------------------------- #

    def _reconstruct(self, coefs, coded, bclass, qis, qi_idx,
                     mb_modes, mb_mvs, intra: bool):
        geo = self.geo
        info = self.info
        # start from the previous frame (uncoded blocks copy through)
        if intra or self.last is None:
            planes = [np.zeros((geo.plane_h[p], geo.plane_w[p]),
                               np.uint8) for p in range(3)]
        else:
            planes = [pl.copy() for pl in self.last]

        # per-block mode/mv lookup tables.  In inter frames a coded
        # block inside a macroblock with NO coded luma block (no mode
        # in the stream) predicts with INTER_NOMV, not INTRA.
        block_mode = np.full(geo.total_blocks,
                             MODE_INTRA if intra else MODE_NO_MV,
                             np.int32)
        block_mv = np.zeros((geo.total_blocks, 2), np.int32)
        if not intra:
            for mb, mode in mb_modes.items():
                if mode < 0:
                    continue
                luma = geo.mb_luma[mb]
                chroma = geo.mb_chroma[mb]
                if mode == MODE_FOURMV:
                    mvs = mb_mvs[mb]
                    for k, bid in enumerate(luma):
                        block_mode[bid] = MODE_FOURMV
                        block_mv[bid] = mvs[k]
                    if geo.fmt == 0:
                        sx = sum(m[0] for m in mvs)
                        sy = sum(m[1] for m in mvs)
                        cmvs = [(_rshift_round(sx, 2),
                                 _rshift_round(sy, 2))] * 2
                    elif geo.fmt == 2:
                        # each chroma block covers one luma block
                        # ROW (the MB's upper / lower pair)
                        pairs = []
                        for j in (0, 1):
                            sx = mvs[2 * j][0] + mvs[2 * j + 1][0]
                            sy = mvs[2 * j][1] + mvs[2 * j + 1][1]
                            pairs.append((_rshift_round(sx, 1),
                                          _rshift_round(sy, 1)))
                        cmvs = pairs + pairs       # plane 1, plane 2
                    else:
                        # 4:4:4: chroma block k mirrors luma block k
                        cmvs = list(mvs) + list(mvs)
                    for bid, cmv in zip(chroma, cmvs):
                        block_mode[bid] = MODE_FOURMV
                        block_mv[bid] = cmv
                else:
                    mv = mb_mvs.get(mb, (0, 0))
                    for bid in luma + list(chroma):
                        block_mode[bid] = mode
                        block_mv[bid] = mv

        pad = 32
        _ref_src = {1: self.last, 2: self.golden or self.last}
        _refs: dict = {}

        def refs(fc):
            # pad lazily per frame class: typical streams never
            # touch golden, saving 3 full-plane int32 pad copies
            got = _refs.get(fc)
            if got is None:
                got = [np.pad(pl.astype(np.int32), pad, mode="edge")
                       for pl in _ref_src[fc]]
                _refs[fc] = got
            return got

        coded_ids = [bid for bid in range(geo.total_blocks)
                     if coded[bid]]
        # dequant + idct batched per (qti, pli, qi) group
        resid = np.zeros((geo.total_blocks, 8, 8), np.int32)
        groups: dict = {}
        for bid in coded_ids:
            p = int(geo.block_pos[bid, 0])
            qti = 0 if block_mode[bid] == MODE_INTRA or intra else 1
            qi = qis[min(int(qi_idx[bid]), len(qis) - 1)]
            groups.setdefault((qti, p, qi), []).append(bid)
        zz = np.array(ZIGZAG, np.int32)
        for (qti, p, qi), ids in groups.items():
            qmat = self._qmat(qti, p, qi).astype(np.int32)
            qmat0 = self._qmat(qti, p, qis[0])
            cz = coefs[ids]                   # (n, 64) zigzag order
            deq = np.zeros((len(ids), 64), np.int32)
            if _QMAT_ZIGZAG:
                deq[:, zz] = cz * qmat        # qmat in zigzag order
            else:
                deq[:, zz] = cz * qmat[zz]    # qmat in raster order
            deq[:, 0] = cz[:, 0] * int(qmat0[0])   # DC via qi0
            resid[ids] = idct8x8(deq.reshape(-1, 8, 8))

        # write blocks grouped by (plane, ref-class, mv): one fancy-
        # indexed gather + add + clip per group instead of a python
        # loop per block (an MB's blocks share mvs, so groups are few)
        mc_groups: dict = {}
        for bid in coded_ids:
            p = int(geo.block_pos[bid, 0])
            mode = int(block_mode[bid]) if not intra else MODE_INTRA
            if mode == MODE_INTRA:
                key = (p, 0, 0, 0)
            else:
                mvx = int(block_mv[bid, 0])
                mvy = int(block_mv[bid, 1])
                if p > 0:
                    # halve only the subsampled axes
                    if geo.fmt in (0, 2):
                        mvx = (mvx >> 1) | (mvx & 1)
                    if geo.fmt == 0:
                        mvy = (mvy >> 1) | (mvy & 1)
                key = (p, FRAME_CLASS[mode], mvx, mvy)
            mc_groups.setdefault(key, []).append(bid)
        oy = np.arange(8)
        for (p, fc, mvx, mvy), ids in mc_groups.items():
            ys = geo.block_pos[ids, 1] * 8
            xs = geo.block_pos[ids, 2] * 8
            rr = resid[ids]
            if fc == 0:                       # intra
                block = rr + 128
            else:
                ref = refs(fc)[p]
                # half-pel: TOWARD-ZERO whole-pel part with a SIGNED
                # half-step remainder.  For mixed-sign diagonal MVs
                # this picks the ANTI-diagonal pixel pair — the
                # (floor, floor+1) form is only equivalent for
                # single-axis and same-sign cases (found empirically
                # against the oracle; the pair straddles the true
                # displacement along the motion direction).
                wx = (mvx + (1 if mvx < 0 else 0)) >> 1
                wy = (mvy + (1 if mvy < 0 else 0)) >> 1
                rx, ry = mvx - 2 * wx, mvy - 2 * wy
                gy = (ys + wy + pad)[:, None, None] + oy[None, :, None]
                gx = (xs + wx + pad)[:, None, None] + oy[None, None, :]
                pred = ref[gy, gx]
                if rx or ry:
                    pred = (pred + ref[gy + ry, gx + rx]) >> 1
                block = pred + rr
            block = np.clip(block, 0, 255).astype(np.uint8)
            # one fancy-indexed scatter per group (blocks within a
            # group never overlap)
            sy = ys[:, None, None] + oy[None, :, None]
            sx = xs[:, None, None] + oy[None, None, :]
            planes[p][sy, sx] = block

        self._loop_filter(planes, coded, qis[0])
        self.last = planes
        if intra:
            self.golden = [pl.copy() for pl in planes]

    # ------------------------------------------------------------- #
    # Loop filter (spec 7.10)
    # ------------------------------------------------------------- #

    def _loop_filter(self, planes, coded, qi0: int) -> None:
        L = int(self.setup.lflims[qi0])
        if L <= 0:
            return
        geo = self.geo
        nat = self._native()
        if nat is not None and hasattr(nat[0], "tc_th_loop_filter"):
            lib = nat[0]
            codedv = np.ascontiguousarray(coded, np.uint8)
            for p in range(3):
                pl = planes[p]
                if not pl.flags["C_CONTIGUOUS"]:
                    pl = np.ascontiguousarray(pl)
                    planes[p] = pl
                lib.tc_th_loop_filter(pl, pl.shape[1], geo.bw[p],
                                      geo.bh[p], codedv,
                                      geo.plane_off[p], L)
            return

        def bound(f):
            a = np.abs(f)
            return np.sign(f) * np.where(
                a < L, a, np.where(a < 2 * L, 2 * L - a, 0))

        def filt_h(pl, y0, x):        # vertical edge at column x
            a = pl[y0:y0 + 8, x - 2].astype(np.int32)
            b_ = pl[y0:y0 + 8, x - 1].astype(np.int32)
            c = pl[y0:y0 + 8, x].astype(np.int32)
            d = pl[y0:y0 + 8, x + 1].astype(np.int32)
            f = (a - d) + 3 * (c - b_)
            R = bound((f + 4) >> 3)
            pl[y0:y0 + 8, x - 1] = np.clip(b_ + R, 0, 255)
            pl[y0:y0 + 8, x] = np.clip(c - R, 0, 255)

        def filt_v(pl, y, x0):        # horizontal edge at row y
            a = pl[y - 2, x0:x0 + 8].astype(np.int32)
            b_ = pl[y - 1, x0:x0 + 8].astype(np.int32)
            c = pl[y, x0:x0 + 8].astype(np.int32)
            d = pl[y + 1, x0:x0 + 8].astype(np.int32)
            f = (a - d) + 3 * (c - b_)
            R = bound((f + 4) >> 3)
            pl[y - 1, x0:x0 + 8] = np.clip(b_ + R, 0, 255)
            pl[y, x0:x0 + 8] = np.clip(c - R, 0, 255)

        for p in range(3):
            pl = planes[p]
            off = geo.plane_off[p]
            bw, bh = geo.bw[p], geo.bh[p]
            for by in range(bh):
                for bx in range(bw):
                    bid = off + by * bw + bx
                    if not coded[bid]:
                        continue
                    y0, x0 = 8 * by, 8 * bx
                    if bx > 0:
                        filt_h(pl, y0, x0)
                    if by > 0:
                        filt_v(pl, y0, x0)
                    if bx < bw - 1 and not coded[bid + 1]:
                        filt_h(pl, y0, x0 + 8)
                    if by < bh - 1 and not coded[bid + bw]:
                        filt_v(pl, y0 + 8, x0)

    # ------------------------------------------------------------- #
    # Frame types
    # ------------------------------------------------------------- #

    def _decode_intra(self, b: Bits, qis: List[int]) -> None:
        geo = self.geo
        coded = np.ones(geo.total_blocks, bool)
        qi_idx = self._read_block_qis(b, coded, len(qis))
        coefs = self._decode_tokens(b, coded)
        bclass = np.zeros(geo.total_blocks, np.int32)
        self._predict_dc(coefs, coded, bclass)
        self._reconstruct(coefs, coded, bclass, qis, qi_idx,
                          {}, {}, intra=True)

    def _decode_inter(self, b: Bits, qis: List[int]) -> None:
        geo = self.geo
        coded = self._read_block_flags(b)
        mb_modes = self._read_modes(b, coded)
        mb_mvs = self._read_motion(b, coded, mb_modes)
        qi_idx = self._read_block_qis(b, coded, len(qis))
        coefs = self._decode_tokens(b, coded)
        # frame class per block for DC prediction
        bclass = np.zeros(geo.total_blocks, np.int32)
        block_mode = np.full(geo.total_blocks, MODE_NO_MV, np.int32)
        for mb, mode in mb_modes.items():
            if mode < 0:
                continue
            for bid in (geo.mb_luma[mb]
                        + list(geo.mb_chroma[mb])):
                block_mode[bid] = mode
        bclass[:] = [FRAME_CLASS[m] for m in block_mode]
        self._predict_dc(coefs, coded, bclass)
        self._reconstruct(coefs, coded, bclass, qis, qi_idx,
                          mb_modes, mb_mvs, intra=False)


def _rshift_round(a: int, b: int) -> int:
    """FFmpeg RSHIFT: round half away from zero."""
    if a > 0:
        return (a + (1 << (b - 1))) >> b
    return -((-a + (1 << (b - 1))) >> b)
