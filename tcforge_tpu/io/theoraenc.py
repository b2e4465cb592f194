"""Native Theora I video encoder.

The reference encodes theora by LINKING libtheora
(/root/reference/encode/encode_theora.c hands raw planes to the
external lib) — there is no in-tree encoder to port.  This is a
from-scratch spec-valid encoder built as the exact mirror of the
in-tree decoder (io/theora.py): every field it writes is the field
the decoder reads, in the decoder's read order, and the encoder's
reconstruction loop IS the in-tree decoder run on the emitted packet
— so encoder-side reconstruction can never drift from what a
conforming decoder produces (the in-tree decoder is validated
bit-exact against libavcodec, and tests/test_theoraenc.py closes the
loop by decoding these streams with libavcodec too).

Toolset: keyframes are fully-coded intra frames; delta frames pick
per-MB among NO_MV / LAST / LAST2 / MV (three-step whole-pel search
+ half-pel refine, SAD with bit-cost penalties) / INTRA, with
per-block rate-distortion skip via the partial/full superblock run
grammar, cheapest-of-eight mode-scheme selection and VLC-vs-raw MV
coding by measured cost.  Quality is a 0..63 qi against
encoder-owned quantizer tables carried in the setup header (Theora
has no fixed matrices — every decoder must honor stream tables).

Stream-side tables (base matrices, scale curves, loop-filter
limits, the 80 Huffman trees) are this encoder's own choices,
written into the setup header per spec 6.4.
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Optional, Tuple

import numpy as np

from tcforge_tpu.io import theora as th

__all__ = ["TheoraNativeEncoder"]


# ------------------------------------------------------------------ #
# MSB-first bit writer (mirror of theora.Bits)
# ------------------------------------------------------------------ #

class BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def getvalue(self) -> bytes:
        if self.n:
            return bytes(self.buf) + bytes(
                [(self.acc << (8 - self.n)) & 0xFF])
        return bytes(self.buf)


# ------------------------------------------------------------------ #
# Encoder-owned quantizer tables (written into the setup header)
# ------------------------------------------------------------------ #

# Quality scale curves: qi=63 is near-lossless, qi=0 is coarse.
_AC_SCALE = np.maximum(
    1, np.round(560.0 * 0.935 ** np.arange(64))).astype(np.int64)
_DC_SCALE = _AC_SCALE.copy()

# Loop-filter limits: stronger at coarse quantizers, off near
# lossless (the in-tree decoder applies whatever we write, and the
# recon loop runs through it, so any curve is self-consistent).
_LFLIMS = np.clip((63 - np.arange(64)) // 3, 0, 21).astype(np.int64)

# Base matrices (8-bit, raster order): a standard luminance-weighted
# intra matrix, a flatter chroma intra matrix, and a near-flat inter
# matrix (inter residuals are not DC-heavy).
_BM_INTRA_Y = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int64)
_BM_INTRA_C = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int64)
_BM_INTER = np.full(64, 20, np.int64)
_BM_INTER[0] = 16

# Static token frequency priors per Huffman group (0 = DC, 1..4 = AC
# bands).  These only shape code lengths; any complete tree is valid.
_TOK_FREQ = {
    0: (40, 12, 6, 6, 4, 3, 2, 10, 4, 120, 120, 50, 50, 22, 22, 10,
        10, 9, 7, 5, 3, 2, 1, 20, 10, 6, 4, 3, 3, 2, 5, 3),
    1: (90, 30, 15, 12, 8, 5, 3, 30, 8, 110, 110, 45, 45, 20, 20, 9,
        9, 8, 6, 4, 2, 1, 1, 40, 20, 12, 8, 5, 5, 3, 8, 5),
    2: (140, 40, 20, 16, 10, 6, 4, 30, 8, 90, 90, 35, 35, 15, 15, 7,
        7, 6, 4, 3, 2, 1, 1, 40, 20, 12, 8, 5, 5, 3, 8, 5),
    3: (180, 50, 25, 20, 12, 8, 5, 25, 8, 70, 70, 28, 28, 12, 12, 5,
        5, 4, 3, 2, 1, 1, 1, 35, 18, 10, 7, 4, 4, 3, 6, 4),
    4: (240, 70, 35, 28, 16, 10, 12, 20, 8, 55, 55, 20, 20, 9, 9, 4,
        4, 3, 2, 2, 1, 1, 1, 30, 15, 8, 6, 4, 3, 2, 5, 3),
}


def _huff_code(freqs) -> Dict[int, Tuple[int, int]]:
    """Huffman code over 32 tokens -> {token: (code, len)}; the tree
    shape is emitted into the setup header, so any complete prefix
    code works — this one just biases toward the common tokens."""
    heap = [(f, i, ("leaf", i)) for i, f in enumerate(freqs)]
    heapq.heapify(heap)
    uid = 32
    while len(heap) > 1:
        f1, _, t1 = heapq.heappop(heap)
        f2, _, t2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, uid, ("node", t1, t2)))
        uid += 1
    codes: Dict[int, Tuple[int, int]] = {}

    def walk(t, code, ln):
        if t[0] == "leaf":
            codes[t[1]] = (code, ln)
        else:
            walk(t[1], code << 1, ln + 1)
            walk(t[2], (code << 1) | 1, ln + 1)
    walk(heap[0][2], 0, 0)
    assert max(ln for _, ln in codes.values()) <= 16
    return codes


_GROUP_CODES = {g: _huff_code(f) for g, f in _TOK_FREQ.items()}


def _emit_tree(bw: BitWriter, codes: Dict[int, Tuple[int, int]]):
    """Write one Huffman table in the setup-header tree grammar
    (0 = split, 1 + 5-bit token = leaf), mirroring _read_huff_tree."""
    by_code = {(c, ln): tok for tok, (c, ln) in codes.items()}

    def emit(code, ln):
        tok = by_code.get((code, ln))
        if tok is not None:
            bw.write(1, 1)
            bw.write(tok, 5)
        else:
            bw.write(0, 1)
            emit(code << 1, ln + 1)
            emit((code << 1) | 1, ln + 1)
    emit(0, 0)


# Canonical run-length codes (encode side of the decoder's LUTs).
def _canonical_codes(lens) -> List[Tuple[int, int]]:
    out = []
    code32 = 0
    for ln in lens:
        out.append((code32 >> (32 - ln), ln))
        code32 += 1 << (32 - ln)
    return out


_SB_RUN_CODES = _canonical_codes(th._SB_RUN_LENS)
_FRAG_RUN_CODES = _canonical_codes(th._FRAG_RUN_LENS)
_MODE_CODES = _canonical_codes(th._MODE_LENS)

# MV VLC encode table: value (-31..31) -> (code, len), from the
# decoder's canonical (sym, len) order.
_MV_CODES: Dict[int, Tuple[int, int]] = {}
_code32 = 0
for _sym, _ln in th._MV_SYMS_LENS:
    _MV_CODES[_sym - 31] = (_code32 >> (32 - _ln), _ln)
    _code32 += 1 << (32 - _ln)
del _code32, _sym, _ln

# Forward DCT basis: X = 16 * (B r B^T) inverts the spec iDCT's
# y = (C^T X C + 8) >> 4 up to integer truncation (C has the 1/sqrt2
# DC weight folded in; see io/theora.py idct8x8).
_B = np.zeros((8, 8))
for _k in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _k == 0 else 1.0
    for _n in range(8):
        _B[_k, _n] = 0.25 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _fdct_blocks(resid: np.ndarray) -> np.ndarray:
    """(n, 8, 8) float residuals -> (n, 8, 8) float DCT coefs."""
    return 16.0 * np.einsum("kn,bnm,lm->bkl", _B, resid, _B)


# ------------------------------------------------------------------ #
# Run-length writers (mirrors of the decoder's three flag passes)
# ------------------------------------------------------------------ #

def _runs(vals: np.ndarray) -> List[Tuple[bool, int]]:
    out = []
    i = 0
    n = len(vals)
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        out.append((bool(vals[i]), j - i))
        i = j
    return out


def _write_sb_run(bw: BitWriter, run: int) -> None:
    if run <= 33:
        c, ln = _SB_RUN_CODES[run - 1]
        bw.write(c, ln)
    else:
        c, ln = _SB_RUN_CODES[33]
        bw.write(c, ln)
        bw.write(run - 34, 12)


def _write_long_runs(bw: BitWriter, vals: np.ndarray) -> None:
    """Superblock-flag pass: first flag bit, then runs; implicit
    toggle between runs except after a maximum-length run, which is
    followed by an explicit flag bit (while blocks remain)."""
    runs = _runs(vals)
    if not runs:
        return
    bw.write(1 if runs[0][0] else 0, 1)
    total = len(vals)
    done = 0
    for ri, (flag, ln) in enumerate(runs):
        while ln:
            piece = min(ln, th.LONG_RUN_MAX)
            # a non-max piece is followed by an implicit toggle: it
            # must END the run (piece == remaining)
            if ln > th.LONG_RUN_MAX:
                piece = th.LONG_RUN_MAX
            _write_sb_run(bw, piece)
            ln -= piece
            done += piece
            if done < total and piece == th.LONG_RUN_MAX:
                # explicit flag bit: same value if the run continues,
                # else the next run's value
                nxt = flag if ln else runs[ri + 1][0]
                bw.write(1 if nxt else 0, 1)


def _write_short_runs(bw: BitWriter, vals: np.ndarray) -> None:
    """Block-flag pass within partial superblocks (short runs,
    explicit flag bit after a maximum-length run)."""
    runs = _runs(vals)
    if not runs:
        return
    bw.write(1 if runs[0][0] else 0, 1)
    pieces: List[Tuple[bool, int]] = []
    for flag, ln in runs:
        while ln:
            piece = min(ln, th.SHORT_RUN_MAX)
            if ln > th.SHORT_RUN_MAX:
                piece = th.SHORT_RUN_MAX
            pieces.append((flag, piece))
            ln -= piece
    for pi, (flag, piece) in enumerate(pieces):
        if pi > 0 and pieces[pi - 1][1] == th.SHORT_RUN_MAX:
            bw.write(1 if flag else 0, 1)
        c, ln2 = _FRAG_RUN_CODES[piece - 1]
        bw.write(c, ln2)


# ------------------------------------------------------------------ #
# The encoder
# ------------------------------------------------------------------ #

class TheoraNativeEncoder:
    """Stateful frame encoder.  encode() returns (packet, is_key)."""

    def __init__(self, width: int, height: int,
                 fps: Tuple[int, int] = (25, 1), qi: int = 45,
                 gop: int = 64, par: Tuple[int, int] = (0, 0)):
        if width <= 0 or height <= 0:
            raise ValueError("theoraenc: bad geometry")
        if not 0 <= qi <= 63:
            raise ValueError("theoraenc: qi must be 0..63")
        self.qi = int(qi)
        self.gop = max(1, int(gop))
        self.kfgshift = max(1, (self.gop - 1).bit_length())
        self.w, self.h = width, height
        self.fmbw = (width + 15) // 16
        self.fmbh = (height + 15) // 16
        self.fps = fps
        self.par = par
        self.headers = [self._ident_header(), self._comment_header(),
                        self._setup_header()]
        # the reconstruction loop IS the in-tree decoder
        self.dec = th.TheoraDecoder(self.headers)
        self.geo = self.dec.geo
        self._since_key = 0
        self._nframes = 0
        # zigzag index -> raster index
        self._zz = np.array(th.ZIGZAG, np.int64)

    # ---------------------------------------------------------- #
    # Headers (spec 6.2 / 6.3 / 6.4)
    # ---------------------------------------------------------- #

    def _ident_header(self) -> bytes:
        bw = BitWriter()
        fh = self.fmbh * 16
        bw.write(3, 8)
        bw.write(2, 8)
        bw.write(1, 8)
        bw.write(self.fmbw, 16)
        bw.write(self.fmbh, 16)
        bw.write(self.w, 24)
        bw.write(self.h, 24)
        bw.write(0, 8)                        # pic_x
        # PICY counts from the BOTTOM of the coded frame; choosing
        # frame_h - pic_h puts the picture at display-top (see the
        # decoder's _crop)
        bw.write(fh - self.h, 8)
        bw.write(self.fps[0], 32)
        bw.write(self.fps[1], 32)
        bw.write(self.par[0], 24)
        bw.write(self.par[1], 24)
        bw.write(0, 8)                        # colorspace unspecified
        bw.write(0, 24)                       # nominal bitrate
        bw.write(self.qi, 6)                  # quality hint
        bw.write(self.kfgshift, 5)
        bw.write(0, 2)                        # pixel format 4:2:0
        bw.write(0, 3)                        # reserved
        return b"\x80theora" + bw.getvalue()

    def _comment_header(self) -> bytes:
        vendor = b"tcforge_tpu theora"
        out = b"\x81theora"
        out += len(vendor).to_bytes(4, "little") + vendor
        out += (0).to_bytes(4, "little")      # no user comments
        return out

    def _setup_header(self) -> bytes:
        bw = BitWriter()
        bw.write(5, 3)                        # lflim bits
        for v in _LFLIMS:
            bw.write(int(v), 5)
        bw.write(9, 4)                        # acscale bits - 1
        for v in _AC_SCALE:
            bw.write(int(v), 10)
        bw.write(9, 4)                        # dcscale bits - 1
        for v in _DC_SCALE:
            bw.write(int(v), 10)
        bw.write(2, 9)                        # nbms - 1 = 2
        for bm in (_BM_INTRA_Y, _BM_INTRA_C, _BM_INTER):
            for v in bm:
                bw.write(int(v), 8)
        # quant ranges: one full-range interval per (qti, pli) with
        # both interpolation ends on the same base matrix.
        # (0,0): newqr implied.  ilog(nbms-1)=ilog(2)=2 bmi bits.
        def one_range(bmi):
            bw.write(bmi, 2)
            bw.write(62, th._ilog(62))        # size-1 -> covers 0..63
            bw.write(bmi, 2)
        one_range(0)                          # intra luma
        bw.write(1, 1)                        # (0,1): newqr
        one_range(1)                          # intra chroma
        bw.write(0, 1)                        # (0,2): copy (0,1)
        bw.write(1, 1)                        # (1,0): newqr
        one_range(2)                          # inter (all planes)
        bw.write(0, 1)                        # (1,1): newqr=0
        bw.write(0, 1)                        #        rpqr=0 -> (1,0)
        bw.write(0, 1)                        # (1,2): newqr=0
        bw.write(0, 1)                        #        rpqr=0 -> (1,1)
        # 80 Huffman tables: 5 groups x 16 table slots; every slot in
        # a group carries the same tree (the frame header always
        # selects slot 0 — duplicates keep the table count spec-true)
        for g in range(5):
            for _ in range(16):
                _emit_tree(bw, _GROUP_CODES[g])
        return b"\x82theora" + bw.getvalue()

    # ---------------------------------------------------------- #
    # Plane preparation
    # ---------------------------------------------------------- #

    def _coded_planes(self, y: np.ndarray, u: np.ndarray,
                      v: np.ndarray) -> List[np.ndarray]:
        """Display planes -> full coded-frame planes (edge padding,
        vertical flip: frames are coded bottom-up)."""
        fw, fh = self.fmbw * 16, self.fmbh * 16
        dims = ((fh, fw), (fh // 2, fw // 2), (fh // 2, fw // 2))
        out = []
        for pl, (ph, pw) in zip((y, u, v), dims):
            pl = np.asarray(pl, np.uint8)
            pad = np.pad(pl, ((0, ph - pl.shape[0]),
                              (0, pw - pl.shape[1])), mode="edge")
            out.append(pad[::-1].astype(np.int32))
        return out

    # ---------------------------------------------------------- #
    # Quantization
    # ---------------------------------------------------------- #

    def _quantize_plane(self, resid: np.ndarray, qti: int, pli: int
                        ) -> np.ndarray:
        """(H, W) int residual plane -> (nblocks, 64) int32 coefs in
        ZIGZAG order (DC at [0] still the full quantized DC; the DC
        prediction residual is substituted later)."""
        h, w = resid.shape
        blocks = resid.reshape(h // 8, 8, w // 8, 8)
        blocks = blocks.transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        X = _fdct_blocks(blocks.astype(np.float64))
        qmat = self.dec._qmat(qti, pli, self.qi).astype(np.float64)
        t = X.reshape(-1, 64) / qmat[None, :]
        if qti:
            # inter deadzone: round at 0.7 qstep instead of 0.5.
            # Skipped blocks are never loop-filtered, so without a
            # deadzone the filter's edge perturbation re-codes a
            # static scene forever (the residual oscillates around
            # half a step); the deadzone absorbs it and static
            # content converges to all-skip deltas.
            q = (np.sign(t) * np.floor(np.abs(t) + 0.3)).astype(
                np.int64)
        else:
            q = np.rint(t).astype(np.int64)
        # token alphabet ceiling (token 22: 69 + 9 extra bits)
        np.clip(q, -580, 580, out=q)
        return q[:, self._zz].astype(np.int32)

    # ---------------------------------------------------------- #
    # DC prediction (encode side of the decoder's _predict_dc)
    # ---------------------------------------------------------- #

    def _dc_residuals(self, dcq: np.ndarray, coded: np.ndarray,
                      bclass: np.ndarray) -> np.ndarray:
        """Replace dcq (full quantized DC per block id) with coded
        residuals; prediction uses the FINAL (clamped) values exactly
        as the decoder will reconstruct them.  bclass is the per-block
        frame class (0 intra / 1 prev / 2 golden): neighbours predict
        only within the same class, and the no-neighbour fallback DC
        is tracked per class, mirroring the decoder's _predict_dc."""
        geo = self.geo
        resid = np.zeros_like(dcq)
        final = dcq.copy()
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
                    vals = [0, 0, 0, 0]
                    if bx > 0 and coded[bid - 1] \
                            and bclass[bid - 1] == fc:
                        idx |= 1
                        vals[3] = int(final[bid - 1])
                    if by > 0:
                        nb = bid - bw
                        if coded[nb] and bclass[nb] == fc:
                            idx |= 4
                            vals[1] = int(final[nb])
                        if bx > 0 and coded[nb - 1] \
                                and bclass[nb - 1] == fc:
                            idx |= 8
                            vals[0] = int(final[nb - 1])
                        if bx < bw - 1 and coded[nb + 1] \
                                and bclass[nb + 1] == fc:
                            idx |= 2
                            vals[2] = int(final[nb + 1])
                    if idx == 0:
                        pred = last_dc[fc]
                    else:
                        w = th.PRED_W[idx]
                        s = (w[0] * vals[0] + w[1] * vals[1]
                             + w[2] * vals[2] + w[3] * vals[3])
                        pred = s // 128 if s >= 0 else -((-s) // 128)
                        if idx & 4 and idx & 8 and idx & 1:
                            if abs(pred - vals[1]) > 128:
                                pred = vals[1]
                            elif abs(pred - vals[3]) > 128:
                                pred = vals[3]
                            elif abs(pred - vals[0]) > 128:
                                pred = vals[0]
                    r = int(dcq[bid]) - pred
                    r = max(-580, min(580, r))   # token ceiling
                    resid[bid] = r
                    final[bid] = pred + r
                    last_dc[fc] = pred + r
        return resid

    # ---------------------------------------------------------- #
    # Token stream (mirror of the decoder's _decode_tokens)
    # ---------------------------------------------------------- #

    @staticmethod
    def _value_token(v: int):
        """Nonzero coefficient -> (token, [(val, nbits), ...])."""
        a = abs(v)
        sign = 1 if v < 0 else 0
        if a == 1:
            return 10 if sign else 9, []
        if a == 2:
            return 12 if sign else 11, []
        if a <= 6:
            return 10 + a, [(sign, 1)]
        for tok, base, ex in ((17, 7, 1), (18, 9, 2), (19, 13, 3),
                              (20, 21, 4), (21, 37, 5), (22, 69, 9)):
            if a < base + (1 << ex):
                return tok, [(sign, 1), (a - base, ex)]
        raise AssertionError("coefficient beyond token range")

    def _token_events(self, cz: np.ndarray, blocks: np.ndarray):
        """Simulate the decoder's bucket traversal over the coded
        blocks (cz rows align with `blocks`, which is already in
        coded order) and return the token stream as a list of
        ('b', nbits, val) raw fields and [group, tok, extras, None]
        mutable token cells (EOB cells get their count patched when
        the run closes)."""
        geo = self.geo
        nb = len(blocks)
        isl = (geo.block_pos[blocks, 0] != 0).astype(int).tolist()
        nz_pos = [np.nonzero(cz[i])[0].tolist() for i in range(nb)]
        ptr = [0] * nb
        czl = cz.tolist()
        out: list = [("b", 4, 0), ("b", 4, 0)]    # hti_dc slots (0, 0)
        eob_cell = None                           # open EOB run cell

        buckets: List[List[int]] = [[] for _ in range(64)]
        buckets[0] = list(range(nb))
        for ci in range(64):
            if ci == 1:
                out.append(("b", 4, 0))           # hti_ac luma slot
                out.append(("b", 4, 0))           # hti_ac chroma slot
            cand = buckets[ci]
            if not cand:
                continue
            cand.sort()
            group = th._COEF_GROUP[ci]
            for idx in cand:
                pos = nz_pos[idx]
                pi = ptr[idx]
                if pi >= len(pos):
                    # block ends here: join / open an EOB run
                    if eob_cell is not None and eob_cell[2] < 4095:
                        eob_cell[2] += 1
                    else:
                        eob_cell = ["eob", group, 1, isl[idx]]
                        out.append(eob_cell)
                    continue
                npos = pos[pi]
                val = czl[idx][npos]
                if eob_cell is not None:
                    eob_cell = None               # run closed in place
                if npos == ci:
                    tok, extras = self._value_token(val)
                    out.append(("t", group, isl[idx], tok, extras))
                    ptr[idx] = pi + 1
                    if ci < 63:
                        buckets[ci + 1].append(idx)
                    continue
                run = npos - ci
                a = abs(val)
                sign = 1 if val < 0 else 0
                if a == 1 and run <= 17:
                    if run <= 5:
                        cell = ("t", group, isl[idx], 22 + run,
                                [(sign, 1)])
                    elif run <= 9:
                        cell = ("t", group, isl[idx], 28,
                                [(sign, 1), (run - 6, 2)])
                    else:
                        cell = ("t", group, isl[idx], 29,
                                [(sign, 1), (run - 10, 3)])
                    out.append(cell)
                    ptr[idx] = pi + 1
                    if npos < 63:
                        buckets[npos + 1].append(idx)
                elif 2 <= a <= 3 and run <= 3:
                    if run == 1:
                        cell = ("t", group, isl[idx], 30,
                                [(sign, 1), (a - 2, 1)])
                    else:
                        cell = ("t", group, isl[idx], 31,
                                [(sign, 1), (a - 2, 1), (run - 2, 1)])
                    out.append(cell)
                    ptr[idx] = pi + 1
                    if npos < 63:
                        buckets[npos + 1].append(idx)
                else:
                    # pure zero run; the value is coded when the
                    # block resurfaces at npos
                    if run <= 8:
                        out.append(("t", group, isl[idx], 7,
                                    [(run - 1, 3)]))
                    else:
                        out.append(("t", group, isl[idx], 8,
                                    [(run - 1, 6)]))
                    buckets[npos].append(idx)
        return out

    @staticmethod
    def _eob_fields(count: int):
        if count <= 3:
            return count - 1, []
        if count <= 7:
            return 3, [(count - 4, 2)]
        if count <= 15:
            return 4, [(count - 8, 3)]
        if count <= 31:
            return 5, [(count - 16, 4)]
        return 6, [(count, 12)]

    def _write_tokens(self, bw: BitWriter, stream) -> None:
        codes = _GROUP_CODES
        for item in stream:
            kind = item[0]
            if kind == "b":
                bw.write(item[2], item[1])
            elif kind == "t":
                _, group, _pl, tok, extras = item
                c, ln = codes[group][tok]
                bw.write(c, ln)
                for v, n in extras:
                    bw.write(v, n)
            else:                              # EOB cell
                _, group, count, _pl = item
                tok, extras = self._eob_fields(count)
                c, ln = codes[group][tok]
                bw.write(c, ln)
                for v, n in extras:
                    bw.write(v, n)

    # ---------------------------------------------------------- #
    # Frame encode
    # ---------------------------------------------------------- #

    def encode(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
               force_key: bool = False) -> Tuple[bytes, bool]:
        planes = self._coded_planes(y, u, v)
        key = (force_key or self.dec.last is None
               or self._since_key >= self.gop)
        pkt = self._encode_intra(planes) if key \
            else self._encode_inter(planes)
        self._since_key = 1 if key else self._since_key + 1
        self._nframes += 1
        # reconstruction loop: run the emitted packet through the
        # in-tree decoder (bit-exact to libavcodec by construction)
        self.dec.decode(pkt)
        return pkt, key

    def _encode_intra(self, planes) -> bytes:
        geo = self.geo
        bw = BitWriter()
        bw.write(0, 1)                         # data packet
        bw.write(0, 1)                         # intra
        bw.write(self.qi, 6)
        bw.write(0, 1)                         # single qi
        bw.write(0, 3)                         # reserved
        cz_all = np.zeros((geo.total_blocks, 64), np.int32)
        for p in range(3):
            cz_all[geo.plane_off[p]:geo.plane_off[p]
                   + geo.nblocks[p]] = self._quantize_plane(
                       planes[p] - 128, 0, p)
        coded = np.ones(geo.total_blocks, bool)
        dcres = self._dc_residuals(
            cz_all[:, 0].astype(np.int64), coded,
            np.zeros(geo.total_blocks, np.int32))
        cz_all[:, 0] = dcres
        blocks = geo.coded_order
        stream = self._token_events(cz_all[blocks], blocks)
        self._write_tokens(bw, stream)
        return bw.getvalue()

    # ---------------------------------------------------------- #
    # Motion estimation / compensation (inter frames)
    # ---------------------------------------------------------- #

    _PAD = 32                                  # matches the decoder

    @staticmethod
    def _mc_pred(ref_pad: np.ndarray, y0: int, x0: int, sz: int,
                 mvx: int, mvy: int) -> np.ndarray:
        """Half-pel prediction for one sz x sz block at (y0, x0),
        mv in half-pel units — the decoder's TOWARD-ZERO whole part
        with a SIGNED half-step remainder (io/theora.py
        _reconstruct)."""
        pad = TheoraNativeEncoder._PAD
        wx = (mvx + (1 if mvx < 0 else 0)) >> 1
        wy = (mvy + (1 if mvy < 0 else 0)) >> 1
        rx, ry = mvx - 2 * wx, mvy - 2 * wy
        gy, gx = y0 + wy + pad, x0 + wx + pad
        pred = ref_pad[gy:gy + sz, gx:gx + sz]
        if rx or ry:
            pred = (pred + ref_pad[gy + ry:gy + ry + sz,
                                   gx + rx:gx + rx + sz]) >> 1
        return pred

    def _search_mv(self, src: np.ndarray, ref_pad: np.ndarray,
                   y0: int, x0: int, start: Tuple[int, int]
                   ) -> Tuple[Tuple[int, int], int]:
        """Three-step whole-pel search + half-pel refine around the
        best of {(0,0), start}; returns ((mvx, mvy) in half-pels,
        SAD)."""
        def sad_whole(wx, wy):
            pad = self._PAD
            r = ref_pad[y0 + wy + pad:y0 + wy + pad + 16,
                        x0 + wx + pad:x0 + wx + pad + 16]
            return int(np.abs(src - r).sum())

        best = (0, 0)
        best_sad = sad_whole(0, 0)
        sx, sy = start[0] >> 1, start[1] >> 1   # half-pel -> whole
        if (sx, sy) != (0, 0) and abs(sx) <= 15 and abs(sy) <= 15:
            s = sad_whole(sx, sy)
            if s < best_sad:
                best, best_sad = (sx, sy), s
        for step in (8, 4, 2, 1):
            improved = True
            while improved:
                improved = False
                for dy in (-step, 0, step):
                    for dx in (-step, 0, step):
                        if dx == 0 and dy == 0:
                            continue
                        nx, ny = best[0] + dx, best[1] + dy
                        if abs(nx) > 15 or abs(ny) > 15:
                            continue
                        s = sad_whole(nx, ny)
                        if s < best_sad:
                            best, best_sad = (nx, ny), s
                            improved = True
        # half-pel refine (mv components capped at +/-31 half-pels)
        mv = (2 * best[0], 2 * best[1])
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nx, ny = mv[0] + dx, mv[1] + dy
                if abs(nx) > 31 or abs(ny) > 31:
                    continue
                p = self._mc_pred(ref_pad, y0, x0, 16, nx, ny)
                s = int(np.abs(src - p).sum())
                if s < best_sad:
                    mv, best_sad = (nx, ny), s
        return mv, best_sad

    @staticmethod
    def _chroma_mv(mv: Tuple[int, int]) -> Tuple[int, int]:
        """Luma half-pel MV -> chroma MV, the decoder's exact
        (v >> 1) | (v & 1) rule."""
        return ((mv[0] >> 1) | (mv[0] & 1),
                (mv[1] >> 1) | (mv[1] & 1))

    def _choose_modes(self, planes) -> Tuple[dict, dict, np.ndarray]:
        """Per-MB mode decision over {NO_MV, LAST, LAST2, MV, INTRA},
        tracking the decoder's last/last2 MV chain.  The per-block
        luma skip decision happens HERE, before the chain update: an
        MB whose luma all skips carries no mode in the stream, so the
        decoder never applies its chain update — deciding skip later
        would desynchronize LAST/LAST2.  Returns (mb_modes, mb_mvs,
        coded) with modeless MBs already marked -1."""
        geo = self.geo
        src_y = planes[0]
        prev_y = self.dec.last[0].astype(np.int32)
        ref_pad = np.pad(prev_y, self._PAD, mode="edge")
        qstep = float(self.dec._qmat(1, 0, self.qi)[1])
        lam = max(2.0, qstep / 3.0)            # bits -> SAD exchange
        sse_floor = 1.5 * qstep * qstep
        last = (0, 0)
        last2 = (0, 0)
        mb_modes: dict = {}
        mb_mvs: dict = {}
        coded = np.zeros(geo.total_blocks, bool)
        for mb in geo.mb_order:
            mbx, mby = mb
            y0, x0 = 16 * mby, 16 * mbx
            src = src_y[y0:y0 + 16, x0:x0 + 16]
            d0 = src - prev_y[y0:y0 + 16, x0:x0 + 16]
            # rate-distortion skip per 8x8: a block whose copy-
            # through residual energy is at the quantization floor
            # gains nothing from coding — and the loop filter
            # perturbs every CODED block's edges, so below-floor
            # blocks would otherwise re-code forever (measured:
            # filter-feedback blocks sit at <= 1.3 qstep^2)
            sse8 = (d0.astype(np.int64) ** 2).reshape(
                2, 8, 2, 8).sum(axis=(1, 3))
            luma_coded = sse8 > sse_floor      # (2, 2) [j, i]
            luma_ids = geo.mb_luma[mb]
            for k, bid in enumerate(luma_ids):
                coded[bid] = bool(luma_coded[k // 2, k % 2])
            if not luma_coded.any():
                mb_modes[mb] = -1              # modeless MB
                mb_mvs[mb] = (0, 0)
                continue
            cand = []                          # (cost, order, mode, mv)
            sad0 = int(np.abs(d0).sum())
            cand.append((sad0 + lam * 2, 0, th.MODE_NO_MV, (0, 0)))
            if last != (0, 0):
                p = self._mc_pred(ref_pad, y0, x0, 16, *last)
                cand.append((int(np.abs(src - p).sum()) + lam * 2,
                             1, th.MODE_LAST, last))
            if last2 != (0, 0) and last2 != last:
                p = self._mc_pred(ref_pad, y0, x0, 16, *last2)
                cand.append((int(np.abs(src - p).sum()) + lam * 3,
                             2, th.MODE_LAST2, last2))
            mv, sad_mv = self._search_mv(src, ref_pad, y0, x0, last)
            if mv != (0, 0):
                mvbits = (_MV_CODES[mv[0]][1] + _MV_CODES[mv[1]][1])
                cand.append((sad_mv + lam * (4 + mvbits), 3,
                             th.MODE_MV, mv))
            # intra proxy: distance from the MB mean
            sad_i = int(np.abs(src - int(src.mean())).sum())
            cand.append((sad_i + lam * 6, 4, th.MODE_INTRA, (0, 0)))
            cand.sort()
            _, _, mode, mv = cand[0]
            mb_modes[mb] = mode
            mb_mvs[mb] = mv
            # decoder-side last/last2 bookkeeping (_read_motion) —
            # only MBs with coded luma reach the decoder's chain
            if mode == th.MODE_MV:
                last2 = last
                last = mv
            elif mode == th.MODE_LAST2:
                last, last2 = last2, last
        return mb_modes, mb_mvs, coded

    def _encode_inter(self, planes) -> bytes:
        geo = self.geo
        bw = BitWriter()
        bw.write(0, 1)
        bw.write(1, 1)                         # inter
        bw.write(self.qi, 6)
        bw.write(0, 1)
        mb_modes, mb_mvs, coded = self._choose_modes(planes)

        # per-block mode/prediction maps (chroma inherits the MB
        # mode; modeless MBs' chroma predicts INTER_NOMV — decoder
        # rule; INTRA predicts flat 128; everything else is MC off
        # the previous reconstruction)
        block_mode = np.full(geo.total_blocks, th.MODE_NO_MV,
                             np.int32)
        block_mv = np.zeros((geo.total_blocks, 2), np.int32)
        for mb, mode in mb_modes.items():
            if mode < 0:
                continue
            mv = mb_mvs[mb]
            cmv = self._chroma_mv(mv)
            for bid in geo.mb_luma[mb]:
                block_mode[bid] = mode
                block_mv[bid] = mv
            for bid in geo.mb_chroma[mb]:
                block_mode[bid] = mode
                block_mv[bid] = cmv

        ref_pads = [np.pad(pl.astype(np.int32), self._PAD,
                           mode="edge") for pl in self.dec.last]
        # residuals for coded luma + chroma skip decision (skip ==
        # copy prev, exactly the decoder's uncoded-block semantics)
        resid_blocks = np.zeros((geo.total_blocks, 8, 8), np.int64)
        for bid in range(geo.total_blocks):
            p, by, bx = (int(v) for v in geo.block_pos[bid])
            y0, x0 = 8 * by, 8 * bx
            src = planes[p][y0:y0 + 8, x0:x0 + 8]
            mode = int(block_mode[bid])
            if p == 0:
                if not coded[bid]:
                    continue
            else:
                # chroma skip: same RD floor rule as luma
                qstep = float(self.dec._qmat(1, p, self.qi)[1])
                d0 = src - self.dec.last[p][
                    y0:y0 + 8, x0:x0 + 8].astype(np.int32)
                if float((d0.astype(np.int64) ** 2).sum()) \
                        <= 1.5 * qstep * qstep:
                    continue                   # uncoded
                coded[bid] = True
            if mode == th.MODE_INTRA:
                resid_blocks[bid] = src - 128
            elif mode == th.MODE_NO_MV:
                resid_blocks[bid] = (
                    src - self.dec.last[p][y0:y0 + 8,
                                           x0:x0 + 8].astype(np.int32))
            else:
                mvx, mvy = int(block_mv[bid, 0]), int(block_mv[bid, 1])
                pred = self._mc_pred(ref_pads[p], y0, x0, 8, mvx, mvy)
                resid_blocks[bid] = src - pred

        # quantize per (qti, plane) group
        cz_all = np.zeros((geo.total_blocks, 64), np.int32)
        qti_arr = np.where(block_mode == th.MODE_INTRA, 0, 1)
        for qti in (0, 1):
            for p in range(3):
                off, n = geo.plane_off[p], geo.nblocks[p]
                ids = np.nonzero(coded[off:off + n]
                                 & (qti_arr[off:off + n] == qti))[0]
                if not len(ids):
                    continue
                cz_all[off + ids] = self._quantize_blocks(
                    resid_blocks[off + ids], qti, p)
        # a NOMV block whose residual quantized to nothing is pure
        # EOB cost: drop it back to uncoded (identical reconstruction)
        empty = coded & (block_mode == th.MODE_NO_MV) \
            & ~(cz_all != 0).any(axis=1)
        coded[empty] = False

        self._write_block_flags(bw, coded)
        self._write_modes(bw, mb_modes, coded)
        self._write_motion(bw, mb_modes, mb_mvs, coded)
        # DC prediction classes follow the final block modes
        bclass = np.array([th.FRAME_CLASS[m] for m in
                           np.where(block_mode < 0, th.MODE_NO_MV,
                                    block_mode)], np.int32)
        dcres = self._dc_residuals(cz_all[:, 0].astype(np.int64),
                                   coded, bclass)
        cz_all[:, 0] = np.where(coded, dcres, 0)
        blocks = geo.coded_order[coded[geo.coded_order]]
        stream = self._token_events(cz_all[blocks], blocks)
        self._write_tokens(bw, stream)
        return bw.getvalue()

    def _quantize_blocks(self, blocks: np.ndarray, qti: int,
                         pli: int) -> np.ndarray:
        """(n, 8, 8) residual blocks -> (n, 64) zigzag coefs."""
        X = _fdct_blocks(blocks.astype(np.float64))
        qmat = self.dec._qmat(qti, pli, self.qi).astype(np.float64)
        t = X.reshape(-1, 64) / qmat[None, :]
        if qti:
            q = (np.sign(t) * np.floor(np.abs(t) + 0.3)).astype(
                np.int64)
        else:
            q = np.rint(t).astype(np.int64)
        np.clip(q, -580, 580, out=q)
        return q[:, self._zz].astype(np.int32)

    def _write_modes(self, bw: BitWriter, mb_modes: dict,
                     coded: np.ndarray) -> None:
        """Pick the cheapest mode-coding scheme (one of the six
        fixed alphabets, a custom alphabet, or 3-bit CLC) and write
        the per-MB modes for MBs with coded luma."""
        geo = self.geo
        used = [mb_modes[mb] for mb in geo.mb_order
                if mb_modes[mb] >= 0
                and any(coded[bid] for bid in geo.mb_luma[mb])]
        counts = [0] * 8
        for m in used:
            counts[m] += 1
        # custom alphabet: modes by descending frequency
        order = sorted(range(8), key=lambda m: (-counts[m], m))
        custom_rank = [0] * 8
        for r, m in enumerate(order):
            custom_rank[m] = r
        best_scheme, best_cost, best_rank = 0, 24 + sum(
            th._MODE_LENS[custom_rank[m]] for m in used), custom_rank
        for s in range(1, 7):
            alpha = th.MODE_ALPHABETS[s - 1]
            rank = [0] * 8
            for r, m in enumerate(alpha):
                rank[m] = r
            cost = sum(th._MODE_LENS[rank[m]] for m in used)
            if cost < best_cost:
                best_scheme, best_cost, best_rank = s, cost, rank
        if 3 * len(used) < best_cost:
            best_scheme = 7
        bw.write(best_scheme, 3)
        if best_scheme == 0:
            for m in range(8):
                bw.write(best_rank[m], 3)
        for m in used:
            if best_scheme == 7:
                bw.write(m, 3)
            else:
                c, ln = _MODE_CODES[best_rank[m]]
                bw.write(c, ln)

    def _write_motion(self, bw: BitWriter, mb_modes: dict,
                      mb_mvs: dict, coded: np.ndarray) -> None:
        """MV coding-mode bit + the vectors for MODE_MV MBs (LAST /
        LAST2 / NO_MV read nothing)."""
        geo = self.geo
        mvs = [mb_mvs[mb] for mb in geo.mb_order
               if mb_modes[mb] == th.MODE_MV
               and any(coded[bid] for bid in geo.mb_luma[mb])]
        vlc_cost = sum(_MV_CODES[x][1] + _MV_CODES[y][1]
                       for x, y in mvs)
        use_vlc = vlc_cost <= 12 * len(mvs)
        bw.write(0 if use_vlc else 1, 1)       # 0 selects the VLC
        for x, y in mvs:
            for v in (x, y):
                if use_vlc:
                    c, ln = _MV_CODES[v]
                    bw.write(c, ln)
                else:
                    bw.write(abs(v), 5)
                    bw.write(1 if v < 0 else 0, 1)

    def _write_block_flags(self, bw: BitWriter,
                           coded: np.ndarray) -> None:
        """Mirror of the decoder's three-pass flag grammar."""
        geo = self.geo
        nsb = geo.total_sbs
        partial = np.zeros(nsb, bool)
        full = np.zeros(nsb, bool)
        for sb in range(nsb):
            flags = coded[geo.sb_blocks[sb]]
            if flags.all():
                full[sb] = True
            elif flags.any():
                partial[sb] = True
        _write_long_runs(bw, partial)
        rest = np.nonzero(~partial)[0]
        if len(rest):
            _write_long_runs(bw, full[rest])
        psbs = np.nonzero(partial)[0]
        if len(psbs):
            seq = []
            for sb in psbs:
                seq.extend(bool(coded[bid]) for bid in
                           geo.sb_blocks[sb])
            _write_short_runs(bw, np.array(seq, bool))
