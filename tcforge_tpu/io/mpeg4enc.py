"""Native MPEG-4 part 2 Simple Profile video ENCODER — the
bridge-free counterpart of io/mpeg4dec.py, closing the last
both-directions gap in the codec tree (the reference encoded
DivX/Xvid via divx4linux/libxvidcore only:
/root/reference/encode/encode_xvid.c, export/export_divx5.c).

Decoder-mirror design (the io/theoraenc.py recipe): the in-loop
reconstruction IS the in-tree decoder's block path — the same H.263
dequantizer (`Mpeg4Decoder._dequant`), the same XVID integer IDCT,
the same half-pel MC and median MV prediction — so encoder state can
never drift from any conforming decoder.  Every VLC table is the
encode-direction inversion of the decoder's (io/_mp4tables.py,
recovered from the public libavcodec archive).

Toolset (always spec-valid, kept deliberately plain):
- I-VOPs: intra MCBPC/CBPY, gradient DC prediction with the intra DC
  VLCs (intra_dc_vlc_thr=0), zigzag RL coding with the type-3
  absolute escape for off-table pairs, H.263 quantizer;
- P-VOPs: not_coded skip, INTER 1MV with median-predicted fcode=1
  vectors (three-step + half-pel ME), INTRA fallback per MB,
  rounding type 0;
- B-VOPs (bframes>0): direct (TRB/TRD-scaled co-located vectors,
  delta 0), forward, backward and interpolated modes at
  fcode_f=fcode_b=1 with per-row MV predictors; modb=1 uncoded-direct
  skip; MBs whose co-located P MB was not_coded emit ZERO bits (the
  decoder synthesizes them — mirroring mpeg4dec._decode_bvop);
  one-group reordering via push()/flush() (coded order: anchor first,
  then the B frames displayed before it);
- one VOS/VO/VOL header block, verid 1, rectangular, 4:2:0.

Validation (tests/test_mpeg4enc.py): every stream decodes through
libavcodec AND the in-tree decoder with identical output, and the
output matches the encoder's own reconstruction bit-exactly.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from tcforge_tpu.io import _mp4tables as T
from tcforge_tpu.io.mpeg4dec import (_ZIG, Mpeg4Decoder, _last_split,
                                     _log2up, idct_add_sel, idct_put)

__all__ = ["Mpeg4NativeEncoder"]


# ------------------------------------------------------------------ #
# Bit writer
# ------------------------------------------------------------------ #

class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def put(self, val: int, bits: int) -> None:
        acc, nb, buf = self.acc, self.nb, self.buf
        for i in range(bits - 1, -1, -1):
            acc = (acc << 1) | ((val >> i) & 1)
            nb += 1
            if nb == 8:
                buf.append(acc)
                acc = 0
                nb = 0
        self.acc, self.nb = acc, nb

    def stuff(self) -> None:
        """'0' then '1's to the next byte boundary (a full 01111111
        byte when already aligned)."""
        n = 8 - self.nb if self.nb else 8
        self.put((1 << (n - 1)) - 1, n)

    def align_zero(self) -> None:
        if self.nb:
            self.put(0, 8 - self.nb)

    def getvalue(self) -> bytes:
        assert self.nb == 0
        return bytes(self.buf)


# ------------------------------------------------------------------ #
# Encode-direction VLC tables (inversions of the decoder's)
# ------------------------------------------------------------------ #

_MV_CODES = [(T.MVTAB[2 * i], T.MVTAB[2 * i + 1]) for i in range(33)]
_CBPY_CODES = [(T.CBPY[2 * i], T.CBPY[2 * i + 1]) for i in range(16)]
_DC_LUM = [(T.DCTAB_LUM[2 * i], T.DCTAB_LUM[2 * i + 1])
           for i in range(13)]
_DC_CHROM = [(T.DCTAB_CHROM[2 * i], T.DCTAB_CHROM[2 * i + 1])
             for i in range(13)]
# intra MCBPC: (mb_type 3|4, cbpc) -> entry 0-3 / 4-7
_MCBPC_I = {}
for _c in range(4):
    _MCBPC_I[(3, _c)] = (T.INTRA_MCBPC_CODE[_c], T.INTRA_MCBPC_BITS[_c])
    _MCBPC_I[(4, _c)] = (T.INTRA_MCBPC_CODE[4 + _c],
                         T.INTRA_MCBPC_BITS[4 + _c])
# inter MCBPC groups: index = (group << 2) | cbpc
_MCBPC_P_GROUP = {0: 0, 1: 2, 2: 4, 3: 1, 4: 3, 5: 6}
_MCBPC_P = {}
for _t, _g in _MCBPC_P_GROUP.items():
    for _c in range(4):
        _i = (_g << 2) | _c
        _MCBPC_P[(_t, _c)] = (T.INTER_MCBPC_CODE[_i],
                              T.INTER_MCBPC_BITS[_i])


def _rl_codes(vlc, runs, levels):
    """{(last, run, level): (code, bits)} + the escape code."""
    n = len(runs)
    n0 = _last_split(list(runs))
    d = {}
    for i in range(n):
        d[(i >= n0, runs[i], levels[i])] = (vlc[2 * i], vlc[2 * i + 1])
    esc = (vlc[2 * n], vlc[2 * n + 1])
    return d, esc


_RL_INTRA, _ESC_INTRA = _rl_codes(T.MP4_INTRA_VLC, T.MP4_INTRA_RUN,
                                  T.MP4_INTRA_LEVEL)
_RL_INTER, _ESC_INTER = _rl_codes(T.INTER_VLC, T.INTER_RUN,
                                  T.INTER_LEVEL)


def _write_mv(w: BitWriter, delta: int) -> None:
    """One MV component difference at fcode=1 (|delta| <= 32)."""
    sym = abs(delta)
    code, bits = _MV_CODES[sym]
    w.put(code, bits)
    if sym:
        w.put(1 if delta < 0 else 0, 1)


def _write_dc(w: BitWriter, dcd: int, comp: int) -> None:
    size = abs(dcd).bit_length()
    code, bits = (_DC_LUM if comp == 0 else _DC_CHROM)[size]
    w.put(code, bits)
    if size == 0:
        return
    mask = (1 << size) - 1
    v = dcd if dcd > 0 else (abs(dcd) ^ mask)
    w.put(v, size)
    if size > 8:
        w.put(1, 1)                      # marker


def _write_block(w: BitWriter, lv: np.ndarray, intra: bool,
                 first_pos: int) -> None:
    """Raster (8,8) levels -> RL codes in zigzag order; table hits
    with sign bit, type-3 absolute escape otherwise."""
    table, esc = (_RL_INTRA, _ESC_INTRA) if intra \
        else (_RL_INTER, _ESC_INTER)
    zz = lv.reshape(64)[_ZIG][first_pos:]
    nz = np.nonzero(zz)[0]
    assert len(nz), "coded block with no coefficients"
    run = 0
    prev = -1
    for j, p in enumerate(nz):
        run = int(p) - prev - 1
        prev = int(p)
        val = int(zz[p])
        last = j == len(nz) - 1
        hit = table.get((last, run, abs(val)))
        if hit is not None:
            w.put(hit[0], hit[1])
            w.put(1 if val < 0 else 0, 1)
        else:
            w.put(esc[0], esc[1])
            w.put(3, 2)                  # escape type 3
            w.put(1 if last else 0, 1)
            w.put(run, 6)
            w.put(1, 1)                  # marker
            w.put(val & 0xFFF, 12)
            w.put(1, 1)                  # marker


# ------------------------------------------------------------------ #
# Forward DCT + H.263 quantizer
# ------------------------------------------------------------------ #

_DCTM = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.5) if _u == 0 else 1.0
        _DCTM[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u
                                          * np.pi / 16.0)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCTM @ block.astype(np.float64) @ _DCTM.T


def _quant_intra_ac(f: np.ndarray, q: int) -> np.ndarray:
    lv = np.trunc(f / (2.0 * q)).astype(np.int64)
    return np.clip(lv, -2047, 2047)


def _quant_inter(f: np.ndarray, q: int) -> np.ndarray:
    mag = np.trunc((np.abs(f) - q * 0.5) / (2.0 * q))
    lv = (np.sign(f) * np.maximum(mag, 0)).astype(np.int64)
    return np.clip(lv, -2047, 2047)


# ------------------------------------------------------------------ #
# Encoder
# ------------------------------------------------------------------ #

class Mpeg4NativeEncoder:
    """One coded chunk per frame; stream headers prepended to the
    first.  gop = I-frame interval; qscale = constant quantizer."""

    FCODE = 1                            # MV range +-16 px

    def __init__(self, width: int, height: int, fps: float = 25.0,
                 qscale: int = 5, gop: int = 12,
                 search_range: int = 12, bframes: int = 0,
                 keep_recon_log: bool = False,
                 four_mv: bool = False, bitrate_kbps: int = 0,
                 qmin: int = 2, qmax: int = 31):
        if not (1 <= qscale <= 31):
            raise ValueError("mpeg4enc: qscale out of range")
        if not (0 <= bframes <= 7):
            raise ValueError("mpeg4enc: bframes out of range")
        self.four_mv = bool(four_mv)
        # single-pass TM5-style rate control (the io/mpeg2enc.py
        # RateController verbatim — encode_xvid.c's -w bitrate role)
        self._rc = None
        if bitrate_kbps:
            from tcforge_tpu.io.mpeg2enc import RateController
            self._rc = RateController(
                bitrate_kbps, fps, max(1, gop),
                bframes + 1, qscale, qmin=max(1, qmin),
                qmax=min(31, qmax))
        self.width, self.height = width, height
        self.mbw = (width + 15) // 16
        self.mbh = (height + 15) // 16
        self.qscale = qscale
        self.gop = max(1, gop)
        self.search = min(search_range, 14)
        self.bframes = bframes
        self.time_inc_res = max(1, int(round(fps)))
        self.time_inc_bits = _log2up(self.time_inc_res)
        self._frame = 0
        # modulo-time-base bookkeeping (mirrors the decoder's
        # _time_base/_last_time_base pair: B VOPs count from the
        # time base BEFORE the most recent anchor updated it)
        self._tb = 0
        self._prev_tb = 0
        self._recon: Optional[list] = None
        self._recon_prev: Optional[list] = None
        # co-located motion/skip state of the last anchor (the B
        # frames' BACKWARD reference), mirroring the decoder's
        # _co_mvs/_co_skip
        self._co_mvs: Optional[list] = None
        self._co_skip: Optional[list] = None
        self._queue: list = []           # pending (disp, y, u, v)
        self._disp = 0                   # display index counter
        self._anchor_disp = -1           # display index of last anchor
        self._since_i = 0
        self._wrote_headers = False
        # display-order recon log for validation (disp -> planes).
        # Populated only when keep_recon_log=True — on the module
        # path it would leak ~3 MB/frame at 1080p (tests opt in).
        self.keep_recon_log = keep_recon_log
        self.recon_log: dict = {}
        # mirror decoder for recon primitives
        self._dec = Mpeg4Decoder()
        self._dec.vol = type("V", (), {"quant_type": 0,
                                       "quarter_sample": 0})()

    # ---------------------------------------------------------- #
    # Headers
    # ---------------------------------------------------------- #

    def _headers(self) -> bytes:
        w = BitWriter()
        w.put(0x000001B0, 32)            # VOS
        w.put(0x03, 8)                   # SP@L3
        w.put(0x000001B5, 32)            # visual object
        w.put(0, 1)                      # is_visual_object_identifier
        w.put(1, 4)                      # type: video
        w.put(0, 1)                      # video signal type
        w.stuff()
        w.put(0x00000100, 32)            # video object 0
        w.put(0x00000120, 32)            # VOL 0
        w.put(0, 1)                      # random accessible
        w.put(1, 8)                      # object type: simple
        w.put(0, 1)                      # is_object_layer_identifier
        w.put(1, 4)                      # aspect 1:1
        w.put(1, 1)                      # vol control parameters
        w.put(1, 2)                      # chroma 4:2:0
        w.put(0 if self.bframes else 1, 1)   # low delay
        w.put(0, 1)                      # no vbv parameters
        w.put(0, 2)                      # shape: rectangular
        w.put(1, 1)                      # marker
        w.put(self.time_inc_res, 16)
        w.put(1, 1)                      # marker
        w.put(0, 1)                      # fixed vop rate: no
        w.put(1, 1)                      # marker
        w.put(self.width, 13)
        w.put(1, 1)                      # marker
        w.put(self.height, 13)
        w.put(1, 1)                      # marker
        w.put(0, 1)                      # interlaced: no
        w.put(1, 1)                      # obmc disable
        w.put(0, 1)                      # sprite: none (verid 1)
        w.put(0, 1)                      # not 8 bit: no
        w.put(0, 1)                      # quant type: H.263
        w.put(1, 1)                      # complexity estim. DISABLE
        w.put(1, 1)                      # resync marker disable
        w.put(0, 1)                      # data partitioned: no
        w.put(0, 1)                      # scalability: no
        w.stuff()
        return w.getvalue()

    def _vop_header(self, w: BitWriter, vop_type: int,
                    disp: int) -> None:
        secs, t = divmod(disp, self.time_inc_res)
        w.put(0x000001B6, 32)
        w.put(vop_type, 2)
        if vop_type == 2:
            incr = secs - self._prev_tb
        else:
            incr = secs - self._tb
        assert incr >= 0
        for _ in range(incr):
            w.put(1, 1)                  # modulo time base
        w.put(0, 1)
        if vop_type != 2:
            self._prev_tb = self._tb
            self._tb = secs
        w.put(1, 1)                      # marker
        w.put(t, self.time_inc_bits)
        w.put(1, 1)                      # marker
        w.put(1, 1)                      # vop coded
        if vop_type == 1:
            w.put(0, 1)                  # rounding type 0
        w.put(0, 3)                      # intra_dc_vlc_thr: always DC
        w.put(self.qscale, 5)
        if vop_type in (1, 2):
            w.put(self.FCODE, 3)         # fcode forward
        if vop_type == 2:
            w.put(self.FCODE, 3)         # fcode backward

    # ---------------------------------------------------------- #
    # Intra macroblock (shared by I-VOPs and P-intra)
    # ---------------------------------------------------------- #

    def _code_intra_mb(self, src6, mbx, mby, dcs):
        """Quantize the 6 source blocks; returns (cbp, per-block
        (dcd, lv), recon (6,8,8) uint8)."""
        q = self.qscale
        entries = []
        cbp = 0
        blocks = np.zeros((6, 8, 8), np.int64)
        for n in range(6):
            comp = 0 if n < 4 else 1
            if n < 4:
                gx = 1 + 2 * mbx + (n & 1)
                gy = 1 + 2 * mby + (n >> 1)
                plane = 0
            else:
                gx, gy = 1 + mbx, 1 + mby
                plane = n - 3
            f = _fdct(src6[n])
            scale = (T.Y_DC_SCALE if plane == 0
                     else T.C_DC_SCALE)[q]
            dc_q = int(np.floor(f[0, 0] / scale + 0.5))
            lv = _quant_intra_ac(f, q)
            lv[0, 0] = 0
            g = dcs[plane]
            a = g[gy, gx - 1]
            c = g[gy - 1, gx]
            dgt = g[gy - 1, gx - 1]
            pred = c if abs(a - dgt) < abs(dgt - c) else a
            pred_q = (int(pred) + (scale >> 1)) // scale
            dcd = dc_q - pred_q
            dc_val = dc_q * scale
            g[gy, gx] = dc_val
            if np.any(lv):
                cbp |= 1 << (5 - n)
            entries.append((dcd, lv))
            blocks[n] = self._dec._dequant(lv, q, True, dc_val)
        recon = idct_put(blocks)
        return cbp, entries, recon

    def _write_intra_mb(self, w, cbp, entries, in_pvop: bool) -> None:
        cbpc = cbp & 3
        cbpy = (cbp >> 2) & 0xF
        if in_pvop:
            w.put(0, 1)                  # not_coded = 0
            code, bits = _MCBPC_P[(3, cbpc)]
        else:
            code, bits = _MCBPC_I[(3, cbpc)]
        w.put(code, bits)
        w.put(0, 1)                      # ac_pred_flag
        code, bits = _CBPY_CODES[cbpy]
        w.put(code, bits)
        for n, (dcd, lv) in enumerate(entries):
            _write_dc(w, dcd, 0 if n < 4 else 1)
            if (cbp >> (5 - n)) & 1:
                _write_block(w, lv, True, 1)

    # ---------------------------------------------------------- #
    # Motion estimation (integer TSS + half-pel refine)
    # ---------------------------------------------------------- #

    @staticmethod
    def _sad(a: np.ndarray, b: np.ndarray) -> int:
        return int(np.abs(a.astype(np.int32) - b).sum())

    def _search_mv(self, ref_pad, pad, cur, x0, y0, pred):
        """Integer-pel three-step search seeded at (0,0) and the
        median predictor, then half-pel refine.  Returns half-pel
        (mx, my) clamped to the fcode=1 range."""
        lim = self.search
        best = None
        for seed in {(0, 0), (pred[0] >> 1, pred[1] >> 1)}:
            sx = max(-lim, min(lim, seed[0]))
            sy = max(-lim, min(lim, seed[1]))
            step = 4
            bx, by = sx, sy
            bs = self._sad(cur, ref_pad[y0 + by + pad:
                                        y0 + by + pad + 16,
                                        x0 + bx + pad:
                                        x0 + bx + pad + 16])
            while step:
                improved = True
                while improved:
                    improved = False
                    for dx, dy in ((-step, 0), (step, 0),
                                   (0, -step), (0, step)):
                        nx, ny = bx + dx, by + dy
                        if abs(nx) > lim or abs(ny) > lim:
                            continue
                        s = self._sad(
                            cur, ref_pad[y0 + ny + pad:
                                         y0 + ny + pad + 16,
                                         x0 + nx + pad:
                                         x0 + nx + pad + 16])
                        if s < bs:
                            bs, bx, by = s, nx, ny
                            improved = True
                step >>= 1
            if best is None or bs < best[0]:
                best = (bs, bx, by)
        _, bx, by = best
        # half-pel refine around (2bx, 2by)
        bmx, bmy = 2 * bx, 2 * by
        bs = None
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                mx, my = 2 * bx + dx, 2 * by + dy
                if not (-32 <= mx <= 31 and -32 <= my <= 31):
                    continue
                p = Mpeg4Decoder._mc_block(ref_pad, pad, x0, y0, 16,
                                           mx, my, 0)
                s = self._sad(cur, p)
                if bs is None or s < bs:
                    bs, bmx, bmy = s, mx, my
        return bmx, bmy, bs

    def _search_mv4(self, ref_pad, pad, yp, x0, y0, mx, my):
        """Per-8x8-block ±2 integer + half-pel refine seeded at the
        1MV winner.  Returns ([(mx, my)] * 4, total SAD)."""
        dec = Mpeg4Decoder
        out = []
        total = 0
        for k in range(4):
            sx, sy = x0 + 8 * (k & 1), y0 + 8 * (k >> 1)
            cur = yp[sy:sy + 8, sx:sx + 8]
            ix0, iy0 = mx >> 1, my >> 1
            bs = None
            best = (ix0, iy0)
            for ddy in range(-2, 3):
                for ddx in range(-2, 3):
                    nx, ny = ix0 + ddx, iy0 + ddy
                    if abs(nx) > 15 or abs(ny) > 15:
                        continue
                    s = self._sad(
                        cur, ref_pad[sy + ny + pad:sy + ny + pad + 8,
                                     sx + nx + pad:sx + nx + pad + 8])
                    if bs is None or s < bs:
                        bs, best = s, (nx, ny)
            ix, iy = best
            bmx, bmy = 2 * ix, 2 * iy
            bs2 = None
            for ddy in (-1, 0, 1):
                for ddx in (-1, 0, 1):
                    nmx, nmy = 2 * ix + ddx, 2 * iy + ddy
                    if not (-32 <= nmx <= 31 and -32 <= nmy <= 31):
                        continue
                    p = dec._mc_block(ref_pad, pad, sx, sy, 8,
                                      nmx, nmy, 0)
                    s = self._sad(cur, p)
                    if bs2 is None or s < bs2:
                        bs2, bmx, bmy = s, nmx, nmy
            out.append((bmx, bmy))
            total += bs2
        return out, total

    # ---------------------------------------------------------- #
    # Frames
    # ---------------------------------------------------------- #

    def _pad_planes(self, y, u, v):
        W = 16 * self.mbw
        H = 16 * self.mbh
        yp = np.zeros((H, W), np.uint8)
        yp[:self.height, :self.width] = y
        yp[:self.height, self.width:] = y[:, -1:]
        yp[self.height:] = yp[self.height - 1:self.height]
        up = np.zeros((H // 2, W // 2), np.uint8)
        ch, cw = u.shape
        up[:ch, :cw] = u
        up[:ch, cw:] = u[:, -1:]
        up[ch:] = up[ch - 1:ch]
        vp = np.zeros((H // 2, W // 2), np.uint8)
        vp[:ch, :cw] = v
        vp[:ch, cw:] = v[:, -1:]
        vp[ch:] = vp[ch - 1:ch]
        return yp, up, vp

    def encode(self, y: np.ndarray, u: np.ndarray, v: np.ndarray
               ) -> Tuple[bytes, bool]:
        """-> (chunk bytes, is_keyframe).  bframes=0 path only; with
        B frames use push()/flush() (reordered, 1:N)."""
        assert self.bframes == 0, "use push()/flush() with bframes"
        yp, up, vp = self._pad_planes(y, u, v)
        intra = (self._frame % self.gop == 0) or self._recon is None
        chunk = self._code_anchor(yp, up, vp, self._frame, intra)
        self._frame += 1
        return chunk, intra

    def _code_anchor(self, yp, up, vp, disp: int, intra: bool
                     ) -> bytes:
        w = BitWriter()
        if not self._wrote_headers:
            w.buf.extend(self._headers())
            self._wrote_headers = True
        self._recon_prev = self._recon
        if self._rc is not None:
            self.qscale = self._rc.pick_qscale(1 if intra else 2)
        if intra:
            self._encode_ivop(w, yp, up, vp, disp)
        else:
            self._encode_pvop(w, yp, up, vp, disp)
        w.stuff()
        if self._rc is not None:
            self._rc.update(1 if intra else 2, 8 * len(w.buf))
        if self.keep_recon_log:
            self.recon_log[disp] = self._recon
        return w.getvalue()

    # ---------------------------------------------------------- #
    # B-frame group reordering
    # ---------------------------------------------------------- #

    def push(self, y: np.ndarray, u: np.ndarray, v: np.ndarray
             ) -> List[Tuple[bytes, bool]]:
        """Feed one display-order frame; returns zero or more coded
        chunks in CODED order (anchor before the B frames that
        display before it)."""
        if self.bframes == 0:
            return [self.encode(y, u, v)]
        self._queue.append((self._disp, y, u, v))
        self._disp += 1
        if self._recon is None or len(self._queue) == self.bframes + 1:
            return self._emit_group()
        return []

    def flush(self) -> List[Tuple[bytes, bool]]:
        """Drain pending frames (the last pending frame anchors)."""
        if not self._queue:
            return []
        return self._emit_group()

    def _emit_group(self) -> List[Tuple[bytes, bool]]:
        group, self._queue = self._queue, []
        bs, anchor = group[:-1], group[-1]
        disp_a = anchor[0]
        intra = (self._recon is None
                 or self._since_i + len(group) >= self.gop)
        prev_anchor_disp = self._anchor_disp
        yp, up, vp = self._pad_planes(anchor[1], anchor[2], anchor[3])
        out = [(self._code_anchor(yp, up, vp, disp_a, intra), intra)]
        self._anchor_disp = disp_a
        trd = max(1, disp_a - prev_anchor_disp)
        for disp_b, by, bu, bv in bs:
            trb = disp_b - prev_anchor_disp
            bw = BitWriter()
            byp, bup, bvp = self._pad_planes(by, bu, bv)
            if self._rc is not None:
                self.qscale = self._rc.pick_qscale(3)
            self._encode_bvop(bw, byp, bup, bvp, disp_b, trb, trd)
            bw.stuff()
            if self._rc is not None:
                self._rc.update(3, 8 * len(bw.buf))
            out.append((bw.getvalue(), False))
        self._since_i = 0 if intra else self._since_i + len(group)
        return out

    @staticmethod
    def _mb_blocks(yp, up, vp, mbx, mby):
        x0, y0 = 16 * mbx, 16 * mby
        src6 = np.empty((6, 8, 8), np.int32)
        for k in range(4):
            src6[k] = yp[y0 + 8 * (k >> 1):y0 + 8 * (k >> 1) + 8,
                         x0 + 8 * (k & 1):x0 + 8 * (k & 1) + 8]
        src6[4] = up[y0 >> 1:(y0 >> 1) + 8, x0 >> 1:(x0 >> 1) + 8]
        src6[5] = vp[y0 >> 1:(y0 >> 1) + 8, x0 >> 1:(x0 >> 1) + 8]
        return src6

    def _encode_ivop(self, w, yp, up, vp, disp=0) -> None:
        self._vop_header(w, 0, disp)
        mbw, mbh = self.mbw, self.mbh
        # decoder resets co-located B state after an I-VOP
        # (mpeg4dec._decode_ivop:800)
        self._co_mvs = [[(0, 0)] * (2 * mbw) for _ in range(2 * mbh)]
        self._co_skip = [[False] * mbw for _ in range(mbh)]
        dcs = [np.full((2 * mbh + 1, 2 * mbw + 2), 1024, np.int64)
               for _ in range(3)]
        ry = np.zeros_like(yp)
        ru = np.zeros_like(up)
        rv = np.zeros_like(vp)
        for mby in range(mbh):
            for mbx in range(mbw):
                src6 = self._mb_blocks(yp, up, vp, mbx, mby)
                cbp, entries, recon = self._code_intra_mb(
                    src6, mbx, mby, dcs)
                self._write_intra_mb(w, cbp, entries, False)
                self._store_mb(ry, ru, rv, mbx, mby, recon)
        self._recon = [ry, ru, rv]

    @staticmethod
    def _store_mb(ry, ru, rv, mbx, mby, recon) -> None:
        x0, y0 = 16 * mbx, 16 * mby
        for k in range(4):
            ry[y0 + 8 * (k >> 1):y0 + 8 * (k >> 1) + 8,
               x0 + 8 * (k & 1):x0 + 8 * (k & 1) + 8] = recon[k]
        ru[y0 >> 1:(y0 >> 1) + 8, x0 >> 1:(x0 >> 1) + 8] = recon[4]
        rv[y0 >> 1:(y0 >> 1) + 8, x0 >> 1:(x0 >> 1) + 8] = recon[5]

    def _encode_pvop(self, w, yp, up, vp, disp=0) -> None:
        self._vop_header(w, 1, disp)
        q = self.qscale
        mbw, mbh = self.mbw, self.mbh
        prev = self._recon
        pad = 16 + 16
        refs = [np.pad(pl, pad, mode="edge") for pl in prev]
        ry = np.zeros_like(yp)
        ru = np.zeros_like(up)
        rv = np.zeros_like(vp)
        dcs = [np.full((2 * mbh + 1, 2 * mbw + 2), 1024, np.int64)
               for _ in range(3)]
        dec = Mpeg4Decoder
        mvgrid = [[(0, 0)] * (2 * mbw) for _ in range(2 * mbh)]
        skipmap = [[False] * mbw for _ in range(mbh)]
        # decoder instance for _pred_mv (needs _mbw)
        self._dec._mbw = mbw
        for mby in range(mbh):
            for mbx in range(mbw):
                x0, y0 = 16 * mbx, 16 * mby
                bx, by = 2 * mbx, 2 * mby
                src6 = self._mb_blocks(yp, up, vp, mbx, mby)
                cury = yp[y0:y0 + 16, x0:x0 + 16]
                pred = self._dec._pred_mv(mvgrid, bx, by, 0)
                mx, my, sad = self._search_mv(refs[0], pad, cury,
                                              x0, y0, pred)
                # intra/inter decision: mean-removed source energy
                # vs motion-compensated SAD (classic H.263 rule)
                mean = int(cury.mean())
                dev = int(np.abs(cury.astype(np.int32) - mean).sum())
                if dev < sad - 500:
                    cbp, entries, recon = self._code_intra_mb(
                        src6, mbx, mby, dcs)
                    self._write_intra_mb(w, cbp, entries, True)
                    self._store_mb(ry, ru, rv, mbx, mby, recon)
                    for k in range(4):
                        mvgrid[by + (k >> 1)][bx + (k & 1)] = (0, 0)
                    continue
                # 4MV decision: per-block vectors must buy enough
                # SAD to cover their extra MV bits
                use4 = False
                mvs4 = None
                if self.four_mv:
                    mvs4, sad4 = self._search_mv4(refs[0], pad, yp,
                                                  x0, y0, mx, my)
                    use4 = sad4 + 300 < sad \
                        and any(m != (mx, my) for m in mvs4)
                # inter: residual blocks against the half-pel pred
                if use4:
                    pred_y = np.empty((16, 16), np.int32)
                    for k in range(4):
                        sx, sy = x0 + 8 * (k & 1), y0 + 8 * (k >> 1)
                        pred_y[8 * (k >> 1):8 * (k >> 1) + 8,
                               8 * (k & 1):8 * (k & 1) + 8] = \
                            dec._mc_block(refs[0], pad, sx, sy, 8,
                                          mvs4[k][0], mvs4[k][1], 0)
                    cmx = dec._round_chroma(
                        sum(m[0] for m in mvs4))
                    cmy = dec._round_chroma(
                        sum(m[1] for m in mvs4))
                else:
                    pred_y = dec._mc_block(refs[0], pad, x0, y0, 16,
                                           mx, my, 0)
                    cmx = (mx >> 1) | (mx & 1)
                    cmy = (my >> 1) | (my & 1)
                pred_u = dec._mc_block(refs[1], pad, x0 >> 1,
                                       y0 >> 1, 8, cmx, cmy, 0)
                pred_v = dec._mc_block(refs[2], pad, x0 >> 1,
                                       y0 >> 1, 8, cmx, cmy, 0)
                pred6 = np.empty((6, 8, 8), np.int32)
                for k in range(4):
                    pred6[k] = pred_y[8 * (k >> 1):8 * (k >> 1) + 8,
                                      8 * (k & 1):8 * (k & 1) + 8]
                pred6[4] = pred_u
                pred6[5] = pred_v
                lvs = np.zeros((6, 8, 8), np.int64)
                blocks = np.zeros((6, 8, 8), np.int64)
                cbp = 0
                for n in range(6):
                    f = _fdct(src6[n] - pred6[n])
                    lv = _quant_inter(f, q)
                    if np.any(lv):
                        cbp |= 1 << (5 - n)
                        lvs[n] = lv
                        blocks[n] = self._dec._dequant(lv, q, False, 0)
                if cbp == 0 and mx == 0 and my == 0:
                    # not_coded skip: copy co-located
                    w.put(1, 1)
                    recon = pred6.astype(np.uint8)
                    self._store_mb(ry, ru, rv, mbx, mby, recon)
                    for k in range(4):
                        mvgrid[by + (k >> 1)][bx + (k & 1)] = (0, 0)
                    skipmap[mby][mbx] = True
                    continue
                w.put(0, 1)              # not_coded = 0
                cbpc = cbp & 3
                cbpy = (cbp >> 2) & 0xF
                code, bits = _MCBPC_P[(2 if use4 else 0, cbpc)]
                w.put(code, bits)
                code, bits = _CBPY_CODES[cbpy ^ 0xF]
                w.put(code, bits)
                if use4:
                    # per-block deltas against the progressive
                    # median predictor (the decoder fills mvgrid
                    # block by block)
                    for k in range(4):
                        pk = self._dec._pred_mv(
                            mvgrid, bx + (k & 1), by + (k >> 1), k)
                        _write_mv(w, self._wrap_mv(
                            mvs4[k][0] - pk[0]))
                        _write_mv(w, self._wrap_mv(
                            mvs4[k][1] - pk[1]))
                        mvgrid[by + (k >> 1)][bx + (k & 1)] = \
                            mvs4[k]
                else:
                    dx = self._wrap_mv(mx - pred[0])
                    dy = self._wrap_mv(my - pred[1])
                    _write_mv(w, dx)
                    _write_mv(w, dy)
                    for k in range(4):
                        mvgrid[by + (k >> 1)][bx + (k & 1)] = \
                            (mx, my)
                for n in range(6):
                    if (cbp >> (5 - n)) & 1:
                        _write_block(w, lvs[n], False, 0)
                coded = [(cbp >> (5 - n)) & 1 for n in range(6)]
                recon = idct_add_sel(blocks, pred6, coded)
                self._store_mb(ry, ru, rv, mbx, mby, recon)
        self._recon = [ry, ru, rv]
        self._co_mvs = mvgrid
        self._co_skip = skipmap

    # ---------------------------------------------------------- #
    # B-VOP
    # ---------------------------------------------------------- #

    # unary mb_type codes (mpeg4dec._MBTYPE_B_LUT direction):
    # direct "1", interpolate "01", backward "001", forward "0001"
    _MBTYPE_B = {0: (1, 1), 1: (1, 2), 2: (1, 3), 3: (1, 4)}

    @staticmethod
    def _pred6_of(py, pu, pv):
        pred6 = np.empty((6, 8, 8), np.int32)
        for k in range(4):
            pred6[k] = py[8 * (k >> 1):8 * (k >> 1) + 8,
                          8 * (k & 1):8 * (k & 1) + 8]
        pred6[4] = pu
        pred6[5] = pv
        return pred6

    def _direct_pred(self, frefs, brefs, pad, x0, y0, mbx, mby,
                     trb, trd):
        """Delta-(0,0) direct-mode prediction — the bit-free mirror
        of mpeg4dec._b_direct."""
        dec = Mpeg4Decoder

        def tdiv(a, d):
            q = abs(a) // d
            return -q if a < 0 else q

        fmv, bmv = [], []
        for k in range(4):
            cm = self._co_mvs[2 * mby + (k >> 1)][2 * mbx + (k & 1)]
            fmv.append((tdiv(trb * cm[0], trd),
                        tdiv(trb * cm[1], trd)))
            bmv.append((tdiv((trb - trd) * cm[0], trd),
                        tdiv((trb - trd) * cm[1], trd)))
        py = np.empty((16, 16), np.int32)
        for k in range(4):
            sx, sy = x0 + 8 * (k & 1), y0 + 8 * (k >> 1)
            fp = dec._mc_block(frefs[0], pad, sx, sy, 8,
                               fmv[k][0], fmv[k][1], 0)
            bp = dec._mc_block(brefs[0], pad, sx, sy, 8,
                               bmv[k][0], bmv[k][1], 0)
            py[8 * (k >> 1):8 * (k >> 1) + 8,
               8 * (k & 1):8 * (k & 1) + 8] = (fp + bp + 1) >> 1
        fcx = dec._round_chroma(sum(m[0] for m in fmv))
        fcy = dec._round_chroma(sum(m[1] for m in fmv))
        bcx = dec._round_chroma(sum(m[0] for m in bmv))
        bcy = dec._round_chroma(sum(m[1] for m in bmv))
        fpu = dec._mc_block(frefs[1], pad, x0 >> 1, y0 >> 1, 8,
                            fcx, fcy, 0)
        bpu = dec._mc_block(brefs[1], pad, x0 >> 1, y0 >> 1, 8,
                            bcx, bcy, 0)
        fpv = dec._mc_block(frefs[2], pad, x0 >> 1, y0 >> 1, 8,
                            fcx, fcy, 0)
        bpv = dec._mc_block(brefs[2], pad, x0 >> 1, y0 >> 1, 8,
                            bcx, bcy, 0)
        return self._pred6_of(py, (fpu + bpu + 1) >> 1,
                              (fpv + bpv + 1) >> 1)

    @staticmethod
    def _wrap_mv(d: int) -> int:
        if d < -32:
            d += 64
        elif d > 31:
            d -= 64
        return d

    def _mb_pred(self, refs, pad, x0, y0, mx, my):
        """Single-MV 16x16 luma + derived-chroma prediction."""
        dec = Mpeg4Decoder
        py = dec._mc_block(refs[0], pad, x0, y0, 16, mx, my, 0)
        cmx = (mx >> 1) | (mx & 1)
        cmy = (my >> 1) | (my & 1)
        pu = dec._mc_block(refs[1], pad, x0 >> 1, y0 >> 1, 8,
                           cmx, cmy, 0)
        pv = dec._mc_block(refs[2], pad, x0 >> 1, y0 >> 1, 8,
                           cmx, cmy, 0)
        return py, pu, pv

    def _encode_bvop(self, w, yp, up, vp, disp, trb, trd) -> None:
        self._vop_header(w, 2, disp)
        q = self.qscale
        mbw, mbh = self.mbw, self.mbh
        pad = 32
        frefs = [np.pad(p, pad, mode="edge")
                 for p in self._recon_prev]
        brefs = [np.pad(p, pad, mode="edge") for p in self._recon]
        ry = np.zeros_like(yp)
        ru = np.zeros_like(up)
        rv = np.zeros_like(vp)
        for mby in range(mbh):
            pf = (0, 0)                  # per-row MV predictors
            pb = (0, 0)
            for mbx in range(mbw):
                x0, y0 = 16 * mbx, 16 * mby
                src6 = self._mb_blocks(yp, up, vp, mbx, mby)
                pred6_d = self._direct_pred(frefs, brefs, pad, x0,
                                            y0, mbx, mby, trb, trd)
                if self._co_skip[mby][mbx]:
                    # co-located P MB was not_coded: the decoder
                    # synthesizes direct/zero/uncoded with NO bits
                    recon = pred6_d.astype(np.uint8)
                    self._store_mb(ry, ru, rv, mbx, mby, recon)
                    continue
                cury = yp[y0:y0 + 16, x0:x0 + 16]
                dsad = int(np.abs(src6[:4].astype(np.int32)
                                  - pred6_d[:4]).sum())
                fmx, fmy, fsad = self._search_mv(frefs[0], pad,
                                                 cury, x0, y0, pf)
                bmx, bmy, bsad = self._search_mv(brefs[0], pad,
                                                 cury, x0, y0, pb)
                fpy, fpu, fpv = self._mb_pred(frefs, pad, x0, y0,
                                              fmx, fmy)
                bpy, bpu, bpv = self._mb_pred(brefs, pad, x0, y0,
                                              bmx, bmy)
                ipy = (fpy + bpy + 1) >> 1
                isad = int(np.abs(cury.astype(np.int32) - ipy).sum())
                # mode pick: SAD + rough side-info cost (favor
                # direct: no MV bits; interp pays two MVs)
                cands = [(dsad - 16, 0), (fsad + 32, 3),
                         (bsad + 32, 2), (isad + 64, 1)]
                mb_type = min(cands)[1]
                if mb_type == 0:
                    pred6 = pred6_d
                elif mb_type == 3:
                    pred6 = self._pred6_of(fpy, fpu, fpv)
                elif mb_type == 2:
                    pred6 = self._pred6_of(bpy, bpu, bpv)
                else:
                    pred6 = self._pred6_of(ipy, (fpu + bpu + 1) >> 1,
                                           (fpv + bpv + 1) >> 1)
                lvs = np.zeros((6, 8, 8), np.int64)
                blocks = np.zeros((6, 8, 8), np.int64)
                cbp = 0
                for n in range(6):
                    f = _fdct(src6[n] - pred6[n])
                    lv = _quant_inter(f, q)
                    if np.any(lv):
                        cbp |= 1 << (5 - n)
                        lvs[n] = lv
                        blocks[n] = self._dec._dequant(lv, q,
                                                       False, 0)
                if mb_type == 0 and cbp == 0:
                    w.put(1, 1)          # modb=1: uncoded direct
                    recon = pred6_d.astype(np.uint8)
                    self._store_mb(ry, ru, rv, mbx, mby, recon)
                    continue
                w.put(0, 1)              # modb
                w.put(1 if cbp == 0 else 0, 1)     # modb2
                code, bits = self._MBTYPE_B[mb_type]
                w.put(code, bits)
                if cbp:
                    w.put(cbp, 6)
                if mb_type != 0 and cbp:
                    w.put(0, 1)          # DBQUANT: +0
                if mb_type == 0:
                    _write_mv(w, 0)      # delta MV (0,0)
                    _write_mv(w, 0)
                if mb_type in (1, 3):
                    _write_mv(w, self._wrap_mv(fmx - pf[0]))
                    _write_mv(w, self._wrap_mv(fmy - pf[1]))
                    pf = (fmx, fmy)
                if mb_type in (1, 2):
                    _write_mv(w, self._wrap_mv(bmx - pb[0]))
                    _write_mv(w, self._wrap_mv(bmy - pb[1]))
                    pb = (bmx, bmy)
                for n in range(6):
                    if (cbp >> (5 - n)) & 1:
                        _write_block(w, lvs[n], False, 0)
                coded = [(cbp >> (5 - n)) & 1 for n in range(6)]
                recon = idct_add_sel(blocks, pred6, coded)
                self._store_mb(ry, ru, rv, mbx, mby, recon)
        if self.keep_recon_log:
            self.recon_log[disp] = [ry, ru, rv]
