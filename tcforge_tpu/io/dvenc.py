"""Native DV (DV25) video encoder — PAL 4:2:0 and NTSC 4:1:1.

The reference encodes DV by LINKING libdv
(/root/reference/encode/encode_dv.c) — there is no in-tree encoder
to port.  This is the exact mirror of the in-tree decoder
(io/dvdec.py): forward 8x8 / 2x4x8 transforms built by numerically
inverting the decoder's float-ized IDCTs, quantization through the
same factor tables (level = round(coef * 2^14 / factor)), per-block
class selection (the finest class whose levels fit the VLC's
|level| <= 255 ceiling), per-macroblock QNO descent until the AC
bits fit the MB's 536-bit budget, and writer-side pass-1/2/3
packing that reproduces the decoder's bit-spilling reader exactly:
each block's codeword string fills its own area first, the
overflows chain into the macroblock's free-area pool (in block
order), then into the segment pool (in MB order), truncating
lowest-priority trailing bits when a segment genuinely overflows
(a truncated trailing codeword is valid DV — decoders park the
partial and move on).

Every emitted frame decodes BIT-IDENTICALLY through the in-tree
decoder and through the bundled libavcodec dvvideo decoder
(tests/test_dvdec.py) — recon is therefore exact by construction.
Non-video DIF sections (header/subcode/VAUX packs, empty-audio
blocks) carry the fixed 625/50 field values the spec prescribes.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from tcforge_tpu.io import dvdec as dd

__all__ = ["DVEncoder"]


# ------------------------------------------------------------------ #
# Encode-side VLC: (run, level>0) -> (code, len) incl. the sign slot
# ------------------------------------------------------------------ #

def _build_enc_tables():
    direct = {}
    runonly = {}
    for code, ln, run, level in dd._VLC_HEAD:
        if level:
            key = (run, level)
            if key not in direct or ln + 1 < direct[key][1]:
                direct[key] = (code << 1, ln + 1)   # + sign bit slot
        else:
            runonly[run] = (code, ln)
    for run in range(64):
        if run not in runonly:
            runonly[run] = (8064 + run, 13)
    levelonly = {}
    for lvl in range(1, 256):
        levelonly[lvl] = ((32512 + lvl) << 1, 16)
    for (run, level), v in list(direct.items()):
        if run == 0:
            if level not in levelonly or v[1] < levelonly[level][1]:
                levelonly[level] = v
    return direct, runonly, levelonly


_DIRECT, _RUNONLY, _LEVELONLY = _build_enc_tables()
_EOB_CODE = (dd._EOB[0], dd._EOB[1])


class _BitStr:
    """Growing MSB-first bitstring as (bigint, nbits)."""

    __slots__ = ("val", "n")

    def __init__(self):
        self.val = 0
        self.n = 0

    def put(self, v: int, k: int) -> None:
        self.val = (self.val << k) | (v & ((1 << k) - 1))
        self.n += k


def _ac_bits(levels: List[int]) -> Tuple[int, int]:
    """Zigzag AC levels (index 1..63, level[0] ignored) -> the
    block's AC codeword bitstring (incl. EOB)."""
    bs = _BitStr()
    run = 0
    for pos in range(1, 64):
        v = levels[pos]
        if v == 0:
            run += 1
            continue
        a = abs(v)
        sign = 1 if v < 0 else 0
        hit = _DIRECT.get((run, a))
        if hit is not None:
            code, ln = hit
            bs.put(code | sign, ln)
        else:
            if run:
                code, ln = _RUNONLY[run - 1]
                bs.put(code, ln)
            code, ln = _LEVELONLY[a]
            bs.put(code | sign, ln)
        run = 0
    code, ln = _EOB_CODE
    bs.put(code, ln)
    return bs.val, bs.n


def _ac_cost(levels: List[int]) -> int:
    """Bit cost of _ac_bits without building the string."""
    cost = _EOB_CODE[1]
    run = 0
    for pos in range(1, 64):
        v = levels[pos]
        if v == 0:
            run += 1
            continue
        a = abs(v)
        hit = _DIRECT.get((run, a))
        if hit is not None:
            cost += hit[1]
        else:
            if run:
                cost += _RUNONLY[run - 1][1]
            cost += _LEVELONLY[a][1]
        run = 0
    return cost


# ------------------------------------------------------------------ #
# Forward transforms: numerical inverses of the decoder's float-ized
# IDCTs (probed per basis coefficient at init)
# ------------------------------------------------------------------ #

def _float_idct88(X: np.ndarray) -> np.ndarray:
    """The decoder's 8x8 IDCT with the integer shifts replaced by
    exact division (linear map)."""
    def rowpass(x, shift):
        r = [x[..., i] for i in range(8)]
        base = dd._W4 * r[0]
        a0 = base + dd._W2 * r[2] + dd._W4 * r[4] + dd._W6 * r[6]
        a1 = base + dd._W6 * r[2] - dd._W4 * r[4] - dd._W2 * r[6]
        a2 = base - dd._W6 * r[2] - dd._W4 * r[4] + dd._W2 * r[6]
        a3 = base - dd._W2 * r[2] + dd._W4 * r[4] - dd._W6 * r[6]
        b0 = dd._W1 * r[1] + dd._W3 * r[3] + dd._W5 * r[5] \
            + dd._W7 * r[7]
        b1 = dd._W3 * r[1] - dd._W7 * r[3] - dd._W1 * r[5] \
            - dd._W5 * r[7]
        b2 = dd._W5 * r[1] - dd._W1 * r[3] + dd._W7 * r[5] \
            + dd._W3 * r[7]
        b3 = dd._W7 * r[1] - dd._W5 * r[3] + dd._W3 * r[5] \
            - dd._W1 * r[7]
        s = 2.0 ** shift
        out = np.empty(x.shape, np.float64)
        for i, v in enumerate((a0 + b0, a1 + b1, a2 + b2, a3 + b3)):
            out[..., i] = v / s
        for i, v in enumerate((a3 - b3, a2 - b2, a1 - b1, a0 - b0)):
            out[..., 4 + i] = v / s
        return out

    t = rowpass(X, dd._ROW_SHIFT)
    return rowpass(t.swapaxes(-1, -2), dd._COL_SHIFT).swapaxes(-1, -2)


def _probe_linear(f) -> np.ndarray:
    """64x64 matrix of a separable float transform."""
    M = np.zeros((64, 64))
    for k in range(64):
        e = np.zeros((1, 8, 8))
        e.flat[k] = 1.0
        M[:, k] = f(e).ravel()
    return M


_M88 = _probe_linear(lambda e: _float_idct88(e))
_F88 = np.linalg.inv(_M88)


def _float_idct248_map() -> np.ndarray:
    """Float-ized 2x4x8: row pass then the 4-point field columns."""
    def rowpass(x):
        r = [x[..., i] for i in range(8)]
        base = dd._W4 * r[0]
        a0 = base + dd._W2 * r[2] + dd._W4 * r[4] + dd._W6 * r[6]
        a1 = base + dd._W6 * r[2] - dd._W4 * r[4] - dd._W2 * r[6]
        a2 = base - dd._W6 * r[2] - dd._W4 * r[4] + dd._W2 * r[6]
        a3 = base - dd._W2 * r[2] + dd._W4 * r[4] - dd._W6 * r[6]
        b0 = dd._W1 * r[1] + dd._W3 * r[3] + dd._W5 * r[5] \
            + dd._W7 * r[7]
        b1 = dd._W3 * r[1] - dd._W7 * r[3] - dd._W1 * r[5] \
            - dd._W5 * r[7]
        b2 = dd._W5 * r[1] - dd._W1 * r[3] + dd._W7 * r[5] \
            + dd._W3 * r[7]
        b3 = dd._W7 * r[1] - dd._W5 * r[3] + dd._W3 * r[5] \
            - dd._W1 * r[7]
        s = 2.0 ** dd._ROW_SHIFT
        out = np.empty(x.shape, np.float64)
        for i, v in enumerate((a0 + b0, a1 + b1, a2 + b2, a3 + b3)):
            out[..., i] = v / s
        for i, v in enumerate((a3 - b3, a2 - b2, a1 - b1, a0 - b0)):
            out[..., 4 + i] = v / s
        return out

    def idct4col(cols):
        a0, a1, a2, a3 = cols[:, 0], cols[:, 1], cols[:, 2], cols[:, 3]
        s = 2.0 ** dd._C_SHIFT
        c0 = (a0 + a2) * (1 << (dd._CN_SHIFT - 1))
        c2 = (a0 - a2) * (1 << (dd._CN_SHIFT - 1))
        c1 = a1 * dd._C1 + a3 * dd._C2
        c3 = a1 * dd._C2 - a3 * dd._C1
        out = np.empty_like(cols)
        out[:, 0] = (c0 + c1) / s
        out[:, 1] = (c2 + c3) / s
        out[:, 2] = (c2 - c3) / s
        out[:, 3] = (c0 - c1) / s
        return out

    def full(e):
        bf = np.empty_like(e)
        bf[:, 0::2, :] = e[:, 0::2, :] + e[:, 1::2, :]
        bf[:, 1::2, :] = e[:, 0::2, :] - e[:, 1::2, :]
        t = rowpass(bf)
        out = np.empty_like(t)
        out[:, 0::2, :] = idct4col(t[:, 0::2, :])
        out[:, 1::2, :] = idct4col(t[:, 1::2, :])
        return out

    M = np.zeros((64, 64))
    for k in range(64):
        e = np.zeros((1, 8, 8))
        e.flat[k] = 1.0
        M[:, k] = full(e).ravel()
    return M


_F248 = np.linalg.inv(_float_idct248_map())


# DIF section templates (625/50 field values; see module docstring)
_HDR_PAYLOAD = bytes.fromhex("bff87878" + "78" + "ff" * 72)
# NTSC: DSF=0 in the header byte; VAUX source byte 3 clears the
# 50/60 system bit
_HDR_PAYLOAD_N = bytes.fromhex("3ff87878" + "78" + "ff" * 72)
_VAUX_PACKS_N = bytes.fromhex("60ffffc0ff613fc8fcff")
_VAUX_PAYLOAD_N = (_VAUX_PACKS_N + b"\xff" * 35 + _VAUX_PACKS_N
                   + b"\xff" * 22)[:77]
_SUB_PAYLOAD = bytes(
    b"".join(bytes([0x8F, 0xF0 + n]) + b"\xff" * 6 for n in range(9))
)[:77].ljust(77, b"\xff")
_VAUX_PACKS = bytes.fromhex("60ffffe0ff613fc8fcff")
_VAUX_PAYLOAD = (_VAUX_PACKS + b"\xff" * 35 + _VAUX_PACKS
                 + b"\xff" * 22)[:77]
_AUDIO_PAYLOAD = b"\xff" * 77


class DVEncoder:
    """DV25 frame encoder: encode(y, u, v) -> DIF frame
    (PAL 720x576 4:2:0 -> 144000 bytes; NTSC 720x480 4:1:1 with
    (480, 180) chroma -> 120000 bytes)."""

    def __init__(self):
        self._factors = dd.DVDecoder()._factors
        # quant index per (class, qno): q = qno + offset[class]
        self._zz = np.array(dd._ZIGZAG_88, np.int64)
        self._zz248 = np.array(dd._ZIGZAG_248, np.int64)

    # ------------------------------------------------------------ #

    def _quantize(self, X: np.ndarray, mode: int, qno: int
                  ) -> Tuple[int, List[int]]:
        """Coefficients (64,) raster -> (class, zigzag levels) at
        qno: finest class whose AC levels fit |level| <= 255."""
        zz = self._zz248 if mode else self._zz
        xz = X[zz]
        for cls in (0, 1, 2, 3):
            q = qno + dd._QUANT_OFFSET[cls]
            factor = np.array(
                self._factors[1 if cls == 3 else 0][mode][q],
                np.float64)
            lv = np.rint(xz * 16384.0 / factor).astype(np.int64)
            if np.abs(lv[1:]).max(initial=0) <= 255:
                out = lv.tolist()
                return cls, out
        np.clip(lv, -255, 255, out=lv)
        return 3, lv.tolist()

    # ------------------------------------------------------------ #

    @staticmethod
    def _pack_segment(mbs: List[Tuple[int, List[Tuple[int, int]]]]
                      ) -> List[bytes]:
        """5 parsed MBs [(qno, [(bits, nbits) x 6])] -> 5 x 77-byte
        payloads with decoder-exact pass-1/2/3 spilling."""
        payloads = []
        free_slots: List[List[int]] = []   # [mb] -> free bit counts
        mb_over: List[Tuple[int, int]] = []  # per-MB overflow string
        area_bits: List[List[List[int]]] = []
        for qno, strs in mbs:
            areas = []          # per block: [val, nbits] placed bits
            frees = []
            over = _BitStr()
            for bi, (v, n) in enumerate(strs):
                cap = dd._BLOCK_BITS[bi]
                if n <= cap:
                    areas.append([v, n])
                    frees.append(cap - n)
                else:
                    areas.append([v >> (n - cap), cap])
                    over.put(v & ((1 << (n - cap)) - 1), n - cap)
                    frees.append(0)
            free_slots.append(frees)
            mb_over.append((over.val, over.n))
            area_bits.append(areas)
        # pass 2: each MB's overflow goes into its own free tails
        seg_over = _BitStr()
        for m in range(5):
            ov, on = mb_over[m]
            pos = 0
            for bi in range(6):
                f = free_slots[m][bi]
                if f <= 0 or pos >= on:
                    continue
                take = min(f, on - pos)
                chunk = (ov >> (on - pos - take)) & ((1 << take) - 1)
                areas = area_bits[m][bi]
                areas[0] = (areas[0] << take) | chunk
                areas[1] += take
                free_slots[m][bi] -= take
                pos += take
            if pos < on:
                seg_over.put(ov & ((1 << (on - pos)) - 1), on - pos)
        # pass 3: the segment overflow fills the remaining free
        # tails across MBs in order (the reader's segment pool)
        ov, on = seg_over.val, seg_over.n
        pos = 0
        for m in range(5):
            for bi in range(6):
                f = free_slots[m][bi]
                if f <= 0 or pos >= on:
                    continue
                take = min(f, on - pos)
                chunk = (ov >> (on - pos - take)) & ((1 << take) - 1)
                areas = area_bits[m][bi]
                areas[0] = (areas[0] << take) | chunk
                areas[1] += take
                free_slots[m][bi] -= take
                pos += take
        # the segment-fit guarantee (see _segment_strings) means
        # everything placed; a leftover here is a bug
        assert pos == on, "dvenc: segment overflow exceeded capacity"
        # emit payloads: STA/QNO byte + areas padded with 1-bits
        for m in range(5):
            qno, _ = mbs[m]
            bs = _BitStr()
            bs.put(0x0, 4)                  # STA
            bs.put(qno, 4)
            for bi in range(6):
                v, n = area_bits[m][bi]
                pad = dd._BLOCK_BITS[bi] - n
                bs.put(v, n)
                if pad:                 # provably unread (see above)
                    bs.put((1 << pad) - 1, pad)
            assert bs.n == 616
            payloads.append(bs.val.to_bytes(77, "big"))
        return payloads

    # ------------------------------------------------------------ #

    @staticmethod
    def _pick_modes(blocks: np.ndarray) -> List[int]:
        """Per-block 8-8 vs 2-4-8 decision: interlaced content has
        more energy in line-to-line differences than in field-
        internal differences."""
        modes = []
        for b in blocks:
            x = b.astype(np.int64)
            inter = np.abs(x[1:] - x[:-1]).sum()
            fields = (np.abs(x[2:] - x[:-2]).sum() + 1) // 2
            modes.append(1 if inter > 2 * fields else 0)
        return modes

    def encode(self, y: np.ndarray, u: np.ndarray, v: np.ndarray
               ) -> bytes:
        y = np.asarray(y, np.uint8)
        u = np.asarray(u, np.uint8)
        v = np.asarray(v, np.uint8)
        if y.shape == (576, 720) and u.shape == (288, 360) \
                and v.shape == (288, 360):
            pal = True
            nseq = 12
            hdr, vaux = _HDR_PAYLOAD, _VAUX_PAYLOAD
        elif y.shape == (480, 720) and u.shape == (480, 180) \
                and v.shape == (480, 180):
            pal = False
            nseq = 10
            hdr, vaux = _HDR_PAYLOAD_N, _VAUX_PAYLOAD_N
        else:
            raise ValueError("dvenc: geometry must be PAL 720x576 + "
                             "360x288 chroma or NTSC 720x480 + "
                             "180x480 4:1:1 chroma")
        out = bytearray()
        for seq in range(nseq):
            # non-video sections
            out += bytes([0x1F, (seq << 4) | 0x07, 0x00]) + hdr
            for k in range(2):
                out += bytes([0x3F, (seq << 4) | 0x07, k]) \
                    + _SUB_PAYLOAD
            for k in range(3):
                out += bytes([0x56, (seq << 4) | 0x07, k]) + vaux
            audio_n = 0
            video_n = 0
            # assemble the 27 segments of this sequence first
            seg_payloads: List[bytes] = []
            for v_i in range(27):
                mbs = []
                for b in range(5):
                    blocks = np.empty((6, 8, 8), np.uint8)
                    if pal:
                        sb_col = dd._SB_COL[b]
                        sb_row = (seq + dd._SB_ROW_OFF[b]) % 12
                        cx = v_i // 3
                        cy = (v_i % 3 if cx % 2 == 0
                              else 2 - (v_i % 3))
                        mbx = 9 * sb_col + cx
                        mby = 3 * sb_row + cy
                        for k in range(4):
                            px = mbx * 16 + (k % 2) * 8
                            py = mby * 16 + (k // 2) * 8
                            blocks[k] = y[py:py + 8, px:px + 8]
                        blocks[4] = v[mby * 8:mby * 8 + 8,
                                      mbx * 8:mbx * 8 + 8]
                        blocks[5] = u[mby * 8:mby * 8 + 8,
                                      mbx * 8:mbx * 8 + 8]
                    else:
                        entries = dd._ntsc_mb_blocks(seq, v_i, b)
                        planes = (y, u, v)
                        for k, (p, py, px, split) in \
                                enumerate(entries):
                            if split:
                                blocks[k][:, :4] = \
                                    planes[p][py:py + 8, px:px + 4]
                                blocks[k][:, 4:] = \
                                    planes[p][py + 8:py + 16,
                                              px:px + 4]
                            else:
                                blocks[k] = planes[p][py:py + 8,
                                                      px:px + 8]
                    modes = self._pick_modes(blocks)
                    mbs.append((blocks, modes))
                seg_payloads.extend(self._pack_segment(
                    self._segment_strings(mbs)))
            # interleave audio/video blocks
            vi = 0
            for n in range(144):
                if n % 16 == 0:
                    out += bytes([0x76, (seq << 4) | 0x07, audio_n]) \
                        + _AUDIO_PAYLOAD
                    audio_n += 1
                else:
                    out += bytes([0x96, (seq << 4) | 0x07, video_n]) \
                        + seg_payloads[vi]
                    video_n += 1
                    vi += 1
        assert len(out) == 144000 if pal else len(out) == 120000
        return bytes(out)

    def _mb_at_qno(self, X, modes, qno):
        """AC info for one MB at a quantizer: [(cls, lv, cost)] and
        the MB's total AC bits."""
        info = []
        total = 0
        for i in range(6):
            cls, lv = self._quantize(X[i], modes[i], qno)
            cost = _ac_cost(lv)
            info.append((cls, lv, cost))
            total += cost
        return info, total

    def _segment_strings(self, mbs) -> List[
            Tuple[int, List[Tuple[int, int]]]]:
        """Rate-fit 5 macroblocks to the SEGMENT's bit capacity:
        every MB starts at the finest quantizer; the most expensive
        MB steps down until the segment fits (bits flow freely
        between macroblocks via the pass-2/3 spill, so the budget is
        shared, like the reference encoders); as a last resort the
        longest blocks drop their highest-frequency coefficients —
        EOBs always stay reachable, so no reader ever touches pool
        padding."""
        budget = 5 * 536                 # segment AC bits
        preps = []
        for blocks, modes in mbs:
            X = np.empty((6, 64))
            for i in range(6):
                F = _F248 if modes[i] else _F88
                X[i] = F @ blocks[i].astype(np.float64).ravel()
            dcs = []
            for i in range(6):
                dc = int(round((X[i][0] - 1024.0) / 4.0))
                dcs.append(max(-256, min(255, dc)))
                X[i][0] = 0.0
            preps.append((X, modes, dcs))
        qnos = [15] * 5
        infos = []
        totals = []
        for m in range(5):
            info, tot = self._mb_at_qno(preps[m][0], preps[m][1], 15)
            infos.append(info)
            totals.append(tot)
        while sum(totals) > budget and max(qnos) > 0:
            m = max(range(5),
                    key=lambda k: totals[k] if qnos[k] > 0 else -1)
            if qnos[m] == 0:
                break
            qnos[m] -= 1
            infos[m], totals[m] = self._mb_at_qno(
                preps[m][0], preps[m][1], qnos[m])
        while sum(totals) > budget:      # qno floor: drop coefs
            m = max(range(5), key=lambda k: totals[k])
            info = infos[m]
            worst = max(range(6), key=lambda i: info[i][2])
            cls, lv, cost = info[worst]
            for j in range(63, 0, -1):
                if lv[j]:
                    lv[j] = 0
                    break
            ncost = _ac_cost(lv)
            info[worst] = (cls, lv, ncost)
            totals[m] += ncost - cost
        out = []
        for m in range(5):
            X, modes, dcs = preps[m]
            strs = []
            for i in range(6):
                cls, lv, _ = infos[m][i]
                bs = _BitStr()
                bs.put(dcs[i] & 0x1FF, 9)
                bs.put(modes[i], 1)
                bs.put(cls, 2)
                av, an = _ac_bits(lv)
                bs.put(av, an)
                strs.append((bs.val, bs.n))
            out.append((qnos[m], strs))
        return out


# ------------------------------------------------------------------ #
# DV audio injection (AAUX, PAL 48 kHz 16-bit stereo)
# ------------------------------------------------------------------ #

# AAUX pack templates (field values of the 625/50 48k/16-bit locked
# mode; byte 2 of the AS pack carries the channel-group index)
_AAUX_PACKS = (bytes.fromhex("50d800e080"),
               bytes.fromhex("511ccfa0ff"),
               bytes.fromhex("52ffc10170"),
               bytes.fromhex("53ff8080c0"))


def inject_audio(frame: bytes, pcm: np.ndarray) -> bytes:
    """Write (1920, 2) int16 samples into a DV25 PAL frame's audio
    DIF blocks (the shuffle derived empirically — see io/dvdec.py).
    Short input is zero-padded; returns the new frame."""
    if len(frame) != 144000:
        raise ValueError("dv audio: need a PAL DIF frame")
    pcm = np.asarray(pcm, np.int16)
    if pcm.ndim == 1:
        pcm = np.stack([pcm, pcm], axis=1)
    if pcm.shape[0] < 1920:
        pcm = np.pad(pcm, ((0, 1920 - pcm.shape[0]), (0, 0)))
    out = bytearray(frame)
    offs = {}
    for off in range(0, 144000, 80):
        if out[off] >> 5 == 3:
            seq = out[off + 1] >> 4
            dbn = out[off + 2]
            offs[(seq, dbn)] = off + 3
            # AAUX packs: dbn 3..6 in even sequences, 0..3 in odd
            start = 3 if seq % 2 == 0 else 0
            if start <= dbn < start + 4:
                pk = bytearray(_AAUX_PACKS[dbn - start])
                if pk[0] == 0x50 and seq >= 6:
                    pk[2] = 0x01          # second channel group
                out[off + 3:off + 8] = pk
            else:
                out[off + 3:off + 8] = b"\xff" * 5
    from tcforge_tpu.io.dvdec import _AUD_SEQ, _AUD_DBN, _AUD_OFF
    for ch in range(2):
        col = pcm[:1920, ch]
        for n in range(1920):
            base = offs[(int(_AUD_SEQ[n]) + 6 * ch,
                         int(_AUD_DBN[n]))]
            o = base + int(_AUD_OFF[n])
            v = int(col[n]) & 0xFFFF
            out[o] = v >> 8
            out[o + 1] = v & 0xFF
    return bytes(out)
