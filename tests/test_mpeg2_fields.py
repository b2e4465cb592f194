"""MPEG-2 FIELD pictures: hand-crafted bitstreams through the native
decoder + field reconstruction/weaving (13818-2 picture_structure 1/2)."""

import numpy as np
import pytest

from tcforge_tpu.io.mpeg2codec import (BitWriter, Mpeg2Encoder,
                                       iter_decode_full)

W, H = 64, 64
MBW = W // 16
ROWS = (H // 2) // 16          # field macroblock rows


@pytest.fixture(scope="module", autouse=True)
def _native():
    from tcforge_tpu import native as n
    if not n.available():
        pytest.skip("native library not built")
    return n


def seq_header() -> bytes:
    return Mpeg2Encoder(W, H, 25.0, qscale=2).sequence_header()


def pce(w: BitWriter, ps: int, fc=2, tff=1):
    """picture coding extension with picture_structure ps (1/2/3)."""
    w.start_code(0xB5)
    w.put(0b1000, 4)
    for _ in range(4):
        w.put(fc, 4)
    w.put(0, 2)                        # intra_dc_precision 8 bit
    w.put(ps, 2)
    w.put(tff, 1)
    w.put(0, 1)                        # frame_pred_frame_dct
    w.put(0, 1)
    w.put(0, 1)                        # q_scale_type linear
    w.put(0, 1)                        # B-14
    w.put(0, 1)
    w.put(0, 1)
    w.put(1, 1)
    w.put(1, 1)
    w.put(0, 1)


def put_mv(w: BitWriter, delta: int, fc_val=2):
    r = fc_val - 1
    if delta == 0:
        w.put(1, 1)
        return
    mag = abs(delta)
    code = ((mag - 1) >> r) + 1
    residual = (mag - 1) & ((1 << r) - 1)
    vlc = {1: (0b01, 2), 2: (0b001, 3), 3: (0b0001, 4)}
    bits, ln = vlc[code]
    w.put(bits, ln)
    w.put(1 if delta < 0 else 0, 1)
    if r:
        w.put(residual, r)


def intra_field(value: int, ps: int, temporal=0) -> bytes:
    """Flat intra field picture: every block DC = value, no AC."""
    w = BitWriter()
    w.start_code(0x00)
    w.put(temporal, 10)
    w.put(1, 3)                        # I
    w.put(0xFFFF, 16)
    w.put(0, 1)
    pce(w, ps)
    from tcforge_tpu.io.mpeg2codec import DC_CHROMA, DC_LUMA
    for row in range(ROWS):
        w.start_code(row + 1)
        w.put(2, 5)
        w.put(0, 1)
        pred_y = pred_u = pred_v = 128
        for col in range(MBW):
            w.put(1, 1)                # MBA 1
            w.put(1, 1)                # intra
            for _ in range(4):
                Mpeg2Encoder._write_dc(w, value - pred_y, DC_LUMA)
                pred_y = value
                w.put(0b10, 2)         # EOB
            Mpeg2Encoder._write_dc(w, 128 - pred_u, DC_CHROMA)
            pred_u = 128
            w.put(0b10, 2)
            Mpeg2Encoder._write_dc(w, 128 - pred_v, DC_CHROMA)
            pred_v = 128
            w.put(0b10, 2)
    return w.bytes()


def p_field(ps: int, sel: int, mvx=0, mvy=0, temporal=1,
            mode_16x8=None) -> bytes:
    """P field picture, every MB MC-not-coded.

    mode_16x8: None -> 16x16 field MC with `sel`; else (sel_up,
    sel_low, mv_up, mv_low) for 16x8 prediction."""
    w = BitWriter()
    w.start_code(0x00)
    w.put(temporal, 10)
    w.put(2, 3)
    w.put(0xFFFF, 16)
    w.put(0b0111, 4)
    w.put(0, 1)
    pce(w, ps)
    for row in range(ROWS):
        w.start_code(row + 1)
        w.put(2, 5)
        w.put(0, 1)
        first = True
        for col in range(MBW):
            w.put(1, 1)                # MBA 1
            w.put(0b001, 3)            # P: MC, not coded
            if mode_16x8 is None:
                w.put(0b01, 2)         # field_motion_type 1: 16x16
                w.put(sel, 1)
                put_mv(w, mvx if first else 0)
                put_mv(w, mvy if first else 0)
            else:
                su, sl, mu, ml = mode_16x8
                w.put(0b10, 2)         # field_motion_type 2: 16x8
                w.put(su, 1)
                put_mv(w, mu[0] if first else 0)
                put_mv(w, mu[1] if first else 0)
                w.put(sl, 1)
                put_mv(w, ml[0] if first else 0)
                put_mv(w, ml[1] if first else 0)
            first = False
    return w.bytes()


def field_i_pair(top_val=100, bot_val=200) -> bytes:
    return (seq_header() + intra_field(top_val, 1)
            + intra_field(bot_val, 2))


def decode(es):
    return list(iter_decode_full(es + b"\x00\x00\x01\xb7"))


class TestIntraFieldPair:
    def test_weave(self):
        out = decode(field_i_pair())
        assert len(out) == 1
        y, u, v = out[0]
        assert y.shape == (H, W)
        np.testing.assert_array_equal(y[0::2], np.full((H // 2, W), 100))
        np.testing.assert_array_equal(y[1::2], np.full((H // 2, W), 200))
        np.testing.assert_array_equal(u, np.full((H // 2, W // 2), 128))

    def test_bottom_field_first_order(self):
        es = (seq_header() + intra_field(50, 2) + intra_field(75, 1))
        y = decode(es)[0][0]
        np.testing.assert_array_equal(y[0::2], np.full((H // 2, W), 75))
        np.testing.assert_array_equal(y[1::2], np.full((H // 2, W), 50))


class TestPFieldPrediction:
    def test_16x16_select_same_parity(self):
        # P frame's fields copy their own parity: identical frame out
        es = field_i_pair() + p_field(1, sel=0) + p_field(2, sel=1)
        out = decode(es)
        assert len(out) == 2
        np.testing.assert_array_equal(out[0][0], out[1][0])

    def test_16x16_select_cross_parity(self):
        # first (top) P field selects the old BOTTOM field (200); the
        # second field's reachable references are then {new top (200),
        # old bottom (200)} — 7.6.2.1: the old top is gone
        es = field_i_pair() + p_field(1, sel=1) + p_field(2, sel=1)
        y = decode(es)[1][0]
        np.testing.assert_array_equal(y[0::2], np.full((H // 2, W), 200))
        np.testing.assert_array_equal(y[1::2], np.full((H // 2, W), 200))

    def test_second_field_references_first(self):
        # frame 2 = I top field (value 37) + P bottom field: selecting
        # TOP must yield the SAME frame's just-decoded field (37), and
        # selecting BOTTOM the previous frame's bottom (200) — 7.6.2.1
        base = field_i_pair()
        es_same = base + intra_field(37, 1, temporal=1) \
            + p_field(2, sel=0)
        y = decode(es_same)[1][0]
        np.testing.assert_array_equal(y[0::2], np.full((H // 2, W), 37))
        np.testing.assert_array_equal(y[1::2], np.full((H // 2, W), 37))
        es_prev = base + intra_field(37, 1, temporal=1) \
            + p_field(2, sel=1)
        y2 = decode(es_prev)[1][0]
        np.testing.assert_array_equal(y2[1::2],
                                      np.full((H // 2, W), 200))

    def test_half_pel_field_mv(self):
        # vertical half-pel inside a field: fields are flat here, so
        # use a gradient intra field pair from the frame encoder
        enc = Mpeg2Encoder(W, H, 25.0, qscale=1)
        yy = np.arange(H)[:, None] * np.ones((1, W))
        yplane = ((yy * 4) % 200 + 20).astype(np.uint8)
        u = np.full((H // 2, W // 2), 128, np.uint8)
        es = enc.encode_frame(yplane, u, u, with_seq=True)
        es += p_field(1, sel=0, mvy=1) + p_field(2, sel=1, mvy=1)
        out = decode(es)
        iy = out[0][0]
        py = out[1][0]
        top = iy[0::2].astype(int)
        want_top = np.empty_like(top)
        want_top[:-1] = (top[:-1] + top[1:] + 1) >> 1
        want_top[-1] = top[-1]
        np.testing.assert_array_equal(py[0::2], want_top.astype(np.uint8))

    def test_16x8_split(self):
        # upper 16x8 from the top ref field, lower 16x8 from bottom ref
        es = field_i_pair() + p_field(
            1, sel=0, mode_16x8=(0, 1, (0, 0), (0, 0))) + p_field(
            2, sel=0, mode_16x8=(0, 1, (0, 0), (0, 0)))
        y = decode(es)[1][0]
        top_field = y[0::2]
        # rows 0-7 of each field MB = 100 (top ref), rows 8-15 = 200
        for mbrow in range(ROWS):
            np.testing.assert_array_equal(
                top_field[mbrow * 16:mbrow * 16 + 8],
                np.full((8, W), 100))
            np.testing.assert_array_equal(
                top_field[mbrow * 16 + 8:mbrow * 16 + 16],
                np.full((8, W), 200))


class TestImporterFieldPath:
    def test_e2e_through_importer(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        es = field_i_pair() + p_field(1, sel=0) + p_field(2, sel=1) \
            + b"\x00\x00\x01\xb7"
        p = tmp_path / "fields.m2v"
        p.write_bytes(es)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mpeg", Job())
        imp.open(str(p))
        batch = imp.read_video_batch(8)
        assert batch["y"].shape == (2, H, W)
        np.testing.assert_array_equal(batch["y"][0], batch["y"][1])
        np.testing.assert_array_equal(
            batch["y"][0][0::2], np.full((H // 2, W), 100))
        imp.close()


class TestFieldEncoding:
    def test_encoder_field_pair_roundtrip(self):
        """encode_frame_fields -> full decode reproduces the frame."""
        rng = np.random.default_rng(8)
        base = np.kron(rng.integers(30, 220, (H // 4, W // 4)),
                       np.ones((4, 4))).astype(np.uint8)
        u = np.full((H // 2, W // 2), 100, np.uint8)
        v = np.full((H // 2, W // 2), 150, np.uint8)
        for tff in (True, False):
            enc = Mpeg2Encoder(W, H, 25.0, qscale=2)
            es = enc.encode_frame_fields(base, u, v,
                                         top_field_first=tff)
            out = decode(es)
            assert len(out) == 1
            dy, du, dv = out[0]
            mse = np.mean((dy.astype(float) - base) ** 2)
            assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 40
            mseu = np.mean((du.astype(float) - u) ** 2)
            assert 10 * np.log10(255 ** 2 / max(mseu, 1e-9)) > 40


class TestFieldJaxPath:
    def test_jax_matches_numpy_golden(self):
        """reconstruct_field_picture_jax == the numpy f64 golden on a
        decoded P field with mixed 16x16/16x8 modes."""
        from tcforge_tpu import native
        from tcforge_tpu.io.mpeg2codec import (
            reconstruct_field_picture, reconstruct_field_picture_jax,
            split_fields)
        es = field_i_pair() + p_field(1, sel=1, mvx=3, mvy=-2) \
            + p_field(2, sel=0, mode_16x8=(0, 1, (1, 1), (-1, 2)))
        bs = native.NativeMpeg2Bitstream(es)
        pics = []
        while True:
            r = bs.next_picture_full()
            if r is None:
                break
            pics.append((r, bs.last_picture_structure))
        mb_rows = ROWS
        # build the reference frame from the intra pair via numpy
        f1 = reconstruct_field_picture(*pics[0][0][2:6], MBW, mb_rows)
        f2 = reconstruct_field_picture(*pics[1][0][2:6], MBW, mb_rows)
        from tcforge_tpu.io.mpeg2codec import weave_fields
        frame = weave_fields(f1, f2)
        refs = split_fields(frame)
        for k in (2, 3):
            pic = pics[k][0]
            np_out = reconstruct_field_picture(
                *pic[2:6], MBW, mb_rows, fwd=refs)
            jx_out = reconstruct_field_picture_jax(
                *pic[2:6], MBW, mb_rows, fwd=refs)
            for a, b in zip(np_out, jx_out):
                np.testing.assert_array_equal(a, np.asarray(b))


# ------------------------------------------------------------------ #
# Dual prime in FIELD pictures (13818-2 7.6.3.6 field-picture case:
# m=1 derived vector from the opposite-parity field, +-1 parity
# correction, average with the same-parity prediction).

def put_dmvector(w: BitWriter, v: int):
    """Table B-11: 0 -> '0', +1 -> '10', -1 -> '11'."""
    if v == 0:
        w.put(0, 1)
    elif v == 1:
        w.put(0b10, 2)
    else:
        w.put(0b11, 2)


def p_field_dual(ps: int, mvx, mvy, dmx, dmy, temporal=1) -> bytes:
    """P field picture, every MB dual prime, MC-not-coded.  Only the
    first MB carries the vector; the rest send zero deltas (PMV
    propagates)."""
    w = BitWriter()
    w.start_code(0x00)
    w.put(temporal, 10)
    w.put(2, 3)
    w.put(0xFFFF, 16)
    w.put(0b0111, 4)
    w.put(0, 1)
    pce(w, ps)
    for row in range(ROWS):
        w.start_code(row + 1)
        w.put(2, 5)
        w.put(0, 1)
        first = True
        for col in range(MBW):
            w.put(1, 1)                # MBA 1
            w.put(0b001, 3)            # P: MC, not coded
            w.put(0b11, 2)             # field_motion_type 3: dual prime
            # no field select; mv then dmvector per component
            put_mv(w, mvx if first else 0)
            put_dmvector(w, dmx)
            put_mv(w, mvy if first else 0)
            put_dmvector(w, dmy)
            first = False
    return w.bytes()


def gradient_field_i(ps: int, seed: int, temporal=0) -> bytes:
    """Intra field with per-macroblock-column DC steps (spatial
    structure so motion vectors matter)."""
    w = BitWriter()
    w.start_code(0x00)
    w.put(temporal, 10)
    w.put(1, 3)
    w.put(0xFFFF, 16)
    w.put(0, 1)
    pce(w, ps)
    from tcforge_tpu.io.mpeg2codec import DC_CHROMA, DC_LUMA
    for row in range(ROWS):
        w.start_code(row + 1)
        w.put(2, 5)
        w.put(0, 1)
        pred_y = pred_u = pred_v = 128
        for col in range(MBW):
            val = 40 + seed * 17 + 31 * col + 13 * row
            w.put(1, 1)
            w.put(1, 1)
            for _ in range(4):
                Mpeg2Encoder._write_dc(w, val - pred_y, DC_LUMA)
                pred_y = val
                w.put(0b10, 2)
            Mpeg2Encoder._write_dc(w, 128 - pred_u, DC_CHROMA)
            pred_u = 128
            w.put(0b10, 2)
            Mpeg2Encoder._write_dc(w, 128 - pred_v, DC_CHROMA)
            pred_v = 128
            w.put(0b10, 2)
    return w.bytes()


def _field_halfpel_ref(ref, vx, vy):
    """Independent (scalar) port of the half-sample field prediction
    for the expected values — written against 13818-2 7.7 directly."""
    h, wdt = ref.shape
    out = np.empty((h, wdt), np.int64)
    ixs, iys = vx >> 1, vy >> 1
    hx, hy = vx & 1, vy & 1
    r = ref.astype(np.int64)

    def px(ax, ay):
        return r[min(max(ay, 0), h - 1), min(max(ax, 0), wdt - 1)]

    for yy in range(h):
        for xx in range(wdt):
            ix, iy = xx + ixs, yy + iys
            a = px(ix, iy)
            b = px(ix + 1, iy)
            c = px(ix, iy + 1)
            d = px(ix + 1, iy + 1)
            if hx and hy:
                out[yy, xx] = (a + b + c + d + 2) >> 2
            elif hx:
                out[yy, xx] = (a + b + 1) >> 1
            elif hy:
                out[yy, xx] = (a + c + 1) >> 1
            else:
                out[yy, xx] = a
    return out


class TestFieldDualPrime:
    MV = (3, 2)          # half-pel: (1.5, 1.0)
    DMV = (1, -1)

    def _stream(self):
        return (seq_header()
                + gradient_field_i(1, seed=0)      # ref top
                + gradient_field_i(2, seed=3)      # ref bottom
                + p_field_dual(1, *self.MV, *self.DMV)   # cur top: DP
                + p_field(2, sel=1, mvx=0, mvy=0))       # cur bottom

    def test_matches_independent_port(self):
        out = decode(self._stream())
        assert len(out) == 2
        ref_top = out[0][0][0::2].astype(np.int64)
        ref_bot = out[0][0][1::2].astype(np.int64)
        got_top = out[1][0][0::2].astype(np.int64)

        mvx, mvy = self.MV
        dmx, dmy = self.DMV
        same = _field_halfpel_ref(ref_top, mvx, mvy)

        def div2(v):
            return (v + (1 if v > 0 else 0)) >> 1

        # top field: e = -1 (7.6.3.6 field-picture case, m = 1)
        dvx = div2(mvx) + dmx
        dvy = div2(mvy) + dmy - 1
        opp = _field_halfpel_ref(ref_bot, dvx, dvy)
        want = (same + opp + 1) >> 1
        # interior only: edge clipping semantics differ at the border
        np.testing.assert_array_equal(got_top[2:-2, 2:-2],
                                      want[2:-2, 2:-2])

    def test_second_field_unaffected(self):
        out = decode(self._stream())
        ref_bot = out[0][0][1::2]
        got_bot = out[1][0][1::2]
        np.testing.assert_array_equal(got_bot, ref_bot)

    def test_numpy_golden_matches_jax(self):
        from tcforge_tpu import native
        from tcforge_tpu.io.mpeg2codec import (
            reconstruct_field_picture, reconstruct_field_picture_jax,
            split_fields)
        es = self._stream() + b"\x00\x00\x01\xb7"
        bs = native.NativeMpeg2Bitstream(es)
        pics = []
        while True:
            pic = bs.next_picture_full()
            if pic is None:
                break
            pics.append((pic[0], pic[2].copy(), pic[3].copy(),
                         pic[4].copy(), pic[5].copy(),
                         bs.last_picture_structure))
        bs.close()
        assert [p[0] for p in pics] == [1, 1, 2, 2]
        assert pics[2][5] == 1          # the DP picture: top field
        # reconstruct the two reference fields (intra)
        refs = []
        for p in pics[:2]:
            refs.append(reconstruct_field_picture(
                p[1], p[2], p[3], p[4], MBW, ROWS))
        fwd = (refs[0], refs[1])
        p = pics[2]
        gold = reconstruct_field_picture(p[1], p[2], p[3], p[4], MBW,
                                         ROWS, fwd=fwd, cur_parity=0)
        fast = reconstruct_field_picture_jax(p[1], p[2], p[3], p[4],
                                             MBW, ROWS, fwd=fwd,
                                             cur_parity=0)
        for g, f in zip(gold, fast):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(f))
