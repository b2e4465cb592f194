"""MPEG-2 P/B-picture decode: hand-crafted bitstreams + reconstruction."""

import numpy as np
import pytest

from tcforge_tpu.io.mpeg2codec import (BitWriter, Mpeg2Encoder,
                                       reconstruct_picture,
                                       MBF_FWD, MBF_INTRA, MBF_SKIPPED)

RNG = np.random.default_rng(55)

W, H = 64, 48
MBW, MBH = W // 16, H // 16


@pytest.fixture(scope="module")
def native():
    from tcforge_tpu import native as n
    if not n.available():
        pytest.skip("native library not built")
    return n


def picture_coding_ext(w: BitWriter, fc=2, fpfd=1, tff=1):
    w.start_code(0xB5)
    w.put(0b1000, 4)
    for _ in range(4):
        w.put(fc, 4)                   # f_codes
    w.put(0, 2)                        # intra_dc_precision
    w.put(0b11, 2)                     # frame picture
    w.put(tff, 1)                      # top_field_first
    w.put(fpfd, 1)                     # frame_pred_frame_dct
    w.put(0, 1)
    w.put(0, 1)                        # q_scale_type linear
    w.put(0, 1)                        # B-14
    w.put(0, 1)
    w.put(0, 1)
    w.put(1, 1)
    w.put(1, 1)
    w.put(0, 1)


def put_mv(w: BitWriter, delta: int, fc_val=2):
    """Encode one motion delta for f_code=fc_val (r_size=fc_val-1)."""
    r = fc_val - 1
    if delta == 0:
        w.put(1, 1)
        return
    mag = abs(delta)
    # delta = ((|code|-1) << r) + residual + 1
    code = ((mag - 1) >> r) + 1
    residual = (mag - 1) & ((1 << r) - 1)
    vlc = {1: (0b01, 2), 2: (0b001, 3), 3: (0b0001, 4)}
    assert code in vlc, "test helper handles |code| <= 3"
    bits, ln = vlc[code]
    w.put(bits, ln)                    # motion_code magnitude
    w.put(1 if delta < 0 else 0, 1)    # sign
    if r:
        w.put(residual, r)


def p_picture(mvx: int, mvy: int, temporal=1) -> bytes:
    """A P picture: every MB forward-predicted with the same vector,
    no coded blocks."""
    w = BitWriter()
    w.start_code(0x00)
    w.put(temporal, 10)
    w.put(2, 3)                        # P
    w.put(0xFFFF, 16)
    w.put(0b1111, 4)                   # full_pel + f_code (MPEG-1 dummy)
    w.put(0, 1)                        # extra bit
    picture_coding_ext(w)
    for row in range(MBH):
        w.start_code(row + 1)
        w.put(2, 5)                    # quantiser_scale_code
        w.put(0, 1)
        for col in range(MBW):
            w.put(1, 1)                # MBA increment 1
            w.put(0b001, 3)            # P macroblock: MC only
            if col == 0:
                put_mv(w, mvx)
                put_mv(w, mvy)
            else:                      # keep the predicted vector
                put_mv(w, 0)
                put_mv(w, 0)
    return w.bytes()


def b_picture(fmv, bmv, temporal=1) -> bytes:
    """A B picture: first MB of each slice interpolated (fwd+bwd),
    remaining MBs skipped (repeat vectors)."""
    w = BitWriter()
    w.start_code(0x00)
    w.put(temporal, 10)
    w.put(3, 3)                        # B
    w.put(0xFFFF, 16)
    w.put(0b1111, 4)
    w.put(0b1111, 4)
    w.put(0, 1)
    picture_coding_ext(w)
    for row in range(MBH):
        w.start_code(row + 1)
        w.put(2, 5)
        w.put(0, 1)
        w.put(1, 1)                    # MBA 1
        w.put(0b10, 2)                 # B macroblock: interp, not coded
        put_mv(w, fmv[0])
        put_mv(w, fmv[1])
        put_mv(w, bmv[0])
        put_mv(w, bmv[1])
        # skip MBs 1..MBW-2 (B skipped repeat vectors), then code the
        # last MB of the row (skipped MBs cannot end a slice)
        w.put(0b010, 3)                # MBA increment 3
        w.put(0b10, 2)                 # interp, not coded
        for _ in range(4):
            put_mv(w, 0)               # keep predicted vectors
    return w.bytes()


def decode_all(native, es):
    bs = native.NativeMpeg2Bitstream(es)
    out = []
    while True:
        r = bs.next_picture_full()
        if r is None:
            break
        out.append(r)
    return out


def ref_stream():
    """Sequence header + one detailed I frame from the encoder."""
    enc = Mpeg2Encoder(W, H, 25.0, qscale=2)
    base = np.kron(RNG.integers(16, 220, (H // 4, W // 4)),
                   np.ones((4, 4))).astype(np.uint8)
    u = ((np.mgrid[0:H // 2, 0:W // 2][1] * 3) % 200 + 20) \
        .astype(np.uint8)
    v = np.full((H // 2, W // 2), 100, np.uint8)
    es = enc.encode_frame(base, u, v, with_seq=True)
    return es, (base, u, v)


def recon(native, pic, refs_f=None, refs_b=None):
    ptype, tref, yc, uc, vc, mbinfo = pic
    return reconstruct_picture(yc, uc, vc, mbinfo, MBW, MBH,
                               fwd=refs_f, bwd=refs_b)


class TestPDecode:
    def test_integer_mv_shift(self, native):
        es, _ = ref_stream()
        es2 = es + p_picture(4, 0)     # +2 full-pel horizontal
        pics = decode_all(native, es2)
        assert [p[0] for p in pics] == [1, 2]
        iy, iu, iv = recon(native, pics[0])
        py, pu, pv = recon(native, pics[1], refs_f=(iy, iu, iv))
        # pred[y][x] = ref[y][x+2]
        np.testing.assert_array_equal(py[:, :-2], iy[:, 2:])
        np.testing.assert_array_equal(pu[:, :-1], iu[:, 1:])

    def test_half_pel_mv(self, native):
        es, _ = ref_stream()
        es2 = es + p_picture(1, 0)     # half-pel right
        pics = decode_all(native, es2)
        iy, iu, iv = recon(native, pics[0])
        py, _, _ = recon(native, pics[1], refs_f=(iy, iu, iv))
        want = (iy[:, :-1].astype(int) + iy[:, 1:].astype(int) + 1) >> 1
        np.testing.assert_array_equal(py[:, :-1], want.astype(np.uint8))

    def test_vertical_mv(self, native):
        es, _ = ref_stream()
        es2 = es + p_picture(0, 2)
        pics = decode_all(native, es2)
        iy, iu, iv = recon(native, pics[0])
        py, _, _ = recon(native, pics[1], refs_f=(iy, iu, iv))
        np.testing.assert_array_equal(py[:-1, :], iy[1:, :])

    def test_mb_flags(self, native):
        es, _ = ref_stream()
        pics = decode_all(native, es + p_picture(4, 0))
        mbinfo = pics[1][5]
        assert (mbinfo[:, 0] & MBF_FWD).all()
        assert not (mbinfo[:, 0] & MBF_INTRA).any()
        # all MBs carry the same reconstructed vector
        assert (mbinfo[:, 1] == 4).all()
        assert (mbinfo[:, 2] == 0).all()


class TestBDecode:
    def test_bidirectional_average(self, native):
        es, _ = ref_stream()
        # second reference: P picture shifted by 4 half-pels
        full = es + p_picture(4, 0) + b_picture((0, 0), (0, 0))
        pics = decode_all(native, full)
        assert [p[0] for p in pics] == [1, 2, 3]
        iy, iu, iv = recon(native, pics[0])
        p = recon(native, pics[1], refs_f=(iy, iu, iv))
        by, _, _ = recon(native, pics[2], refs_f=(iy, iu, iv),
                         refs_b=p)
        want = ((iy.astype(int) + p[0].astype(int) + 1) >> 1) \
            .astype(np.uint8)
        np.testing.assert_array_equal(by, want)

    def test_skipped_mbs_repeat_vectors(self, native):
        es, _ = ref_stream()
        full = es + p_picture(0, 0) + b_picture((4, 0), (4, 0))
        pics = decode_all(native, full)
        mbinfo = pics[2][5]
        info = mbinfo.reshape(MBH, MBW, 12)
        # the middle MBs are skipped and repeat the first MB's vectors
        assert (info[:, 1:3, 0] & MBF_SKIPPED).all()
        assert not (info[:, 3, 0] & MBF_SKIPPED).any()
        assert (info[:, :, 1] == 4).all()
        assert (info[:, :, 5] == 4).all()


class TestImporterReordering:
    def test_ipb_display_order(self, native, tmp_path):
        """Importer end-to-end: decode order I P B -> display I B P."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        es, _ = ref_stream()
        full = es + p_picture(4, 0, temporal=2) \
            + b_picture((0, 0), (0, 0), temporal=1)
        p = tmp_path / "ipb.m2v"
        p.write_bytes(full)

        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mpeg", Job())
        imp.open(str(p))
        batch = imp.read_video_batch(8)
        y = batch["y"]
        assert y.shape[0] == 3
        # rebuild references to check order: I, then B=(I+P)/2, then P
        pics = decode_all(native, full)
        iy, iu, iv = recon(native, pics[0])
        pp = recon(native, pics[1], refs_f=(iy, iu, iv))
        bb = ((iy.astype(int) + pp[0].astype(int) + 1) >> 1) \
            .astype(np.uint8)
        np.testing.assert_array_equal(y[0], iy)
        np.testing.assert_array_equal(y[1], bb)
        np.testing.assert_array_equal(y[2], pp[0])
        imp.close()

    def test_intra_only_still_works(self, native, tmp_path):
        """The old intra path must keep decoding through the new
        reordering machinery."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        enc = Mpeg2Encoder(W, H, 25.0, qscale=4)
        es = bytearray()
        for i in range(4):
            yy, xx = np.mgrid[0:H, 0:W]
            y = ((xx + yy * 2 + i * 9) % 256).astype(np.uint8)
            u = np.full((H // 2, W // 2), 90 + i, np.uint8)
            v = np.full((H // 2, W // 2), 140, np.uint8)
            es += enc.encode_frame(y, u, v, with_seq=(i == 0))
        p = tmp_path / "intra.m2v"
        p.write_bytes(bytes(es))
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mpeg", Job())
        imp.open(str(p))
        batch = imp.read_video_batch(8)
        assert batch["y"].shape[0] == 4
        # frames come out in order: chroma identifies each
        assert [int(batch["u"][k, 0, 0]) for k in range(4)] \
            == [90, 91, 92, 93]
        imp.close()


def put_dmvector(w: BitWriter, v: int):
    """Table B-11: 0 -> '0', +1 -> '10', -1 -> '11'."""
    if v == 0:
        w.put(0, 1)
    elif v == 1:
        w.put(0b10, 2)
    else:
        w.put(0b11, 2)


def p_picture_dual(mvx, mvy, dmx, dmy, tff=1, temporal=1) -> bytes:
    """P picture, every MB dual-prime (motion_type 3, not coded).
    mvy is in FIELD half-pel units (dual prime parses field-format
    vertical)."""
    w = BitWriter()
    w.start_code(0x00)
    w.put(temporal, 10)
    w.put(2, 3)
    w.put(0xFFFF, 16)
    w.put(0b0111, 4)                   # full_pel=0 + f_code 111
    w.put(0, 1)
    picture_coding_ext(w, fpfd=0, tff=tff)
    for row in range(MBH):
        w.start_code(row + 1)
        w.put(2, 5)
        w.put(0, 1)
        for col in range(MBW):
            w.put(1, 1)                # MBA 1
            w.put(0b001, 3)            # P: MC only, not coded
            w.put(0b11, 2)             # frame_motion_type 3 = dual prime
            if col == 0:
                put_mv(w, mvx)
                put_dmvector(w, dmx)
                put_mv(w, mvy)
                put_dmvector(w, dmy)
            else:
                put_mv(w, 0)           # keep the predicted vector
                put_dmvector(w, dmx)
                put_mv(w, 0)
                put_dmvector(w, dmy)
    return w.bytes()


class TestDualPrime:
    def _field_ref_stream(self):
        """I frame whose top field is 100 and bottom field 200
        (field provenance is observable in every prediction)."""
        enc = Mpeg2Encoder(W, H, 25.0, qscale=1)
        y = np.empty((H, W), np.uint8)
        y[0::2] = 100
        y[1::2] = 200
        u = np.full((H // 2, W // 2), 128, np.uint8)
        v = u.copy()
        return enc.encode_frame(y, u, v, with_seq=True), y

    def test_zero_vector_averages_fields(self, native):
        """mv = dmv = 0: every pixel of each field averages its own
        field with the (interpolated) opposite field -> flat 150."""
        es, ref_y = self._field_ref_stream()
        es += p_picture_dual(0, 0, 0, 0)
        pics = decode_all(native, es)
        assert len(pics) == 2
        ptype, _, yc, uc, vc, mbinfo = pics[1]
        assert ptype == 2
        from tcforge_tpu.io.mpeg2codec import MBF_DUAL, MBF_FWD
        flags = mbinfo[:, 0]
        assert (flags & MBF_DUAL).all()
        assert (flags & MBF_FWD).all()
        ref = reconstruct_picture(*pics[0][2:6], MBW, MBH)
        out = reconstruct_picture(yc, uc, vc, mbinfo, MBW, MBH,
                                  fwd=ref, top_field_first=True)
        # interior rows: same-parity 100/200 averaged with opposite
        # parity 200/100 -> (100+200+1)>>1 = 150 everywhere
        np.testing.assert_array_equal(out[0][2:-2],
                                      np.full((H - 4, W), 150))

    def test_matches_independent_port(self, native):
        """Nonzero mv + dmvector vs a per-pixel port of 13818-2
        7.6.3.6 written independently here."""
        # textured reference with distinct fields
        enc = Mpeg2Encoder(W, H, 25.0, qscale=1)
        yy, xx = np.mgrid[0:H, 0:W]
        y = (((xx * 8 + yy * 16) % 200) + 20).astype(np.uint8)
        u = np.full((H // 2, W // 2), 128, np.uint8)
        es = enc.encode_frame(y, u, u, with_seq=True)
        for tff in (1, 0):
            mvx, mvy, dmx, dmy = 3, -2, 1, -1
            full = es + p_picture_dual(mvx, mvy, dmx, dmy, tff=tff)
            pics = decode_all(native, full)
            ref = reconstruct_picture(*pics[0][2:6], MBW, MBH)
            out = reconstruct_picture(*pics[1][2:6], MBW, MBH,
                                      fwd=ref, top_field_first=bool(tff))

            # ---- independent reference implementation ----
            refy = ref[0].astype(np.int64)

            def div2(v):
                return (v + (1 if v > 0 else 0)) >> 1

            m_t = 1 if tff else 3
            m_b = 3 if tff else 1
            vtx, vty = div2(mvx * m_t) + dmx, div2(mvy * m_t) + dmy - 1
            vbx, vby = div2(mvx * m_b) + dmx, div2(mvy * m_b) + dmy + 1

            def fpred(py, px, vx, vy, sel):
                # field prediction at frame pixel (py, px)
                f = py >> 1
                ix, hx = px + (vx >> 1), vx & 1
                fl, hy = f + (vy >> 1), vy & 1
                fmax = H // 2 - 1

                def s(ff, xx_):
                    return refy[sel + 2 * min(max(ff, 0), fmax),
                                min(max(xx_, 0), W - 1)]
                a = s(fl, ix)
                b = s(fl, ix + 1)
                c = s(fl + 1, ix)
                d = s(fl + 1, ix + 1)
                if hx and hy:
                    return (a + b + c + d + 2) >> 2
                if hx:
                    return (a + b + 1) >> 1
                if hy:
                    return (a + c + 1) >> 1
                return a

            want = np.zeros((H, W), np.int64)
            for py in range(H):
                for px in range(W):
                    par = py & 1
                    same = fpred(py, px, mvx, mvy, par)
                    if par == 0:
                        oth = fpred(py, px, vtx, vty, 1)
                    else:
                        oth = fpred(py, px, vbx, vby, 0)
                    want[py, px] = (same + oth + 1) >> 1
            np.testing.assert_array_equal(out[0],
                                          want.astype(np.uint8))

    def test_jax_matches_numpy(self, native):
        from tcforge_tpu.io.mpeg2codec import reconstruct_picture_jax
        es, _ = self._field_ref_stream()
        es += p_picture_dual(3, -2, 1, -1, tff=0)
        pics = decode_all(native, es)
        ref = reconstruct_picture(*pics[0][2:6], MBW, MBH)
        out_np = reconstruct_picture(*pics[1][2:6], MBW, MBH,
                                     fwd=ref, top_field_first=False)
        out_jx = reconstruct_picture_jax(*pics[1][2:6], MBW, MBH,
                                         fwd=ref, top_field_first=False)
        for a, b in zip(out_np, out_jx):
            np.testing.assert_array_equal(a, np.asarray(b))


class TestFieldDctIntra:
    def _field_dct_intra(self, a=80, b=160, temporal=0) -> bytes:
        """Intra frame picture with fpfd=0 and dct_type=1: the upper
        luma blocks hold field-0 lines (value a), the lower blocks
        field-1 lines (value b) -> decoded rows must ALTERNATE a,b."""
        from tcforge_tpu.io.mpeg2codec import DC_CHROMA, DC_LUMA
        w = BitWriter()
        w.start_code(0x00)
        w.put(temporal, 10)
        w.put(1, 3)
        w.put(0xFFFF, 16)
        w.put(0, 1)
        picture_coding_ext(w, fpfd=0)
        for row in range(MBH):
            w.start_code(row + 1)
            w.put(2, 5)
            w.put(0, 1)
            pred_y = pred_u = pred_v = 128
            for col in range(MBW):
                w.put(1, 1)            # MBA 1
                w.put(1, 1)            # intra
                w.put(1, 1)            # dct_type = 1 (field DCT)
                for val in (a, a, b, b):
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

    def test_importer_batch_path_deinterleaves(self, native, tmp_path):
        """The batched-intra fast path must NOT swallow field-DCT
        pictures (code-review finding: scrambled row interleave)."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        es, _ = ref_stream()
        full = es + self._field_dct_intra(temporal=1) \
            + b"\x00\x00\x01\xb7"
        p = tmp_path / "fdct.m2v"
        p.write_bytes(full)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mpeg", Job())
        imp.open(str(p))
        batch = imp.read_video_batch(4)
        y = batch["y"][1]
        np.testing.assert_array_equal(y[0::2], np.full((H // 2, W), 80))
        np.testing.assert_array_equal(y[1::2],
                                      np.full((H // 2, W), 160))
        imp.close()
