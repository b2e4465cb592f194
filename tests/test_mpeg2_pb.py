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


def picture_coding_ext(w: BitWriter, fc=2):
    w.start_code(0xB5)
    w.put(0b1000, 4)
    for _ in range(4):
        w.put(fc, 4)                   # f_codes
    w.put(0, 2)                        # intra_dc_precision
    w.put(0b11, 2)                     # frame picture
    w.put(0, 1)
    w.put(1, 1)                        # frame_pred_frame_dct
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
