"""Native host-IO library tests: parity with the pure-Python paths."""

import numpy as np
import pytest

from tcforge_tpu import native
from tcforge_tpu.io.y4m import Y4MHeader, Y4MReader, Y4MWriter
from tcforge_tpu.io.avi import AviVideoStream, AviWriter
from tcforge_tpu.io import rawio
from tcforge_tpu.core.formats import ImageFormat as F

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")
RNG = np.random.default_rng(77)


class TestNativeY4M:
    def test_read_parity(self, tmp_path):
        p = tmp_path / "t.y4m"
        frames = [(RNG.integers(0, 256, (16, 32), dtype=np.uint8),
                   RNG.integers(0, 256, (8, 16), dtype=np.uint8),
                   RNG.integers(0, 256, (8, 16), dtype=np.uint8))
                  for _ in range(5)]
        with Y4MWriter(str(p), Y4MHeader(width=32, height=16,
                                         fps_num=30000,
                                         fps_den=1001)) as w:
            for fr in frames:
                w.write_frame(*fr)
        r = native.NativeY4MReader(str(p))
        assert (r.width, r.height) == (32, 16)
        assert r.fps == pytest.approx(30000 / 1001)
        b1 = r.read_batch(3)
        b2 = r.read_batch(3)
        assert b1[0].shape == (3, 16, 32)
        assert b2[0].shape == (2, 16, 32)
        assert r.read_batch(1) is None
        for i in range(3):
            np.testing.assert_array_equal(b1[0][i], frames[i][0])
            np.testing.assert_array_equal(b1[1][i], frames[i][1])
        np.testing.assert_array_equal(b2[2][1], frames[4][2])
        r.close()

    def test_write_parity(self, tmp_path):
        p = tmp_path / "n.y4m"
        w = native.NativeY4MWriter(str(p), 16, 8, 25, 1, "420")
        data = RNG.integers(0, 256, (2, 16 * 8 * 3 // 2), dtype=np.uint8)
        assert w.write_packed(data, 2) == 2
        w.close()
        with Y4MReader(str(p)) as r:
            fr = r.read_frame()
            np.testing.assert_array_equal(
                fr[0].reshape(-1), data[0][:128])

    def test_importer_uses_native(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        p = tmp_path / "t.y4m"
        with Y4MWriter(str(p), Y4MHeader(width=8, height=8)) as w:
            w.write_frame(np.full((8, 8), 9, np.uint8),
                          np.full((4, 4), 128, np.uint8),
                          np.full((4, 4), 128, np.uint8))
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "y4m", Job())
        imp.open(str(p))
        assert imp._native is not None
        planes = imp.read_video_batch(4)
        assert planes["y"].shape == (1, 8, 8)
        assert planes["y"][0, 0, 0] == 9
        imp.close()


class TestNativeAvi:
    def test_scan_movi_parity(self, tmp_path):
        from tcforge_tpu.io.avi import AviReader
        p = tmp_path / "t.avi"
        vs = AviVideoStream(fourcc="I420", width=8, height=8, fps=25.0)
        with AviWriter(str(p), vs) as w:
            for i in range(5):
                w.write_video_frame(bytes([i]) * 96)
        rd = AviReader(str(p))
        offs, sizes, kinds = native.avi_scan_movi(str(p),
                                                  rd._movi_start + 4)
        assert len(offs) == 5
        assert (kinds == 0).all()
        want = [(o, s) for (o, s, f) in rd._video_index]
        got = [(int(o), int(s)) for o, s in zip(offs, sizes)]
        assert got == want
        rd.close()


class TestNativeShuffles:
    def test_yuy2(self):
        y, u, v = (RNG.integers(0, 256, (4, 8), dtype=np.uint8),
                   RNG.integers(0, 256, (4, 4), dtype=np.uint8),
                   RNG.integers(0, 256, (4, 4), dtype=np.uint8))
        packed = np.frombuffer(rawio.pack_frame((y, u, v), F.YUY2),
                               np.uint8)
        ny, nu, nv = native.yuy2_to_planar(packed, 8, 4)
        np.testing.assert_array_equal(ny, y)
        np.testing.assert_array_equal(nu, u)
        np.testing.assert_array_equal(nv, v)


class TestNativeIdct:
    def test_bit_identical_to_float64_reference(self):
        from tcforge_tpu import native
        if not native.idct_available():
            import pytest
            pytest.skip("native lib without tc_idct_intra_batch")
        from tcforge_tpu.io.mpeg2codec import _dct_basis
        rng = np.random.default_rng(3)
        n, bh, bw = 3, 12, 22
        coef = rng.integers(-2048, 2048, (n, bh, bw, 64)) \
            .astype(np.int32)
        got = native.idct_intra_batch(coef)
        b = _dct_basis()
        c = coef.astype(np.float64).reshape(n, bh, bw, 8, 8)
        pix = b.T @ (c @ b)
        ref = np.clip(np.round(
            pix.transpose(0, 1, 3, 2, 4).reshape(n, bh * 8, bw * 8)),
            0, 255).astype(np.uint8)
        np.testing.assert_array_equal(got, ref)


class TestEncoderHelpers:
    """Golden tests for the B-picture / mode-decision native kernels
    (tc_bisad / tc_b_select_pred / tc_mb_act / tc_mc_pred_half SIMD
    fast path) vs the numpy formulas they replaced in
    io/mpeg2enc._b_native / _p_native."""

    def setup_method(self):
        if not native.available() or not hasattr(
                native.load(), "tc_bisad"):
            pytest.skip("native lib without encoder helpers")

    def test_bisad_golden(self):
        rng = np.random.default_rng(0)
        f = rng.integers(0, 255, (64, 96), np.uint8)
        b = rng.integers(0, 255, (64, 96), np.uint8)
        c = rng.integers(0, 255, (64, 96), np.uint8)
        bi = (f.astype(np.int32) + b.astype(np.int32) + 1) // 2
        want = np.abs(bi - c.astype(np.int32)) \
            .reshape(4, 16, 6, 16).sum(axis=(1, 3))
        np.testing.assert_array_equal(native.bisad(f, b, c), want)

    def test_b_select_pred_golden(self):
        rng = np.random.default_rng(1)
        for mb, shape in ((16, (64, 96)), (8, (32, 48))):
            f = rng.integers(0, 255, shape, np.uint8)
            b = rng.integers(0, 255, shape, np.uint8)
            mode = rng.integers(0, 3, (4, 6)).astype(np.int32)
            bi = ((f.astype(np.int32) + b.astype(np.int32) + 1) // 2) \
                .astype(np.uint8)
            want = np.empty_like(f)
            for by in range(4):
                for bx in range(6):
                    sl = np.s_[by * mb:(by + 1) * mb,
                               bx * mb:(bx + 1) * mb]
                    want[sl] = (f[sl], b[sl], bi[sl])[mode[by, bx]]
            np.testing.assert_array_equal(
                native.b_select_pred(f, b, mode, mb), want)

    def test_mb_act_exact_integer_form(self):
        rng = np.random.default_rng(2)
        y = rng.integers(0, 255, (64, 96), np.uint8)
        s = y.reshape(4, 16, 6, 16).sum(axis=(1, 3), dtype=np.int64)
        acc = np.abs(256 * y.reshape(4, 16, 6, 16).astype(np.int64)
                     - s[:, None, :, None]).sum(axis=(1, 3))
        np.testing.assert_array_equal(native.mb_act(y), acc // 256)

    def test_mc_pred_half_simd_matches_scalar(self):
        rng = np.random.default_rng(3)
        ref = rng.integers(0, 255, (64, 96), np.uint8)
        # vectors spanning interior AND border-clamped windows
        mvh = rng.integers(-36, 36, (4, 6, 2)).astype(np.int32)
        got = native.mc_pred_half(ref, mvh, 16)
        h, w = ref.shape
        out = np.empty_like(ref)
        for by in range(4):
            for bx in range(6):
                vy, vx = int(mvh[by, bx, 0]), int(mvh[by, bx, 1])
                iy, ix = vy >> 1, vx >> 1
                hy, hx = vy & 1, vx & 1
                for r in range(16):
                    yy = by * 16 + r
                    y0 = min(max(yy + iy, 0), h - 1)
                    y1 = min(max(yy + iy + 1, 0), h - 1)
                    for cc in range(16):
                        xx = bx * 16 + cc
                        x0 = min(max(xx + ix, 0), w - 1)
                        x1 = min(max(xx + ix + 1, 0), w - 1)
                        a = int(ref[y0, x0])
                        b = int(ref[y0, x1])
                        c = int(ref[y1, x0])
                        d = int(ref[y1, x1])
                        if hx and hy:
                            p = (a + b + c + d + 2) >> 2
                        elif hx:
                            p = (a + b + 1) >> 1
                        elif hy:
                            p = (a + c + 1) >> 1
                        else:
                            p = a
                        out[yy, xx] = p
        np.testing.assert_array_equal(got, out)


class TestEncoderBlockKernels:
    """The round-3 encode-path additions: levels-only inter pipeline
    (B pictures), selected-block intra (P intra/inter decision),
    MB-interleaved level output, fused B chroma MC+select, and the
    mpsadbw/early-exit ME — all must stay bit-identical to the
    full-plane kernels they shortcut."""

    def setup_method(self):
        if not native.available() or not hasattr(
                native.load(), "tc_enc_inter_levels"):
            pytest.skip("native lib without encoder block kernels")

    def _scan_w(self):
        from tcforge_tpu.io.mpeg2enc import (DEFAULT_INTRA_MATRIX,
                                             ZIGZAG)
        return (np.asarray(ZIGZAG, np.int32),
                np.asarray(DEFAULT_INTRA_MATRIX, np.int32).reshape(64))

    def test_inter_levels_match_plane(self):
        rng = np.random.default_rng(4)
        scan, _ = self._scan_w()
        cur = rng.integers(0, 256, (48, 64), np.uint8)
        pred = rng.integers(0, 256, (48, 64), np.uint8)
        for qs in (2, 8, 31):
            lv1, _ = native.enc_inter_plane(cur, pred, qs, scan)
            lv2 = native.enc_inter_levels(cur, pred, qs, scan)
            np.testing.assert_array_equal(lv1, lv2)

    def test_inter_zero_block_recon_is_pred(self):
        rng = np.random.default_rng(5)
        scan, _ = self._scan_w()
        cur = rng.integers(0, 256, (32, 32), np.uint8)
        lv, rec = native.enc_inter_plane(cur, cur, 8, scan)
        assert not lv.any()
        np.testing.assert_array_equal(rec, cur)

    def test_intra_sel_matches_full_plane(self):
        rng = np.random.default_rng(6)
        scan, W = self._scan_w()
        plane = rng.integers(0, 256, (48, 64), np.uint8)
        lvf, recf = native.enc_intra_plane(plane, 8, W, scan)
        rec = rng.integers(0, 256, (48, 64), np.uint8)
        keep = rec.copy()
        bys = np.asarray([0, 1, 5], np.int32)
        bxs = np.asarray([2, 7, 0], np.int32)
        lvs = native.enc_intra_sel(plane, 8, W, scan, bys, bxs, rec)
        mask = np.ones((48, 64), bool)
        for k, (by, bx) in enumerate(zip(bys, bxs)):
            sl = np.s_[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            np.testing.assert_array_equal(lvs[k], lvf[by, bx])
            np.testing.assert_array_equal(rec[sl], recf[sl])
            mask[sl] = False
        np.testing.assert_array_equal(rec[mask], keep[mask])

    def test_mb_interleaved_slots_match_host_interleave(self):
        from tcforge_tpu.io.mpeg2enc import _np_interleave16
        rng = np.random.default_rng(7)
        scan, W = self._scan_w()
        y = rng.integers(0, 256, (48, 64), np.uint8)
        u = rng.integers(0, 256, (24, 32), np.uint8)
        v = rng.integers(0, 256, (24, 32), np.uint8)
        py = rng.integers(0, 256, (48, 64), np.uint8)
        pu = rng.integers(0, 256, (24, 32), np.uint8)
        pv = rng.integers(0, 256, (24, 32), np.uint8)
        mbh, mbw = 3, 4
        out = np.empty((mbh * mbw, 6, 64), np.int16)
        native.enc_inter_levels(y, py, 8, scan, slot=-1, out=out)
        native.enc_inter_levels(u, pu, 8, scan, slot=4, out=out)
        native.enc_inter_levels(v, pv, 8, scan, slot=5, out=out)
        want = _np_interleave16(
            native.enc_inter_levels(y, py, 8, scan),
            native.enc_inter_levels(u, pu, 8, scan),
            native.enc_inter_levels(v, pv, 8, scan), mbh, mbw)
        np.testing.assert_array_equal(out, want)
        # intra variant through the same slots
        out2 = np.empty_like(out)
        native.enc_intra_plane(y, 8, W, scan, slot=-1, out=out2)
        native.enc_intra_plane(u, 8, W, scan, slot=4, out=out2)
        native.enc_intra_plane(v, 8, W, scan, slot=5, out=out2)
        want2 = _np_interleave16(
            native.enc_intra_plane(y, 8, W, scan)[0],
            native.enc_intra_plane(u, 8, W, scan)[0],
            native.enc_intra_plane(v, 8, W, scan)[0], mbh, mbw)
        np.testing.assert_array_equal(out2, want2)

    def test_b_mc_sel_pred_matches_two_pass(self):
        rng = np.random.default_rng(8)
        f = rng.integers(0, 256, (32, 48), np.uint8)
        b = rng.integers(0, 256, (32, 48), np.uint8)
        fmv = rng.integers(-12, 13, (4, 6, 2)).astype(np.int32)
        bmv = rng.integers(-12, 13, (4, 6, 2)).astype(np.int32)
        mode = rng.integers(0, 3, (4, 6)).astype(np.int32)
        want = native.b_select_pred(native.mc_pred_half(f, fmv, 8),
                                    native.mc_pred_half(b, bmv, 8),
                                    mode, 8)
        got = native.b_mc_sel_pred(f, b, fmv, bmv, mode, 8)
        np.testing.assert_array_equal(got, want)

    def test_me16_matches_jax_reference(self):
        import jax.numpy as jnp
        from tcforge_tpu.io import mpeg2enc as M
        rng = np.random.default_rng(9)
        base = rng.integers(0, 256, (80, 144), np.uint8)
        ref = base[8:72, 8:136].copy()
        cur = np.roll(base, (3, -2), axis=(0, 1))[8:72, 8:136]
        cur = np.clip(cur.astype(np.int16)
                      + rng.integers(-6, 7, cur.shape),
                      0, 255).astype(np.uint8)
        for r in (4, 8):
            mv, _ = M.motion_search(jnp.asarray(ref),
                                    jnp.asarray(cur), r)
            mj, sj = M.halfpel_refine(jnp.asarray(ref),
                                      jnp.asarray(cur),
                                      jnp.asarray(mv))
            mn, sn = native.me16_refine(ref, cur, r)
            np.testing.assert_array_equal(np.asarray(mj), mn)
            np.testing.assert_array_equal(np.asarray(sj), sn)
