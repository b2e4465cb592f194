"""Tests for the stabilize/transform pair (filter/stabilize/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tcforge_tpu.core.formats import ImageFormat as F
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.job import FilterSpec, Job
import tcforge_tpu.modules  # noqa: F401
from tcforge_tpu.modules.filters.stabilize import (
    cleanmean, init_fields, preprocess_transforms, read_trf,
    smooth_transforms, warp_plane, write_trf)
from tcforge_tpu.modules.registry import ModuleKind, new_module

RNG = np.random.default_rng(7)


def yuv_batch(ys, first_id=0):
    y = np.stack(ys)
    n, h, w = y.shape
    c = np.full((n, h // 2, w // 2), 128, np.uint8)
    fb = FrameBatch.from_numpy(y=y, u=c, v=c, fmt=F.YUV420P)
    return FrameBatch(format=fb.format, y=fb.y, u=fb.u, v=fb.v,
                      attrs=fb.attrs,
                      frame_ids=jnp.arange(first_id, first_id + n,
                                           dtype=jnp.int32), fps=25.0)


def shaky_sequence(n=6, h=120, w=160, seed=3):
    """Textured base frame translated by a known per-frame jitter.
    Features are ~8 px wide (block-upsampled noise) so the SAD
    landscape has a basin the strided coarse search can fall into —
    per-pixel noise has none, which is why the reference pre-smooths
    frames with a blur before detection."""
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 256, (h // 8, w // 8), dtype=np.uint8)
    base = np.kron(small, np.ones((8, 8), np.uint8))
    jitter = [(0, 0), (2, 1), (-1, 3), (3, -2), (0, 2), (-2, -1)][:n]
    frames = [np.roll(base, (sy, sx), axis=(0, 1))
              for sx, sy in jitter]
    return frames, jitter


class TestTransformMath:
    def test_cleanmean_trims_pentiles(self):
        vals = np.array([100.0, 1.0, 2.0, 3.0, -50.0])
        m, mn, mx = cleanmean(vals)
        # len/5 = 1 trimmed from each end: mean of [1,2,3]
        assert m == pytest.approx(2.0)
        assert (mn, mx) == (1.0, 3.0)

    def test_smoothing_matches_reference_recurrence(self):
        """Golden test against a direct port of the C loop
        (preprocess_transforms, filter_transform.c:625-686)."""
        ts = RNG.normal(size=(40, 4))
        smoothing = 3
        s = smoothing * 2 + 1
        tau = 1.0 / (3 * s)
        orig = ts.copy()
        want = ts.copy()
        s_sum = np.zeros(4)
        for i in range(smoothing):
            s_sum += orig[i] if i < len(orig) else 0
        avg2 = np.zeros(4)
        for i in range(len(orig)):
            old = orig[i - smoothing - 1] if i - smoothing - 1 >= 0 \
                else np.zeros(4)
            new = orig[i + smoothing] if i + smoothing < len(orig) \
                else np.zeros(4)
            s_sum = s_sum - old + new
            avg = s_sum / s
            want[i] = orig[i] - avg
            avg2 = avg2 * (1 - tau) + want[i] * tau
            want[i] = want[i] - avg2
        got = smooth_transforms(ts, smoothing)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_relative_to_absolute(self):
        ts = np.array([[1, 0, 0, 0], [2, 1, 0, 0], [-1, 1, 0, 0]],
                      float)
        out = preprocess_transforms(ts, 100, 100, smoothing=0, invert=0,
                                    relative=1, maxshift=-1,
                                    maxangle=-1.0, zoom=0.0, optzoom=0)
        np.testing.assert_allclose(out[:, 0], [1, 3, 2])
        np.testing.assert_allclose(out[:, 1], [0, 1, 2])

    def test_optzoom_adds_zoom(self):
        ts = np.zeros((20, 4))
        ts[:, 0] = np.linspace(-8, 8, 20)
        out = preprocess_transforms(ts, 100, 100, smoothing=0, invert=0,
                                    relative=0, maxshift=-1,
                                    maxangle=-1.0, zoom=0.0, optzoom=1)
        assert (out[:, 3] > 0).all()

    def test_trf_roundtrip(self, tmp_path):
        ts = [np.array([1.5, -2.25, 0.01, 0.0]),
              np.array([0.0, 3.0, -0.02, 1.5])]
        p = tmp_path / "t.trf"
        write_trf(str(p), ts, {"algo": 1})
        back = read_trf(str(p))
        np.testing.assert_allclose(back, np.stack(ts), atol=1e-4)

    def test_init_fields_inside_frame(self):
        centers = init_fields(160, 120, 12, 12, 6)
        border = 12 // 2 + 12 + 6
        assert (centers[:, 0] >= border).all()
        assert (centers[:, 0] <= 160 - border).all()
        assert (centers[:, 1] >= border).all()
        assert (centers[:, 1] <= 120 - border).all()


class TestWarpPlane:
    def test_pure_translation_integer(self):
        img = RNG.integers(0, 256, (32, 48), dtype=np.uint8)
        out = np.asarray(warp_plane(
            jnp.asarray(img), jnp.float32(5.0), jnp.float32(-3.0),
            jnp.float32(0.0), jnp.float32(0.0), interp=2, crop=1,
            default_val=16, rotation_threshold=0.004))
        # dest[x] = src[x - tx]: content moves right by 5, up by 3
        np.testing.assert_array_equal(out[:, :5], 16)
        np.testing.assert_array_equal(out[29:, :], 16)
        np.testing.assert_array_equal(out[0:29, 5:], img[3:, :-5])

    def test_crop_keep_border(self):
        img = np.full((16, 16), 99, np.uint8)
        out = np.asarray(warp_plane(
            jnp.asarray(img), jnp.float32(4.0), jnp.float32(0.0),
            jnp.float32(0.0), jnp.float32(0.0), interp=2, crop=0,
            default_val=16, rotation_threshold=0.004))
        # crop=0 keeps the original pixel where the source is off-frame
        np.testing.assert_array_equal(out, img)

    def test_rotation_bilinear_against_numpy(self):
        """90-degree rotation via the interpolated path must land on
        exact pixels (cos=0, sin=1)."""
        img = RNG.integers(0, 256, (33, 33), dtype=np.uint8)
        out = np.asarray(warp_plane(
            jnp.asarray(img), jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(np.pi / 2), jnp.float32(0.0), interp=2, crop=1,
            default_val=16, rotation_threshold=0.004))
        # p_s = R(-alpha) p_d around the center (16.5, 16.5):
        # x_s = cos(-a)x + sin(-a)y -> for a=90deg: x_s=-y_d1, y_s=x_d1
        c = 33 / 2.0
        yy, xx = np.mgrid[0:33, 0:33].astype(np.float64)
        x_s = -(yy - c) + c
        y_s = (xx - c) + c
        # half-pixel centers: x_s like 16.5 -> bilinear of 2 px
        inner = (x_s >= 1) & (x_s < 32) & (y_s >= 1) & (y_s < 32)
        xf = np.floor(x_s).astype(int)
        yf = np.floor(y_s).astype(int)
        frac_x = x_s - xf
        frac_y = y_s - yf
        v = (img[np.clip(yf + 1, 0, 32), np.clip(xf + 1, 0, 32)]
             * frac_x * frac_y
             + img[np.clip(yf, 0, 32), np.clip(xf + 1, 0, 32)]
             * frac_x * (1 - frac_y)
             + img[np.clip(yf + 1, 0, 32), np.clip(xf, 0, 32)]
             * (1 - frac_x) * frac_y
             + img[np.clip(yf, 0, 32), np.clip(xf, 0, 32)]
             * (1 - frac_x) * (1 - frac_y))
        want = np.trunc(v).astype(np.uint8)
        assert np.abs(out[inner].astype(int)
                      - want[inner].astype(int)).max() <= 1

    def test_zoom_shrinks_content(self):
        img = np.zeros((32, 32), np.uint8)
        img[:, 16:] = 200                # right half bright
        out = np.asarray(warp_plane(
            jnp.asarray(img), jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(0.0), jnp.float32(20.0), interp=2, crop=1,
            default_val=16, rotation_threshold=0.004))
        # zoom>0 magnifies (z = 1 - zoom/100 < 1): the edge at x=16
        # stays near the center but the sampled region shrinks
        edge = int(np.argmax(out[16] > 100))
        assert 14 <= edge <= 18

    def test_interp_modes_all_run(self):
        img = RNG.integers(0, 256, (24, 24), dtype=np.uint8)
        for mode in range(5):
            out = np.asarray(warp_plane(
                jnp.asarray(img), jnp.float32(0.7), jnp.float32(-0.3),
                jnp.float32(0.05), jnp.float32(0.0), interp=mode,
                crop=1, default_val=16, rotation_threshold=0.004))
            assert out.shape == img.shape
            assert out.dtype == np.uint8


class TestStabilizeDetection:
    def test_global_translation_detected(self):
        frames, jitter = shaky_sequence()
        filt = new_module(ModuleKind.FILTER, "stabilize", Job(),
                          "shakiness=4:stepsize=2")
        st = filt.init_state(160, 120, F.YUV420P)
        _, st = filt.apply(yuv_batch(frames), st)
        filt.collect(st)
        assert len(filt.transforms) == len(frames)
        # frame k is base rolled by jitter[k]; detected transform is
        # prev->curr relative shift: -(jitter[k] - jitter[k-1])
        for k in range(1, len(frames)):
            dx = jitter[k][0] - jitter[k - 1][0]
            dy = jitter[k][1] - jitter[k - 1][1]
            t = filt.transforms[k]
            assert t[0] == pytest.approx(-dx, abs=0.5)
            assert t[1] == pytest.approx(-dy, abs=0.5)

    def test_first_frame_null(self):
        frames, _ = shaky_sequence(n=2)
        filt = new_module(ModuleKind.FILTER, "stabilize", Job(), "")
        st = filt.init_state(160, 120, F.YUV420P)
        _, st = filt.apply(yuv_batch(frames), st)
        filt.collect(st)
        np.testing.assert_allclose(filt.transforms[0], 0)

    def test_batch_boundary_invariance(self):
        """Splitting the stream across two batches must give the same
        transforms (the prev-frame carry crosses batches)."""
        frames, _ = shaky_sequence(n=6)
        opts = "shakiness=4:stepsize=2"

        f1 = new_module(ModuleKind.FILTER, "stabilize", Job(), opts)
        st = f1.init_state(160, 120, F.YUV420P)
        _, st = f1.apply(yuv_batch(frames), st)
        f1.collect(st)

        f2 = new_module(ModuleKind.FILTER, "stabilize", Job(), opts)
        st = f2.init_state(160, 120, F.YUV420P)
        _, st = f2.apply(yuv_batch(frames[:3]), st)
        f2.collect(st)
        _, st = f2.apply(yuv_batch(frames[3:], first_id=3), st)
        f2.collect(st)

        np.testing.assert_allclose(np.stack(f1.transforms),
                                   np.stack(f2.transforms), atol=1e-9)

    def test_algo0_brute_force(self):
        base = RNG.integers(0, 256, (48, 64), dtype=np.uint8)
        frames = [base, np.roll(base, (1, 2), axis=(0, 1))]
        filt = new_module(ModuleKind.FILTER, "stabilize", Job(),
                          "algo=0:shakiness=3")
        st = filt.init_state(64, 48, F.YUV420P)
        _, st = filt.apply(yuv_batch(frames), st)
        filt.collect(st)
        t = filt.transforms[1]
        assert (t[0], t[1]) == (-2, -1)


class TestEndToEnd:
    def test_two_pass_stabilization(self, tmp_path):
        """Pass 1 writes the .trf; pass 2 with smoothing=0 undoes the
        camera shake exactly (interior pixels match frame 0)."""
        frames, jitter = shaky_sequence(n=6)
        trf = tmp_path / "shake.trf"

        stab = new_module(ModuleKind.FILTER, "stabilize", Job(),
                          f"result={trf}:shakiness=4:stepsize=2")
        st = stab.init_state(160, 120, F.YUV420P)
        _, st = stab.apply(yuv_batch(frames), st)
        stab.collect(st)
        stab.finalize(st)
        assert trf.exists()

        tr = new_module(
            ModuleKind.FILTER, "transform", Job(),
            f"input={trf}:smoothing=0:optzoom=0:sharpen=0:crop=1")
        st = tr.init_state(160, 120, F.YUV420P)
        out, _ = tr.apply(yuv_batch(frames), st)
        oy = np.asarray(out.y)
        # interior region (away from crop borders) must match frame 0
        ref = frames[0][20:100, 20:140].astype(int)
        for k in range(len(frames)):
            got = oy[k, 20:100, 20:140].astype(int)
            assert np.abs(got - ref).max() <= 1, f"frame {k}"

    def test_pipeline_integration(self, tmp_path):
        """The engine's collect/finalize hooks drive stabilize through
        a real Pipeline run."""
        from tcforge_tpu.io import y4m
        from tcforge_tpu.pipeline.engine import Pipeline

        frames, _ = shaky_sequence(n=6)
        src = tmp_path / "in.y4m"
        c = np.full((120 // 2, 160 // 2), 128, np.uint8)
        hdr = y4m.Y4MHeader(width=160, height=120, fps_num=25, fps_den=1)
        with y4m.Y4MWriter(str(src), hdr) as w:
            for f in frames:
                w.write_frame(f, c, c)
        trf = tmp_path / "out.trf"
        job = Job(video_in_file=str(src), im_v_module="y4m",
                  video_out_file=str(tmp_path / "o.y4m"),
                  ex_v_module="raw", ex_m_module="y4m", batch_size=3,
                  filters=[FilterSpec(
                      "stabilize",
                      f"result={trf}:shakiness=4:stepsize=2")])
        counters = Pipeline(job).run(progress=False)
        assert counters.encoded == 6
        ts = read_trf(str(trf))
        assert ts.shape == (6, 4)
        assert np.abs(ts[1:, :2]).max() > 0.5   # shake was detected

    def test_transform_missing_file(self):
        with pytest.raises(ValueError):
            new_module(ModuleKind.FILTER, "transform", Job(),
                       "input=/nonexistent/x.trf")
