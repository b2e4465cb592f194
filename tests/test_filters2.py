"""Tests for dnr, logo/logoaway, fieldanalysis, image IO and sequences."""

import numpy as np
import jax.numpy as jnp
import pytest

from tcforge_tpu.core.formats import ImageFormat as F
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.job import FilterSpec, Job
from tcforge_tpu.io.image import list_sequence, read_image, write_image
import tcforge_tpu.modules  # noqa: F401
from tcforge_tpu.modules.registry import ModuleKind, new_module

RNG = np.random.default_rng(88)


def yuv_batch(ys):
    y = np.stack(ys)
    n, h, w = y.shape
    c = np.full((n, h // 2, w // 2), 128, np.uint8)
    return FrameBatch.from_numpy(y=y, u=c, v=c, fmt=F.YUV420P)


class TestImageIO:
    def test_ppm_roundtrip(self, tmp_path):
        img = RNG.integers(0, 256, (8, 12, 3), dtype=np.uint8)
        p = tmp_path / "t.ppm"
        write_image(str(p), img)
        back = read_image(str(p))
        np.testing.assert_array_equal(back, img)

    def test_pgm_roundtrip(self, tmp_path):
        img = RNG.integers(0, 256, (6, 10), dtype=np.uint8)
        p = tmp_path / "t.pgm"
        write_image(str(p), img)
        np.testing.assert_array_equal(read_image(str(p)), img)

    def test_ppm_with_comment(self, tmp_path):
        p = tmp_path / "c.ppm"
        p.write_bytes(b"P6\n# a comment\n2 2\n255\n" + bytes(12))
        img = read_image(str(p))
        assert img.shape == (2, 2, 3)

    def test_sequence(self, tmp_path):
        for i in range(3):
            write_image(str(tmp_path / f"f{i:03d}.ppm"),
                        np.zeros((4, 4, 3), np.uint8))
        files = list_sequence(str(tmp_path))
        assert len(files) == 3
        assert files == sorted(files)


class TestImageModules:
    def test_sequence_pipeline(self, tmp_path):
        from tcforge_tpu.pipeline.engine import Pipeline
        for i in range(4):
            write_image(str(tmp_path / f"in{i:02d}.ppm"),
                        np.full((16, 16, 3), i * 40, np.uint8))
        job = Job(video_in_file=str(tmp_path), im_v_module="im",
                  video_out_file=str(tmp_path / "out.ppm"),
                  ex_m_module="im", batch_size=4,
                  im_colorspace=F.RGB24)
        c = Pipeline(job).run(progress=False)
        assert c.encoded == 4
        outs = sorted(tmp_path.glob("out-*.ppm"))
        assert len(outs) == 4
        img = read_image(str(outs[2]))
        assert img[0, 0, 0] == 80


class TestDnr:
    def test_static_noise_locked(self):
        base = np.full((30, 16, 16), 100, np.int16)
        noisy = (base + RNG.integers(-3, 4, base.shape)).clip(0, 255) \
            .astype(np.uint8)
        filt = new_module(ModuleKind.FILTER, "dnr", Job(), "")
        st = filt.init_state(16, 16, F.YUV420P)
        out, _ = filt.apply(yuv_batch(list(noisy)), st)
        oy = np.asarray(out.y).astype(float)
        # later frames should be much flatter than the input
        assert oy[10:].std() < noisy[10:].std() * 0.5

    def test_scene_change_passthrough(self):
        a = np.full((16, 16), 40, np.uint8)
        b = np.full((16, 16), 200, np.uint8)   # hard cut
        filt = new_module(ModuleKind.FILTER, "dnr", Job(), "")
        st = filt.init_state(16, 16, F.YUV420P)
        out, _ = filt.apply(yuv_batch([a, a, b, b]), st)
        oy = np.asarray(out.y)
        np.testing.assert_array_equal(oy[2], b)   # scene change passes


class TestLogo:
    def test_overlay(self, tmp_path):
        logo = np.full((4, 6, 3), 255, np.uint8)
        lp = tmp_path / "logo.ppm"
        write_image(str(lp), logo)
        filt = new_module(ModuleKind.FILTER, "logo", Job(),
                          f"file={lp}:pos=2x3")
        rgb = np.zeros((2, 16, 16, 3), np.uint8)
        fb = FrameBatch.from_numpy(rgb=rgb, fmt=F.RGB24)
        out, _ = filt.apply(fb, None)
        o = np.asarray(out.rgb)
        assert (o[:, 3:7, 2:8] == 255).all()
        assert (o[:, 0:3, :] == 0).all()

    def test_missing_file(self):
        with pytest.raises(ValueError):
            new_module(ModuleKind.FILTER, "logo", Job(), "")

    def test_logoaway(self):
        y = np.full((16, 16), 60, np.uint8)
        y[5:7, 5:11] = 250                      # "logo" inside the region
        filt = new_module(ModuleKind.FILTER, "logoaway", Job(),
                          "pos=4x4:size=8x4:mode=2")
        out, _ = filt.apply(yuv_batch([y]), None)
        region = np.asarray(out.y)[0, 4:8, 4:12].astype(float)
        assert abs(region.mean() - 60) < 4      # interpolated from borders


def _c_blend(src, dest, alpha):
    """filter_logoaway.c:125 alpha_blending, C integer semantics."""
    return ((alpha * (int(src) - int(dest))) >> 8) + int(dest) & 0xFF


def _c_yuv_xy(y, u, v, xpos, ypos, width, height, xw):
    """Direct sequential port of process_frame_yuv_xy
    (filter_logoaway.c:458-550); width/height are absolute ends."""
    yweight = 100 - xw
    y = y.astype(np.int64)
    u = u.astype(np.int64)
    v = v.astype(np.int64)
    xd, yd = 256 // (width - xpos), 256 // (height - ypos)
    for row in range(ypos, height):
        av = yd * (height - row)
        for col in range(xpos, width):
            ah = xd * (width - col)
            h = _c_blend(y[row, xpos], y[row, width], ah)
            vv = _c_blend(y[ypos, col], y[height, col], av)
            y[row, col] = (h * xw + vv * yweight) // 100
    cxd, cyd = 512 // (width - xpos), 512 // (height - ypos)
    for pl in (u, v):
        for row in range(ypos // 2 + 1, height // 2):
            av = cyd * (height // 2 - row)
            for col in range(xpos // 2 + 1, width // 2):
                ah = cxd * (width // 2 - col)
                h = _c_blend(pl[row, xpos // 2], pl[row, width // 2], ah)
                vv = _c_blend(pl[ypos // 2, col], pl[height // 2, col], av)
                pl[row, col] = (h * xw + vv * yweight) // 100
    return y.astype(np.uint8), u.astype(np.uint8), v.astype(np.uint8)


class TestLogoAwayGolden:
    def _batch(self, seed=7, hw=(32, 48)):
        rng = np.random.RandomState(seed)
        h, w = hw
        y = rng.randint(0, 256, (h, w), np.int64).astype(np.uint8)
        u = rng.randint(0, 256, (h // 2, w // 2), np.int64).astype(np.uint8)
        v = rng.randint(0, 256, (h // 2, w // 2), np.int64).astype(np.uint8)
        return y, u, v

    @pytest.mark.parametrize("pos,size,xw", [
        ((8, 6), (20, 14), 50), ((5, 3), (7, 9), 30), ((0, 0), (13, 11), 80)])
    def test_xy_bit_exact(self, pos, size, xw):
        y, u, v = self._batch()
        gy, gu, gv = _c_yuv_xy(y.copy(), u.copy(), v.copy(),
                               pos[0], pos[1], pos[0] + size[0],
                               pos[1] + size[1], xw)
        filt = new_module(
            ModuleKind.FILTER, "logoaway", Job(),
            f"pos={pos[0]}x{pos[1]}:size={size[0]}x{size[1]}"
            f":mode=2:xweight={xw}")
        fb = FrameBatch.from_numpy(y=y[None], u=u[None], v=v[None],
                                   fmt=F.YUV420P)
        out, _ = filt.apply(fb, None)
        np.testing.assert_array_equal(np.asarray(out.y)[0], gy)
        np.testing.assert_array_equal(np.asarray(out.u)[0], gu)
        np.testing.assert_array_equal(np.asarray(out.v)[0], gv)

    def test_solid_and_range(self):
        y, u, v = self._batch(3)
        filt = new_module(ModuleKind.FILTER, "logoaway", Job(),
                          "pos=4x4:size=10x8:mode=1:fill=FF8040:range=0-0")
        fb = FrameBatch.from_numpy(y=np.stack([y, y]), u=np.stack([u, u]),
                                   v=np.stack([v, v]), fmt=F.YUV420P)
        out, _ = filt.apply(fb, None)
        oy = np.asarray(out.y)
        # BT.601 of (255,128,64): filter_logoaway.c:866
        yc = int(0.257 * 255 + 0.504 * 128 + 0.098 * 64 + 16)
        assert (oy[0, 4:12, 4:14] == yc).all()
        np.testing.assert_array_equal(oy[1], y)   # frame 1 outside range

    def test_shape_mode(self, tmp_path):
        y, u, v = self._batch(11)
        alpha = np.zeros((8, 10), np.uint8)
        alpha[:, :3] = 255                        # keep left strip
        ap = tmp_path / "alpha.pgm"
        write_image(str(ap), alpha)
        filt = new_module(ModuleKind.FILTER, "logoaway", Job(),
                          f"pos=4x4:size=10x8:mode=3:file={ap}")
        fb = FrameBatch.from_numpy(y=y[None], u=u[None], v=v[None],
                                   fmt=F.YUV420P)
        out, _ = filt.apply(fb, None)
        oy = np.asarray(out.y)
        # alpha==255 area keeps the original pixels to within the
        # >>8 blend truncation (alpha 255 of 256 => off by <= 1)
        assert np.abs(oy[0, 4:12, 4:6].astype(int)
                      - y[4:12, 4:6].astype(int)).max() <= 1
        # the masked area was rewritten
        assert (oy[0, 4:12, 8:14] != y[4:12, 8:14]).any()

    def test_border(self):
        y, u, v = self._batch(5)
        filt = new_module(ModuleKind.FILTER, "logoaway", Job(),
                          "pos=4x4:size=10x8:mode=1:border")
        fb = FrameBatch.from_numpy(y=y[None], u=u[None], v=v[None],
                                   fmt=F.YUV420P)
        out, _ = filt.apply(fb, None)
        oy = np.asarray(out.y)[0]
        assert (oy[5:11:2, 4] == 255).all()       # odd rows left edge


class TestMisc:
    def test_fieldanalysis(self):
        from tcforge_tpu.modules.filters.cadence import interlace_score
        filt = new_module(ModuleKind.FILTER, "fieldanalysis", Job(), "")
        st = filt.init_state(48, 32, F.YUV420P)
        yy, xx = np.mgrid[0:32, 0:48]
        prog = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
        combed = prog.copy()
        combed[1::2] = 255 - combed[1::2]
        _, st = filt.apply(yuv_batch([prog, combed]), st)
        assert int(st["frames"]) == 2
        assert int(st["interlaced"]) == 1

    def test_29to23(self):
        from tcforge_tpu.core.frame import ATTR_SKIPPED
        filt = new_module(ModuleKind.FILTER, "29to23", Job(fps=29.97), "")
        fb = yuv_batch([np.zeros((8, 8), np.uint8)] * 30)
        out, _ = filt.apply(fb, None)
        kept = int((~np.asarray(out.has_attr(ATTR_SKIPPED))).sum())
        assert kept == 24                       # 30 -> 24 frames

    def test_cpaudio(self):
        from tcforge_tpu.core.frame import AudioBatch
        filt = new_module(ModuleKind.FILTER, "cpaudio", Job(), "source=1")
        pcm = np.stack([np.arange(10), np.arange(10) + 100],
                       axis=-1).astype(np.int16)[None]
        out, _ = filt.apply(AudioBatch(pcm=jnp.asarray(pcm)), None)
        o = np.asarray(out.pcm)
        np.testing.assert_array_equal(o[..., 0], o[..., 1])
        assert o[0, 3, 0] == 103


class TestYuvDenoise:
    def test_static_noise_reduced(self):
        base = np.full((12, 32, 32), 100, np.int16)
        noisy = (base + RNG.integers(-4, 5, base.shape)).clip(0, 255) \
            .astype(np.uint8)
        filt = new_module(ModuleKind.FILTER, "yuvdenoise", Job(),
                          "threshold=8:delay=3")
        st = filt.init_state(32, 32, F.YUV420P)
        out, _ = filt.apply(yuv_batch(list(noisy)), st)
        oy = np.asarray(out.y).astype(float)
        assert oy[6:].std() < noisy[6:].std() * 0.6

    def test_motion_tracked(self):
        """A moving object must not leave ghost trails: the MC search
        should track the shift so edges stay sharp."""
        frames = []
        for i in range(8):
            f = np.full((32, 64), 50, np.uint8)
            x = 8 + i * 2                   # block moves 2 px/frame
            f[8:24, x:x + 16] = 200
            frames.append(f)
        filt = new_module(ModuleKind.FILTER, "yuvdenoise", Job(),
                          "threshold=6:delay=3:radius=4")
        st = filt.init_state(64, 32, F.YUV420P)
        out, _ = filt.apply(yuv_batch(frames), st)
        last = np.asarray(out.y)[-1].astype(int)
        want = frames[-1].astype(int)
        # edges within a few levels of the clean moving frame
        assert np.abs(last - want).max() <= thr_limit(filt)


def thr_limit(filt):
    # correction pass clamps deviations to about the threshold
    return filt.options["threshold"] + 3


class TestExtras:
    def test_smartyuv_registered(self):
        filt = new_module(ModuleKind.FILTER, "smartyuv", Job(), "")
        fb = yuv_batch([np.full((16, 16), 100, np.uint8)] * 2)
        st = filt.init_state(16, 16, F.YUV420P)
        out, _ = filt.apply(fb, st)
        assert out.y.shape == fb.y.shape

    def test_aclip(self):
        import jax.numpy as jnp
        from tcforge_tpu.core.frame import AudioBatch
        filt = new_module(ModuleKind.FILTER, "aclip", Job(), "level=30000")
        st = filt.init_state(48000, 2)
        pcm = np.zeros((3, 100, 2), np.int16)
        pcm[1, 5:10, 0] = 32000
        _, st = filt.apply(AudioBatch(pcm=jnp.asarray(pcm)), st)
        assert int(st["clipped_samples"]) == 5
        assert int(st["clipped_frames"]) == 1

    def test_barrel_identity_at_zero(self):
        filt = new_module(ModuleKind.FILTER, "barrel", Job(), "k1=0:k2=0")
        y = RNG.integers(0, 256, (17, 33), dtype=np.uint8)
        fb = yuv_batch([np.pad(y, ((0, 15), (0, 31)))[:32, :64]])
        out, _ = filt.apply(fb, None)
        np.testing.assert_array_equal(np.asarray(out.y), np.asarray(fb.y))

    def test_barrel_distorts(self):
        filt = new_module(ModuleKind.FILTER, "barrel", Job(), "k1=800")
        y = np.zeros((32, 64), np.uint8)
        y[:, 48:] = 200                  # vertical edge off-center
        out, _ = filt.apply(yuv_batch([y]), None)
        o = np.asarray(out.y)[0]
        # the edge bows: its position in the corner row differs from the
        # center row (larger radius -> stronger inward pull)
        edge_top = int(np.argmax(o[0] > 100))
        edge_mid = int(np.argmax(o[16] > 100))
        assert edge_top < edge_mid
        # the untouched left side stays black
        assert (o[:, :8] == 0).all()


class TestTomsmocompPallas:
    def test_kernel_matches_jnp_reference(self):
        """ops/kernels.tomsmocomp_plane_pallas (interpret mode) must be
        bit-identical to the jnp tournament for every effort level."""
        import jax
        import jax.numpy as jnp
        from tcforge_tpu.modules.filters.tomsmocomp import \
            tomsmocomp_plane
        from tcforge_tpu.ops.kernels import tomsmocomp_plane_pallas
        rng = np.random.default_rng(12)
        n, h, w = 2, 40, 136             # non-multiple of chunk/lanes
        curr = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
        prev = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
        nxt = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
        for effort in (0, 3, 5, 11, 15):
            for parity in (0, 1):
                ref = jax.vmap(lambda c, p, x: tomsmocomp_plane(
                    c.astype(jnp.int32), p.astype(jnp.int32),
                    x.astype(jnp.int32), parity, effort))(
                    jnp.asarray(curr), jnp.asarray(prev),
                    jnp.asarray(nxt))
                ref = np.clip(np.asarray(ref), 0, 255).astype(np.uint8)
                got = np.asarray(tomsmocomp_plane_pallas(
                    jnp.asarray(curr), jnp.asarray(prev),
                    jnp.asarray(nxt), parity, effort, interpret=True))
                np.testing.assert_array_equal(ref, got)


class TestYuvdenoisePostprocess:
    """Round-3 option-surface depth: contrast/sharpen/increment/border
    golden-tested against independent ports of the denoise.c formulas
    (C truncation semantics included)."""

    def _c_contrast(self, p, contrast, lo, hi):
        v = p.astype(np.int64) - 128
        v = np.trunc(v * contrast / 100).astype(np.int64) + 128
        return np.clip(v, lo, hi).astype(np.uint8)

    def test_contrast_matches_c_formula(self):
        from tcforge_tpu.modules.filters.yuvdenoise import \
            contrast_plane
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        p = rng.integers(0, 256, (32, 32), np.uint8)
        for c in (50, 100, 150, 255):
            got = np.asarray(contrast_plane(jnp.asarray(p), c, 16, 235))
            np.testing.assert_array_equal(
                got, self._c_contrast(p, c, 16, 235), err_msg=str(c))

    def test_sharpen_matches_c_formula_interior(self):
        from tcforge_tpu.modules.filters.yuvdenoise import \
            sharpen_plane
        import jax.numpy as jnp
        rng = np.random.default_rng(1)
        p = rng.integers(16, 236, (16, 24), np.uint8)
        got = np.asarray(sharpen_plane(jnp.asarray(p), 60))
        pi = p.astype(np.int64)
        # interior: m = 2x2 forward avg, d = (p-m)*s/100 truncated
        for y in range(15):
            for x in range(23):
                m = (pi[y, x] + pi[y, x + 1] + pi[y + 1, x]
                     + pi[y + 1, x + 1]) // 4
                d = int(np.trunc((pi[y, x] - m) * 60 / 100))
                want = min(235, max(16, m + d))
                assert got[y, x] == want, (y, x)

    def test_full_filter_options_run(self):
        from tcforge_tpu.core.formats import ImageFormat
        from tcforge_tpu.core.frame import FrameBatch
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        rng = np.random.default_rng(2)
        y = rng.integers(0, 256, (2, 32, 32), np.uint8)
        u = rng.integers(0, 256, (2, 16, 16), np.uint8)
        fb = FrameBatch.from_numpy(fmt=ImageFormat.YUV420P, fps=25.0,
                                   first_id=0, y=y, u=u, v=u)
        f = new_module(ModuleKind.FILTER, "yuvdenoise", Job(),
                       "threshold=5:delay=3:luma_contrast=120:"
                       "chroma_contrast=90:sharpen=40:increment_cb=3:"
                       "increment_cr=-2:border=4,4,24,24:mode=2")
        st = f.init_state(32, 32, ImageFormat.YUV420P)
        out, st = f.apply(fb, st)
        oy = np.asarray(out.y)
        ou = np.asarray(out.u)
        # border blackout applied
        assert (oy[:, :4, :] == 16).all() and (oy[:, :, :4] == 16).all()
        assert (ou[:, :2, :] == 128).all()
        # active area is not black
        assert oy[:, 8:24, 8:24].mean() > 30
