"""ascii filter (filter_ascii.c native-alt) + PSF font parsing."""

import numpy as np
import pytest

from tcforge_tpu.core.formats import ImageFormat as F
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.job import FilterSpec, Job
from tcforge_tpu.modules.filters.asciiart import AsciiFilter, parse_psf
from tcforge_tpu.modules.registry import ModuleKind, new_module

import tcforge_tpu.modules  # noqa: F401


def _psf1(charsize=10, nglyphs=256):
    rng = np.random.default_rng(7)
    glyphs = rng.integers(0, 256, (nglyphs, charsize), dtype=np.uint8)
    glyphs[ord(" ")] = 0                        # space = empty
    glyphs[ord("@")] = 255                      # @ = solid
    return bytes([0x36, 0x04, 0x00, charsize]) + glyphs.tobytes(), glyphs


def _psf2(w=12, h=14, nglyphs=128):
    rng = np.random.default_rng(9)
    bpr = (w + 7) // 8
    charsize = bpr * h
    hdr = (b"\x72\xb5\x4a\x86"
           + np.array([0, 32, 0, nglyphs, charsize, h, w],
                      dtype="<u4").tobytes())
    data = rng.integers(0, 256, (nglyphs, charsize), dtype=np.uint8)
    return hdr + data.tobytes(), data, w, h


class TestPSF:
    def test_psf1_roundtrip(self):
        blob, glyphs = _psf1()
        bits, h, w = parse_psf(blob)
        assert (h, w) == (10, 8)
        assert bits.shape == (256, 10, 8)
        want = np.unpackbits(glyphs[65].reshape(10, 1), axis=1)
        np.testing.assert_array_equal(bits[65], want)

    def test_psf2_roundtrip(self):
        blob, data, w, h = _psf2()
        bits, gh, gw = parse_psf(blob)
        assert (gh, gw) == (h, w)
        assert bits.shape == (128, h, w)
        row = np.unpackbits(data[66].reshape(h, -1), axis=1)[:, :w]
        np.testing.assert_array_equal(bits[66], row)

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            parse_psf(b"\x00\x01\x02\x03" * 8)

    def test_truncated(self):
        blob, _ = _psf1()
        with pytest.raises(ValueError):
            parse_psf(blob[:100])


def _mk_batch(y_val=128, n=2, w=64, h=48):
    y = np.full((n, h, w), y_val, np.uint8)
    u = np.full((n, h // 2, w // 2), 90, np.uint8)
    v = np.full((n, h // 2, w // 2), 170, np.uint8)
    return FrameBatch.from_numpy(y=y, u=u, v=v, fmt=F.YUV420P)


class TestAsciiFilter:
    def test_registered(self):
        f = new_module(ModuleKind.FILTER, "ascii", Job())
        assert isinstance(f, AsciiFilter)

    def test_uniform_frame_is_periodic(self):
        f = AsciiFilter(Job())
        fb = _mk_batch(128)
        out, _ = f.apply(fb, None)
        y = np.asarray(out.y)
        gh, gw = f._gh, f._gw
        hc, wc = 48 // gh, 64 // gw
        grid = y[0, :hc * gh, :wc * gw]
        tile = grid[:gh, :gw]
        # every cell renders the same glyph at the same luma
        for i in range(hc):
            for j in range(wc):
                np.testing.assert_array_equal(
                    grid[i * gh:(i + 1) * gh, j * gw:(j + 1) * gw], tile)
        # the glyph is drawn at the cell's luminance on black
        assert set(np.unique(tile)) <= {0, 128}
        assert (tile == 128).any()

    def test_chroma_kept_flat(self):
        f = AsciiFilter(Job())
        fb = _mk_batch(200)
        out, _ = f.apply(fb, None)
        u = np.asarray(out.u)[0]
        gh, gw = f._gh, f._gw
        hc, wc = 48 // gh, 64 // gw
        grid = u[:hc * gh // 2, :wc * gw // 2]
        assert set(np.unique(grid)) <= {90}
        # padding outside the cell grid is neutral chroma
        assert np.all(np.asarray(out.u)[0, hc * gh // 2:, :] == 128)

    def test_brighter_cells_denser_glyphs(self):
        f = AsciiFilter(Job())
        lo, _ = f.apply(_mk_batch(30), None)
        hi, _ = f.apply(_mk_batch(230), None)
        gh, gw = f._gh, f._gw
        ink_lo = (np.asarray(lo.y)[0, :gh, :gw] > 0).mean()
        ink_hi = (np.asarray(hi.y)[0, :gh, :gw] > 0).mean()
        assert ink_hi > ink_lo

    def test_psf_font_option(self, tmp_path):
        blob, _ = _psf1()
        p = tmp_path / "font.psf"
        p.write_bytes(blob)
        f = AsciiFilter(Job(), f"font={p}")
        assert (f._gh, f._gw) == (10, 8)
        out, _ = f.apply(_mk_batch(255), None)
        # brightest cell -> densest glyph ('@' = all-ink in this font)
        y = np.asarray(out.y)[0, :10, :8]
        assert (y == 255).all()

    def test_rgb_path(self):
        f = AsciiFilter(Job())
        rgb = np.zeros((1, 48, 64, 3), np.uint8)
        rgb[..., 0] = 200                       # red frame
        fb = FrameBatch.from_numpy(rgb=rgb, fmt=F.RGB24)
        out, _ = f.apply(fb, None)
        o = np.asarray(out.rgb)
        assert o.shape == rgb.shape
        assert o[..., 0].max() == 200           # ink in the cell color
        assert o[..., 1].max() == 0


class TestAsciiE2E:
    def test_chain_runs(self, tmp_path):
        from tcforge_tpu.pipeline.engine import Pipeline
        dst = tmp_path / "out.y4m"
        job = Job(video_in_file="test://", video_out_file=str(dst),
                  im_v_module="framegen", ex_m_module="y4m",
                  im_v_width=64, im_v_height=48, fps=25.0,
                  max_frames=4, batch_size=2,
                  filters=[FilterSpec("ascii", "")])
        c = Pipeline(job).run(progress=False)
        assert c.encoded == 4
        assert dst.stat().st_size > 0
