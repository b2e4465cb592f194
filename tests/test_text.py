"""text filter: static strings, frame counters, timestamps, fades."""

import numpy as np
import jax.numpy as jnp
import pytest

from tcforge_tpu.core.formats import ImageFormat as F
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.job import Job
import tcforge_tpu.modules  # noqa: F401
from tcforge_tpu.modules.filters.text import rgb_to_yuv_color
from tcforge_tpu.modules.registry import ModuleKind, new_module


def yuv(n, h, w, first=0, fill=60):
    y = np.full((n, h, w), fill, np.uint8)
    c = np.full((n, h // 2, w // 2), 128, np.uint8)
    fb = FrameBatch.from_numpy(y=y, u=c, v=c, fmt=F.YUV420P)
    return FrameBatch(format=fb.format, y=fb.y, u=fb.u, v=fb.v,
                      attrs=fb.attrs,
                      frame_ids=jnp.arange(first, first + n,
                                           dtype=jnp.int32), fps=25.0)


class TestStatic:
    def test_draws_text(self):
        f = new_module(ModuleKind.FILTER, "text", Job(fps=25.0),
                       "string=HELLO:pos=4x4")
        st = f.init_state(128, 64, F.YUV420P)
        out, _ = f.apply(yuv(2, 64, 128), st)
        oy = np.asarray(out.y)
        assert (oy[0] != 60).sum() > 100       # glyph pixels written
        np.testing.assert_array_equal(oy[0], oy[1])
        # untouched outside the text band
        assert (oy[0, 40:, :] == 60).all()

    def test_color_chroma(self):
        f = new_module(ModuleKind.FILTER, "text", Job(fps=25.0),
                       "string=X:pos=4x4:color=FF0000:dpi=72")
        st = f.init_state(64, 32, F.YUV420P)
        out, _ = f.apply(yuv(1, 32, 64), st)
        _, cu, cv = rgb_to_yuv_color(255, 0, 0)
        ou = np.asarray(out.u)
        ov = np.asarray(out.v)
        assert (ou == cu).any() and (ov == cv).any()

    def test_transparency_toggle(self):
        common = "string=I:pos=4x4:dpi=72"
        f1 = new_module(ModuleKind.FILTER, "text", Job(fps=25.0), common)
        f2 = new_module(ModuleKind.FILTER, "text", Job(fps=25.0),
                        common + ":notransparent")
        s1 = f1.init_state(64, 32, F.YUV420P)
        s2 = f2.init_state(64, 32, F.YUV420P)
        o1, _ = f1.apply(yuv(1, 32, 64), s1)
        o2, _ = f2.apply(yuv(1, 32, 64), s2)
        # the opaque box covers the whole glyph cell -> more pixels off 60
        assert (np.asarray(o2.y) != 60).sum() \
            > (np.asarray(o1.y) != 60).sum()

    def test_bad_position(self):
        f = new_module(ModuleKind.FILTER, "text", Job(fps=25.0),
                       "string=WIDE TEXT THAT CANNOT FIT:pos=60x4")
        with pytest.raises(ValueError):
            f.init_state(64, 32, F.YUV420P)


class TestDynamic:
    def test_frame_counter_changes(self):
        f = new_module(ModuleKind.FILTER, "text", Job(fps=25.0),
                       "frame:posdef=2")
        st = f.init_state(256, 96, F.YUV420P)
        out, _ = f.apply(yuv(3, 96, 256, first=7), st)
        oy = np.asarray(out.y)
        assert not np.array_equal(oy[0], oy[1])
        assert not np.array_equal(oy[1], oy[2])

    def test_frame_counter_batch_invariant(self):
        f = new_module(ModuleKind.FILTER, "text", Job(fps=25.0),
                       "frame:pos=8x8")
        st = f.init_state(256, 96, F.YUV420P)
        a, _ = f.apply(yuv(4, 96, 256), st)
        b1, _ = f.apply(yuv(2, 96, 256), st)
        b2, _ = f.apply(yuv(2, 96, 256, first=2), st)
        np.testing.assert_array_equal(np.asarray(a.y)[:2],
                                      np.asarray(b1.y))
        np.testing.assert_array_equal(np.asarray(a.y)[2:],
                                      np.asarray(b2.y))

    def test_tstamp_runs(self):
        f = new_module(ModuleKind.FILTER, "text", Job(fps=25.0),
                       "tstamp:posdef=8")
        st = f.init_state(256, 96, F.YUV420P)
        out, _ = f.apply(yuv(2, 96, 256, first=90), st)
        assert (np.asarray(out.y)[0] != 60).sum() > 200


class TestRangeFade:
    def test_range_gating(self):
        f = new_module(ModuleKind.FILTER, "text", Job(fps=25.0),
                       "string=A:pos=4x4:range=2-3:dpi=72")
        st = f.init_state(64, 32, F.YUV420P)
        out, _ = f.apply(yuv(6, 32, 64), st)
        oy = np.asarray(out.y)
        changed = [(oy[k] != 60).any() for k in range(6)]
        assert changed == [False, False, True, True, False, False]

    def test_fade_ramps(self):
        f = new_module(ModuleKind.FILTER, "text", Job(fps=25.0),
                       "string=A:pos=4x4:range=0-100:fade=10:dpi=72")
        st = f.init_state(64, 32, F.YUV420P)
        out, _ = f.apply(yuv(12, 32, 64), st)
        oy = np.asarray(out.y).astype(int)
        # deviation from background grows while fading in
        dev = [np.abs(oy[k] - 60).sum() for k in range(12)]
        assert dev[0] == 0                   # opaque starts at 0
        assert dev[1] < dev[5] <= dev[11]


class TestDpiAntialias:
    def test_dpi_scales_glyphs(self):
        from tcforge_tpu.modules.filters.text import _load_font, render_mask
        m72 = render_mask("E", _load_font("", 25, 72))
        m96 = render_mask("E", _load_font("", 25, 96))
        # FT_Set_Char_Size semantics: 96 dpi glyphs are ~4/3 larger
        assert m96.shape[0] > m72.shape[0]
        assert m96.shape[1] >= m72.shape[1]

    def test_antialias_off_is_binary(self):
        from tcforge_tpu.modules.filters.text import _load_font, render_mask
        font = _load_font("", 25, 96)
        aa = render_mask("S", font, True)
        mono = render_mask("S", font, False)
        assert set(np.unique(mono)) <= {16, 240}
        assert len(np.unique(aa)) > 2

    def test_filter_accepts_options(self):
        f = new_module(ModuleKind.FILTER, "text", Job(fps=25.0),
                       "string=A:pos=4x4:dpi=72:antialias=0")
        st = f.init_state(64, 32, F.YUV420P)
        out, _ = f.apply(yuv(1, 32, 64), st)
        assert (np.asarray(out.y) != 60).any()
