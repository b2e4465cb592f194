"""subtitler PPML renderer tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tcforge_tpu.core.formats import ImageFormat as F
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.job import Job
import tcforge_tpu.modules  # noqa: F401
from tcforge_tpu.modules.filters.subtitler import parse_ppml
from tcforge_tpu.modules.registry import ModuleKind, new_module


def yuv(n, h, w, first=0, fill=60):
    y = np.full((n, h, w), fill, np.uint8)
    c = np.full((n, h // 2, w // 2), 128, np.uint8)
    fb = FrameBatch.from_numpy(y=y, u=c, v=c, fmt=F.YUV420P)
    return FrameBatch(format=fb.format, y=fb.y, u=fb.u, v=fb.v,
                      attrs=fb.attrs,
                      frame_ids=jnp.arange(first, first + n,
                                           dtype=jnp.int32), fps=25.0)


def make_filter(tmp_path, ppml, extra=""):
    p = tmp_path / "s.ppml"
    p.write_text(ppml)
    return new_module(ModuleKind.FILTER, "subtitler", Job(fps=25.0),
                      f"subtitle_file={p}:points=12" + extra)


class TestParse:
    def test_objects_and_events(self, tmp_path):
        p = tmp_path / "x.ppml"
        p.write_text("""; comment
*main main_movie
*logo picture /nonexistent.ppm
*hello text Hi there

2 first subtitle
5 *logo xpos=10 ypos=20
9
""")
        objs, events = parse_ppml(str(p))
        assert objs["logo"].kind == "picture"
        assert objs["hello"].arg == "Hi there"
        assert [e.frame for e in events] == [2, 5, 9]
        assert events[0].text == "first subtitle"
        assert events[1].obj == "logo"
        assert events[2].text == ""

    def test_unknown_kind(self, tmp_path):
        p = tmp_path / "x.ppml"
        p.write_text("*x wibble foo\n")
        with pytest.raises(ValueError):
            parse_ppml(str(p))


class TestSubtitles:
    def test_timed_text(self, tmp_path):
        filt = make_filter(tmp_path, """*main main_movie
2 HELLO WORLD
5 SECOND LINE
8
""")
        st = filt.init_state(160, 96, F.YUV420P)
        out, _ = filt.apply(yuv(10, 96, 160), st)
        oy = np.asarray(out.y)
        changed = [(oy[k] != 60).any() for k in range(10)]
        # text from 2..4, different text 5..7, nothing after 8
        assert changed == [False, False, True, True, True,
                           True, True, True, False, False]
        assert not np.array_equal(oy[2], oy[5])   # text switched
        # subtitle sits in the bottom band
        assert (oy[3][:60] == 60).all()

    def test_batch_invariance(self, tmp_path):
        src = """*main main_movie
1 ABC
6
"""
        f1 = make_filter(tmp_path, src)
        st = f1.init_state(160, 96, F.YUV420P)
        a, _ = f1.apply(yuv(8, 96, 160), st)
        b1, _ = f1.apply(yuv(3, 96, 160), st)
        b2, _ = f1.apply(yuv(5, 96, 160, first=3), st)
        np.testing.assert_array_equal(np.asarray(a.y)[:3],
                                      np.asarray(b1.y))
        np.testing.assert_array_equal(np.asarray(a.y)[3:],
                                      np.asarray(b2.y))


class TestObjects:
    def test_picture_overlay_and_kill(self, tmp_path):
        from tcforge_tpu.io.image import write_image
        img = np.zeros((8, 8, 3), np.uint8)
        img[..., 0] = 250                      # red square
        pic = tmp_path / "logo.ppm"
        write_image(str(pic), img)
        filt = make_filter(tmp_path, f"""*logo picture {pic}
2 *logo xpos=20 ypos=10
6 *logo kill
""")
        st = filt.init_state(160, 96, F.YUV420P)
        out, _ = filt.apply(yuv(8, 96, 160), st)
        oy = np.asarray(out.y)
        ov = np.asarray(out.v)
        assert (oy[0] == 60).all()             # before install
        assert (oy[3, 10:18, 20:28] != 60).any()
        assert (ov[3] > 200).any()             # red -> high V
        assert (oy[6] == 60).all()             # killed
        assert (oy[7] == 60).all()

    def test_motion(self, tmp_path):
        from tcforge_tpu.io.image import write_image
        img = np.full((4, 4, 3), 255, np.uint8)
        pic = tmp_path / "w.ppm"
        write_image(str(pic), img)
        filt = make_filter(tmp_path, f"""*dot picture {pic}
0 *dot xpos=0 ypos=0 dxpos=4
""")
        st = filt.init_state(160, 96, F.YUV420P)
        out, _ = filt.apply(yuv(5, 96, 160), st)
        oy = np.asarray(out.y)
        # the bright block slides right by 4 px per frame
        for k in range(4):
            x = 4 * k
            assert (oy[k, 0:4, x:x + 4] > 200).all()
            assert (oy[k, 0:4, x + 8:x + 12] == 60).all()

    def test_transparency_ramp(self, tmp_path):
        filt = make_filter(tmp_path, """*label text SOLID
0 *label xpos=8 ypos=8 transp=0 dtransp=25
""")
        st = filt.init_state(160, 96, F.YUV420P)
        out, _ = filt.apply(yuv(5, 96, 160), st)
        oy = np.asarray(out.y).astype(int)
        dev = [np.abs(oy[k] - 60).sum() for k in range(5)]
        assert dev[0] > dev[1] > dev[2] > dev[3]   # fading out

    def test_frame_counter(self, tmp_path):
        filt = make_filter(tmp_path, """*counter frame_counter
0 *counter xpos=4 ypos=4
""")
        st = filt.init_state(192, 96, F.YUV420P)
        out, _ = filt.apply(yuv(3, 96, 192, first=41), st)
        oy = np.asarray(out.y)
        assert (oy[0] != 60).any()
        assert not np.array_equal(oy[0], oy[1])    # digits change
