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


def write_ppm(path, rgb):
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(rgb.astype(np.uint8).tobytes())


class TestThreeD:
    def _white_bar_filter(self, tmp_path, keys):
        """A 4x12 white picture object steered with 3D keys."""
        pic = tmp_path / "bar.ppm"
        rgb = np.full((4, 12, 3), 255, np.uint8)
        write_ppm(pic, rgb)
        ppml = (f"*bar picture {pic}\n"
                f"0 *bar xpos=30 ypos=20 {keys}\n")
        return make_filter(tmp_path, ppml)

    def _run(self, filt, h=64, w=96):
        st = filt.init_state(w, h, F.YUV420P)
        fb = yuv(1, h, w)
        out, _ = filt.apply(fb, st)
        return np.asarray(out.y)[0]

    def test_zrot_90_swaps_extent(self, tmp_path):
        """A wide bar rotated 90 degrees covers a tall region."""
        y = self._run(self._white_bar_filter(tmp_path, "zrot=90"))
        lit = np.argwhere(y > 200)
        hgt = lit[:, 0].max() - lit[:, 0].min() + 1
        wid = lit[:, 1].max() - lit[:, 1].min() + 1
        assert hgt > wid              # 12x4 -> ~4 wide, ~12 tall

    def test_zero_rot_matches_extent(self, tmp_path):
        y = self._run(self._white_bar_filter(tmp_path, "zrot=0"))
        lit = np.argwhere(y > 200)
        hgt = lit[:, 0].max() - lit[:, 0].min() + 1
        wid = lit[:, 1].max() - lit[:, 1].min() + 1
        assert wid > hgt
        assert (hgt, wid) == (4, 12)

    def test_zpos_zoom_doubles(self, tmp_path):
        y1 = self._run(self._white_bar_filter(tmp_path, "zpos=1"))
        y2 = self._run(self._white_bar_filter(tmp_path, "zpos=2"))
        a1 = (y1 > 100).sum()
        a2 = (y2 > 100).sum()
        # the point lattice spans (mh-1) x (mw-1) units, so a 2x zoom
        # covers (2*3)x(2*11) vs 4x12 = 2.75x in pixel count
        assert 2.5 < a2 / a1 < 5.0

    def test_shear_slants(self, tmp_path):
        """x-shear makes rows shift horizontally with y."""
        y = self._run(self._white_bar_filter(tmp_path, "xshear=80"))
        lit = np.argwhere(y > 200)
        rows = {}
        for r, c in lit:
            rows.setdefault(r, []).append(c)
        centers = [np.mean(v) for _, v in sorted(rows.items())]
        assert centers[0] != centers[-1]

    def test_dzrot_animates(self, tmp_path):
        filt = self._white_bar_filter(tmp_path, "zrot=0 dzrot=90")
        st = filt.init_state(64, 96, F.YUV420P)
        fb = yuv(2, 64, 96)
        out, _ = filt.apply(fb, st)
        y0, y1 = np.asarray(out.y)
        lit0 = np.argwhere(y0 > 200)
        lit1 = np.argwhere(y1 > 200)
        w0 = lit0[:, 1].max() - lit0[:, 1].min()
        w1 = lit1[:, 1].max() - lit1[:, 1].min()
        assert w0 > w1                # frame 1 rotated toward vertical


class TestMovieInMovie:
    def test_movie_object_composites_and_loops(self, tmp_path):
        from tcforge_tpu.io.y4m import Y4MHeader, Y4MWriter
        clip = tmp_path / "clip.y4m"
        hdr = Y4MHeader(width=16, height=8, fps_num=25, fps_den=1)
        with Y4MWriter(str(clip), hdr) as wr:
            for v in (200, 220):       # 2-frame movie
                wr.write_frame(np.full((8, 16), v, np.uint8),
                               np.full((4, 8), 90, np.uint8),
                               np.full((4, 8), 90, np.uint8))
        ppml = (f"*mov movie {clip}\n"
                "0 *mov xpos=10 ypos=6\n")
        filt = make_filter(tmp_path, ppml)
        st = filt.init_state(64, 32, F.YUV420P)
        fb = yuv(5, 32, 64)
        out, _ = filt.apply(fb, st)
        y = np.asarray(out.y)
        u = np.asarray(out.u)
        # frame 0 shows movie frame 0, frame 1 movie frame 1, loops
        assert y[0, 6, 10] == 200
        assert y[1, 6, 10] == 220
        assert y[2, 6, 10] == 200
        assert y[4, 6, 10] == 200
        # outside the window untouched; chroma composited
        assert y[0, 0, 0] == 60
        assert u[0, 3, 5] == 90


class TestSrtSubtitles:
    SRT = """1
00:00:01,000 --> 00:00:02,000
Hello <i>world</i>

2
00:00:02,000 --> 00:00:03,500
Second line
continues here

"""

    def test_parse_srt(self, tmp_path):
        from tcforge_tpu.io.srt import parse_srt
        p = tmp_path / "s.srt"
        p.write_text(self.SRT)
        cues = parse_srt(str(p))
        assert cues == [(1000, 2000, "Hello world"),
                        (2000, 3500, "Second line continues here")]

    def test_filter_renders_srt_cues(self, tmp_path):
        import numpy as np

        from tcforge_tpu.core.frame import FrameBatch
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.filters.subtitler import \
            SubtitlerFilter
        p = tmp_path / "s.srt"
        p.write_text(self.SRT)
        f = SubtitlerFilter(Job(fps=25.0),
                            f"srt={p}:frames=100:points=10")
        w, h = 512, 128
        from tcforge_tpu.core.formats import ImageFormat
        st = f.init_state(w, h, ImageFormat.YUV420P)
        y = np.full((100, h, w), 16, np.uint8)
        u = np.full((100, h // 2, w // 2), 128, np.uint8)
        fb = FrameBatch.from_numpy(y=y, u=u, v=u.copy(),
                                   first_id=0)
        out, _ = f.apply(fb, st)
        oy = np.asarray(out.y)
        # frame 0: no cue active; frame 30 (1.2s): cue 1; frame 60
        # (2.4s): cue 2; frame 95 (3.8s): blank again
        base = y[0]
        assert np.array_equal(oy[0], base)
        assert not np.array_equal(oy[30], base)
        assert not np.array_equal(oy[60], base)
        assert np.array_equal(oy[95], base)
        # back-to-back cue boundary (frame 50 = exactly 2.0s):
        # the second cue shows, not a blank hole
        assert not np.array_equal(oy[50], base)

    def test_overlapping_and_blink_cues(self, tmp_path):
        """Overlaps render joined text for the overlap span and the
        outer cue continues after the inner one ends; sub-frame cues
        round up to one frame instead of sticking forever."""
        srt = ("1\n00:00:01,000 --> 00:00:05,000\nOUTER\n\n"
               "2\n00:00:02,000 --> 00:00:03,000\nINNER\n\n"
               "3\n00:00:10,000 --> 00:00:10,020\nBLINK\n\n")
        p = tmp_path / "o.srt"
        p.write_text(srt)
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.filters.subtitler import \
            SubtitlerFilter
        f = SubtitlerFilter(Job(fps=25.0), f"srt={p}:frames=300")
        subs = {e.frame: e.text for e in f.events}
        assert subs[25] == "OUTER"
        assert subs[50] == "OUTER  INNER"
        assert subs[75] == "OUTER"          # outer continues
        assert subs[125] == ""              # cleared at 5.0s
        assert subs[250] == "BLINK"
        assert subs[251] == ""              # 20ms cue = 1 frame


class TestColorProcessor:
    """Main-movie color processor (color_processor.c): hue rotation,
    NTSC line-phase drift, saturation — golden vs an independent
    per-pixel port of adjust_color()'s asin/sin formulation."""

    def _golden(self, u, v, hue_deg, drift_deg, sat_pct):
        import math
        out_u = u.astype(np.int32).copy()
        out_v = v.astype(np.int32).copy()
        ch, cw = u.shape
        lw = 2.0 * cw
        for cy in range(ch):
            for cx in range(cw):
                uc = int(u[cy, cx]) - 128
                vc = int(v[cy, cx]) - 128
                da = ((2.0 * cx + 0.5) / lw) - 0.5
                deg = hue_deg + drift_deg * da
                if uc == 0 and vc == 0:
                    nu, nv = 0, 0
                else:
                    amp = math.sqrt(uc * uc + vc * vc)
                    a = math.asin(uc / amp)
                    if vc < 0:
                        a = math.pi - a
                    a += deg * math.pi / 180.0
                    amp *= sat_pct / 100.0
                    nu = int(math.sin(a) * amp)
                    nv = int(math.cos(a) * amp)
                out_u[cy, cx] = min(255, max(0, nu + 128))
                out_v[cy, cx] = min(255, max(0, nv + 128))
        return out_u.astype(np.uint8), out_v.astype(np.uint8)

    def _run_filter(self, ppml_text, frames, tmp_path):
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.formats import ImageFormat
        from tcforge_tpu.core.frame import FrameBatch
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.filters.subtitler import \
            SubtitlerFilter
        p = tmp_path / "c.ppml"
        p.write_text(ppml_text)
        h, w = 64, 96
        job = Job(im_v_width=w, im_v_height=h)
        filt = SubtitlerFilter(
            job, f"subtitle_file={p}:frames={frames}")
        filt.init_state(w, h, ImageFormat.YUV420P)
        rng = np.random.RandomState(4)
        y = jnp.asarray(rng.randint(0, 256, (2, h, w)), jnp.uint8)
        u = jnp.asarray(rng.randint(0, 256, (2, h // 2, w // 2)),
                        jnp.uint8)
        v = jnp.asarray(rng.randint(0, 256, (2, h // 2, w // 2)),
                        jnp.uint8)
        fb = FrameBatch(format=ImageFormat.YUV420P, y=y, u=u, v=v,
                        attrs=jnp.zeros((2,), jnp.int32),
                        frame_ids=jnp.arange(2, dtype=jnp.int32),
                        fps=25.0)
        out, _ = filt.apply(fb, None)
        return (np.asarray(u), np.asarray(v),
                np.asarray(out.u), np.asarray(out.v),
                np.asarray(out.y), np.asarray(y))

    def test_hue_drift_sat_golden(self, tmp_path):
        ppml = ("*mm main_movie\n"
                "0 *mm hue=25.0 hue_ldrift=14.0 sat=80.0\n")
        u0, v0, ug, vg, yo, yi = self._run_filter(ppml, 8, tmp_path)
        assert np.array_equal(yo, yi)      # luma untouched
        for i in range(2):
            eu, ev = self._golden(u0[i], v0[i], 25.0, 14.0, 80.0)
            # rotation-matrix vs asin/sin float paths: ±1 code
            assert np.abs(ug[i].astype(int)
                          - eu.astype(int)).max() <= 1
            assert np.abs(vg[i].astype(int)
                          - ev.astype(int)).max() <= 1

    def test_dhue_accumulates(self, tmp_path):
        ppml = ("*mm main_movie\n"
                "0 *mm dhue=10.0\n")
        u0, v0, ug, vg, _, _ = self._run_filter(ppml, 8, tmp_path)
        # frame 0: hue 0 (identity-ish); frame 1: hue 10
        e0u, e0v = self._golden(u0[0], v0[0], 0.0, 0.0, 100.0)
        e1u, e1v = self._golden(u0[1], v0[1], 10.0, 0.0, 100.0)
        assert np.abs(ug[0].astype(int) - e0u.astype(int)).max() <= 1
        assert np.abs(ug[1].astype(int) - e1u.astype(int)).max() <= 1
        assert np.abs(vg[1].astype(int) - e1v.astype(int)).max() <= 1

    def test_no_color_events_is_identity(self, tmp_path):
        ppml = "*mm main_movie\n0 *mm\n"
        u0, v0, ug, vg, _, _ = self._run_filter(ppml, 8, tmp_path)
        assert np.array_equal(u0, ug)
        assert np.array_equal(v0, vg)
