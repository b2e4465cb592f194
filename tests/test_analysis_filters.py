"""whitebalance / detectclipping / facemask / fields / divxkey / control
filters vs numpy ports of the C formulas."""

import numpy as np
import pytest

from tcforge_tpu.core.formats import ImageFormat as F
from tcforge_tpu.core.frame import ATTR_KEYFRAME, FrameBatch
from tcforge_tpu.core.job import Job

RNG = np.random.default_rng(31)


def rand_u8(*shape):
    return RNG.integers(0, 256, size=shape, dtype=np.uint8)


def rgb_batch(n, h, w):
    data = rand_u8(n, h, w, 3)
    return data, FrameBatch.from_numpy(rgb=data, fmt=F.RGB24)


class TestWhitebalance:
    def _c_luts(self, level):
        # filter_whitebalance.c:120-124
        factor = 1 + abs(level) / 100
        if level < 0:
            factor = 1 / factor
        i = np.arange(256)
        red = (np.power(i / 255, 1 / factor) * 255).astype(np.uint8)
        blue = (np.power(i / 255, factor) * 255).astype(np.uint8)
        return red, blue

    @pytest.mark.parametrize("level", [40, -60, 150])
    def test_rgb_exact(self, level):
        from tcforge_tpu.modules.filters.analysis import WhitebalanceFilter
        data, fb = rgb_batch(2, 8, 12)
        f = WhitebalanceFilter(Job(), f"level={level}")
        out, _ = f.apply(fb, None)
        red, blue = self._c_luts(level)
        want = data.copy()
        want[..., 0] = red[data[..., 0]]
        want[..., 2] = blue[data[..., 2]]
        np.testing.assert_array_equal(np.asarray(out.rgb), want)

    def test_limit_toggles(self):
        from tcforge_tpu.modules.filters.analysis import WhitebalanceFilter
        data, fb = rgb_batch(6, 4, 4)
        # on for frames 0-1, off 2-3, on again 4+
        f = WhitebalanceFilter(Job(), "level=40:limit=-2+4")
        out, _ = f.apply(fb, None)
        red, _ = self._c_luts(40)
        got = np.asarray(out.rgb)
        assert np.array_equal(got[0, ..., 0], red[data[0, ..., 0]])
        np.testing.assert_array_equal(got[2], data[2])
        np.testing.assert_array_equal(got[3], data[3])
        assert np.array_equal(got[4, ..., 0], red[data[4, ..., 0]])

    def test_yuv_roundtrip_runs(self):
        from tcforge_tpu.modules.filters.analysis import WhitebalanceFilter
        y, u, v = rand_u8(2, 16, 16), rand_u8(2, 8, 8), rand_u8(2, 8, 8)
        fb = FrameBatch.from_numpy(y=y, u=u, v=v, fmt=F.YUV420P)
        out, _ = WhitebalanceFilter(Job(), "level=80").apply(fb, None)
        assert out.format == F.YUV420P
        assert not np.array_equal(np.asarray(out.y), y)


class TestDetectClipping:
    def test_border_detection(self):
        from tcforge_tpu.modules.filters.analysis import \
            DetectClippingFilter
        h, w = 32, 48
        n = 6
        y = np.zeros((n, h, w), np.uint8)
        y[:, 4:h - 6, 8:w - 2] = 200        # content box
        fb = FrameBatch.from_numpy(y=y, u=np.full((n, h // 2, w // 2),
                                                  128, np.uint8),
                                   v=np.full((n, h // 2, w // 2), 128,
                                             np.uint8), fmt=F.YUV420P)
        f = DetectClippingFilter(Job(), "limit=24")
        st = f.init_state(w, h, F.YUV420P)
        _, st = f.apply(fb, st)
        t, lft, b, r = f.suggestion(st)
        # rounded-to-even clip values (filter_detectclipping.c:287-291)
        assert (t, lft) == (4, 8)
        assert b == h - ((h - 7 + 1) & ~1)
        assert r == w - ((w - 3 + 1) & ~1)

    def test_warmup_frames_ignored(self):
        from tcforge_tpu.modules.filters.analysis import \
            DetectClippingFilter
        h, w = 16, 16
        y = np.zeros((4, h, w), np.uint8)
        y[:3] = 255                          # frames 0-2: all bright
        y[3, 6:10, 6:10] = 200               # the only counted frame
        fb = FrameBatch.from_numpy(y=y, u=np.full((4, 8, 8), 128,
                                                  np.uint8),
                                   v=np.full((4, 8, 8), 128, np.uint8),
                                   fmt=F.YUV420P)
        f = DetectClippingFilter(Job(), "limit=24")
        st = f.init_state(w, h, F.YUV420P)
        _, st = f.apply(fb, st)
        assert int(st["y1"]) == 6 and int(st["y2"]) == 9


class TestFacemask:
    def test_cell_means(self):
        from tcforge_tpu.modules.filters.analysis import FacemaskFilter
        data, fb = rgb_batch(2, 16, 24)
        f = FacemaskFilter(
            Job(), "xpos=4:ypos=2:xresolution=4:yresolution=2:"
            "xdim=8:ydim=4")
        out, _ = f.apply(fb, None)
        got = np.asarray(out.rgb)
        # outside untouched
        np.testing.assert_array_equal(got[:, :2], data[:, :2])
        np.testing.assert_array_equal(got[:, :, :4], data[:, :, :4])
        # each 2x4 cell inside is its own mean
        for cy in range(2):
            for cx in range(2):
                cell = data[:, 2 + cy * 2:4 + cy * 2,
                            4 + cx * 4:8 + cx * 4].astype(np.float64)
                mean = np.round(cell.mean(axis=(1, 2)))
                gcell = got[:, 2 + cy * 2:4 + cy * 2, 4 + cx * 4:8 + cx * 4]
                for nidx in range(2):
                    assert np.all(np.abs(
                        gcell[nidx] - mean[nidx]) <= 1)

    def test_bad_resolution_rejected(self):
        from tcforge_tpu.modules.filters.analysis import FacemaskFilter
        with pytest.raises(ValueError):
            FacemaskFilter(Job(), "xdim=10:xresolution=4:"
                           "ydim=4:yresolution=2")


class TestFields:
    def _mk(self, n=5, h=8, w=6):
        y = rand_u8(n, h, w)
        u = np.full((n, h // 2, w // 2), 128, np.uint8)
        v = u.copy()
        return y, FrameBatch.from_numpy(y=y, u=u, v=v, fmt=F.YUV420P)

    def _new(self, opts):
        from tcforge_tpu.modules.filters.analysis import FieldsFilter
        return FieldsFilter(Job(), opts)

    def test_flip(self):
        y, fb = self._mk()
        f = self._new("flip")
        st = f.init_state(6, 8, F.YUV420P)
        out, _ = f.apply(fb, st)
        got = np.asarray(out.y)
        np.testing.assert_array_equal(got[:, 0::2], y[:, 1::2])
        np.testing.assert_array_equal(got[:, 1::2], y[:, 0::2])

    def test_shift_semantics(self):
        # out_top(i) = bottom(i-1); out_bottom(i) = top(i)
        y, fb = self._mk()
        f = self._new("shift")
        st = f.init_state(6, 8, F.YUV420P)
        out, _ = f.apply(fb, st)
        got = np.asarray(out.y)
        np.testing.assert_array_equal(got[0, 0::2], np.zeros((4, 6)))
        np.testing.assert_array_equal(got[1:, 0::2], y[:-1, 1::2])
        np.testing.assert_array_equal(got[:, 1::2], y[:, 0::2])

    def test_shift_batch_invariance(self):
        from tcforge_tpu.core.frame import FrameBatch as FB
        y, _ = self._mk(n=6)
        f = self._new("shift")
        st = f.init_state(6, 8, F.YUV420P)
        full, _ = f.apply(FB.from_numpy(
            y=y, u=np.full((6, 4, 3), 128, np.uint8),
            v=np.full((6, 4, 3), 128, np.uint8), fmt=F.YUV420P), st)
        st2 = f.init_state(6, 8, F.YUV420P)
        parts = []
        for s in (slice(0, 2), slice(2, 6)):
            fb = FB.from_numpy(y=y[s],
                               u=np.full((s.stop - s.start, 4, 3), 128,
                                         np.uint8),
                               v=np.full((s.stop - s.start, 4, 3), 128,
                                         np.uint8), fmt=F.YUV420P)
            out, st2 = f.apply(fb, st2)
            parts.append(np.asarray(out.y))
        np.testing.assert_array_equal(np.asarray(full.y),
                                      np.concatenate(parts))

    def test_shiftflip_delays_bottom(self):
        y, fb = self._mk()
        f = self._new("shift:flip")
        st = f.init_state(6, 8, F.YUV420P)
        out, _ = f.apply(fb, st)
        got = np.asarray(out.y)
        np.testing.assert_array_equal(got[:, 0::2], y[:, 0::2])
        np.testing.assert_array_equal(got[1:, 1::2], y[:-1, 1::2])

    def test_no_ops_rejected(self):
        with pytest.raises(ValueError):
            self._new("")


class TestDivxKey:
    def _synth_es(self, types):
        out = b""
        for t in types:
            out += b"\x00\x00\x01\xb6" + bytes([t << 6]) + b"\x11\x22"
        return out

    def test_scan(self):
        from tcforge_tpu.io.mpeg4 import scan_keyframes, divx3_is_key
        es = self._synth_es([0, 1, 1, 0, 2])
        np.testing.assert_array_equal(
            scan_keyframes(es), [True, False, False, True, False])
        assert divx3_is_key(b"\x00\x00\x00\x00")
        assert not divx3_is_key(b"\x40\x00\x00\x00")

    def test_filter_sets_attr(self, tmp_path):
        from tcforge_tpu.modules.filters.analysis import DivxKeyFilter
        es = tmp_path / "v.m4v"
        es.write_bytes(self._synth_es([0, 1, 0, 1]))
        f = DivxKeyFilter(Job(), f"es={es}")
        y = rand_u8(4, 16, 16)
        fb = FrameBatch.from_numpy(
            y=y, u=np.full((4, 8, 8), 128, np.uint8),
            v=np.full((4, 8, 8), 128, np.uint8), fmt=F.YUV420P)
        out, _ = f.apply(fb, None)
        attrs = np.asarray(out.attrs)
        np.testing.assert_array_equal(
            (attrs & ATTR_KEYFRAME) != 0, [True, False, True, False])


class TestControlFilter:
    def test_scripted_load(self, tmp_path):
        """control file loads 'invert' mid-stream; later frames invert."""
        from tcforge_tpu.io.y4m import Y4MReader
        from tcforge_tpu.pipeline.engine import Pipeline
        cmds = tmp_path / "cmds.txt"
        cmds.write_text("4 load invert\n")
        src, dst = tmp_path / "in.y4m", tmp_path / "out.y4m"
        n, w, h = 12, 16, 8
        y = np.full((n, h, w), 100, np.uint8)
        c = np.full((n, h // 2, w // 2), 128, np.uint8)
        from tcforge_tpu.io.y4m import Y4MHeader, Y4MWriter
        hdr = Y4MHeader(width=w, height=h, fps_num=25, fps_den=1)
        with Y4MWriter(str(src), hdr) as wr:
            for i in range(n):
                wr.write_frame(y[i], c[i], c[i])
        job = Job()
        job.video_in_file = str(src)
        job.video_out_file = str(dst)
        job.im_v_module = "y4m"
        job.ex_m_module = "y4m"
        job.batch_size = 4
        from tcforge_tpu.core.job import FilterSpec
        job.filters.append(FilterSpec("control", f"file={cmds}"))
        Pipeline(job).run(progress=False)
        with Y4MReader(str(dst)) as r:
            vals = [fr[0][0, 0] for fr in r]
        # command fires after the batch containing frame 4: batches of 4
        # -> frames 8.. are inverted (batch granularity documented)
        assert vals[0] == 100
        assert vals[-1] == 155
