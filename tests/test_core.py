"""Core-layer unit tests.

Mirrors the reference's pure-logic test binaries: test-framecode.c,
test-ratiocodes.c, testsuite/test-tcfunctions.c (see SURVEY.md §4).
"""

import numpy as np
import pytest

from tcforge_tpu.core import framecode, optstr, ratiocodes
from tcforge_tpu.core.codecs import (Codec, codec_from_fourcc,
                                     codec_from_string, codec_to_string)
from tcforge_tpu.core.formats import ImageFormat, format_from_string
from tcforge_tpu.core.frame import (ATTR_END_OF_STREAM, ATTR_SKIPPED,
                                    FrameBatch)
from tcforge_tpu.core.job import FilterSpec, Job


class TestFormats:
    def test_subsampling(self):
        assert ImageFormat.YUV420P.subsampling == (2, 2)
        assert ImageFormat.YUV422P.subsampling == (2, 1)
        assert ImageFormat.YUV411P.subsampling == (4, 1)
        assert ImageFormat.YUV444P.subsampling == (1, 1)

    def test_uv_plane_shape(self):
        # aclib/imgconvert.h:54-60 UV_PLANE_SIZE parity
        assert ImageFormat.YUV420P.uv_plane_shape(720, 576) == (288, 360)
        assert ImageFormat.YUV422P.uv_plane_shape(720, 576) == (576, 360)
        assert ImageFormat.YUV411P.uv_plane_shape(720, 576) == (576, 180)
        assert ImageFormat.YUV444P.uv_plane_shape(720, 576) == (576, 720)

    def test_frame_bytes(self):
        assert ImageFormat.YUV420P.frame_bytes(640, 480) == 640 * 480 * 3 // 2
        assert ImageFormat.RGB24.frame_bytes(640, 480) == 640 * 480 * 3
        assert ImageFormat.YUY2.frame_bytes(640, 480) == 640 * 480 * 2

    def test_from_string(self):
        assert format_from_string("i420") is ImageFormat.YUV420P
        assert format_from_string("RGB24") is ImageFormat.RGB24
        with pytest.raises(ValueError):
            format_from_string("nosuch")

    def test_classification(self):
        assert ImageFormat.YUV420P.is_yuv and ImageFormat.YUV420P.is_planar
        assert ImageFormat.YUY2.is_packed_yuv and not ImageFormat.YUY2.is_planar
        assert ImageFormat.RGB24.is_rgb and not ImageFormat.RGB24.is_yuv


class TestCodecs:
    def test_roundtrip(self):
        assert codec_to_string(Codec.YUV420P) == "yuv420p"
        assert codec_from_string("yuv420p") is Codec.YUV420P
        assert codec_from_string("nosuch") is Codec.UNKNOWN

    def test_fourcc(self):
        assert codec_from_fourcc("XVID") is Codec.XVID
        assert codec_from_fourcc("xvid") is Codec.XVID
        assert codec_from_fourcc("I420") is Codec.YUV420P

    def test_reference_ids(self):
        # numeric parity with libtc/tccodecs.h:35-44
        assert Codec.YUV420P.value == 0x30323449
        assert Codec.RGB24.value == 0x24
        assert Codec.PCM.value == 1


class TestRatioCodes:
    def test_frc_roundtrip(self):
        # ratiocodes.c:36-53 table parity
        for code, fps in [(1, 24000 / 1001), (2, 24.0), (3, 25.0),
                          (4, 30000 / 1001), (5, 30.0), (6, 50.0),
                          (7, 60000 / 1001), (8, 60.0), (9, 1.0)]:
            assert ratiocodes.frc_code_to_value(code) == pytest.approx(fps)
            assert ratiocodes.frc_code_from_value(fps) == code

    def test_frc_no_match(self):
        assert ratiocodes.frc_code_from_value(17.3) is None
        assert ratiocodes.frc_code_to_value(99) is None

    def test_frc_from_ratio(self):
        assert ratiocodes.frc_code_from_ratio(30000, 1001) == 4
        assert ratiocodes.frc_code_from_ratio(25, 1) == 3

    def test_asr(self):
        assert ratiocodes.asr_code_to_ratio(2) == (4, 3)
        assert ratiocodes.asr_code_from_value(16 / 9) == 3
        assert "4:3" in ratiocodes.asr_code_describe(2)


class TestFramecode:
    def test_parse_time_seconds(self):
        # bare number = seconds (framecode.c:408-450)
        assert framecode.parse_time("10", 25.0) == 250
        assert framecode.parse_time("10.5", 25.0) == 255

    def test_parse_time_hms(self):
        assert framecode.parse_time("1:00", 25.0) == 1500       # M:S
        assert framecode.parse_time("1:00:00", 25.0) == 90000   # H:M:S
        assert framecode.parse_time("0:0:2.3", 30.0) == 63

    def test_parse_ranges(self):
        rl = framecode.parse_ranges("0-10,20-30/2", 1.0)
        assert len(rl) == 2
        assert rl.ranges[0].stf == 0 and rl.ranges[0].etf == 10
        assert rl.ranges[1].stepf == 2
        assert rl.contains(0) and rl.contains(9)
        assert not rl.contains(10)
        assert rl.contains(20) and not rl.contains(21) and rl.contains(22)

    def test_mask(self):
        rl = framecode.parse_ranges("2-6/2", 1.0)
        m = rl.mask(0, 8)
        assert m.tolist() == [False, False, True, False, True, False,
                              False, False]

    def test_bad_input(self):
        with pytest.raises(ValueError):
            framecode.parse_ranges("5", 25.0)       # no '-'
        with pytest.raises(ValueError):
            framecode.parse_ranges("10-5", 25.0)    # reversed
        with pytest.raises(ValueError):
            framecode.parse_ranges("0-10", 0.0)     # bad fps

    def test_split_chunks(self):
        # src/split.c:146 cluster-chunk arithmetic
        chunks = framecode.split_chunks(10, 3)
        assert chunks == [(0, 4), (4, 7), (7, 10)]
        assert framecode.split_chunks(8, 4) == [(0, 2), (2, 4), (4, 6),
                                                (6, 8)]


class TestOptstr:
    def test_parse(self):
        d = optstr.parse_optstr("luma=4.0:chroma=3:pre")
        assert d == {"luma": "4.0", "chroma": "3", "pre": ""}

    def test_get_value(self):
        opts = "a=2:b=1.5:m=7x5:q=1,2,3,4:flag"
        assert optstr.get_value(opts, "a", "d") == 2
        assert optstr.get_value(opts, "b", "f") == 1.5
        assert optstr.get_value(opts, "m", "dxd") == (7, 5)
        assert optstr.get_value(opts, "q", "4d") == (1, 2, 3, 4)
        assert optstr.get_value(opts, "flag", "b") is True
        assert optstr.get_value(opts, "zz", "d", default=9) == 9

    def test_lookup(self):
        assert optstr.lookup("help:x=1", "help")
        assert not optstr.lookup("x=1", "help")

    def test_module_desc(self):
        desc = optstr.ModuleDesc(
            name="testmod", comment="test",
            params=[optstr.ParamSpec("luma", "strength", "f", 4.0, 0.0,
                                     100.0),
                    optstr.ParamSpec("pre", "prefilter", "d", 0, 0, 1)])
        vals = desc.parse_options("luma=2.5")
        assert vals == {"luma": 2.5, "pre": 0}
        with pytest.raises(optstr.OptStrError):
            desc.parse_options("luma=200")       # out of range
        with pytest.raises(optstr.OptStrError):
            desc.parse_options("nosuch=1")       # unknown key

    def test_format_roundtrip(self):
        s = optstr.format_optstr({"a": 1, "m": (3, 5), "f": True})
        assert optstr.parse_optstr(s) == {"a": "1", "m": "3x5", "f": "1"}


class TestFrameBatch:
    def test_blank_yuv420(self):
        fb = FrameBatch.blank(4, 64, 48, ImageFormat.YUV420P, fps=25.0)
        assert fb.batch == 4 and fb.width == 64 and fb.height == 48
        assert fb.y.shape == (4, 48, 64)
        assert fb.u.shape == (4, 24, 32)
        assert np.asarray(fb.u)[0, 0, 0] == 128    # chroma neutral
        assert fb.frame_ids.tolist() == [0, 1, 2, 3]

    def test_blank_rgb(self):
        fb = FrameBatch.blank(2, 32, 16, ImageFormat.RGB24)
        assert fb.rgb.shape == (2, 16, 32, 3)
        assert fb.planes == (fb.rgb,)

    def test_attrs(self):
        import jax.numpy as jnp
        fb = FrameBatch.blank(3, 8, 8, ImageFormat.YUV420P)
        fb = fb.with_attrs(jnp.array([0, ATTR_SKIPPED, ATTR_END_OF_STREAM],
                                     dtype=jnp.int32))
        assert fb.has_attr(ATTR_SKIPPED).tolist() == [False, True, False]
        assert fb.needs_processing().tolist() == [True, True, False]

    def test_pytree(self):
        import jax
        fb = FrameBatch.blank(2, 16, 16, ImageFormat.YUV420P)
        fb2 = jax.tree_util.tree_map(lambda x: x, fb)
        assert fb2.format is ImageFormat.YUV420P
        assert fb2.y.shape == fb.y.shape

    def test_jit_through(self):
        import jax
        import jax.numpy as jnp

        @jax.jit
        def bump(fb: FrameBatch) -> FrameBatch:
            return fb.with_planes(y=fb.y + 1)

        fb = FrameBatch.blank(2, 16, 16, ImageFormat.YUV420P)
        out = bump(fb)
        assert int(np.asarray(out.y).max()) == 1


class TestJob:
    def test_export_size_chain(self):
        job = Job(im_v_width=720, im_v_height=576,
                  im_clip=(8, 8, 8, 8),        # -> 704x560
                  zoom_width=640, zoom_height=480)
        assert job.export_size() == (640, 480)

    def test_export_size_resize_units(self):
        job = Job(im_v_width=640, im_v_height=480, resize_up=(2, 1))
        assert job.export_size() == (656, 488)

    def test_validate(self):
        job = Job(im_v_width=64, im_v_height=48,
                  im_clip=(0, 40, 0, 40))
        with pytest.raises(ValueError):
            job.validate()

    def test_filter_spec(self):
        fs = FilterSpec.parse("hqdn3d=luma=6.0:pre=1")
        assert fs.name == "hqdn3d" and fs.options == "luma=6.0:pre=1"
        assert FilterSpec.parse("invert").options == ""
