"""Encoder configuration files — x264.cfg / xvid.cfg / lavc.cfg tier.

Mirrors encode_x264.c:919 / encode_xvid.c:692 / encode_lavc.c:1288:
cfg file read from "." + config dirs (section=NULL reads the whole
file; lavc reads the [codec] section), then the module option string
re-parsed on top so every cfg option works on the command line.
"""

import numpy as np
import pytest

from tcforge_tpu.native import av

needs_bridge = pytest.mark.skipif(not av.available(),
                                  reason="FFmpeg bridge not built")


class TestCfgParsing:
    def test_read_flat_ignores_sections_and_flags(self, tmp_path):
        from tcforge_tpu.core.cfgfile import read_flat
        p = tmp_path / "xvid.cfg"
        p.write_text("# comment\n"
                     "[features]\n"
                     "quant_type = h263\n"
                     "max_bframes = 1\n"
                     "[quality]\n"
                     "trellis = 0\n"
                     "2pass_bug_workaround\n")
        got = read_flat(str(p))
        assert got == {"quant_type": "h263", "max_bframes": "1",
                       "trellis": "0", "2pass_bug_workaround": ""}

    def test_read_encoder_cfg_search_order(self, tmp_path, monkeypatch):
        from tcforge_tpu.modules.encoders.encoder_cfg import \
            read_encoder_cfg
        (tmp_path / "x264.cfg").write_text("qp = 30\n")
        monkeypatch.setenv("TCFORGE_CONFIG_DIR", str(tmp_path))
        assert read_encoder_cfg("x264.cfg") == {"qp": "30"}
        assert read_encoder_cfg("nosuch.cfg") == {}

    def test_read_encoder_cfg_section(self, tmp_path, monkeypatch):
        from tcforge_tpu.modules.encoders.encoder_cfg import \
            read_encoder_cfg
        (tmp_path / "lavc.cfg").write_text(
            "[mpeg4]\nqmin = 8\n[mpeg2video]\nqmin = 2\n")
        monkeypatch.setenv("TCFORGE_CONFIG_DIR", str(tmp_path))
        assert read_encoder_cfg("lavc.cfg", "mpeg4") == {"qmin": "8"}
        assert read_encoder_cfg("lavc.cfg", "h263") == {}

    def test_x264_avopts(self):
        from tcforge_tpu.modules.encoders.encoder_cfg import x264_avopts
        got = x264_avopts({"qp": "20", "cabac": "", "nodeterministic": "",
                           "2pass_bug_workaround": ""})
        parts = got["x264-params"].split(":")
        assert "qp=20" in parts
        assert "cabac=1" in parts
        assert "deterministic=0" in parts
        assert not any("2pass" in p for p in parts)
        assert x264_avopts({}) == {}

    def test_xvid_avopts(self):
        from tcforge_tpu.modules.encoders.encoder_cfg import xvid_avopts
        got = xvid_avopts({"max_bframes": "2", "quant_type": "mpeg",
                           "bquant_ratio": "150", "closed_gop": "1",
                           "quarterpel": "0", "unknown_thing": "7"})
        assert got["bf"] == "2"
        assert got["mpeg_quant"] == "1"
        assert got["b_quant_factor"] == "1.5"
        assert got["flags"] == "+cgop-qpel"
        assert "unknown_thing" not in got

    def test_split_extra_options(self):
        from tcforge_tpu.modules.encoders.encoder_cfg import \
            split_extra_options
        from tcforge_tpu.modules.encoders.bridge_video import X264Encoder
        known, extra = split_extra_options(
            X264Encoder.desc, "bitrate=900:qp=20:cabac")
        assert "bitrate=900" in known
        assert extra == {"qp": "20", "cabac": ""}


@needs_bridge
class TestCfgE2E:
    def _run(self, tmp_path, name, enc, optstring="", frames=8):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        out = tmp_path / f"{name}.avi"
        job = Job(video_in_file="test://", video_out_file=str(out),
                  im_v_module="framegen", ex_v_module=enc,
                  ex_m_module="avi", im_v_width=192, im_v_height=144,
                  fps=25.0, max_frames=frames, batch_size=4,
                  ex_v_string=optstring)
        c = Pipeline(job).run(progress=False)
        assert c.encoded == frames
        # coded video bytes, not file size — the AVI header/index
        # padding (~64KB) would swamp the comparison at this scale
        from tcforge_tpu.io.avi import AviReader
        r = AviReader(out)
        return sum(sz for _off, sz, _fl in r._video_index)

    def test_x264_cfg_reaches_encoder(self, tmp_path, monkeypatch):
        """qp=40 via x264.cfg produces a much smaller stream than
        qp=8 — proves the cfg file drives libx264."""
        monkeypatch.setenv("TCFORGE_CONFIG_DIR", str(tmp_path))
        (tmp_path / "x264.cfg").write_text("qp = 40\n")
        small = self._run(tmp_path, "small", "x264")
        (tmp_path / "x264.cfg").write_text("qp = 8\n")
        big = self._run(tmp_path, "big", "x264")
        assert big > small * 2, (big, small)

    def test_x264_optstring_overrides_cfg(self, tmp_path, monkeypatch):
        """Command-line qp=8 wins over the cfg file's qp=40
        (encode_x264.c re-parses ex_v_string after the cfg read)."""
        monkeypatch.setenv("TCFORGE_CONFIG_DIR", str(tmp_path))
        (tmp_path / "x264.cfg").write_text("qp = 40\n")
        small = self._run(tmp_path, "s2", "x264")
        big = self._run(tmp_path, "b2", "x264", optstring="qp=8")
        assert big > small * 2, (big, small)

    def test_xvid_cfg_reaches_encoder(self, tmp_path, monkeypatch):
        """min/max quant forced coarse via xvid.cfg shrinks output."""
        monkeypatch.setenv("TCFORGE_CONFIG_DIR", str(tmp_path))
        (tmp_path / "xvid.cfg").write_text(
            "[quantizer]\nmin_iquant = 31\nmax_iquant = 31\n")
        small = self._run(tmp_path, "xs", "xvid")
        (tmp_path / "xvid.cfg").write_text(
            "[quantizer]\nmin_iquant = 1\nmax_iquant = 2\n")
        big = self._run(tmp_path, "xb", "xvid")
        assert big > small, (big, small)

    def test_lavc_cfg_section(self, tmp_path, monkeypatch):
        """lavc.cfg [mpeg4] section reaches the lavc encoder."""
        monkeypatch.setenv("TCFORGE_CONFIG_DIR", str(tmp_path))
        (tmp_path / "lavc.cfg").write_text(
            "[mpeg4]\nqmin = 31\nqmax = 31\n")
        small = self._run(tmp_path, "ls", "lavc")
        (tmp_path / "lavc.cfg").write_text(
            "[mpeg4]\nqmin = 1\nqmax = 2\n")
        big = self._run(tmp_path, "lb", "lavc")
        assert big > small, (big, small)

    def test_unknown_key_warns_not_fatal(self, tmp_path, monkeypatch):
        """A bogus cfg key is skipped with a warning, never fatal
        (tc_config_read_file tolerance)."""
        monkeypatch.setenv("TCFORGE_CONFIG_DIR", str(tmp_path))
        (tmp_path / "x264.cfg").write_text(
            "totally_bogus_key = 1\nqp = 30\n")
        assert self._run(tmp_path, "w", "x264") > 0


class TestAdviceR3Fixes:
    def test_no_prefix_negation_restricted_to_known_pairs(self):
        # ADVICE r3: a bare key that merely *starts* with "no" must
        # not be mangled into a different option
        from tcforge_tpu.modules.encoders.encoder_cfg import x264_avopts
        got = x264_avopts({"noise_reduction": ""})
        assert got["x264-params"] == "noise_reduction=1"
        # the real conf-table pairs still negate
        got = x264_avopts({"nocabac": "", "nodeterministic": ""})
        parts = got["x264-params"].split(":")
        assert "cabac=0" in parts and "deterministic=0" in parts

    def test_colon_values_rejected(self):
        from tcforge_tpu.modules.encoders.encoder_cfg import x264_avopts
        got = x264_avopts({"qp": "20", "evil": "a:b=1"})
        assert got["x264-params"] == "qp=20"
