"""-R multipass through the bridge encoders (encode_x264.c /
encode_xvid.c pass-log handling via AV_CODEC_FLAG_PASS1/2)."""

import os

import numpy as np
import pytest

from tcforge_tpu.core.job import Job
from tcforge_tpu.pipeline.engine import Pipeline


def _session(tmp_path, out_name, encoder, kbps, pass_n, log,
             n=50, codec_opts=""):
    out = tmp_path / out_name
    job = Job(video_in_file="test://", video_out_file=str(out),
              im_v_module="framegen", ex_v_module=encoder,
              ex_m_module="raw", im_v_width=160, im_v_height=128,
              fps=25.0, max_frames=n, batch_size=8, bitrate=kbps,
              divxmultipass=pass_n, divxlogfile=str(log))
    if codec_opts:
        job.ex_v_string = codec_opts
    Pipeline(job).run(progress=False)
    return out.stat().st_size


@pytest.fixture(scope="module")
def bridge():
    from tcforge_tpu.native import av
    if not av.available():
        pytest.skip("bridge not built")
    return av


class TestX264TwoPass:
    def test_pass1_writes_stats_and_pass2_hits_rate(self, tmp_path,
                                                    bridge):
        kbps = 40           # below the content's natural rate so the
        n = 50              # rate control is actually binding
        target = kbps * 1000 / 8 * (n / 25.0)     # bytes
        log = tmp_path / "x264.log"
        s1p = _session(tmp_path, "single.264", "x264", kbps, 0, log)
        sz1 = _session(tmp_path, "p1.264", "x264", kbps, 1, log)
        assert log.exists() and log.stat().st_size > 0
        sz2 = _session(tmp_path, "p2.264", "x264", kbps, 2, log)
        dev1 = abs(s1p - target) / target
        dev2 = abs(sz2 - target) / target
        # pass 2 must land at least as close to -w as single pass,
        # and within 30% of the target outright
        assert dev2 <= dev1 + 0.02, (s1p, sz2, target)
        assert dev2 < 0.30, (sz2, target)

    def test_pass2_without_stats_fails_cleanly(self, tmp_path,
                                               bridge):
        with pytest.raises(ValueError, match="stats"):
            _session(tmp_path, "p2.264", "x264", 150, 2,
                     tmp_path / "missing.log", n=8)


class TestLavcTwoPass:
    def test_mpeg4_two_pass(self, tmp_path, bridge):
        kbps = 200
        n = 50
        target = kbps * 1000 / 8 * (n / 25.0)
        log = tmp_path / "lavc.log"
        _session(tmp_path, "p1.m4v", "lavc", kbps, 1, log,
                 codec_opts="codec=mpeg4")
        assert log.exists() and log.stat().st_size > 0
        sz2 = _session(tmp_path, "p2.m4v", "lavc", kbps, 2, log,
                       codec_opts="codec=mpeg4")
        assert abs(sz2 - target) / target < 0.35, (sz2, target)
