"""CLI option surface: -w/-F/-R/-L/-S/-H/--debug/--avi_limit wiring."""

import os

import numpy as np
import pytest

from tcforge_tpu.cli import main
from tcforge_tpu.io.y4m import Y4MHeader, Y4MReader, Y4MWriter


def write_y4m(path, n, w, h, base=0):
    hdr = Y4MHeader(width=w, height=h, fps_num=25, fps_den=1)
    with Y4MWriter(str(path), hdr) as wr:
        for i in range(n):
            y = np.full((h, w), (base + i) % 256, np.uint8)
            c = np.full((h // 2, w // 2), 128, np.uint8)
            wr.write_frame(y, c, c)


class TestSeek:
    def test_L_skips_frames(self, tmp_path):
        src, dst = tmp_path / "in.y4m", tmp_path / "out.y4m"
        write_y4m(src, 10, 32, 16)
        rc = main(["-i", str(src), "-L", "4", "-o", str(dst),
                   "--progress_off", "-q"])
        assert rc == 0
        with Y4MReader(str(dst)) as r:
            vals = [fr[0][0, 0] for fr in r]
        assert vals == [4, 5, 6, 7, 8, 9]

    def test_L_avi_fast_seek(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        src, dst = tmp_path / "in.avi", tmp_path / "out.y4m"
        mid = tmp_path / "mid.y4m"
        write_y4m(mid, 8, 32, 16)
        rc = main(["-i", str(mid), "-o", str(src), "--progress_off",
                   "-q"])
        assert rc == 0
        rc = main(["-i", str(src), "-L", "5", "-o", str(dst),
                   "--progress_off", "-q"])
        assert rc == 0
        with Y4MReader(str(dst)) as r:
            vals = [fr[0][0, 0] for fr in r]
        assert vals == [5, 6, 7]


class TestEncoderOptions:
    @pytest.fixture(autouse=True)
    def _need_native(self):
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native library not built")

    def test_F_and_flush_trailing(self, tmp_path):
        """-F reaches the encoder; trailing non-anchor frames survive
        via the engine's encoder flush."""
        src = tmp_path / "in.y4m"
        out = tmp_path / "o.m2v"
        back = tmp_path / "b.y4m"
        write_y4m(src, 14, 48, 32, base=100)
        rc = main(["-i", str(src), "-y", "mpeg2,null",
                   "-F", "gop_n=12:gop_m=3:qscale=2", "-o", str(out),
                   "--progress_off", "-q"])
        assert rc == 0
        rc = main(["-i", str(out), "-o", str(back), "--progress_off",
                   "-q"])
        assert rc == 0
        with Y4MReader(str(back)) as r:
            assert len(list(r)) == 14

    def test_w_enables_rate_control(self, tmp_path):
        src = tmp_path / "in.y4m"
        # textured content (flat frames are DC-only: qscale-invariant)
        hdr = Y4MHeader(width=48, height=32, fps_num=25, fps_den=1)
        rng = np.random.default_rng(9)
        with Y4MWriter(str(src), hdr) as wr:
            for i in range(24):
                y = rng.integers(0, 256, (32, 48), dtype=np.uint8)
                c = np.full((16, 24), 128, np.uint8)
                wr.write_frame(y, c, c)
        o1, o2 = tmp_path / "lo.m2v", tmp_path / "hi.m2v"
        for out, kbps in ((o1, "100"), (o2, "2000")):
            rc = main(["-i", str(src), "-y", "mpeg2,null",
                       "-F", "gop_n=12:gop_m=1", "-w", kbps,
                       "-o", str(out), "--progress_off", "-q"])
            assert rc == 0
        assert o1.stat().st_size < o2.stat().st_size

    def test_R_two_pass(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 12, 48, 32)
        logf = tmp_path / "pass.log"
        rc = main(["-i", str(src), "-y", "mpeg2,null",
                   "-F", "gop_n=12:gop_m=1", "-w", "500",
                   "-R", f"1,{logf}", "-o", str(tmp_path / "p1.m2v"),
                   "--progress_off", "-q"])
        assert rc == 0
        assert len(logf.read_text().splitlines()) == 12
        rc = main(["-i", str(src), "-y", "mpeg2,null",
                   "-F", "gop_n=12:gop_m=1", "-w", "500",
                   "-R", f"2,{logf}", "-o", str(tmp_path / "p2.m2v"),
                   "--progress_off", "-q"])
        assert rc == 0


class TestMisc:
    def test_avi_limit_rotates(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 30, 64, 48)      # raw frames ~4.6KB each
        out = tmp_path / "out.avi"
        rc = main(["-i", str(src), "-o", str(out), "--avi_limit", "1",
                   "--progress_off", "-q"])
        assert rc == 0
        # 30*4.6KB < 1MB -> single chunk still gets the -000 name
        from tcforge_tpu.parallel.split import chunk_output_name
        assert os.path.exists(chunk_output_name(str(out), 0))

    def test_debug_channels(self, tmp_path, capsys):
        from tcforge_tpu.core import log
        src = tmp_path / "in.y4m"
        write_y4m(src, 2, 32, 16)
        rc = main(["-i", str(src), "-o", str(tmp_path / "o.y4m"),
                   "--debug", "threads,sync", "--progress_off", "-q"])
        assert rc == 0
        assert log.debug_enabled(log.DEBUG_THREADS)
        assert log.debug_enabled(log.DEBUG_SYNC)
        assert not log.debug_enabled(log.DEBUG_MODULES)
        log.set_debug_channels(0)
