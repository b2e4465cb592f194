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


class TestMoreOptions:
    def test_avi_comments(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 3, 32, 16)
        cf = tmp_path / "comments.txt"
        cf.write_text("INAM My Title\nICMT transcoded by tcforge\n")
        out = tmp_path / "o.avi"
        rc = main(["-i", str(src), "-o", str(out),
                   "--avi_comments", str(cf), "--progress_off", "-q"])
        assert rc == 0
        from tcforge_tpu.io.avi import AviReader
        r = AviReader(str(out))
        assert r.info.get("INAM") == "My Title"
        assert "tcforge" in r.info.get("ICMT", "")

    def test_split_time_rotates(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 10, 32, 16)
        out = tmp_path / "o.y4m"
        # 25 fps source, 0.2 s -> rotate every 5 frames -> 2 chunks
        rc = main(["-i", str(src), "-o", str(out),
                   "--split_time", "0.2", "--progress_off", "-q"])
        assert rc == 0
        from tcforge_tpu.parallel.split import chunk_output_name
        with Y4MReader(chunk_output_name(str(out), 0)) as r:
            assert len(list(r)) == 5
        with Y4MReader(chunk_output_name(str(out), 1)) as r:
            assert len(list(r)) == 5

    def test_av_fine_ms_shifts_audio(self):
        import numpy as np
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.synchronizer import new_synchronizer
        job = Job(a_rate=48000)
        job.av_fine_ms = 10            # 480 samples dropped
        s = new_synchronizer(job)
        pcm = np.arange(2000, dtype=np.int16).reshape(-1, 1)
        out = s.process_audio(pcm, spf=100)
        assert out[0, 0] == 480
        job2 = Job(a_rate=48000)
        job2.av_fine_ms = -10          # 480 samples of silence first
        s2 = new_synchronizer(job2)
        out2 = s2.process_audio(pcm, spf=100)
        assert out2.shape[0] == 2480
        assert out2[0, 0] == 0 and out2[480, 0] == 0  # pcm starts at 0

    def test_passthrough_and_misc_flags(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 2, 32, 16)
        pidf = tmp_path / "pid"
        rc = main(["-i", str(src), "-o", str(tmp_path / "o.y4m"),
                   "-P", "1", "-Q", "3", "-a", "0",
                   "--write_pid", str(pidf), "--accel", "sse2",
                   "--progress_off", "-q"])
        assert rc == 0
        assert pidf.read_text().strip().isdigit()

    def test_hard_fps(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 2, 32, 16)      # probed fps = 25
        out = tmp_path / "o.y4m"
        rc = main(["-i", str(src), "-o", str(out), "-f", "30",
                   "--hard_fps", "--progress_off", "-q"])
        assert rc == 0
        with Y4MReader(str(out)) as r:
            assert abs(r.header.fps - 30.0) < 0.01
