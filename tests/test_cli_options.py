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


class TestRound2Options:
    """Second option batch: pre/post clips, audio formats, quantizers,
    pulldown, -W autosplit, -N, -O."""

    def test_pre_post_clip_pixels(self, tmp_path):
        src, dst = tmp_path / "in.y4m", tmp_path / "out.y4m"
        h, w = 32, 48
        hdr = Y4MHeader(width=w, height=h, fps_num=25, fps_den=1)
        with Y4MWriter(str(src), hdr) as wr:
            y = np.arange(h * w, dtype=np.uint8).reshape(h, w)
            c = np.full((h // 2, w // 2), 128, np.uint8)
            wr.write_frame(y, c, c)
        rc = main(["-i", str(src), "--pre_clip", "4,8",
                   "--post_clip", "2,4", "-o", str(dst),
                   "--progress_off", "-q"])
        assert rc == 0
        with Y4MReader(str(dst)) as r:
            out = next(iter(r))[0]
        y = np.arange(h * w, dtype=np.uint8).reshape(h, w)
        expect = y[4:-4, 8:-8][2:-2, 4:-4]
        assert out.shape == expect.shape
        np.testing.assert_array_equal(out, expect)

    def test_audio_format_options_parse(self):
        from tcforge_tpu.cli import args_to_job, build_parser
        args = build_parser().parse_args(
            ["-i", "x.y4m", "-e", "44100,8,1", "-n", "0x2000",
             "-b", "192,1,7.5,2", "-E", "32000,16,2",
             "--resync_margin", "3", "--resync_interval", "50",
             "--no_audio_adjust", "--antialias_para", "0.4,0.6",
             "--quantizers", "4,20", "--import_asr", "2",
             "--video_max_bitrate", "9000", "-O", "-A"])
        job = args_to_job(args)
        assert (job.a_rate, job.a_bits, job.a_chan) == (44100, 8, 1)
        assert job.a_codec_flag == 0x2000
        assert (job.mp3bitrate, job.a_vbr, job.mp3quality,
                job.mp3mode) == (192, 1, 7.5, 2)
        assert (job.mp3frequency, job.dm_bits, job.dm_chan) \
            == (32000, 16, 2)
        assert (job.resync_margin, job.resync_interval) == (3, 50)
        assert job.no_audio_adjust
        assert abs(job.antialias_weight - 0.4) < 1e-9
        assert abs(job.antialias_bias - 0.6) < 1e-9
        assert (job.min_quantizer, job.max_quantizer) == (4, 20)
        assert job.im_asr == 2
        assert job.video_max_bitrate == 9000
        assert not job.encoder_flush
        from tcforge_tpu.core.codecs import Codec
        assert job.im_a_codec == Codec.AC3

    def test_dvd_ts_flags_parse(self):
        from tcforge_tpu.cli import args_to_job, build_parser
        args = build_parser().parse_args(
            ["-i", "x", "-T", "2,3-5,1", "--ts_pid", "0x1e0",
             "--a52_drc_off", "--dv_yuy2_mode"])
        job = args_to_job(args)
        assert (job.dvd_title, job.dvd_chapter1, job.dvd_chapter2,
                job.dvd_angle) == (2, 3, 5, 1)
        assert job.ts_pid1 == 0x1E0
        assert job.a52_mode == 2
        assert job.dv_yuy2_mode

    def test_autosplit_chunks(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 10, 32, 16)
        o0, o1 = tmp_path / "c0.y4m", tmp_path / "c1.y4m"
        for n, out in ((0, o0), (1, o1)):
            rc = main(["-i", str(src), "-W", f"{n},2", "-o", str(out),
                       "--progress_off", "-q"])
            assert rc == 0
        with Y4MReader(str(o0)) as r:
            assert [f[0][0, 0] for f in r] == [0, 1, 2, 3, 4]
        with Y4MReader(str(o1)) as r:
            assert [f[0][0, 0] for f in r] == [5, 6, 7, 8, 9]

    def test_autosplit_percentage(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 10, 32, 16)
        out = tmp_path / "pc.y4m"
        rc = main(["-i", str(src), "-W", "20,30",
                   "--cluster_percentage", "-o", str(out),
                   "--progress_off", "-q"])
        assert rc == 0
        with Y4MReader(str(out)) as r:
            assert [f[0][0, 0] for f in r] == [2, 3, 4]

    def test_version_flag(self, capsys):
        import pytest as _pytest
        with _pytest.raises(SystemExit) as e:
            main(["-v"])
        assert e.value.code == 0
        assert "tcforge_tpu" in capsys.readouterr().out


class TestMpeg2NewOptions:
    @pytest.fixture(autouse=True)
    def _need_native(self):
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native library not built")

    @staticmethod
    def _pic_ext_flags(data):
        """Yield (top_field_first, repeat_first_field) per picture
        coding extension, plus the progressive_sequence bit."""
        import struct
        prog_seq = None
        flags = []
        i = 0
        while True:
            i = data.find(b"\x00\x00\x01\xb5", i)
            if i < 0:
                break
            ext_id = data[i + 4] >> 4
            if ext_id == 1:      # sequence extension
                # bits: 4 id + 8 profile -> progressive bit is next
                prog_seq = (data[i + 5] >> 3) & 1
            elif ext_id == 8:    # picture coding extension
                # 4 id + 16 fcodes + 2 dc + 2 struct = 24 bits, so
                # byte i+7 = tff fpfd conc qst ivlc ascan rff c420
                b3 = data[i + 7]
                tff = (b3 >> 7) & 1
                rff = (b3 >> 1) & 1
                flags.append((tff, rff))
            i += 4
        return prog_seq, flags

    def test_pulldown_cadence_intra(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 8, 48, 32)
        out = tmp_path / "o.m2v"
        rc = main(["-i", str(src), "-y", "mpeg2,null", "--pulldown",
                   "-o", str(out), "--progress_off", "-q"])
        assert rc == 0
        prog_seq, flags = self._pic_ext_flags(out.read_bytes())
        assert prog_seq == 0
        assert flags[:8] == [(1, 1), (0, 0), (0, 1), (1, 0)] * 2

    def test_pulldown_cadence_gop(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 8, 48, 32)
        out = tmp_path / "o.m2v"
        rc = main(["-i", str(src), "-y", "mpeg2,null", "--pulldown",
                   "-F", "gop_n=4:gop_m=2", "-o", str(out),
                   "--progress_off", "-q"])
        assert rc == 0
        prog_seq, flags = self._pic_ext_flags(out.read_bytes())
        assert prog_seq == 0
        # coded order != display order: collect by temporal_reference
        assert sorted(flags) == sorted(
            [(1, 1), (0, 0), (0, 1), (1, 0)] * 2)

    def test_video_max_bitrate_in_seq_header(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 2, 48, 32)
        out = tmp_path / "o.m2v"
        rc = main(["-i", str(src), "-y", "mpeg2,null",
                   "--video_max_bitrate", "9800", "-o", str(out),
                   "--progress_off", "-q"])
        assert rc == 0
        data = out.read_bytes()
        i = data.find(b"\x00\x00\x01\xb3")
        # bitrate: 18 bits starting after 12+12+4+4 = 32 bits
        word = int.from_bytes(data[i + 8:i + 12], "big")
        bitrate_400 = word >> 14
        assert bitrate_400 == 9800 * 1000 // 400

    def test_encoder_noflush_drops_tail(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 8, 48, 32, base=10)
        o1, o2 = tmp_path / "flush.m2v", tmp_path / "noflush.m2v"
        base_args = ["-i", str(src), "-y", "mpeg2,null",
                     "-F", "gop_n=6:gop_m=3", "--progress_off", "-q"]
        assert main(base_args + ["-o", str(o1)]) == 0
        assert main(base_args + ["-O", "-o", str(o2)]) == 0
        assert o2.stat().st_size < o1.stat().st_size

    def test_N_selects_encoder(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 2, 48, 32)
        out = tmp_path / "o.m2v"
        rc = main(["-i", str(src), "-N", "mpeg2video", "-y",
                   "mpeg2,null", "-o", str(out), "--progress_off",
                   "-q"])
        assert rc == 0
        data = out.read_bytes()
        assert data[:4] == b"\x00\x00\x01\xb3"

    def test_N_without_y(self, tmp_path):
        src = tmp_path / "in.y4m"
        write_y4m(src, 2, 48, 32)
        out = tmp_path / "o.m2v"
        rc = main(["-i", str(src), "-N", "mpeg2video",
                   "-o", str(out), "--progress_off", "-q"])
        assert rc == 0
        assert out.read_bytes()[:4] == b"\x00\x00\x01\xb3"

    def test_encode_fields_gop_roundtrip(self, tmp_path):
        """--encode_fields t + GOP options: field-coded I/P/B stream
        that the importer decodes back frame-exact."""
        src = tmp_path / "in.y4m"
        write_y4m(src, 6, 48, 32, base=40)
        out = tmp_path / "o.m2v"
        back = tmp_path / "b.y4m"
        rc = main(["-i", str(src), "-y", "mpeg2,null",
                   "--encode_fields", "t",
                   "-F", "gop_n=6:gop_m=2:qscale=2:alt_scan=1",
                   "-o", str(out), "--progress_off", "-q"])
        assert rc == 0
        rc = main(["-i", str(out), "-o", str(back), "--progress_off",
                   "-q"])
        assert rc == 0
        with Y4MReader(str(back)) as r:
            vals = [fr[0][0, 0] for fr in r]
        assert len(vals) == 6
        # flat frames survive quantization exactly: display order check
        assert vals == [40, 41, 42, 43, 44, 45]


class TestAccelFlag:
    def test_accel_none_disables_native(self, tmp_path):
        import os
        import subprocess
        import sys
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH="/root/repo")
        out = tmp_path / "o.y4m"
        r = subprocess.run(
            [sys.executable, "-m", "tcforge_tpu.cli", "-i", "test://",
             "-g", "64x48", "--max_frames", "4", "--accel", "none",
             "-J", "hqdn3d", "-o", str(out), "--progress_off"],
            env=env, capture_output=True, text=True)
        assert r.returncode == 0
        assert "native fast paths disabled" in r.stderr + r.stdout
        assert out.stat().st_size > 0
