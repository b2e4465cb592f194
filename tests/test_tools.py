"""CLI tool tests (tcprobe/avimerge/avisplit/avifix/tcmodinfo/tccat)."""

import json

import numpy as np
import pytest

from tcforge_tpu.io.avi import (AviAudioStream, AviReader, AviVideoStream,
                                AviWriter)
from tcforge_tpu.io.y4m import Y4MHeader, Y4MWriter

RNG = np.random.default_rng(5)


def make_avi(path, n=4, w=16, h=8, audio=False, payload_fn=None):
    vs = AviVideoStream(fourcc="I420", width=w, height=h, fps=25.0)
    ats = [AviAudioStream()] if audio else []
    payloads = []
    with AviWriter(str(path), vs, ats) as wr:
        for i in range(n):
            data = (payload_fn(i) if payload_fn
                    else bytes([i]) * (w * h * 3 // 2))
            payloads.append(data)
            wr.write_video_frame(data)
            if audio:
                wr.write_audio(b"\x01\x02" * 960)
    return payloads


class TestTcprobe:
    def test_human(self, tmp_path, capsys):
        from tcforge_tpu.tools.tcprobe import main
        p = tmp_path / "t.avi"
        make_avi(p)
        assert main(["-i", str(p)]) == 0
        out = capsys.readouterr().out
        assert "yuv420p 16x8" in out

    def test_machine(self, tmp_path, capsys):
        from tcforge_tpu.tools.tcprobe import main
        p = tmp_path / "t.y4m"
        with Y4MWriter(str(p), Y4MHeader(width=8, height=4)) as w:
            w.write_frame(np.zeros((4, 8), np.uint8),
                          np.zeros((2, 4), np.uint8),
                          np.zeros((2, 4), np.uint8))
        assert main(["-i", str(p), "-B"]) == 0
        d = json.loads(capsys.readouterr().out)
        assert d["width"] == 8 and d["magic"] == "yuv4mpeg"

    def test_missing(self, capsys):
        from tcforge_tpu.tools.tcprobe import main
        assert main(["-i", "/nonexistent"]) == 1


class TestAviTools:
    def test_merge(self, tmp_path):
        from tcforge_tpu.tools.avimerge import main
        p1, p2 = tmp_path / "a.avi", tmp_path / "b.avi"
        pay1 = make_avi(p1, n=3)
        pay2 = make_avi(p2, n=2, payload_fn=lambda i: bytes([i + 10]) * 192)
        out = tmp_path / "m.avi"
        assert main(["-o", str(out), "-i", str(p1), str(p2)]) == 0
        with AviReader(str(out)) as r:
            assert r.video_frames == 5
            assert r.read_video_frame(3)[0] == pay2[0]

    def test_merge_mismatch(self, tmp_path):
        from tcforge_tpu.tools.avimerge import merge
        p1, p2 = tmp_path / "a.avi", tmp_path / "b.avi"
        make_avi(p1, w=16, h=8)
        make_avi(p2, w=32, h=8)
        with pytest.raises(ValueError):
            merge([str(p1), str(p2)], str(tmp_path / "m.avi"))

    def test_split_and_rejoin(self, tmp_path):
        from tcforge_tpu.tools.avimerge import merge
        from tcforge_tpu.tools.avisplit import split
        src = tmp_path / "src.avi"
        payloads = make_avi(src, n=7)
        outs = split(str(src), 3)
        assert len(outs) == 3
        joined = tmp_path / "joined.avi"
        merge(outs, str(joined))
        with AviReader(str(joined)) as r:
            assert r.video_frames == 7
            for i, want in enumerate(payloads):
                assert r.read_video_frame(i)[0] == want

    def test_avifix_rebuilds_broken_index(self, tmp_path):
        from tcforge_tpu.tools.avifix import fix
        src = tmp_path / "src.avi"
        payloads = make_avi(src, n=4)
        raw = src.read_bytes()
        broken = tmp_path / "broken.avi"
        broken.write_bytes(raw[:raw.rfind(b"idx1")])   # strip index
        fixed = tmp_path / "fixed.avi"
        assert fix(str(broken), str(fixed)) == 4
        with AviReader(str(fixed)) as r:
            assert r.video_frames == 4
            assert r.read_video_frame(2)[0] == payloads[2]


class TestTcmodinfo:
    def test_inspect(self, capsys):
        from tcforge_tpu.tools.tcmodinfo import main
        assert main(["-i", "hqdn3d", "-t", "filter"]) == 0
        out = capsys.readouterr().out
        assert "luma" in out and "spatial" in out

    def test_chain_ok(self, capsys):
        from tcforge_tpu.tools.tcmodinfo import main
        assert main(["--chain", "raw", "y4m"]) == 0

    def test_list(self, capsys):
        from tcforge_tpu.tools.tcmodinfo import main
        assert main(["--list"]) == 0
        assert "filter:unsharp" in capsys.readouterr().out

    def test_socket_client(self, tmp_path, capsys):
        """-s mode drives a live control socket (tcmodinfo.c -s)."""
        import io
        import threading

        from tcforge_tpu.pipeline.control import ControlServer
        from tcforge_tpu.pipeline.engine import Counters
        from tcforge_tpu.tools.tcmodinfo import _socket_client
        from tcforge_tpu.core.job import Job

        class FakePipe:
            job = Job()
            chain_dirty = False
            counters = Counters(frames_in=3, encoded=2)
            interrupted = threading.Event()
            paused = threading.Event()

        path = str(tmp_path / "ctl.sock")
        srv = ControlServer(path, FakePipe())
        try:
            out = io.StringIO()
            rc = _socket_client(
                path, infile=io.StringIO("progress\nversion\nquit\n"),
                outfile=out)
            assert rc == 0
            text = out.getvalue()
            assert "frames=3" in text and "tcforge_tpu" in text
        finally:
            srv.close()

    def test_socket_client_no_server(self, tmp_path):
        from tcforge_tpu.tools.tcmodinfo import _socket_client
        assert _socket_client(str(tmp_path / "nope.sock")) == 1


class TestTccat:
    def test_cat(self, tmp_path, capsys):
        from tcforge_tpu.tools.tccat import main
        a, b = tmp_path / "a.bin", tmp_path / "b.bin"
        a.write_bytes(b"AAA")
        b.write_bytes(b"BBB")
        out = tmp_path / "out.bin"
        assert main(["-i", str(a), str(b), "-o", str(out)]) == 0
        assert out.read_bytes() == b"AAABBB"


class TestTcscan:
    def test_scan_y4m(self, tmp_path, capsys):
        from tcforge_tpu.tools.tcscan import main
        p = tmp_path / "t.y4m"
        with Y4MWriter(str(p), Y4MHeader(width=8, height=4)) as w:
            for _ in range(3):
                w.write_frame(np.full((4, 8), 100, np.uint8),
                              np.zeros((2, 4), np.uint8),
                              np.zeros((2, 4), np.uint8))
        assert main(["-i", str(p)]) == 0
        out = capsys.readouterr().out
        assert "3 frames" in out and "mean 100.0" in out


class TestAvisplitReferenceOptions:
    """avisplit.c option surface: -s (MB), -t ranges (+-c cat),
    -H first-n, -f comments."""

    def _src(self, tmp_path, n=10):
        src = tmp_path / "src.avi"
        payloads = make_avi(src, n=n)
        return src, payloads

    def test_size_based_split(self, tmp_path):
        from tcforge_tpu.tools.avisplit import split_by_size
        src, payloads = self._src(tmp_path)
        outs = split_by_size(str(src), 1)    # tiny frames: 1 chunk
        assert len(outs) == 1
        with AviReader(outs[0]) as r:
            assert r.video_frames == 10

    def test_time_range_extract(self, tmp_path):
        from tcforge_tpu.tools.avisplit import main
        src, payloads = self._src(tmp_path)
        # framecode syntax: [[H:]M:]S[.F] — .F adds FRAMES
        rc = main(["-i", str(src), "-t", "0:0:0.5-0:0:0.10",
                   "-o", str(tmp_path / "cut.avi")])
        assert rc == 0
        out = tmp_path / "cut-000.avi"
        assert out.exists()
        with AviReader(str(out)) as r:
            got = [r.read_video_frame(i)[0]
                   for i in range(r.video_frames)]
        # frames 5..12 clipped to 10 -> 5..9
        assert got == payloads[5:10]

    def test_cat_ranges_merge(self, tmp_path):
        from tcforge_tpu.tools.avisplit import split_spans
        src, payloads = self._src(tmp_path)
        outs = split_spans(str(src), [(0, 2), (5, 7)],
                           str(tmp_path / "cat.avi"), cat=True)
        assert len(outs) == 1
        with AviReader(outs[0]) as r:
            got = [r.read_video_frame(i)[0]
                   for i in range(r.video_frames)]
        assert got == payloads[0:2] + payloads[5:7]

    def test_first_n_chunks_and_comments(self, tmp_path):
        from tcforge_tpu.tools.avisplit import main
        src, payloads = self._src(tmp_path)
        com = tmp_path / "comments.txt"
        com.write_text("INAM Split Demo\nICMT chunked\n")
        rc = main(["-i", str(src), "--frames", "3", "-H", "2",
                   "-f", str(com), "-o", str(tmp_path / "c.avi")])
        assert rc == 0
        assert (tmp_path / "c-000.avi").exists()
        assert (tmp_path / "c-001.avi").exists()
        assert not (tmp_path / "c-002.avi").exists()
        with AviReader(str(tmp_path / "c-000.avi")) as r:
            assert r.info.get("INAM") == "Split Demo"


class TestAvimergeExtraAudio:
    def test_p_multiplexes_wav_track(self, tmp_path):
        """avimerge -p adds an audio track from a separate WAV
        (avimerge.c -p/-A)."""
        import numpy as np

        from tcforge_tpu.io.wav import WavInfo, WavWriter
        from tcforge_tpu.tools.avimerge import main
        src = tmp_path / "v.avi"
        make_avi(src, n=4, audio=False)
        wav = tmp_path / "a.wav"
        pcm = (np.arange(4800, dtype=np.int16)
               .reshape(-1, 2) % 2000)
        with WavWriter(str(wav), WavInfo(rate=48000,
                                         channels=2)) as w:
            w.write_samples(pcm)
        out = tmp_path / "m.avi"
        rc = main(["-i", str(src), "-o", str(out),
                   "-p", str(wav)])
        assert rc == 0
        with AviReader(str(out)) as r:
            assert r.video_frames == 4
            assert len(r.audio) == 1
            assert r.audio[0].rate == 48000
            got = b"".join(r.read_audio_chunks(0))
        assert got == pcm.tobytes()


class TestTcmodinfoReferenceOptions:
    def test_p_module_path(self, capsys):
        from tcforge_tpu.tools.tcmodinfo import main
        assert main(["-p"]) == 0
        assert "modules" in capsys.readouterr().out

    def test_M_parameter_info(self, capsys):
        from tcforge_tpu.tools.tcmodinfo import main
        assert main(["-i", "hqdn3d", "-M", "luma"]) == 0
        out = capsys.readouterr().out
        assert "luma" in out and "default" in out
        assert main(["-i", "hqdn3d", "-M", "nosuch"]) == 1

    def test_F_format_lookup(self, capsys):
        from tcforge_tpu.tools.tcmodinfo import main
        assert main(["-F", ".avi", "-t", "multiplex"]) == 0
        assert "avi" in capsys.readouterr().out
