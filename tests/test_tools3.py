"""tcdecode / tcmodchain / tcxpm2rgb tools + OGG muxer round trip."""

import numpy as np
import pytest

from tcforge_tpu.core.job import Job


class TestTcdecode:
    def test_mpeg2_to_raw(self, tmp_path, capsys):
        from tcforge_tpu.io.mpeg2codec import Mpeg2Encoder
        from tcforge_tpu.tools.tcdecode import main
        w, h = 48, 32
        y = np.linspace(16, 234, w * h, dtype=np.uint8).reshape(h, w)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 150, np.uint8)
        es = tmp_path / "v.m2v"
        enc = Mpeg2Encoder(w, h, 25.0, qscale=2)
        es.write_bytes(enc.encode_frame(y, u, v) + enc.sequence_end())
        out = tmp_path / "out.raw"
        rc = main(["-i", str(es), "-o", str(out), "-x", "mpeg2"])
        assert rc == 0
        raw = np.frombuffer(out.read_bytes(), np.uint8)
        assert raw.size == w * h * 3 // 2
        dy = raw[:w * h].reshape(h, w)
        mse = np.mean((dy.astype(float) - y) ** 2)
        assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 40

    def test_ulaw(self, tmp_path):
        from tcforge_tpu.tools.tcdecode import _ulaw_decode, main
        # mu-law 0xFF encodes 0
        assert _ulaw_decode(b"\xff")[0] == 0
        # golden: encode a few values with the standard formula inverse
        src = tmp_path / "a.ul"
        src.write_bytes(bytes([0xFF, 0x7F, 0x80, 0x00]))
        out = tmp_path / "a.pcm"
        assert main(["-i", str(src), "-o", str(out), "-x", "ulaw"]) == 0
        pcm = np.frombuffer(out.read_bytes(), np.int16)
        assert pcm[0] == 0
        assert pcm[1] < 0 or pcm[1] == 0      # 0x7F: max negative? sign
        assert abs(int(pcm[2])) > 30000       # 0x80 ~ loudest positive
        assert pcm[3] < -30000                # 0x00 ~ loudest negative

    def test_unknown_codec(self, capsys):
        from tcforge_tpu.tools.tcdecode import main
        import io, sys
        old = sys.stdin
        try:
            sys.stdin = type("S", (), {"buffer": io.BytesIO(b"")})()
            assert main(["-x", "nosuch"]) == 1
        finally:
            sys.stdin = old


class TestTcmodchain:
    def test_check_ok(self, capsys):
        from tcforge_tpu.tools.tcmodchain import main
        assert main(["-C", "encode:mpeg2", "mux:avi"]) == 0

    def test_check_mismatch(self):
        from tcforge_tpu.tools.tcmodchain import main
        # wav muxer takes PCM only; mpeg2 encoder emits MPEG2
        assert main(["-C", "encode:mpeg2", "mux:wav"]) == 1

    def test_list_muxers_for_encoder(self, capsys):
        from tcforge_tpu.tools.tcmodchain import main
        assert main(["-L", "encode:mpeg2", "mux:*"]) == 0
        names = capsys.readouterr().out.split()
        assert "avi" in names
        assert "wav" not in names

    def test_list_encoders_for_muxer(self, capsys):
        from tcforge_tpu.tools.tcmodchain import main
        assert main(["-L", "encode:*", "mux:y4m"]) == 0
        names = capsys.readouterr().out.split()
        assert "raw" in names or "copy" in names


class TestTcxpm2rgb:
    XPM = '''/* XPM */
static char *test[] = {
"4 2 3 1",
"  c #000000",
"x c #FF0000",
". c white",
"  x.",
"xx. "
};
'''

    def test_convert(self, tmp_path):
        from tcforge_tpu.tools.tcxpm2rgb import main
        src = tmp_path / "t.xpm"
        src.write_text(self.XPM)
        out = tmp_path / "t.rgb"
        assert main(["-i", str(src), "-o", str(out)]) == 0
        img = np.frombuffer(out.read_bytes(), np.uint8).reshape(2, 4, 3)
        np.testing.assert_array_equal(img[0, 0], [0, 0, 0])
        np.testing.assert_array_equal(img[0, 2], [255, 0, 0])
        np.testing.assert_array_equal(img[0, 3], [255, 255, 255])
        np.testing.assert_array_equal(img[1, 0], [255, 0, 0])

    def test_named_and_none(self, tmp_path):
        from tcforge_tpu.tools.tcxpm2rgb import parse_xpm
        xpm = ('"2 1 2 1",\n"a c None",\n"b c blue",\n"ab"')
        w, h, img = parse_xpm(xpm)
        np.testing.assert_array_equal(img[0, 0], [0, 0, 0])
        np.testing.assert_array_equal(img[0, 1], [0, 0, 255])


class TestOggMux:
    def test_pipeline_roundtrip(self, tmp_path):
        """framegen -> ogg muxer -> ogg importer -> bit-exact planes."""
        from tcforge_tpu.pipeline.engine import Pipeline
        from tcforge_tpu.io.y4m import Y4MHeader, Y4MWriter, Y4MReader
        rng = np.random.default_rng(7)
        n, w, h = 5, 32, 16
        frames = [(rng.integers(0, 256, (h, w), dtype=np.uint8),
                   rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
                   rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8))
                  for _ in range(n)]
        src = tmp_path / "in.y4m"
        hdr = Y4MHeader(width=w, height=h, fps_num=25, fps_den=1)
        with Y4MWriter(str(src), hdr) as wr:
            for fr in frames:
                wr.write_frame(*fr)
        mid = tmp_path / "mid.ogm"
        job = Job()
        job.video_in_file = str(src)
        job.video_out_file = str(mid)
        job.im_v_module = "y4m"
        job.batch_size = 2
        Pipeline(job).run(progress=False)
        assert mid.stat().st_size > 0

        # read back through the importer
        dst = tmp_path / "out.y4m"
        job2 = Job()
        job2.video_in_file = str(mid)
        job2.video_out_file = str(dst)
        job2.ex_m_module = "y4m"
        Pipeline(job2).run(progress=False)
        with Y4MReader(str(dst)) as r:
            got = list(r)
        assert len(got) == n
        for a, b in zip(frames, got):
            for pa, pb in zip(a, b):
                np.testing.assert_array_equal(pa, pb)

    def test_page_writer_lacing(self, tmp_path):
        """Packets > 255*MAX_SEGS bytes must span pages and reassemble."""
        import io
        from tcforge_tpu.io.ogg import (OggPageWriter, iter_pages,
                                        pages_to_packets)
        buf = io.BytesIO()
        wtr = OggPageWriter(buf, 42)
        big = bytes(range(256)) * 300          # 76800 bytes
        wtr.write_packet(b"hdr", 0, flush=True)
        wtr.write_packet(big, 1, flush=True)
        wtr.write_packet(b"tail", 2, flush=True)
        wtr.close()
        buf.seek(0)
        pkts = [p for _, p in
                pages_to_packets(iter_pages(buf, check_crc=True),
                                 serial=42)]
        assert pkts == [b"hdr", big, b"tail"]


class TestTcdecodeIPB:
    def test_decodes_pb_stream(self, tmp_path):
        """tcdecode -x mpeg2 must use the full decoder (code-review
        finding: was the intra-only path)."""
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native library not built")
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        from tcforge_tpu.tools.tcdecode import main
        enc = Mpeg2FullEncoder(48, 32, 25.0, qscale=2, gop_n=6,
                               gop_m=3)
        es = b""
        base = np.linspace(20, 200, 32 * 48).reshape(32, 48)
        for i in range(7):
            y = np.clip(base + i * 3, 0, 255).astype(np.uint8)
            c = np.full((16, 24), 128, np.uint8)
            es += enc.push_frame(y, c, c)
        es += enc.flush()
        src = tmp_path / "v.m2v"
        src.write_bytes(es)
        out = tmp_path / "v.raw"
        assert main(["-i", str(src), "-o", str(out),
                     "-x", "mpeg2"]) == 0
        raw = out.read_bytes()
        assert len(raw) == 7 * (48 * 32 * 3 // 2)


class TestTcdecodeBridge:
    def test_ac3_decode(self, tmp_path):
        """tcdecode -x ac3 (decode_a52.c role via the bridge)."""
        import numpy as np
        from tcforge_tpu.native import av
        if not av.available():
            import pytest
            pytest.skip("bridge not built")
        enc = av.AvAudioEncoder("ac3", 48000, 2, 192000)
        t = np.arange(24000)
        pcm = (np.sin(t / 20) * 8000).astype(np.int16)
        enc.feed(np.stack([pcm, pcm], 1))
        enc.flush()
        src = tmp_path / "t.ac3"
        src.write_bytes(enc.read())
        out = tmp_path / "t.pcm"
        from tcforge_tpu.tools.tcdecode import main
        assert main(["-i", str(src), "-x", "ac3",
                     "-o", str(out)]) == 0
        assert out.stat().st_size > 20000 * 2 * 2

    def test_dv_decode(self, tmp_path):
        """tcdecode -x dv (decode_dv.c role via the bridge)."""
        import numpy as np
        from tcforge_tpu.native import av
        if not av.available():
            import pytest
            pytest.skip("bridge not built")
        enc = av.AvVideoEncoder("dvvideo", 720, 576, 25.0)
        u = np.full((288, 360), 128, np.uint8)
        pkts = []
        for i in range(3):
            y = np.full((576, 720), 40 * i + 20, np.uint8)
            pkts += enc.encode(y, u, u)
        pkts += enc.flush()
        src = tmp_path / "t.dv"
        src.write_bytes(b"".join(p for p, _ in pkts))
        out = tmp_path / "t.yuv"
        from tcforge_tpu.tools.tcdecode import main
        assert main(["-i", str(src), "-x", "dv", "-o", str(out)]) == 0
        assert out.stat().st_size == 3 * (720 * 576 * 3 // 2)


class TestTcdecodeRound3Late:
    """decode_{lzo,mp2,mov}.c handler parity (tcdecode.c:63-77)."""

    def test_lzo_frames(self, tmp_path):
        import numpy as np
        from tcforge_tpu.io.tclzo import compress_frame
        from tcforge_tpu.tools.tcdecode import main
        raw1 = np.random.default_rng(0).integers(
            0, 256, 5000, np.uint8).tobytes()
        raw2 = b"abcd" * 800
        src = tmp_path / "t.lzo"
        src.write_bytes(compress_frame(raw1) + compress_frame(raw2))
        out = tmp_path / "t.raw"
        assert main(["-i", str(src), "-x", "lzo",
                     "-o", str(out)]) == 0
        assert out.read_bytes() == raw1 + raw2

    def test_mp2_decode(self, tmp_path):
        import numpy as np
        import pytest as _pytest
        from tcforge_tpu.native import av
        if not av.available():
            _pytest.skip("FFmpeg bridge not built")
        from tcforge_tpu.tools.tcdecode import main
        enc = av.AvAudioEncoder("mp2", 48000, 2, 224000)
        pcm = (np.sin(np.arange(48000 * 2).reshape(-1, 2) * 0.05)
               * 20000).astype(np.int16)
        enc.feed(pcm)
        enc.flush()
        src = tmp_path / "t.mp2"
        src.write_bytes(enc.read())
        out = tmp_path / "t.pcm"
        assert main(["-i", str(src), "-x", "mp2",
                     "-o", str(out)]) == 0
        got = np.frombuffer(out.read_bytes(), np.int16)
        assert len(got) > 40000 * 2     # ~1 s stereo decoded

    def test_mov_decode(self, tmp_path):
        import numpy as np
        import pytest as _pytest
        cv2 = _pytest.importorskip("cv2")
        from tcforge_tpu.tools.tcdecode import main
        src = tmp_path / "t.mp4"
        wr = cv2.VideoWriter(str(src),
                             cv2.VideoWriter_fourcc(*"mp4v"),
                             25, (64, 48))
        for i in range(5):
            wr.write(np.full((48, 64, 3), i * 40, np.uint8))
        wr.release()
        out = tmp_path / "t.yuv"
        assert main(["-i", str(src), "-x", "mov",
                     "-o", str(out)]) == 0
        assert out.stat().st_size == 5 * (64 * 48 * 3 // 2)
