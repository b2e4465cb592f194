"""Program stream writer tests (io/psmux.py + the mpg muxer)."""

import io
import wave

import numpy as np
import pytest

from tcforge_tpu.io import mpeg
from tcforge_tpu.io.psmux import (PsWriter, lpcm_packet, pack_header,
                                  pes_packet, system_header)


class TestUnits:
    def test_pack_header_parses(self, tmp_path):
        data = pack_header(90000) + pes_packet(0xE0, b"\x01\x02\x03")
        p = tmp_path / "a.ps"
        p.write_bytes(data)
        pkts = list(mpeg.iter_pes_packets(str(p)))
        assert pkts == [(0xE0, b"\x01\x02\x03")]

    def test_pes_pts_roundtrip(self):
        pkt = pes_packet(0xE0, b"\x00\x00\x01\x00zz", pts=123456789)
        # payload after 6-byte header
        assert mpeg.pes_pts(pkt[6:]) == 123456789

    def test_lpcm_packet_parses(self):
        rng = np.random.default_rng(0)
        pcm = rng.integers(-2000, 2000, (480, 2)).astype(np.int16)
        pkt = lpcm_packet(pcm, 48000, 1, pts=900)
        payload = mpeg._strip_pes_header(pkt[6:])
        got = mpeg.parse_lpcm_payload(payload)
        assert got is not None
        np.testing.assert_array_equal(got[0], pcm)
        assert got[1] == 48000

    def test_writer_stream_structure(self):
        buf = io.BytesIO()
        w = PsWriter(buf, fps=25.0, audio_rate=48000)
        w.write_video(b"\x00\x00\x01\x00" + b"v" * 5000)
        w.write_audio_pcm(np.zeros((960, 2), np.int16))
        w.close()
        data = buf.getvalue()
        assert data.startswith(b"\x00\x00\x01\xba")
        assert b"\x00\x00\x01\xbb" in data          # system header
        assert data.endswith(b"\x00\x00\x01\xb9")   # program end

    def test_video_pts_on_access_units(self, tmp_path):
        buf = io.BytesIO()
        w = PsWriter(buf, fps=25.0)
        w.write_video(b"\x00\x00\x01\x00" + b"a" * 4000)
        w.write_video(b"\x00\x00\x01\x00" + b"b" * 100)
        w.close()
        p = tmp_path / "a.ps"
        p.write_bytes(buf.getvalue())
        ptss = [pts for sid, pl, pts in
                mpeg.iter_pes_packets(str(p), with_pts=True)
                if sid == 0xE0]
        # first chunk of each picture has a PTS, continuations None
        assert ptss[0] is not None
        assert ptss[1] is None          # continuation of picture 1
        assert ptss[2] is not None
        assert ptss[2] > ptss[0]


class TestPipelineRoundTrip:
    def test_vob_av_roundtrip(self, tmp_path):
        """framegen -> mpeg2 + PCM -> .vob -> import -> y4m + wav."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native library not built")
        vob = tmp_path / "t.vob"
        job = Job(video_in_file="test://", video_out_file=str(vob),
                  im_v_module="framegen", ex_v_module="mpeg2",
                  ex_m_module="mpg", im_v_width=64, im_v_height=48,
                  fps=25.0, max_frames=10, batch_size=4)
        job.ex_v_fcc = "gop_n=5:gop_m=1:qscale=4"
        Pipeline(job).run(progress=False)
        assert vob.stat().st_size > 0

        from tcforge_tpu.io.probe import probe_file
        info = probe_file(str(vob))
        assert info.is_video and info.tracks

        out_y4m = tmp_path / "b.y4m"
        out_wav = tmp_path / "b.wav"
        job2 = Job(video_in_file=str(vob),
                   video_out_file=str(out_y4m),
                   audio_out_file=str(out_wav))
        Pipeline(job2).run(progress=False)
        from tcforge_tpu.io.y4m import Y4MReader
        with Y4MReader(str(out_y4m)) as r:
            frames = list(r)
        assert len(frames) == 10
        with wave.open(str(out_wav)) as w:
            assert w.getframerate() == 48000
            # 10 frames at 25 fps = 0.4 s = 19200 samples
            assert abs(w.getnframes() - 19200) <= 480

    def test_non_dvd_rate_rejected(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        job = Job()
        job.a_rate = 22050
        job.dm_chan = 2
        mux = new_module(ModuleKind.MULTIPLEXOR, "mpg", job)
        with pytest.raises(ValueError, match="LPCM"):
            mux.open(str(tmp_path / "x.mpg"))


class TestBFrameTimeline:
    def test_gop_m3_pts_per_picture(self, tmp_path):
        """gop_m=3 payloads carry several pictures; every picture gets
        its own PES + display-timeline PTS and SCR stays behind PTS."""
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native library not built")
        rng = np.random.default_rng(1)
        enc = Mpeg2FullEncoder(64, 48, 25.0, qscale=4, gop_n=6,
                               gop_m=3, search_range=4)
        buf = io.BytesIO()
        w = PsWriter(buf, fps=25.0)
        nf = 9
        for i in range(nf):
            w.write_video(enc.push_frame(
                rng.integers(0, 256, (48, 64), np.uint8),
                np.full((24, 32), 100, np.uint8),
                np.full((24, 32), 150, np.uint8)))
        w.write_video(enc.flush())
        w.close()
        p = tmp_path / "b.mpg"
        p.write_bytes(buf.getvalue())
        ptss = [pts for sid, pl, pts in
                mpeg.iter_pes_packets(str(p), with_pts=True)
                if sid == 0xE0 and pts is not None]
        assert len(ptss) == nf           # one PTS per coded picture
        ft = 90000 / 25.0
        # PTS values cover the DISPLAY timeline exactly once each
        disp = sorted(round((t - PsWriter.DELAY) / ft) for t in ptss)
        assert disp == list(range(1, nf + 1))

    def test_mpeg1_gop_timeline(self, tmp_path):
        """MPEG-1 GOP-relative trefs resolve to a monotone display
        timeline through the GOP-base tracking."""
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native library not built")
        rng = np.random.default_rng(2)
        enc = Mpeg2FullEncoder(64, 48, 25.0, qscale=4, gop_n=4,
                               gop_m=2, search_range=4, mpeg1=True)
        buf = io.BytesIO()
        w = PsWriter(buf, fps=25.0)
        nf = 10
        for i in range(nf):
            w.write_video(enc.push_frame(
                rng.integers(0, 256, (48, 64), np.uint8),
                np.full((24, 32), 100, np.uint8),
                np.full((24, 32), 150, np.uint8)))
        w.write_video(enc.flush())
        w.close()
        p = tmp_path / "m1.mpg"
        p.write_bytes(buf.getvalue())
        ptss = [pts for sid, pl, pts in
                mpeg.iter_pes_packets(str(p), with_pts=True)
                if sid == 0xE0 and pts is not None]
        ft = 90000 / 25.0
        disp = sorted(round((t - PsWriter.DELAY) / ft) for t in ptss)
        assert disp == list(range(1, nf + 1))


class TestLpcmTrackSelect:
    def test_second_track_via_a(self, tmp_path):
        """Two LPCM sub-streams: -a 1 picks 0xA1, default picks 0xA0
        and never merges both."""
        import struct
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        from tcforge_tpu.io.mpeg2codec import Mpeg2Encoder

        def pes(sid, payload):
            hdr = b"\x80\x00\x00"
            return (b"\x00\x00\x01" + bytes([sid])
                    + struct.pack(">H", len(hdr) + len(payload)) + hdr
                    + payload)

        enc = Mpeg2Encoder(32, 32, 25.0, qscale=4)
        es = enc.sequence_header() + enc.encode_frame(
            np.full((32, 32), 90, np.uint8),
            np.full((16, 16), 100, np.uint8),
            np.full((16, 16), 150, np.uint8))
        pack = b"\x00\x00\x01\xba" + bytes([0x44] + [0] * 8
                                           + [0, 0, 0xF8])
        t0 = (np.arange(480, dtype=np.int16) * 3).astype(">i2")
        t1 = (np.arange(480, dtype=np.int16) * 7).astype(">i2")
        info = (0 << 6) | (0 << 4) | 0          # 48 kHz mono
        out = bytearray()
        out += pack + pes(0xE0, es)
        for sub, pcm in ((0xA0, t0), (0xA1, t1)):
            priv = bytes([sub, 1, 0, 4, 0, info, 0]) + pcm.tobytes()
            out += pes(0xBD, priv)
        out += b"\x00\x00\x01\xb9"
        p = tmp_path / "two.vob"
        p.write_bytes(bytes(out))

        def read_pcm(track):
            job = Job()
            job.a_track = track
            imp = new_module(ModuleKind.DEMULTIPLEXOR, "mpeg", job,
                             "stream=0")
            imp.open(str(p))
            imp.read_video_batch(2)
            a = imp.read_audio_batch(10 ** 6)
            return None if a is None else np.asarray(a)

        a0 = read_pcm(0)
        a1 = read_pcm(1)
        np.testing.assert_array_equal(
            a0[:, 0], t0.astype("<i2").astype(np.int16))
        np.testing.assert_array_equal(
            a1[:, 0], t1.astype("<i2").astype(np.int16))
        assert a0.shape[0] == 480 and a1.shape[0] == 480
