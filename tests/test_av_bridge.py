"""FFmpeg bridge (native/tcforge_av.cpp via native/av.py).

These tests double as EXTERNAL GOLDEN VALIDATION for the in-tree
codecs: the Vorbis encoder/decoder are checked against FFmpeg's
independent implementation in both directions — the strongest
correctness evidence available in this environment."""

import numpy as np
import pytest

from tcforge_tpu.native import av

pytestmark = pytest.mark.skipif(not av.available(),
                                reason="FFmpeg bridge not built")


def parse_xiph(blob):
    n = blob[0]
    pos = 1
    lens = []
    for _ in range(n):
        ln = 0
        while blob[pos] == 255:
            ln += 255
            pos += 1
        ln += blob[pos]
        pos += 1
        lens.append(ln)
    out = []
    for ln in lens:
        out.append(blob[pos:pos + ln])
        pos += ln
    out.append(blob[pos:])
    return out


def best_snr(sig, rec, search=4096):
    best = 1e18
    for off in range(0, min(search, max(1, len(rec) - 1000))):
        n = min(len(sig), len(rec) - off)
        err = np.mean((rec[off:off + n] - sig[:n]) ** 2)
        best = min(best, err)
    return 10 * np.log10(np.mean(sig ** 2) / max(best, 1e-300))


class TestAudioBridge:
    def test_mp2_roundtrip(self):
        rate, ch = 48000, 2
        t = np.arange(rate) / rate
        sig = np.stack([0.5 * np.sin(2 * np.pi * 440 * t)] * ch, 1)
        enc = av.AvAudioEncoder("mp2", rate, ch, 224000)
        enc.feed((sig * 32767).astype(np.int16))
        enc.flush()
        es = enc.read()
        assert len(es) > 1000
        dec = av.AvAudioDecoder("mp2")
        dec.feed(es)
        dec.flush()
        got = dec.read()
        assert dec.rate == rate and dec.channels == ch
        rec = got.astype(np.float64) / 32768.0
        assert best_snr(sig, rec) > 35.0

    def test_mp3_decode_available(self):
        assert av.have_codec("mp3")
        assert av.have_codec("ac3")

    def test_chunked_feed_equals_whole(self):
        """Parser framing: byte-dribbled feeds decode identically."""
        rate = 44100
        t = np.arange(rate // 2) / rate
        sig = np.stack([0.4 * np.sin(2 * np.pi * 600 * t)] * 2, 1)
        enc = av.AvAudioEncoder("mp2", rate, 2, 192000)
        enc.feed((sig * 32767).astype(np.int16))
        enc.flush()
        es = enc.read()
        whole = av.AvAudioDecoder("mp2")
        whole.feed(es)
        whole.flush()
        a = whole.read()
        chunked = av.AvAudioDecoder("mp2")
        for i in range(0, len(es), 313):
            chunked.feed(es[i:i + 313])
        chunked.flush()
        b = chunked.read()
        np.testing.assert_array_equal(a, b)


class TestVorbisExternalValidation:
    """Both directions against FFmpeg's independent Vorbis code."""

    @pytest.mark.parametrize("passes,floor_db", [(5, 38.0), (6, 50.0),
                                                 (7, 60.0)])
    def test_our_encoder_decodes_in_ffmpeg(self, passes, floor_db):
        from tcforge_tpu.io.vorbisenc import VorbisEncoder
        rate, ch, n = 48000, 2, 512
        enc = VorbisEncoder(rate, ch, blocksize=n, passes=passes)
        dec = av.AvAudioDecoder("vorbis",
                                header_packets=enc.header_packets())
        t = np.arange(rate // 2) / rate
        sig = np.stack([0.6 * np.sin(2 * np.pi * 440 * t),
                        0.4 * np.sin(2 * np.pi * 1000 * t)], 1)
        hop = n // 2
        buf = np.concatenate([np.zeros((hop, ch)), sig,
                              np.zeros((2 * n, ch))], 0)
        pos = 0
        while pos + n <= buf.shape[0]:
            dec.feed(enc.encode_block(buf[pos:pos + n]))
            pos += hop
        dec.flush()
        got = dec.read()
        assert dec.rate == rate
        rec = got.astype(np.float64) / 32768.0
        # r4: quality scales ~12 dB per refinement pass at ~+20%
        # bitrate (measured 43.5 / 55.7 / 67.1 dB at 5/6/7 passes)
        assert best_snr(sig, rec) > floor_db

    @pytest.mark.parametrize("make_r", [
        lambda L, t: L,                                  # identical
        lambda L, t: -L,                                 # anti-phase
        lambda L, t: 0.5 * L,                            # scaled
        lambda L, t: 0.4 * np.sin(2 * np.pi * 1000 * t),  # uncorrelated
    ])
    def test_our_decoder_matches_ffmpeg_on_ffmpeg_streams(self, make_r):
        """FFmpeg-encoded Vorbis (real-world setup: bark floors,
        multi-class cascades, dim-8 books, coupling) must decode to
        the same PCM as FFmpeg's own decoder."""
        if not av.have_codec("vorbis", encoder=True):
            pytest.skip("no vorbis encoder in this FFmpeg")
        from tcforge_tpu.io.vorbis import VorbisDecoder
        rate = 48000
        enc = av.AvAudioEncoder("vorbis", rate, 2, 256000)
        enc.set_framed(True)
        t = np.arange(rate // 8) / rate
        L = 0.6 * np.sin(2 * np.pi * 440 * t)
        sig = np.stack([L, make_r(L, t)], 1)
        enc.feed(np.clip(sig * 32767, -32768, 32767).astype(np.int16))
        enc.flush()
        pkts = enc.read_packets()
        hdrs = parse_xiph(enc.extradata)
        ref = av.AvAudioDecoder("vorbis", header_packets=hdrs)
        ours = VorbisDecoder()
        for h in hdrs:
            ours.header_packet(h)
        oc = []
        for p in pkts:
            x = ours.audio_packet(p)
            if x is not None and len(x):
                oc.append(x)
            ref.feed(p)
        ref.flush()
        r = ref.read().astype(np.float64) / 32768.0
        o = np.concatenate(oc)
        n = min(len(r), len(o))
        err = np.mean((o[:n] - r[:n]) ** 2)
        snr = 10 * np.log10(np.mean(r ** 2) / max(err, 1e-300))
        assert snr > 60.0, snr


class TestVideoBridge:
    def test_mpeg4_roundtrip(self):
        enc = av.AvVideoEncoder("mpeg4", 64, 48, 25.0, gop=5)
        dec = av.AvVideoDecoder("mpeg4")
        rng = np.random.default_rng(0)
        frames = []
        pkts = []
        for i in range(6):
            y = np.full((48, 64), 40 + 30 * i, np.uint8)
            y[10:20, 10:30] = 200
            frames.append(y)
            pkts += enc.encode(y, np.full((24, 32), 100, np.uint8),
                               np.full((24, 32), 150, np.uint8))
        pkts += enc.flush()
        assert len(pkts) == 6
        outs = []
        for p, key in pkts:
            got = dec.decode(p)
            if got:
                outs.append(got[0])
        assert len(outs) == 6
        for a, b in zip(frames, outs):
            assert np.abs(a.astype(int) - b.astype(int)).mean() < 4.0

    def test_dv_decoder_present(self):
        assert av.have_codec("dvvideo")


class TestBridgeModules:
    def test_lavc_avi_roundtrip(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        from tcforge_tpu.pipeline.engine import Pipeline
        out = tmp_path / "l.avi"
        job = Job(video_in_file="test://", video_out_file=str(out),
                  im_v_module="framegen", ex_v_module="lavc",
                  ex_m_module="avi", im_v_width=64, im_v_height=48,
                  fps=25.0, max_frames=8, batch_size=4)
        job.ex_v_fcc = "DIVX"
        Pipeline(job).run(progress=False)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "avi", Job())
        imp.open(str(out))
        got = 0
        while True:
            b = imp.read_video_batch(4)
            if b is None:
                break
            got += next(iter(b.values())).shape[0]
        assert got == 8

    def _encode(self, tmp_path, name, enc, mux, ext, w=64, h=48,
                frames=8):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        out = tmp_path / f"{name}.{ext}"
        job = Job(video_in_file="test://", video_out_file=str(out),
                  im_v_module="framegen", ex_v_module=enc,
                  ex_m_module=mux, im_v_width=w, im_v_height=h,
                  fps=25.0, max_frames=frames, batch_size=4)
        c = Pipeline(job).run(progress=False)
        assert c.encoded == frames
        return out

    def _reimport(self, path, module, frames):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        imp = new_module(ModuleKind.DEMULTIPLEXOR, module, Job())
        imp.open(str(path))
        got = 0
        while True:
            b = imp.read_video_batch(4)
            if b is None:
                break
            got += next(iter(b.values())).shape[0]
        assert got == frames, (module, got)

    def test_x264_avi_roundtrip(self, tmp_path):
        """x264 encode (libx264 via bridge) -> AVI 'H264' -> decodes
        back through the avi importer's compressed-fourcc delegation
        AND external FFmpeg (cv2)."""
        out = self._encode(tmp_path, "x", "x264", "avi", "avi")
        self._reimport(out, "avi", 8)
        import cv2
        cap = cv2.VideoCapture(str(out))
        n = 0
        while cap.read()[0]:
            n += 1
        assert n == 8

    def test_xvid_avi_roundtrip(self, tmp_path):
        out = self._encode(tmp_path, "xv", "xvid", "avi", "avi")
        self._reimport(out, "avi", 8)

    def test_theora_ogg_roundtrip(self, tmp_path):
        """theora encode -> native theora logical stream in ogg ->
        our ogg importer AND external FFmpeg (cv2) read it back."""
        out = self._encode(tmp_path, "th", "theora", "ogg", "ogg")
        self._reimport(out, "ogg", 8)
        import cv2
        cap = cv2.VideoCapture(str(out))
        n = 0
        while cap.read()[0]:
            n += 1
        assert n == 8

    def test_dv_encode_roundtrip(self, tmp_path):
        """dv encode (dvvideo) -> raw .dv stream -> dv importer."""
        out = self._encode(tmp_path, "d", "dv", "raw", "dv",
                           w=720, h=576)
        self._reimport(out, "dv", 8)

    def test_dv_rejects_bad_geometry(self):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        job = Job(video_in_file="test://", video_out_file="/dev/null",
                  im_v_module="framegen", ex_v_module="dv",
                  ex_m_module="raw", im_v_width=64, im_v_height=48,
                  fps=25.0, max_frames=4, batch_size=4)
        with pytest.raises(ValueError, match="720x576"):
            Pipeline(job).run(progress=False)

    def test_lavf_native_mp4(self, tmp_path):
        """x264+lame -> native libavformat MP4; FFmpeg (cv2) reads
        the video track and libavformat decodes the audio track."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        out = tmp_path / "o.mp4"
        job = Job(video_in_file="test://", video_out_file=str(out),
                  im_v_module="framegen", ex_v_module="x264",
                  ex_a_module="lame", ex_m_module="lavf",
                  im_v_width=64, im_v_height=48, fps=25.0,
                  max_frames=8, batch_size=4)
        Pipeline(job).run(progress=False)
        import cv2
        cap = cv2.VideoCapture(str(out))
        n = 0
        while cap.read()[0]:
            n += 1
        assert n == 8
        from tcforge_tpu.native.av import AvFileAudio
        a = AvFileAudio(str(out))
        total = 0
        while True:
            g = a.read()
            if g is None:
                break
            total += len(g)
        assert a.rate == 48000 and total > 10000

    def test_mp4_full_circle(self, tmp_path):
        """mp4 (x264+mp3) -> ffmpeg importer -> y4m + wav: exact
        frame and sample counts back out."""
        import wave
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        mp4 = tmp_path / "c.mp4"
        job = Job(video_in_file="test://", video_out_file=str(mp4),
                  im_v_module="framegen", ex_v_module="x264",
                  ex_a_module="lame", ex_m_module="lavf",
                  im_v_width=64, im_v_height=48, fps=25.0,
                  max_frames=10, batch_size=5)
        Pipeline(job).run(progress=False)
        y4m, wav = tmp_path / "b.y4m", tmp_path / "b.wav"
        job2 = Job(video_in_file=str(mp4), video_out_file=str(y4m),
                   audio_out_file=str(wav), im_v_module="ffmpeg",
                   ex_m_module="y4m", batch_size=5)
        c = Pipeline(job2).run(progress=False)
        assert c.encoded == 10
        w = wave.open(str(wav))
        assert w.getframerate() == 48000
        assert abs(w.getnframes() - 48000 * 10 / 25.0) < 2400

    def test_lavf_native_ts(self, tmp_path):
        """mpeg2 -> native MPEG-TS out; our own TS importer AND
        FFmpeg read it back."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        out = tmp_path / "o.ts"
        job = Job(video_in_file="test://", video_out_file=str(out),
                  im_v_module="framegen", ex_v_module="mpeg2",
                  ex_m_module="lavf", im_v_width=64, im_v_height=48,
                  fps=25.0, max_frames=8, batch_size=4)
        Pipeline(job).run(progress=False)
        import cv2
        cap = cv2.VideoCapture(str(out))
        n = 0
        while cap.read()[0]:
            n += 1
        assert n == 8
        self._reimport(out, "mpeg", 8)

    def test_mp2enc_module_roundtrip(self, tmp_path):
        import wave
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        rate = 48000
        t = np.arange(rate // 2) / rate
        sig = np.stack([0.5 * np.sin(2 * np.pi * 440 * t)] * 2, 1)
        with wave.open(str(tmp_path / "a.wav"), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes((sig * 32767).astype("<i2").tobytes())
        out = tmp_path / "a.mp2"
        job = Job()
        job.video_in_file = str(tmp_path / "a.wav")
        job.video_out_file = str(out)
        job.ex_a_module = "mp2enc"
        job.ex_m_module = "raw"
        Pipeline(job).run(progress=False)
        dec = av.AvAudioDecoder("mp2")
        dec.feed(out.read_bytes())
        dec.flush()
        rec = dec.read().astype(np.float64) / 32768.0
        # job-default bitrate (128 kbps): lower fidelity than the
        # direct 224 kbps bridge test above
        assert best_snr(sig, rec) > 28.0

    def test_mp3_importer_module(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        rate = 44100
        t = np.arange(rate // 2) / rate
        sig = np.stack([0.5 * np.sin(2 * np.pi * 440 * t)] * 2, 1)
        enc = av.AvAudioEncoder("mp3", rate, 2, 192000)
        enc.feed((sig * 32767).astype(np.int16))
        enc.flush()
        (tmp_path / "a.mp3").write_bytes(enc.read())
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mp3", Job())
        imp.open(str(tmp_path / "a.mp3"))
        assert imp.audio_rate == rate
        chunks = []
        while True:
            a = imp.read_audio_batch(4096)
            if a is None:
                break
            chunks.append(a)
        rec = np.concatenate(chunks).astype(np.float64) / 32768.0
        assert best_snr(sig, rec) > 25.0


class TestVcdProfile:
    def test_vcd_profile_end_to_end(self, tmp_path):
        """--export_prof vcd-pal: true MPEG-1 video + MP2 audio in a
        program stream that round-trips through the own importer."""
        import subprocess
        import sys
        import os as _os
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native library not built")
        env = dict(_os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH="/root/repo")
        out = tmp_path / "vcd.mpg"
        r = subprocess.run(
            [sys.executable, "-m", "tcforge_tpu.cli", "-i", "test://",
             "-g", "64x48", "--max_frames", "6", "--export_prof",
             "vcd-pal", "-F", "gop_n=3:gop_m=1:qscale=8",
             "-Z", "352x288", "-o", str(out), "--progress_off"],
            env=env, capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-500:]
        data = out.read_bytes()
        assert data[:4] == b"\x00\x00\x01\xba"
        assert b"\x00\x00\x01\xb3" in data       # sequence header
        assert b"\x00\x00\x01\xb5" not in data   # true MPEG-1
        assert b"\x00\x00\x01\xc0" in data       # MP2 audio PES
        from tcforge_tpu.io.probe import probe_file
        from tcforge_tpu.core.codecs import Codec
        info = probe_file(str(out))
        assert info.codec == Codec.MPEG1
        assert info.tracks and info.tracks[0].codec == Codec.MP2

    def test_svcd_profile_end_to_end(self, tmp_path):
        """--export_prof svcd-pal: MPEG-2 video + MP2 audio PS."""
        import subprocess
        import sys
        import os as _os
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native library not built")
        env = dict(_os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH="/root/repo")
        out = tmp_path / "svcd.mpg"
        r = subprocess.run(
            [sys.executable, "-m", "tcforge_tpu.cli", "-i", "test://",
             "-g", "64x48", "--max_frames", "6", "--export_prof",
             "svcd-pal", "-F", "gop_n=3:gop_m=1:qscale=8",
             "-Z", "480x576", "-o", str(out), "--progress_off"],
            env=env, capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-500:]
        data = out.read_bytes()
        assert b"\x00\x00\x01\xb5" in data       # MPEG-2 extension
        assert b"\x00\x00\x01\xc0" in data       # MP2 audio PES
        from tcforge_tpu.io.probe import probe_file
        from tcforge_tpu.core.codecs import Codec
        info = probe_file(str(out))
        assert info.codec == Codec.MPEG2
        assert (info.width, info.height) == (480, 576)


class Test422ExternalValidation:
    """4:2:2 MPEG-2 cross-validation against libavcodec: FFmpeg
    encodes 422P@ML P/B streams our native decoder must reconstruct,
    and decodes them itself as the reference output."""

    def _src(self, w, h, n=8, seed=11):
        rng = np.random.default_rng(seed)
        base_y = rng.integers(0, 256, (h, w), np.uint8)
        base_u = rng.integers(0, 256, (h, w // 2), np.uint8)
        base_v = rng.integers(0, 256, (h, w // 2), np.uint8)
        frames = []
        for i in range(n):
            frames.append((np.roll(base_y, i * 2, 1),
                           np.roll(base_u, i, 1),
                           np.roll(base_v, i, 1)))
        return frames

    def _psnr(self, a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 10 * np.log10(255 ** 2 / max(mse, 1e-9))

    def test_ffmpeg_422_stream_decodes_natively(self, tmp_path):
        """libavcodec mpeg2video(yuv422p, IP GOP) -> our native
        422 P/B reconstruction, checked frame by frame against
        libavcodec's own decode."""
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native host library not built")
        w, h = 64, 48
        frames = self._src(w, h)
        enc = av.AvVideoEncoder(
            "mpeg2video", w, h, fps=25.0, bitrate=6_000_000, gop=4,
            opts={"pixel_format": "yuv422p", "bf": "0",
                  "flags": "+cgop",
                  "sc_threshold": "1000000000"})
        es = b""
        for y, u, v in frames:
            for payload, _key in enc.encode(y, u, v):
                es += payload
        for payload, _key in enc.flush():
            es += payload
        enc.close()
        assert es, "bridge produced no 422 stream"

        # our native decode (display order == coded order: bf=0)
        from tcforge_tpu.io.mpeg2codec import iter_decode_full
        ours = list(iter_decode_full(es + b"\x00\x00\x01\xb7"))
        assert len(ours) == len(frames)

        # libavcodec's own decode of the same stream, 4:2:2 out
        dec = av.AvVideoDecoder("mpeg2video")
        theirs = []
        for pkt in self._split_pictures(es):
            got = dec.decode(pkt, chroma=2)
            if got is not None:
                theirs.append(got)
        theirs.extend(dec.flush(chroma=2))
        dec.close()
        assert dec.last_src_chroma == 2
        assert len(theirs) == len(frames)
        for i, ((oy, ou, ov), (ty, tu, tv)) in enumerate(
                zip(ours, theirs)):
            # ours is downconverted to 4:2:0 at the API boundary;
            # compare luma exactly-ish and chroma via decimation
            assert self._psnr(oy, ty) > 45, f"frame {i} luma"
            from tcforge_tpu.io.mpeg2codec import chroma_422_to_420
            assert self._psnr(ou, chroma_422_to_420(tu)) > 43, \
                f"frame {i} chroma"

    @staticmethod
    def _split_pictures(es):
        """Split an ES at picture start codes (one packet per coded
        picture, sequence headers glued to the following picture)."""
        import re
        starts = [m.start() for m in
                  re.finditer(b"\x00\x00\x01\x00", es)]
        # prepend headers before the first picture to packet 0
        cuts = [0] + starts[1:] + [len(es)]
        return [es[cuts[i]:cuts[i + 1]]
                for i in range(len(cuts) - 1)]


class TestDPictureDifferentiator:
    def test_ffmpeg_cannot_decode_d_pictures(self):
        """Document the differentiator: libavcodec's mpeg1video
        decoder (like the reference's libmpeg2) rejects D-picture
        sequences that our native codec round-trips bit-exactly
        (tests/test_mpeg1.py::TestMpeg1DPictures)."""
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        rng = np.random.default_rng(7)
        enc = Mpeg2FullEncoder(64, 48, 25.0, qscale=8, gop_n=4,
                               gop_m=1, mpeg1=True, dpict=True)
        es = b""
        for _ in range(4):
            es += enc.push_frame(
                rng.integers(0, 256, (48, 64), np.uint8),
                rng.integers(0, 256, (24, 32), np.uint8),
                rng.integers(0, 256, (24, 32), np.uint8))
        es += enc.flush()
        dec = av.AvVideoDecoder("mpeg1video")
        got = []
        import re
        starts = [m.start() for m in
                  re.finditer(b"\x00\x00\x01\x00", es)]
        cuts = [0] + starts[1:] + [len(es)]
        for i in range(len(cuts) - 1):
            try:
                r = dec.decode(es[cuts[i]:cuts[i + 1]])
            except ValueError:
                r = None
            if r is not None:
                got.append(r)
        got.extend(dec.flush())
        dec.close()
        assert got == []               # libavcodec: nothing decodes


class Test422SessionEncode:
    def test_cli_422_session_encodes_422_mpeg2(self, tmp_path):
        """-V yuv422p + lavc pixel_format=yuv422p emits a true
        4:2:2 MPEG-2 ES that the native decoder reads back."""
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native host library not built")
        from tcforge_tpu.cli import main
        out = tmp_path / "out.m2v"
        rc = main(["-i", "test://", "-g", "64x48", "--max_frames",
                   "6", "-V", "yuv422p", "-y",
                   "lavc=codec=mpeg2video:pixel_format=yuv422p:bf=0,"
                   "raw", "-o", str(out), "--progress_off", "-q"])
        assert rc == 0
        es = out.read_bytes()
        bs = native.NativeMpeg2Bitstream(es)
        assert bs.chroma == 2
        bs.close()
        from tcforge_tpu.io.mpeg2codec import iter_decode_full
        frames = list(iter_decode_full(es))
        assert len(frames) == 6
        assert frames[0][0].shape == (48, 64)


class TestAudioOnlyLavfSession:
    def test_flac_to_wav_bitexact(self, tmp_path):
        """Audio-only files the bridge demuxes (flac/aac/...) drive an
        audio-only session through the ffmpeg importer; FLAC is
        lossless so the WAV out matches the source PCM exactly."""
        pcm = (np.sin(np.linspace(0, 300, 48000 * 2))
               .reshape(-1, 2) * 12000).astype(np.int16)
        enc = av.AvAudioEncoder("flac", 48000, 2, 0)
        enc.set_framed(True)
        enc.feed(pcm)
        enc.flush()
        pkts = enc.read_packets()
        fs = enc.frame_size or 4608
        src = tmp_path / "tone.flac"
        mux = av.AvMuxer(str(src), "")
        ai = mux.add_audio("flac", 48000, 2, enc.extradata or b"")
        mux.write_header()
        pts = 0
        for payload in pkts:
            mux.write(ai, payload, pts, fs, True)
            pts += fs
        mux.close()

        from tcforge_tpu.cli import main
        out = tmp_path / "tone.wav"
        rc = main(["-i", str(src), "-o", str(out),
                   "--progress_off", "-q"])
        assert rc == 0
        from tcforge_tpu.io.wav import WavReader
        r = WavReader(str(out))
        got = []
        while True:
            s = r.read_samples(1 << 16)
            if s is None:
                break
            got.append(s)
        dec = np.concatenate(got)
        assert r.info.rate == 48000 and r.info.channels == 2
        n = len(pcm)
        assert len(dec) >= n
        np.testing.assert_array_equal(dec[:n], pcm)

    def test_wav_flac_wav_lossless_circle(self, tmp_path):
        """Both directions: -y null,flac,lavf writes a real .flac
        (audio-only native lavf mux) and reading it back is
        bit-exact."""
        import numpy as np

        from tcforge_tpu.cli import main
        from tcforge_tpu.io.wav import WavInfo, WavReader, WavWriter
        pcm = (np.sin(np.linspace(0, 200, 24000 * 2))
               .reshape(-1, 2) * 9000).astype(np.int16)
        src = tmp_path / "t.wav"
        with WavWriter(str(src), WavInfo(rate=48000,
                                         channels=2)) as w:
            w.write_samples(pcm)
        mid = tmp_path / "t.flac"
        assert main(["-i", str(src), "-y", "null,flac,lavf",
                     "-o", str(mid), "--progress_off", "-q"]) == 0
        back = tmp_path / "t2.wav"
        assert main(["-i", str(mid), "-o", str(back),
                     "--progress_off", "-q"]) == 0
        r = WavReader(str(back))
        got = []
        while True:
            s = r.read_samples(1 << 16)
            if s is None:
                break
            got.append(s)
        dec = np.concatenate(got)
        np.testing.assert_array_equal(dec[:len(pcm)], pcm)


class TestPixelFormatGuard:
    """ADVICE r3 (high): a pixel_format AVOption that switches the
    context away from planar 4:2:0/4:2:2 must fail at open(), not
    segfault in tc_avve_feed (NULL data[1] for gray) or silently
    over-read the chroma planes (yuv444p)."""

    def test_gray_rejected_at_open(self):
        with pytest.raises(Exception):
            av.AvVideoEncoder("ffv1", 64, 48, 25.0,
                              opts={"pixel_format": "gray"})

    def test_yuv444p_now_allowed(self):
        """r5: the bridge feeds yuv444p (chroma family 4) for the
        theora 4:4:4 oracle — full-resolution chroma planes encode."""
        enc = av.AvVideoEncoder("ffv1", 64, 48, 25.0,
                                opts={"pixel_format": "yuv444p"})
        y = np.zeros((48, 64), np.uint8)
        pkts = enc.encode(y, y, y) + enc.flush()
        enc.close()
        assert any(len(p) for p, _ in pkts)

    def test_yuv422p_still_allowed(self):
        enc = av.AvVideoEncoder("ffv1", 64, 48, 25.0,
                                opts={"pixel_format": "yuv422p"})
        y = np.zeros((48, 64), np.uint8)
        c = np.zeros((48, 32), np.uint8)
        pkts = enc.encode(y, c, c) + enc.flush()
        enc.close()
        assert any(len(p) for p, _ in pkts)


class TestCopyNotAudioOnly:
    def test_copy_vmod_does_not_open_audio_only_mux(self):
        """ADVICE r3: ex_v_module='copy' emits real video payloads;
        routing it to the audio-only native mux would write a header
        then die in write_video mid-run."""
        from types import SimpleNamespace
        from tcforge_tpu.modules.muxers.basic import LavfMuxer
        job = SimpleNamespace(
            ex_v_module="copy", ex_a_module="lame", ex_v_fcc=None,
            audio_only_session=False, a_rate=48000,
            audio_out_file=None, ex_v_width=64, ex_v_height=48,
            im_v_width=64, im_v_height=48, out_fps=25.0, fps=25.0,
            extradata={})
        mux = LavfMuxer.__new__(LavfMuxer)
        mux.job = job
        mux.options = {}
        assert mux._try_native("/tmp/never-written.mkv") is False
