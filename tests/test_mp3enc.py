"""Native MPEG-1 Layer III encoder (io/mp3enc.py): round-trip SNR
through the in-tree decoder, exact agreement between that decoder and
libavcodec on our streams, granule bit accounting (part2_3 must land
exactly), huffman table selection incl. ESC/linbits, and the lame
module fallback wiring."""

import numpy as np
import pytest

from tcforge_tpu.io.mp2dec import parse_mpa_header
from tcforge_tpu.io.mp3dec import Mp3Decoder, decode_stream
from tcforge_tpu.io.mp3enc import Mp3Encoder, NativeMp3Encoder

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available()
except Exception:
    HAVE_BRIDGE = False

needs_bridge = pytest.mark.skipif(
    not HAVE_BRIDGE, reason="FFmpeg bridge needed for the oracle")


def _tones(rate, nframes, nch, seed=0, noise=0.002):
    rng = np.random.RandomState(seed)
    n = 1152 * nframes
    t = np.arange(n) / rate
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.25 * np.sin(2 * np.pi * 1830 * t + 0.3)
           + 0.1 * np.sin(2 * np.pi * 5400 * t + 1.0)
           + noise * rng.standard_normal(n))
    pcm = np.clip(np.rint(sig * 28000), -32768, 32767).astype(np.int16)
    if nch == 2:
        return np.stack([pcm, np.roll(pcm, 57)], 1)
    return pcm[:, None]


def _encode(pcm, rate, nch, kbps):
    enc = Mp3Encoder(rate, nch, kbps)
    return b"".join(enc.encode_frame(pcm[i * 1152:(i + 1) * 1152])
                    for i in range(pcm.shape[0] // 1152)), enc


def _snr_aligned(ref, got, maxd=4000):
    ref = ref.astype(np.float64)
    got = got.astype(np.float64)
    best = -1.0
    for d in range(maxd):
        n = min(len(ref), len(got) - d)
        if n < 4000:
            break
        err = ref[:n] - got[d:d + n]
        best = max(best, 10 * np.log10(
            (ref[:n] ** 2).sum() / max((err ** 2).sum(), 1e-9)))
    return best


class TestBitstream:
    def test_headers(self):
        pcm = _tones(48000, 4, 2)
        stream, enc = _encode(pcm, 48000, 2, 192)
        fb = enc.frame_bytes
        assert len(stream) == 4 * fb
        for i in range(4):
            h = parse_mpa_header(stream[i * fb:i * fb + 4])
            assert h is not None and h.layer == 3 and h.version == 1
            assert h.bitrate_kbps == 192 and h.sample_rate == 48000

    def test_granule_bits_land_exactly(self):
        """The decoder records whether each granule's huffman decode
        consumed exactly part2_3_length bits — the strictest check
        that our bit accounting and emission agree."""
        pcm = _tones(44100, 6, 2, seed=3)
        stream, enc = _encode(pcm, 44100, 2, 160)
        dec = Mp3Decoder()
        fb = enc.frame_bytes
        for i in range(6):
            out = dec.decode_frame(stream[i * fb:(i + 1) * fb])
            assert out is not None
            assert dec.granule_bit_check is True

    def test_bitrate_snapping(self):
        assert Mp3Encoder(44100, 2, 200).bitrate_kbps == 192
        assert Mp3Encoder(44100, 2, 999).bitrate_kbps == 320

    def test_bad_modes_rejected(self):
        with pytest.raises(ValueError):
            Mp3Encoder(7350, 2, 128)    # not an MPA rate family
        with pytest.raises(ValueError):
            Mp3Encoder(44100, 3, 128)
        # 22050 is now a valid LSF rate (r5)
        assert Mp3Encoder(22050, 2, 64).samples == 576


class TestRoundTrip:
    @pytest.mark.parametrize("rate,kbps,floor", [
        (44100, 320, 45.0), (48000, 192, 40.0), (32000, 128, 38.0)])
    def test_stereo(self, rate, kbps, floor):
        pcm = _tones(rate, 10, 2)
        stream, _ = _encode(pcm, rate, 2, kbps)
        dec, r, ch = decode_stream(stream)
        assert (r, ch) == (rate, 2)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > floor
        assert _snr_aligned(pcm[:, 1], dec[:, 1]) > floor

    def test_mono(self):
        pcm = _tones(48000, 10, 1)
        stream, _ = _encode(pcm, 48000, 1, 160)
        dec, r, ch = decode_stream(stream)
        assert (r, ch) == (48000, 1)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 48.0

    def test_silence(self):
        pcm = np.zeros((1152 * 2, 2), np.int16)
        stream, _ = _encode(pcm, 44100, 2, 128)
        dec, _, _ = decode_stream(stream)
        assert np.abs(dec).max() <= 1

    def test_loud_broadband_exercises_esc_tables(self):
        """Full-scale noise forces large quantized values at low
        global gain headroom — the ESC/linbits coding path."""
        rng = np.random.RandomState(7)
        pcm = (rng.randint(-30000, 30000, (1152 * 6, 2))
               .astype(np.int16))
        stream, _ = _encode(pcm, 44100, 2, 320)
        dec, _, _ = decode_stream(stream)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 10.0


@needs_bridge
class TestExternalOracle:
    def _lavc(self, stream):
        d = _av.AvAudioDecoder("mp3")
        d.feed(stream)
        d.flush()
        chunks = []
        while True:
            r = d.read()
            if r is None:
                break
            chunks.append(r)
        d.close()
        return np.concatenate(chunks)

    def test_own_and_lavc_agree(self):
        pcm = _tones(44100, 8, 2, seed=4)
        stream, _ = _encode(pcm, 44100, 2, 256)
        own, _, _ = decode_stream(stream)
        ext = self._lavc(stream)
        m = min(len(own), len(ext))
        d = own[:m].astype(np.int32) - ext[:m].astype(np.int32)
        assert np.abs(d).max() <= 4

    def test_lavc_snr(self):
        pcm = _tones(48000, 8, 2, seed=5)
        stream, _ = _encode(pcm, 48000, 2, 320)
        ext = self._lavc(stream)
        assert _snr_aligned(pcm[:, 0], ext[:, 0]) > 45.0


class TestStreamingWrapper:
    def test_feed_flush_framing(self):
        pcm = _tones(44100, 5, 2)[:1152 * 4 + 300]
        enc = NativeMp3Encoder(44100, 2, 192000)
        enc.feed(pcm[:1700])
        enc.feed(pcm[1700:])
        enc.flush()
        pkts = enc.read_packets()
        assert len(pkts) == 5                  # 4 full + padded tail
        fb = 144000 * 192 // 44100
        assert all(len(p) == fb for p in pkts)
        dec, _, _ = decode_stream(b"".join(pkts))
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 38.0

    def test_module_fallback_forced(self, monkeypatch):
        from tcforge_tpu.core.frame import AudioBatch
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        monkeypatch.setenv("TCFORGE_NATIVE_MP3ENC", "1")
        job = Job()
        job.a_rate = 44100
        job.a_chan = 2
        mod = new_module(ModuleKind.ENCODER, "lame", job,
                         "bitrate=192")
        assert isinstance(mod._enc, NativeMp3Encoder)
        pcm = _tones(44100, 2, 2)
        out = mod.encode_audio(AudioBatch(pcm=pcm))
        out += mod.flush()
        dec, r, ch = decode_stream(b"".join(out))
        assert (r, ch) == (44100, 2)


class TestLsfEncode:
    """r5: MPEG-2 LSF + MPEG-2.5 Layer III ENCODE (one 576-sample
    granule per frame, 8-bit main_data_begin, 9-bit
    scalefac_compress, no preflag) — the reference reached these
    rates via lame only."""

    def _roundtrip(self, rate, ch, kbps, min_snr=50.0):
        from tcforge_tpu.io.mp3dec import decode_stream
        enc = Mp3Encoder(rate, ch, kbps)
        n = enc.samples
        assert n == 576
        t = np.arange(n * 16) / rate
        pcm = np.tile((0.5 * np.sin(2 * np.pi * 440 * t))[:, None],
                      (1, ch))
        stream = b"".join(enc.encode_frame(pcm[i * n:(i + 1) * n])
                          for i in range(16))
        dec, r, c = decode_stream(stream)
        assert (r, c) == (rate, ch)
        d = np.asarray(dec, np.float64)[n * 4:n * 12, 0] / 32768.0
        best = -99.0
        for lag in range(2400):
            seg_d = d[:len(d) - 2400]
            seg_s = pcm[n * 4 + lag:n * 4 + lag + len(seg_d), 0]
            if len(seg_s) < len(seg_d):
                break
            e = seg_s - seg_d
            best = max(best, 10 * np.log10(
                np.sum(seg_s ** 2) / max(np.sum(e ** 2), 1e-12)))
        assert best > min_snr, f"{rate}/{ch}/{kbps}: {best:.1f} dB"

    def test_lsf_rates(self):
        self._roundtrip(22050, 2, 64)
        self._roundtrip(24000, 2, 80)
        self._roundtrip(16000, 1, 32)

    def test_v25_rates(self):
        self._roundtrip(11025, 2, 40)
        self._roundtrip(12000, 1, 24)
        self._roundtrip(8000, 1, 16)

    @pytest.mark.skipif(not HAVE_BRIDGE, reason="oracle needs bridge")
    def test_lavc_decodes_lsf(self):
        import os
        import tempfile
        from tcforge_tpu.native import av as _av2
        rate, ch, kbps = 22050, 2, 64
        enc = Mp3Encoder(rate, ch, kbps)
        n = enc.samples
        t = np.arange(n * 12) / rate
        pcm = np.tile((0.5 * np.sin(2 * np.pi * 330 * t))[:, None],
                      (1, ch))
        stream = b"".join(enc.encode_frame(pcm[i * n:(i + 1) * n])
                          for i in range(12))
        f = tempfile.NamedTemporaryFile(suffix=".mp3", delete=False)
        f.write(stream)
        f.close()
        try:
            a = _av2.AvFileAudio(f.name)
            assert (a.rate, a.channels) == (rate, ch)
            chunks = []
            while True:
                g = a.read(4096)
                if g is None:
                    break
                if len(g):
                    chunks.append(g)
            d = np.concatenate(chunks).astype(np.float64) / 32768.0
        finally:
            os.unlink(f.name)
        dd = d[n * 4:n * 10, 0]
        best = -99.0
        for lag in range(2400):
            seg_d = dd[:len(dd) - 2400]
            seg_s = pcm[n * 4 + lag:n * 4 + lag + len(seg_d), 0]
            if len(seg_s) < len(seg_d):
                break
            e = seg_s - seg_d
            best = max(best, 10 * np.log10(
                np.sum(seg_s ** 2) / max(np.sum(e ** 2), 1e-12)))
        assert best > 50.0, f"lavc SNR {best:.1f} dB"
