"""Native MPEG-1 Layer II encoder (io/mpaenc.py): round-trip SNR
through the in-tree oracle-validated decoder, exact agreement between
that decoder and libavcodec on our streams (proves spec-valid
bitstreams), table B.2a-d selection, scfsi losslessness, and the
mp2enc module fallback wiring."""

import numpy as np
import pytest

from tcforge_tpu.io.mp2dec import decode_stream, parse_mpa_header
from tcforge_tpu.io.mpaenc import Mp2Encoder, NativeAudioEncoder

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available()
except Exception:
    HAVE_BRIDGE = False

needs_bridge = pytest.mark.skipif(
    not HAVE_BRIDGE, reason="FFmpeg bridge needed for the oracle")


def _tones(rate, nframes, nch, seed=0):
    rng = np.random.RandomState(seed)
    n = 1152 * nframes
    t = np.arange(n) / rate
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.25 * np.sin(2 * np.pi * 1830 * t + 0.3)
           + 0.1 * np.sin(2 * np.pi * 5400 * t + 1.0)
           + 0.002 * rng.standard_normal(n))
    pcm = np.clip(np.rint(sig * 28000), -32768, 32767).astype(np.int16)
    if nch == 2:
        return np.stack([pcm, np.roll(pcm, 57)], 1)
    return pcm[:, None]


def _encode(pcm, rate, nch, kbps):
    enc = Mp2Encoder(rate, nch, kbps)
    return b"".join(enc.encode_frame(pcm[i * 1152:(i + 1) * 1152])
                    for i in range(pcm.shape[0] // 1152)), enc


def _snr_aligned(ref, got, maxd=1200):
    ref = ref.astype(np.float64)
    got = got.astype(np.float64)
    best = -1.0
    for d in range(maxd):
        n = min(len(ref), len(got) - d)
        if n < 4000:
            break
        err = ref[:n] - got[d:d + n]
        sp = (ref[:n] ** 2).sum()
        best = max(best, 10 * np.log10(sp / max((err ** 2).sum(),
                                                1e-9)))
    return best


class TestBitstream:
    def test_headers_and_frame_sizes(self):
        pcm = _tones(48000, 4, 2)
        stream, enc = _encode(pcm, 48000, 2, 384)
        fb = enc.frame_bytes
        assert len(stream) == 4 * fb
        for i in range(4):
            h = parse_mpa_header(stream[i * fb:i * fb + 4])
            assert h is not None and h.layer == 2 and h.version == 1
            assert h.bitrate_kbps == 384 and h.sample_rate == 48000
            assert h.mode == 0 and h.frame_bytes == fb

    def test_table_selection(self):
        # per-channel kbps drives B.2a-d exactly as the decoder side
        assert Mp2Encoder(44100, 2, 384).sblimit == 30
        assert Mp2Encoder(48000, 2, 384).sblimit == 27
        assert Mp2Encoder(44100, 1, 48).sblimit == 8
        assert Mp2Encoder(32000, 1, 48).sblimit == 12

    def test_illegal_bitrate_snaps_to_legal(self):
        # 384 kbps is stereo-only; mono must snap to a legal rate
        assert Mp2Encoder(44100, 1, 384).bitrate_kbps == 192
        assert Mp2Encoder(44100, 2, 32).bitrate_kbps == 64

    def test_bad_rate_rejected(self):
        with pytest.raises(ValueError):
            Mp2Encoder(11025, 2, 192)     # MPEG-2.5 is Layer III only
        with pytest.raises(ValueError):
            Mp2Encoder(48000, 3, 192)


class TestRoundTrip:
    @pytest.mark.parametrize("rate", [32000, 44100, 48000])
    def test_tones_stereo_384(self, rate):
        pcm = _tones(rate, 12, 2)
        stream, _ = _encode(pcm, rate, 2, 384)
        dec, r, ch = decode_stream(stream)
        assert (r, ch) == (rate, 2)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 46.0
        assert _snr_aligned(pcm[:, 1], dec[:, 1]) > 46.0

    def test_tones_mono_lowrate(self):
        # table B.2d keeps only 12 subbands (0-6 kHz at 32 kHz);
        # keep the content inside them
        rate = 32000
        t = np.arange(1152 * 12) / rate
        sig = 0.4 * np.sin(2 * np.pi * 440 * t) \
            + 0.2 * np.sin(2 * np.pi * 1830 * t + 0.3)
        pcm = np.rint(sig * 28000).astype(np.int16)[:, None]
        stream, _ = _encode(pcm, rate, 1, 48)
        dec, r, ch = decode_stream(stream)
        assert (r, ch) == (rate, 1)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 30.0

    def test_silence_allocates_nothing(self):
        pcm = np.zeros((1152 * 2, 2), np.int16)
        stream, enc = _encode(pcm, 44100, 2, 192)
        dec, _, _ = decode_stream(stream)
        assert np.abs(dec).max() <= 1

    def test_constant_envelope_uses_scfsi(self):
        # steady tone -> equal part scalefactors -> scfsi=2 frames
        # still reconstruct; this exercises the 1-scf transmit path
        rate = 48000
        t = np.arange(1152 * 8) / rate
        pcm = np.rint(20000 * np.sin(2 * np.pi * 750 * t)) \
            .astype(np.int16)[:, None]
        stream, _ = _encode(pcm, rate, 1, 192)
        dec, _, _ = decode_stream(stream)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 55.0


@needs_bridge
class TestExternalOracle:
    def _lavc(self, stream):
        d = _av.AvAudioDecoder("mp2")
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
        """Both decoders on OUR stream must agree to ~1 LSB: proves
        the bitstream means what we think it means."""
        pcm = _tones(44100, 10, 2, seed=3)
        stream, _ = _encode(pcm, 44100, 2, 256)
        own, _, _ = decode_stream(stream)
        ext = self._lavc(stream)
        m = min(len(own), len(ext))
        d = own[:m].astype(np.int32) - ext[:m].astype(np.int32)
        assert np.abs(d).max() <= 4

    def test_lavc_snr(self):
        pcm = _tones(48000, 10, 2, seed=5)
        stream, _ = _encode(pcm, 48000, 2, 384)
        ext = self._lavc(stream)
        assert _snr_aligned(pcm[:, 0], ext[:, 0]) > 46.0


class TestStreamingWrapper:
    def test_feed_flush_framing(self):
        pcm = _tones(44100, 6, 2)[:1152 * 5 + 500]
        enc = NativeAudioEncoder(44100, 2, 224000)
        # ragged feeds must re-chunk to exact 1152-sample frames
        enc.feed(pcm[:1000])
        enc.feed(pcm[1000:2500])
        enc.feed(pcm[2500:])
        enc.flush()
        pkts = enc.read_packets()
        assert len(pkts) == 6                  # 5 full + padded tail
        fb = 144000 * 224 // 44100
        assert all(len(p) == fb for p in pkts)
        dec, _, _ = decode_stream(b"".join(pkts))
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 40.0

    def test_module_fallback_forced(self, monkeypatch):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        monkeypatch.setenv("TCFORGE_NATIVE_MP2ENC", "1")
        job = Job()
        job.a_rate = 44100
        job.a_chan = 2
        mod = new_module(ModuleKind.ENCODER, "mp2enc", job,
                         "bitrate=192")
        from tcforge_tpu.io.mpaenc import NativeAudioEncoder as N
        assert isinstance(mod._enc, N)
        from tcforge_tpu.core.frame import AudioBatch
        pcm = _tones(44100, 2, 2)
        out = mod.encode_audio(AudioBatch(pcm=pcm))
        out += mod.flush()
        dec, r, ch = decode_stream(b"".join(out))
        assert (r, ch) == (44100, 2)


@needs_bridge
class TestLsf:
    """MPEG-2 LSF (ISO 13818-3) Layer II: half sample rates through
    the single Table B.1 allocation table — whose nbal-3/2 rows skip
    the 7-step class (recovered from the bundled libavcodec binary;
    the dense 0..7 indexing decodes garbage)."""

    def _lavc(self, stream):
        d = _av.AvAudioDecoder("mp2")
        d.feed(stream)
        d.flush()
        out = d.read()
        d.close()
        return np.asarray(out)

    @pytest.mark.parametrize("rate,kbps", [(24000, 64), (22050, 96),
                                           (16000, 32)])
    def test_decode_matches_lavc_1lsb(self, rate, kbps):
        t = np.arange(rate) / rate
        p0 = np.rint(15000 * (0.5 * np.sin(2 * np.pi * 440 * t)
                              + 0.2 * np.sin(2 * np.pi * 2000 * t))
                     ).astype(np.int16)
        p = np.stack([p0, p0], 1)
        e = _av.AvAudioEncoder("mp2", rate, 2, kbps * 1000)
        e.set_framed(True)
        e.feed(p)
        e.flush()
        s = b"".join(e.read_packets())
        own, r, ch = decode_stream(s)
        assert (r, ch) == (rate, 2)
        ext = self._lavc(s)
        m = min(len(own), len(ext))
        d = own[:m].astype(np.int32) - ext[:m].astype(np.int32)
        assert np.abs(d).max() <= 1

    def test_encode_lsf_round_trip(self):
        rate = 24000
        t = np.arange(1152 * 8) / rate
        p0 = np.rint(15000 * (0.5 * np.sin(2 * np.pi * 440 * t)
                              + 0.2 * np.sin(2 * np.pi * 1500 * t))
                     ).astype(np.int16)
        p = np.stack([p0, p0], 1)
        enc = Mp2Encoder(rate, 2, 160)
        assert enc.version == 2 and enc.sblimit == 30
        s = b"".join(enc.encode_frame(p[i * 1152:(i + 1) * 1152])
                     for i in range(8))
        h = parse_mpa_header(s[:4])
        assert h.version == 2 and h.sample_rate == rate
        own, _, _ = decode_stream(s)
        ext = self._lavc(s)
        m = min(len(own), len(ext))
        assert np.abs(own[:m].astype(np.int32)
                      - ext[:m].astype(np.int32)).max() <= 1
        assert _snr_aligned(p[:, 0], own[:, 0]) > 48.0
