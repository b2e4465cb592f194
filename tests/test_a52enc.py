"""Native A/52 (AC-3) encoder (io/a52enc.py): round-trip SNR through
the in-tree oracle-validated decoder, exact agreement between that
decoder and libavcodec on our streams (proves the bitstream is
spec-valid incl. CRC1/CRC2), syncinfo fields, bisection fit, and the
ac3enc module fallback wiring."""

import numpy as np
import pytest

from tcforge_tpu.io.a52dec import decode_stream, parse_syncinfo
from tcforge_tpu.io.a52enc import (A52Encoder, NativeAc3Encoder,
                                   _crc16)

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available()
except Exception:
    HAVE_BRIDGE = False

needs_bridge = pytest.mark.skipif(
    not HAVE_BRIDGE, reason="FFmpeg bridge needed for the oracle")


def _tones(rate, nframes, nch, seed=0):
    rng = np.random.RandomState(seed)
    n = 1536 * nframes
    t = np.arange(n) / rate
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.25 * np.sin(2 * np.pi * 1830 * t + 0.3)
           + 0.1 * np.sin(2 * np.pi * 6500 * t + 1.0)
           + 0.003 * rng.standard_normal(n))
    pcm = np.clip(np.rint(sig * 28000), -32768, 32767).astype(np.int16)
    if nch == 2:
        return np.stack([pcm, np.roll(pcm, 57)], 1)
    return pcm[:, None]


def _encode(pcm, rate, nch, kbps):
    enc = A52Encoder(rate, nch, kbps)
    return b"".join(enc.encode_frame(pcm[i * 1536:(i + 1) * 1536])
                    for i in range(pcm.shape[0] // 1536)), enc


def _snr_aligned(ref, got, maxd=2000):
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
    def test_syncinfo_and_framing(self):
        pcm = _tones(48000, 4, 2)
        stream, enc = _encode(pcm, 48000, 2, 448)
        fb = enc.frame_bytes
        assert len(stream) == 4 * fb
        for i in range(4):
            si = parse_syncinfo(stream[i * fb:i * fb + 8])
            assert si is not None
            nbytes, rate, _ = si[0], si[1], si[2]
            assert rate == 48000

    def test_crcs_valid(self):
        """CRC1 covers the 5/8 region, CRC2 the whole frame — both
        must verify to zero (strict decoders check them)."""
        pcm = _tones(44100, 3, 2, seed=2)
        stream, enc = _encode(pcm, 44100, 2, 256)
        fb = enc.frame_bytes
        for i in range(3):
            fr = stream[i * fb:(i + 1) * fb]
            words58 = (fb >> 1) * 5 // 8
            assert _crc16(fr[2:2 * words58]) == 0
            assert _crc16(fr[2:]) == 0

    def test_bitrate_snapping(self):
        assert A52Encoder(48000, 2, 200).bitrate_kbps == 192
        assert A52Encoder(48000, 2, 9999).bitrate_kbps == 640

    def test_bad_modes_rejected(self):
        with pytest.raises(ValueError):
            A52Encoder(22050, 2, 192)
        with pytest.raises(ValueError):
            A52Encoder(48000, 6, 448)


class TestRoundTrip:
    @pytest.mark.parametrize("rate,kbps,floor", [
        (48000, 448, 42.0), (44100, 256, 40.0), (32000, 192, 38.0)])
    def test_stereo(self, rate, kbps, floor):
        pcm = _tones(rate, 10, 2)
        stream, _ = _encode(pcm, rate, 2, kbps)
        dec, r, ch = decode_stream(stream, dither=False)
        assert (r, ch) == (rate, 2)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > floor
        assert _snr_aligned(pcm[:, 1], dec[:, 1]) > floor

    def test_mono_high_rate(self):
        pcm = _tones(48000, 10, 1)
        stream, _ = _encode(pcm, 48000, 1, 640)
        dec, r, ch = decode_stream(stream, dither=False)
        assert (r, ch) == (48000, 1)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 55.0

    def test_low_bitrate_still_fits(self):
        """Bisection must land a fitting SNR offset even at 64k
        stereo (narrow bandwidth, most bins bap-0)."""
        pcm = _tones(48000, 6, 2)
        stream, enc = _encode(pcm, 48000, 2, 64)
        assert len(stream) == 6 * enc.frame_bytes
        dec, _, _ = decode_stream(stream, dither=False)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 10.0

    def test_silence(self):
        pcm = np.zeros((1536 * 2, 2), np.int16)
        stream, _ = _encode(pcm, 48000, 2, 192)
        dec, _, _ = decode_stream(stream, dither=False)
        assert np.abs(dec).max() <= 1


@needs_bridge
class TestExternalOracle:
    def _lavc(self, stream):
        d = _av.AvAudioDecoder("ac3")
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
        """dithflag=0 everywhere, so both decoders reconstruct the
        same deterministic signal — must agree to rounding."""
        pcm = _tones(48000, 8, 2, seed=3)
        stream, _ = _encode(pcm, 48000, 2, 384)
        own, _, _ = decode_stream(stream, dither=False)
        ext = self._lavc(stream)
        m = min(len(own), len(ext))
        d = own[:m].astype(np.int32) - ext[:m].astype(np.int32)
        assert np.abs(d).max() <= 4

    def test_lavc_snr(self):
        pcm = _tones(44100, 8, 2, seed=5)
        stream, _ = _encode(pcm, 44100, 2, 448)
        ext = self._lavc(stream)
        assert _snr_aligned(pcm[:, 0], ext[:, 0]) > 42.0


class TestStreamingWrapper:
    def test_feed_flush_framing(self):
        pcm = _tones(48000, 5, 2)[:1536 * 4 + 700]
        enc = NativeAc3Encoder(48000, 2, 384000)
        enc.feed(pcm[:2000])
        enc.feed(pcm[2000:])
        enc.flush()
        pkts = enc.read_packets()
        assert len(pkts) == 5                  # 4 full + padded tail
        fb = enc._enc.frame_bytes
        assert all(len(p) == fb for p in pkts)
        dec, _, _ = decode_stream(b"".join(pkts), dither=False)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 40.0

    def test_module_fallback_forced(self, monkeypatch):
        from tcforge_tpu.core.frame import AudioBatch
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        monkeypatch.setenv("TCFORGE_NATIVE_AC3ENC", "1")
        job = Job()
        job.a_rate = 48000
        job.a_chan = 2
        mod = new_module(ModuleKind.ENCODER, "ac3enc", job,
                         "bitrate=384")
        assert isinstance(mod._enc, NativeAc3Encoder)
        pcm = _tones(48000, 2, 2)
        out = mod.encode_audio(AudioBatch(pcm=pcm))
        out += mod.flush()
        dec, r, ch = decode_stream(b"".join(out), dither=False)
        assert (r, ch) == (48000, 2)
