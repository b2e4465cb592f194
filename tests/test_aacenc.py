"""Native AAC-LC encoder (io/aacenc.py): round-trip SNR through the
in-tree oracle-exact decoder, agreement between that decoder and
libavcodec on our streams (proves spec-valid bitstreams incl. the
section/escape grammar), budget fitting, and the faac module
fallback wiring."""

import numpy as np
import pytest

from tcforge_tpu.io.aacdec import decode_adts_stream, parse_asc
from tcforge_tpu.io.aacenc import (AacEncoder, NativeAacEncoder,
                                   adts_header)

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available()
except Exception:
    HAVE_BRIDGE = False

needs_bridge = pytest.mark.skipif(
    not HAVE_BRIDGE, reason="FFmpeg bridge needed for the oracle")


def _tones(rate, nframes, nch, seed=0):
    rng = np.random.RandomState(seed)
    n = 1024 * nframes
    t = np.arange(n) / rate
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1830 * t + 0.3)
           + 0.002 * rng.standard_normal(n))
    pcm = np.clip(np.rint(sig * 28000), -32768, 32767).astype(np.int16)
    if nch == 2:
        return np.stack([pcm, np.roll(pcm, 57)], 1)
    return pcm[:, None]


def _encode(pcm, rate, nch, kbps):
    enc = AacEncoder(rate, nch, kbps)
    pkts = [enc.encode_frame(pcm[i * 1024:(i + 1) * 1024])
            for i in range(pcm.shape[0] // 1024)]
    adts = b"".join(adts_header(len(pk), enc.sfi, nch) + pk
                    for pk in pkts)
    return adts, enc


def _snr_aligned(ref, got, maxd=5000):
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


class TestRoundTrip:
    @pytest.mark.parametrize("rate,kbps,floor", [
        (44100, 192, 41.0), (48000, 128, 37.0), (32000, 96, 37.0)])
    def test_stereo(self, rate, kbps, floor):
        pcm = _tones(rate, 15, 2)
        adts, _ = _encode(pcm, rate, 2, kbps)
        dec, r, ch = decode_adts_stream(adts)
        assert (r, ch) == (rate, 2)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > floor
        assert _snr_aligned(pcm[:, 1], dec[:, 1]) > floor

    def test_mono(self):
        pcm = _tones(48000, 12, 1)
        adts, _ = _encode(pcm, 48000, 1, 96)
        dec, r, ch = decode_adts_stream(adts)
        assert (r, ch) == (48000, 1)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 43.0

    def test_silence(self):
        pcm = np.zeros((1024 * 3, 2), np.int16)
        adts, _ = _encode(pcm, 44100, 2, 128)
        dec, _, _ = decode_adts_stream(adts)
        assert np.abs(dec).max() <= 1

    def test_loud_broadband_exercises_escapes(self):
        rng = np.random.RandomState(7)
        pcm = rng.randint(-30000, 30000, (1024 * 6, 2)).astype(np.int16)
        adts, _ = _encode(pcm, 44100, 2, 320)
        dec, _, _ = decode_adts_stream(adts)
        # broadband noise at the bandwidth cap: just prove decodable
        # and correlated
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 2.0

    def test_budget_respected(self):
        pcm = _tones(44100, 20, 2)
        adts, enc = _encode(pcm, 44100, 2, 128)
        actual_kbps = len(adts) * 8 * 44100 / (20 * 1024) / 1000
        assert actual_kbps < 140.0

    def test_bad_modes_rejected(self):
        with pytest.raises(ValueError):
            AacEncoder(7350, 2, 128)
        with pytest.raises(ValueError):
            AacEncoder(44100, 6, 128)

    def test_asc(self):
        enc = AacEncoder(44100, 2, 128)
        assert parse_asc(enc.asc()) == (2, 4, 2)


@needs_bridge
class TestExternalOracle:
    def _lavc(self, adts):
        d = _av.AvAudioDecoder("aac")
        d.feed(adts)
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
        pcm = _tones(44100, 12, 2, seed=3)
        adts, _ = _encode(pcm, 44100, 2, 192)
        own, _, _ = decode_adts_stream(adts)
        ext = self._lavc(adts)
        m = min(len(own), len(ext))
        d = own[:m].astype(np.int32) - ext[:m].astype(np.int32)
        assert np.abs(d).max() <= 2

    def test_lavc_snr(self):
        pcm = _tones(48000, 12, 2, seed=5)
        adts, _ = _encode(pcm, 48000, 2, 192)
        ext = self._lavc(adts)
        assert _snr_aligned(pcm[:, 0], ext[:, 0]) > 43.0


class TestStreamingWrapper:
    def test_feed_flush_framing(self):
        pcm = _tones(44100, 5, 2)[:1024 * 4 + 300]
        enc = NativeAacEncoder(44100, 2, 192000)
        enc.feed(pcm[:1500])
        enc.feed(pcm[1500:])
        enc.flush()
        pkts = enc.read_packets()
        assert len(pkts) == 5                  # 4 full + padded tail
        assert parse_asc(enc.extradata) == (2, 4, 2)
        adts = b"".join(adts_header(len(pk), 4, 2) + pk for pk in pkts)
        dec, _, _ = decode_adts_stream(adts)
        assert _snr_aligned(pcm[:, 0], dec[:, 0]) > 45.0

    def test_module_fallback_forced(self, monkeypatch):
        from tcforge_tpu.core.frame import AudioBatch
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        monkeypatch.setenv("TCFORGE_NATIVE_AACENC", "1")
        job = Job()
        job.a_rate = 44100
        job.a_chan = 2
        mod = new_module(ModuleKind.ENCODER, "faac", job,
                         "bitrate=128")
        assert isinstance(mod._enc, NativeAacEncoder)
        pcm = _tones(44100, 2, 2)
        out = mod.encode_audio(AudioBatch(pcm=pcm))
        out += mod.flush()
        assert len(out) == 2 and all(len(p) > 40 for p in out)


class TestShortBlocks:
    """r5: EIGHT_SHORT encode with window-switch decision (push/
    flush_frames API, one-frame lookahead placing LONG_START before
    each transient).  Validated through the in-tree decoder AND
    libavcodec; pre-echo around attacks improves vs long-only."""

    def _click_pcm(self, rate=44100, frames=16):
        n = 1024
        t = np.arange(n * frames) / rate
        sig = 0.3 * np.sin(2 * np.pi * 500 * t)
        for k in range(2, frames, 3):
            sig[k * n + 512:k * n + 520] += 0.6
        return np.clip(np.rint(sig * 28000), -32768,
                       32767).astype(np.int16)[:, None]

    def _encode_push(self, pcm, rate=44100, kbps=96):
        enc = AacEncoder(rate, 1, kbps)
        n = 1024
        units = []
        seqs = []
        orig = enc._code_frame
        enc._code_frame = lambda p, s: (seqs.append(s),
                                        orig(p, s))[1]
        for i in range(pcm.shape[0] // n):
            units += enc.push(pcm[i * n:(i + 1) * n])
        units += enc.flush_frames()
        adts = b"".join(adts_header(len(u), enc.sfi, 1) + u
                        for u in units)
        return adts, seqs, units

    def test_sequences_and_own_decoder(self):
        pcm = self._click_pcm()
        adts, seqs, units = self._encode_push(pcm)
        assert len(units) == 16
        # every transient framed by LONG_START / EIGHT_SHORT /
        # LONG_STOP; steady frames stay ONLY_LONG
        assert 2 in seqs and 1 in seqs and 3 in seqs
        for i, s in enumerate(seqs):
            if s == 2:
                assert seqs[i - 1] in (1, 2)
                if i + 1 < len(seqs):
                    assert seqs[i + 1] in (2, 3)
        dec, r, ch = decode_adts_stream(adts)
        assert (r, ch) == (44100, 1)
        assert _snr_aligned(pcm[:, 0], np.asarray(dec)[:, 0]) > 25.0

    def test_pre_echo_improves(self):
        pcm = self._click_pcm()
        n = 1024
        rate = 44100
        ref = pcm[:, 0].astype(np.float64)

        def decode(push):
            enc = AacEncoder(rate, 1, 96)
            if push:
                units = []
                for i in range(16):
                    units += enc.push(pcm[i * n:(i + 1) * n])
                units += enc.flush_frames()
            else:
                units = [enc.encode_frame(pcm[i * n:(i + 1) * n])
                         for i in range(16)]
            adts = b"".join(adts_header(len(u), enc.sfi, 1) + u
                            for u in units)
            d, _, _ = decode_adts_stream(adts)
            return np.asarray(d)[:, 0].astype(np.float64)

        def pre_echo(d):
            best = None
            for lag in range(0, 4097):
                m = min(len(ref), len(d) - lag)
                if m < 8 * n:
                    break
                err = ref[:m] - d[lag:lag + m]
                v = (err ** 2).sum()
                if best is None or v < best[0]:
                    best = (v, lag)
            dal = d[best[1]:best[1] + len(ref)]
            tot = 0.0
            for k in range(2, 16, 3):
                lo, hi = k * n + 128, k * n + 512
                err = ref[lo:hi] - dal[lo:hi]
                tot += (err ** 2).mean()
            return tot

        assert pre_echo(decode(True)) < pre_echo(decode(False))

    @pytest.mark.skipif(not HAVE_BRIDGE, reason="oracle")
    def test_lavc_decodes_short_stream(self):
        import os
        import tempfile
        from tcforge_tpu.native import av as _av2
        pcm = self._click_pcm()
        adts, seqs, _ = self._encode_push(pcm)
        assert 2 in seqs
        f = tempfile.NamedTemporaryFile(suffix=".aac", delete=False)
        f.write(adts)
        f.close()
        try:
            a = _av2.AvFileAudio(f.name)
            chunks = []
            while True:
                g = a.read(4096)
                if g is None:
                    break
                if len(g):
                    chunks.append(g)
            d = np.concatenate(chunks)
        finally:
            os.unlink(f.name)
        assert _snr_aligned(pcm[:, 0], np.asarray(d)[:, 0]) > 25.0
