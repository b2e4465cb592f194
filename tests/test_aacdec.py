"""Native AAC-LC decoder (io/aacdec.py) vs the bundled libavcodec
decoder.  The oracle bound is <= 2 LSB per sample — the decoder
reproduces libavcodec's PNS LCG in its exact draw order, so even
noise-substituted bands compare directly.  Content classes force the
tool coverage: tones (long windows, M/S, PNS on quiet bands),
transients (EIGHT_SHORT with grouping, TNS), noise (escape codebook,
PNS, TNS)."""

import numpy as np
import pytest

from tcforge_tpu.io.aacdec import (AacDecoder, decode_adts_stream,
                                   parse_adts_header, parse_asc,
                                   SAMPLE_RATES)

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available()
except Exception:
    HAVE_BRIDGE = False

needs_bridge = pytest.mark.skipif(
    not HAVE_BRIDGE, reason="FFmpeg bridge needed for the oracle")


def adts_wrap(pkts, sfi, nch):
    out = bytearray()
    for pk in pkts:
        ln = len(pk) + 7
        h = bytearray(7)
        h[0] = 0xFF
        h[1] = 0xF1
        h[2] = (1 << 6) | (sfi << 2) | (nch >> 2)
        h[3] = ((nch & 3) << 6) | (ln >> 11)
        h[4] = (ln >> 3) & 0xFF
        h[5] = ((ln & 7) << 5) | 0x1F
        h[6] = 0xFC
        out += h + pk
    return bytes(out)


def _content(rate, n, kind, seed=5):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / rate
    if kind == "tones":
        x = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.2 * np.sin(2 * np.pi * 1830 * t)
             + 0.003 * rng.standard_normal(n))
    elif kind == "transient":
        x = np.zeros(n)
        for st in range(0, n - 400, 1600):
            x[st:st + 200] = 0.5 * rng.standard_normal(200)
    else:
        x = 0.25 * rng.standard_normal(n)
    return np.rint(np.clip(x * 28000, -32000, 32000)).astype(np.int16)


def _lavc_encode(pcm, rate, nch, kbps):
    e = _av.AvAudioEncoder("aac", rate, nch, kbps * 1000)
    e.set_framed(True)
    e.feed(pcm)
    e.flush()
    return e.read_packets(), parse_asc(e.extradata)[1]


def _lavc_decode(adts):
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


class TestFraming:
    def test_adts_header(self):
        h = parse_adts_header(bytes([0xFF, 0xF1, 0x50, 0x80, 0x43,
                                     0x1F, 0xFC, 0, 0]))
        assert h is not None
        assert h["sfi"] == 4 and h["channels"] == 2
        assert h["frame_length"] == 0x218
        assert parse_adts_header(b"\x00" * 9) is None

    def test_asc(self):
        # AAC-LC, 44.1 kHz, stereo (the shape lavc emits)
        ot, sfi, ch = parse_asc(bytes([0x12, 0x10]))
        assert (ot, sfi, ch) == (2, 4, 2)

    def test_garbage(self):
        with pytest.raises(ValueError):
            decode_adts_stream(b"not aac at all" * 100)


@needs_bridge
class TestOracle:
    @pytest.mark.parametrize("rate", [96000, 48000, 44100, 32000,
                                      22050, 16000, 11025, 8000])
    @pytest.mark.parametrize("kind", ["tones", "transient", "noise"])
    def test_matrix_stereo(self, rate, kind):
        kbps = 192 if rate >= 32000 else 64
        pcm = _content(rate, 1024 * 15, kind)
        p = np.stack([pcm, pcm], 1)
        pkts, sfi = _lavc_encode(p, rate, 2, kbps)
        adts = adts_wrap(pkts, sfi, 2)
        own, r, ch = decode_adts_stream(adts)
        assert (r, ch) == (rate, 2)
        ext = _lavc_decode(adts)
        m = min(len(own), len(ext))
        d = own[:m].astype(np.int32) - ext[:m].astype(np.int32)
        assert np.abs(d).max() <= 2

    def test_mono(self):
        pcm = _content(48000, 1024 * 12, "transient")[:, None]
        pkts, sfi = _lavc_encode(pcm, 48000, 1, 96)
        adts = adts_wrap(pkts, sfi, 1)
        own, r, ch = decode_adts_stream(adts)
        assert (r, ch) == (48000, 1)
        ext = _lavc_decode(adts)
        m = min(len(own), len(ext))
        d = own[:m].astype(np.int32) - ext[:m].astype(np.int32)
        assert np.abs(d).max() <= 2

    def test_raw_packets_api(self):
        """decode_raw on bare access units (the container path —
        extradata ASC instead of ADTS)."""
        pcm = _content(44100, 1024 * 8, "tones")
        p = np.stack([pcm, pcm], 1)
        pkts, sfi = _lavc_encode(p, 44100, 2, 128)
        dec = AacDecoder()
        own = np.concatenate([dec.decode_raw(pk, sfi, 2)
                              for pk in pkts])
        assert dec.sample_rate == 44100 and dec.channels == 2
        ext = _lavc_decode(adts_wrap(pkts, sfi, 2)).astype(np.float64)
        m = min(len(own), len(ext))
        assert np.abs(np.rint(own[:m]) - ext[:m]).max() <= 2


class TestWiring:
    def _mk(self, tmp_path):
        if not HAVE_BRIDGE:
            pytest.skip("bridge needed to synthesize the fixture")
        pcm = _content(44100, 1024 * 6, "tones")
        p = np.stack([pcm, pcm], 1)
        pkts, sfi = _lavc_encode(p, 44100, 2, 128)
        f = tmp_path / "t.aac"
        f.write_bytes(adts_wrap(pkts, sfi, 2))
        return f

    def test_probe_names_adts(self, tmp_path):
        from tcforge_tpu.core.codecs import Codec, ContainerFormat
        from tcforge_tpu.io.probe import probe_file
        f = self._mk(tmp_path)
        info = probe_file(str(f))
        assert info.magic == ContainerFormat.AAC_FILE
        assert info.tracks and info.tracks[0].codec == Codec.AAC
        assert info.tracks[0].samplerate == 44100
        assert info.tracks[0].channels == 2

    def test_importer_native_path(self, tmp_path, monkeypatch):
        monkeypatch.setenv("TCFORGE_NATIVE_AAC", "1")
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        f = self._mk(tmp_path)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "aac", Job())
        imp.open(str(f))
        assert imp.audio_rate == 44100 and imp.audio_channels == 2
        chunks = []
        while True:
            a = imp.read_audio_batch(4096)
            if a is None:
                break
            chunks.append(a)
        imp.close()
        got = np.concatenate(chunks)
        assert got.shape[0] >= 1024 * 6
        assert np.abs(got.astype(np.int64)).max() > 10000


class TestFuzz:
    def test_random_blobs(self):
        rng = np.random.default_rng(31)
        from tcforge_tpu.io import aacdec
        for _ in range(16):
            blob = rng.integers(0, 256, rng.integers(16, 4096),
                                dtype=np.uint8).tobytes()
            try:
                aacdec.decode_adts_stream(blob)
            except (ValueError, NotImplementedError, EOFError):
                pass
            dec = AacDecoder()
            try:
                dec.decode_raw(blob, 4, 2)
            except (ValueError, NotImplementedError, EOFError):
                pass

    @needs_bridge
    def test_truncations(self, tmp_path):
        pcm = _content(44100, 1024 * 4, "tones")
        p = np.stack([pcm, pcm], 1)
        pkts, sfi = _lavc_encode(p, 44100, 2, 128)
        adts = adts_wrap(pkts, sfi, 2)
        for cut in (3, 10, len(adts) // 2, len(adts) - 5):
            try:
                decode_adts_stream(adts[:cut])
            except (ValueError, NotImplementedError, EOFError):
                pass
