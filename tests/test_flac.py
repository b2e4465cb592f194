"""Native FLAC codec (io/flac.py): FLAC is lossless, so every oracle
test here is BIT-EXACT — pure round trip, native encode -> libavcodec
decode, libavcodec encode -> native decode (exercises LPC subframes
and stereo decorrelation our encoder never emits), probe/importer/
muxer wiring, and a bridge-free CLI e2e."""

import numpy as np
import pytest

from tcforge_tpu.io.flac import (FlacDecoder, FlacEncoder,
                                 NativeFlacEncoder, decode_stream,
                                 parse_streaminfo)

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available()
except Exception:
    HAVE_BRIDGE = False

needs_bridge = pytest.mark.skipif(
    not HAVE_BRIDGE, reason="FFmpeg bridge needed for the oracle")


def _sig(rate, nsamp, nch, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(nsamp) / rate
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.05 * rng.standard_normal(nsamp))
    pcm = np.clip(np.rint(x * 20000), -32768, 32767).astype(np.int16)
    if nch == 2:
        return np.stack([pcm, np.roll(pcm, 100)], 1)
    return pcm[:, None]


def _whole_file(pcm, rate, nch):
    enc = NativeFlacEncoder(rate, nch)
    enc.feed(pcm)
    enc.flush()
    xd = enc.extradata
    return (b"fLaC" + bytes([0x80]) + len(xd).to_bytes(3, "big") + xd
            + b"".join(enc.read_packets()))


class TestRoundTrip:
    @pytest.mark.parametrize("nch", [1, 2])
    def test_bit_exact(self, nch):
        pcm = _sig(44100, 44100, nch)
        f = _whole_file(pcm, 44100, nch)
        dec, rate, ch, bps = decode_stream(f)
        assert (rate, ch, bps) == (44100, nch, 16)
        assert np.array_equal(dec, pcm.astype(np.int64))

    def test_partial_last_block(self):
        pcm = _sig(48000, 4096 * 2 + 777, 2)
        f = _whole_file(pcm, 48000, 2)
        dec, _, _, _ = decode_stream(f)
        assert dec.shape[0] == pcm.shape[0]
        assert np.array_equal(dec, pcm.astype(np.int64))

    def test_constant_and_silence(self):
        pcm = np.zeros((9000, 2), np.int16)
        pcm[4096:8192] = 1234
        f = _whole_file(pcm, 32000, 2)
        dec, _, _, _ = decode_stream(f)
        assert np.array_equal(dec, pcm.astype(np.int64))
        # constant blocks should collapse far below verbatim size
        assert len(f) < pcm.nbytes // 4

    def test_compresses(self):
        pcm = _sig(44100, 44100, 2)
        f = _whole_file(pcm, 44100, 2)
        assert len(f) < pcm.nbytes          # always below raw PCM

    def test_streaminfo_fields(self):
        enc = FlacEncoder(96000, 2, bps=16, block=4096)
        si = parse_streaminfo(enc.streaminfo())
        assert si["rate"] == 96000
        assert si["channels"] == 2
        assert si["bps"] == 16
        assert si["min_block"] == si["max_block"] == 4096

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            FlacDecoder(b"not a flac file at all......")
        with pytest.raises(ValueError):
            decode_stream(b"fLaC" + bytes([0x80, 0, 0, 34])
                          + b"\x00" * 34)   # no frames


@needs_bridge
class TestExternalOracle:
    def test_native_encode_lavc_decode(self, tmp_path):
        pcm = _sig(44100, 44100, 2, seed=1)
        p = tmp_path / "n.flac"
        p.write_bytes(_whole_file(pcm, 44100, 2))
        fa = _av.AvFileAudio(str(p))
        chunks = []
        while True:
            r = fa.read()
            if r is None:
                break
            chunks.append(r)
        fa.close()
        got = np.concatenate(chunks)
        assert np.array_equal(got[:len(pcm)], pcm)

    def test_lavc_encode_native_decode(self):
        """libavcodec emits LPC subframes and mid/side stereo our
        encoder never writes — the decoder must handle them."""
        pcm = _sig(48000, 48000, 2, seed=2)
        enc = _av.AvAudioEncoder("flac", 48000, 2, 0)
        enc.set_framed(True)
        enc.feed(pcm)
        enc.flush()
        xd = enc.extradata
        f = (b"fLaC" + bytes([0x80]) + len(xd).to_bytes(3, "big")
             + xd + b"".join(enc.read_packets()))
        dec, rate, ch, bps = decode_stream(f)
        assert (rate, ch, bps) == (48000, 2, 16)
        # lavc pads the tail block; trim to the source length
        assert np.array_equal(dec[:len(pcm)], pcm.astype(np.int64))


class TestWiring:
    def test_probe_names_flac(self, tmp_path):
        from tcforge_tpu.core.codecs import Codec, ContainerFormat
        from tcforge_tpu.io.probe import probe_file
        pcm = _sig(44100, 8192, 2)
        p = tmp_path / "t.flac"
        p.write_bytes(_whole_file(pcm, 44100, 2))
        info = probe_file(str(p))
        assert info.magic == ContainerFormat.FLAC_FILE
        assert info.tracks and info.tracks[0].codec == Codec.FLAC
        assert info.tracks[0].samplerate == 44100
        assert info.tracks[0].channels == 2

    def test_importer_native_path(self, tmp_path, monkeypatch):
        monkeypatch.setenv("TCFORGE_NATIVE_FLAC", "1")
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        pcm = _sig(44100, 20000, 2)
        p = tmp_path / "t.flac"
        p.write_bytes(_whole_file(pcm, 44100, 2))
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "flac", Job())
        imp.open(str(p))
        assert imp.audio_rate == 44100 and imp.audio_channels == 2
        chunks = []
        while True:
            a = imp.read_audio_batch(4096)
            if a is None:
                break
            chunks.append(a)
        imp.close()
        assert np.array_equal(np.concatenate(chunks), pcm)

    def test_cli_wav_flac_wav_no_bridge(self, tmp_path, monkeypatch):
        """Full lossless circle with the bridge paths FORCED OFF:
        wav -> native flac encode + bare-FLAC mux -> native flac
        import -> wav, bit-exact."""
        import wave

        from tcforge_tpu.cli import main
        monkeypatch.setenv("TCFORGE_NATIVE_FLAC", "1")
        pcm = _sig(44100, 44100, 2)
        src = tmp_path / "a.wav"
        w = wave.open(str(src), "wb")
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(pcm.tobytes())
        w.close()
        mid = tmp_path / "a.flac"
        assert main(["-i", str(src), "-y", "null,flac,lavf",
                     "-E", "44100,16,2", "-o", str(mid),
                     "--progress_off"]) == 0
        assert mid.read_bytes()[:4] == b"fLaC"
        back = tmp_path / "b.wav"
        assert main(["-i", str(mid), "-y", "null,raw,wav",
                     "-E", "44100,16,2", "-o", str(back),
                     "--progress_off"]) == 0
        r = wave.open(str(back))
        got = np.frombuffer(r.readframes(r.getnframes()),
                            np.int16).reshape(-1, 2)
        assert np.array_equal(got, pcm)
