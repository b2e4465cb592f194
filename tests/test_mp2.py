"""Native MPEG-1 Layer I/II audio decoder (io/mp2dec.py) validated
against the bundled libavcodec decoders.  Layer I/II conformance is
tolerance-based by definition (real-valued synthesis), so the oracle
bound is SNR >= 70 dB with per-sample error <= 4 LSB — measured
~82 dB / 1 LSB, the float64-vs-fixed-point rounding floor."""

import numpy as np
import pytest

from tcforge_tpu.io import mp2dec

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available()
except Exception:
    HAVE_BRIDGE = False

needs_bridge = pytest.mark.skipif(
    not HAVE_BRIDGE, reason="FFmpeg bridge needed for the oracle")


def _signal(rate, ch, seed=0):
    rng = np.random.RandomState(seed)
    n = rate // 2
    t = np.arange(n) / rate
    sig = (0.35 * np.sin(2 * np.pi * 440 * t)
           + 0.25 * np.sin(2 * np.pi * 1830 * t + 0.4)
           + 0.15 * np.sin(2 * np.pi * 7000 * t + 1.1)
           + 0.03 * rng.standard_normal(n))
    pcm = np.clip(sig * 20000, -32768, 32767).astype(np.int16)
    if ch == 2:
        return np.stack([pcm, np.roll(pcm, 100)], 1)
    return pcm[:, None]


def _bridge_decode(codec, stream):
    dec = _av.AvAudioDecoder(codec)
    dec.feed(stream)
    dec.flush()
    chunks = []
    while True:
        r = dec.read()
        if r is None:
            break
        chunks.append(r)
    dec.close()
    return np.concatenate(chunks)


def _snr(ref, got):
    m = min(len(ref), len(got))
    assert m > 0
    d = ref[:m].astype(np.float64) - got[:m].astype(np.float64)
    sp = (ref[:m].astype(np.float64) ** 2).mean()
    return (10 * np.log10(sp / max((d ** 2).mean(), 1e-12)),
            float(np.abs(d).max()))


@needs_bridge
class TestLayer2Oracle:
    @pytest.mark.parametrize("rate,ch,kbps", [
        (48000, 2, 224),        # table B.2a
        (44100, 2, 384),        # table B.2b
        (44100, 2, 96),         # table B.2c (48 kbps/ch)
        (32000, 2, 64),         # table B.2d
        (48000, 1, 64),         # mono, table a
        (44100, 1, 48),         # mono, table c
    ])
    def test_snr_vs_bridge(self, rate, ch, kbps):
        pcm = _signal(rate, ch)
        enc = _av.AvAudioEncoder("mp2", rate, ch, bitrate=kbps * 1000)
        enc.feed(pcm)
        stream = enc.read()
        ref = _bridge_decode("mp2", stream)
        got, grate, gch = mp2dec.decode_stream(stream)
        assert (grate, gch) == (rate, ch)
        assert len(got) == len(ref)
        snr, maxd = _snr(ref, got)
        assert snr >= 70.0, f"snr {snr:.1f}"
        assert maxd <= 4.0

    def test_stream_decoder_chunked(self):
        rate, ch = 48000, 2
        pcm = _signal(rate, ch)
        enc = _av.AvAudioEncoder("mp2", rate, ch, bitrate=192000)
        enc.feed(pcm)
        stream = enc.read()
        whole, _, _ = mp2dec.decode_stream(stream)
        sd = mp2dec.StreamDecoder()
        outs = []
        for i in range(0, len(stream), 173):    # awkward chunking
            sd.feed(stream[i:i + 173])
            r = sd.read()
            if r is not None:
                outs.append(r)
        sd.flush()
        r = sd.read()
        if r is not None:
            outs.append(r)
        got = np.concatenate(outs)
        np.testing.assert_array_equal(got, whole)


def _bits_writer():
    buf = bytearray()
    acc = [0, 0]                 # value, nbits

    def put(v, n):
        acc[0] = (acc[0] << n) | (v & ((1 << n) - 1))
        acc[1] += n
        while acc[1] >= 8:
            acc[1] -= 8
            buf.append((acc[0] >> acc[1]) & 0xFF)

    def done(size):
        if acc[1]:
            put(0, 8 - acc[1])
        while len(buf) < size:
            buf.append(0)
        assert len(buf) <= size, "crafted frame overflows its budget"
        return bytes(buf)

    return put, done


@needs_bridge
class TestCraftedFrames:
    """Hand-built frames validate paths libavcodec's encoder never
    emits: Layer I (no encoder exists in libavcodec at all) and
    Layer II joint stereo."""

    def test_layer1_vs_bridge(self):
        rng = np.random.RandomState(3)
        put, done = _bits_writer()
        # header: MPEG-1 Layer I, 448 kbps, 44.1 kHz, mono, no CRC
        put(0x7FF, 11); put(3, 2); put(3, 2); put(1, 1)
        put(14, 4); put(0, 2); put(0, 1); put(0, 1)
        put(3, 2); put(0, 2); put(0, 1); put(0, 1); put(0, 2)
        allocs = [int(rng.randint(0, 10)) for _ in range(32)]
        for a in allocs:
            put(a, 4)
        for a in allocs:
            if a:
                put(int(rng.randint(0, 63)), 6)
        for _ in range(12):
            for a in allocs:
                if a:
                    nb = a + 1
                    put(int(rng.randint(0, (1 << nb) - 1)), nb)
        frame = done((12000 * 448 // 44100) * 4)
        ref = _bridge_decode("mp1", frame)
        dec = mp2dec.Mp2Decoder()
        got = dec.decode_frame(frame)
        assert got.shape == (384, 1) == ref.shape
        snr, maxd = _snr(ref, got)
        assert snr >= 70.0 and maxd <= 4.0, (snr, maxd)

    def test_layer2_joint_stereo_vs_bridge(self):
        rng = np.random.RandomState(4)
        put, done = _bits_writer()
        # MPEG-1 Layer II, 192 kbps, 48 kHz, joint stereo mode_ext 2
        put(0x7FF, 11); put(3, 2); put(2, 2); put(1, 1)
        put(10, 4); put(1, 2); put(0, 1); put(0, 1)
        put(1, 2); put(2, 2); put(0, 1); put(0, 1); put(0, 2)
        table, sblimit = mp2dec._alloc_table(48000, 192, 2)
        bound = 12               # (mode_ext + 1) * 4
        # keep allocations small so the frame fits its 576-byte
        # budget (random full-range allocs would overflow it and the
        # two decoders would legitimately diverge past the end)
        alloc = [[0] * sblimit for _ in range(2)]
        for sb in range(bound):
            nbal = table[sb][0]
            for chn in range(2):
                alloc[chn][sb] = int(rng.randint(0, 4)) if sb < 16 \
                    else 0
                put(alloc[chn][sb], nbal)
        for sb in range(bound, sblimit):
            nbal = table[sb][0]
            a = int(rng.randint(0, 3)) if sb < 20 else 0
            a = min(a, (1 << nbal) - 1)
            alloc[0][sb] = alloc[1][sb] = a
            put(a, nbal)
        scfsi = [[0] * sblimit for _ in range(2)]
        for sb in range(sblimit):
            for chn in range(2):
                if alloc[chn][sb]:
                    scfsi[chn][sb] = int(rng.randint(0, 4))
                    put(scfsi[chn][sb], 2)
        for sb in range(sblimit):
            for chn in range(2):
                if alloc[chn][sb]:
                    nsf = (3, 2, 1, 2)[scfsi[chn][sb]]
                    for _ in range(nsf):
                        put(int(rng.randint(0, 60)), 6)
        for _gr in range(12):
            for sb in range(sblimit):
                for chn in range(1 if sb >= bound else 2):
                    a = alloc[chn][sb]
                    if not a:
                        continue
                    cls = table[sb][1][a - 1]
                    steps = mp2dec.QUANT_STEPS[cls]
                    bits = mp2dec.QUANT_BITS[cls]
                    if bits < 0:
                        put(int(rng.randint(0, steps ** 3)), -bits)
                    else:
                        for _ in range(3):
                            put(int(rng.randint(0, steps)), bits)
        frame = done(144000 * 192 // 48000)
        ref = _bridge_decode("mp2", frame)
        dec = mp2dec.Mp2Decoder()
        got = dec.decode_frame(frame)
        assert got.shape == (1152, 2) == ref.shape
        snr, maxd = _snr(ref, got)
        assert snr >= 70.0 and maxd <= 4.0, (snr, maxd)


class TestRobustness:
    def test_garbage_streams(self):
        rng = np.random.RandomState(5)
        for _ in range(12):
            blob = rng.randint(0, 256, rng.randint(0, 4096),
                               np.uint8).tobytes()
            try:
                mp2dec.decode_stream(blob)
            except (ValueError, NotImplementedError):
                pass

    def test_layer3_raises(self):
        # a Layer III header must route to the bridge, not garbage
        hdr = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 412
        dec = mp2dec.Mp2Decoder()
        with pytest.raises(NotImplementedError):
            dec.decode_frame(hdr)

    def test_header_parse(self):
        h = mp2dec.parse_mpa_header(bytes([0xFF, 0xFD, 0xA0, 0x00]))
        assert h is not None and h.layer == 2
        assert h.sample_rate == 44100
        assert mp2dec.parse_mpa_header(b"\x00\x00\x00\x00") is None


@needs_bridge
class TestImporterFallback:
    def test_mp3_importer_native_path(self, tmp_path, monkeypatch):
        """With the bridge reported absent, the mp3 importer decodes
        Layer II files through io/mp2dec.py."""
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        from tcforge_tpu.native import av

        rate, ch = 44100, 2
        pcm = _signal(rate, ch)
        enc = _av.AvAudioEncoder("mp2", rate, ch, bitrate=192000)
        enc.feed(pcm)
        stream = enc.read()
        path = tmp_path / "a.mp2"
        path.write_bytes(stream)
        ref, _, _ = mp2dec.decode_stream(stream)

        monkeypatch.setattr(av, "available", lambda: False)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mp3", Job())
        imp.open(str(path))
        assert imp.audio_rate == rate
        assert imp.audio_channels == ch
        chunks = []
        while True:
            b = imp.read_audio_batch(4096)
            if b is None:
                break
            chunks.append(b)
        imp.close()
        got = np.concatenate(chunks)
        np.testing.assert_array_equal(got, ref)


@needs_bridge
class TestPsImportFallback:
    def test_ps_mp2_native_when_bridge_absent(self, tmp_path,
                                              monkeypatch):
        """MPEG-PS with an MP2 audio track decodes through
        io/mp2dec.py when the bridge is reported absent."""
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        from tcforge_tpu.io.psmux import PsWriter
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        from tcforge_tpu.native import av

        w, h, nfr = 64, 48, 6
        rng = np.random.RandomState(9)
        venc = Mpeg2FullEncoder(w, h, 25.0, qscale=2, gop_n=6,
                                gop_m=1, search_range=4)
        es = b""
        base = rng.randint(0, 256, (h + 16, w + 16)).astype(np.uint8)
        for i in range(nfr):
            y = base[i:i + h, i:i + w].copy()
            u = np.full((h // 2, w // 2), 80, np.uint8)
            v = np.full((h // 2, w // 2), 160, np.uint8)
            es += venc.push_frame(y, u, v)
        es += venc.flush()

        rate, ch = 48000, 2
        aenc = _av.AvAudioEncoder("mp2", rate, ch, bitrate=192000)
        aenc.feed(_signal(rate, ch))
        mp2 = aenc.read()
        ref, _, _ = mp2dec.decode_stream(mp2)

        path = tmp_path / "av.mpg"
        with open(path, "wb") as f:
            wtr = PsWriter(f, fps=25.0, audio_rate=rate)
            wtr.write_video(es)
            wtr.write_audio_es(mp2, sid=0xC0)
            wtr.close()

        monkeypatch.setattr(av, "available", lambda: False)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mpeg", Job())
        imp.open(str(path))
        assert imp.audio_rate == rate
        a = imp.read_audio_batch(len(ref) + 10)
        imp.close()
        assert a is not None
        np.testing.assert_array_equal(a, ref[:len(a)])
        assert len(a) >= len(ref) - 1152
