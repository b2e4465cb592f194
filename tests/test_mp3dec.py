"""Native Layer III decoder (io/mp3dec.py) vs the bundled libavcodec
decoder.

Two validation axes:
- SNR vs the float oracle (bounds set from measured 77.8-83.2 dB —
  the float32-oracle-vs-float64 rounding floor; maxdiff is 1 LSB).
- EXACT bit accounting: after every granule the reader must land on
  the side info's part2_3_length boundary.  Any Huffman-table,
  region-boundary or scalefactor-grammar error desyncs immediately,
  so 100% exact frames is a hard structural proof.
"""

import numpy as np
import pytest

from tcforge_tpu.io import mp3dec
from tcforge_tpu.io.mp2dec import StreamDecoder, parse_mpa_header

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available()
except Exception:
    HAVE_BRIDGE = False

needs_bridge = pytest.mark.skipif(
    not HAVE_BRIDGE, reason="FFmpeg bridge + lame needed for oracle")


def _signal(rate, kind, seed=0):
    rng = np.random.RandomState(seed)
    n = rate
    t = np.arange(n) / rate
    if kind == "sine":
        return (0.35 * np.sin(2 * np.pi * 440 * t)
                + 0.25 * np.sin(2 * np.pi * 1830 * t + 0.4)
                + 0.15 * np.sin(2 * np.pi * 7000 * t + 1.1))
    if kind == "transient":                 # forces short blocks
        sig = np.zeros(n)
        for st in range(0, n - 400, 1600):
            sig[st:st + 200] = 0.6 * rng.standard_normal(200)
        return sig
    return 0.4 * rng.standard_normal(n)


def _encode(sig, rate, ch, kbps):
    pcm = np.clip(sig * 20000, -32768, 32767).astype(np.int16)
    pcm = pcm[:, None] if ch == 1 else \
        np.stack([pcm, np.roll(pcm, 100)], 1)
    enc = _av.AvAudioEncoder("mp3", rate, ch, bitrate=kbps * 1000)
    enc.feed(pcm)
    return enc.read()


def _bridge_decode(stream):
    dec = _av.AvAudioDecoder("mp3")
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
    assert m > 10000
    a = ref[:m].astype(np.float64)
    d = a - got[:m].astype(np.float64)
    return 10 * np.log10((a ** 2).mean() / max((d * d).mean(), 1e-12)), \
        np.abs(d).max()


@needs_bridge
class TestOracle:
    @pytest.mark.parametrize("kind,rate,ch,kbps,min_snr", [
        ("sine", 44100, 2, 128, 75.0),
        ("sine", 44100, 1, 64, 75.0),
        ("sine", 48000, 2, 192, 75.0),
        ("sine", 32000, 2, 96, 75.0),
        ("noise", 44100, 2, 128, 75.0),
        ("noise", 48000, 2, 320, 75.0),
        ("transient", 44100, 2, 96, 70.0),  # short blocks + mixed rsv
    ])
    def test_snr(self, kind, rate, ch, kbps, min_snr):
        stream = _encode(_signal(rate, kind), rate, ch, kbps)
        ref = _bridge_decode(stream)
        got, grate, gch = mp3dec.decode_stream(stream)
        assert (grate, gch) == (rate, ch)
        snr, maxd = _snr(ref, got)
        assert snr >= min_snr, f"snr {snr:.1f}"
        assert maxd <= 2

    def test_bit_accounting_exact_all_frames(self):
        stream = _encode(_signal(44100, "transient", 3), 44100, 2, 112)
        dec = mp3dec.Mp3Decoder()
        pos, nfr, nok = 0, 0, 0
        while pos + 4 <= len(stream):
            hdr = parse_mpa_header(stream[pos:pos + 4])
            if hdr is None or hdr.frame_bytes <= 4:
                pos += 1
                continue
            out = dec.decode_frame(stream[pos:pos + hdr.frame_bytes])
            if out is not None:
                nfr += 1
                nok += bool(dec.granule_bit_check)
            pos += hdr.frame_bytes
        assert nfr > 20
        assert nok == nfr, f"{nfr - nok} frames off part2_3 boundary"

    def test_stream_decoder_dispatches_layer3(self):
        stream = _encode(_signal(44100, "sine"), 44100, 2, 128)
        whole, _, _ = mp3dec.decode_stream(stream)
        sd = StreamDecoder()
        outs = []
        for i in range(0, len(stream), 517):
            sd.feed(stream[i:i + 517])
            r = sd.read()
            if r is not None:
                outs.append(r)
        sd.flush()
        r = sd.read()
        if r is not None:
            outs.append(r)
        assert sd.rate == 44100 and sd.channels == 2
        got = np.concatenate(outs)
        np.testing.assert_array_equal(got, whole)


class TestRobustness:
    def test_garbage_streams(self):
        rng = np.random.RandomState(11)
        for _ in range(10):
            blob = rng.randint(0, 256, rng.randint(0, 4096),
                               np.uint8).tobytes()
            try:
                mp3dec.decode_stream(blob)
            except (ValueError, NotImplementedError):
                pass

    def test_truncated_frame_returns_none(self):
        # valid header claiming a full frame, but body cut short: the
        # decoder must not crash and must not emit samples for it
        hdr = bytes([0xFF, 0xFB, 0x90, 0x00])  # L3 128k 44.1k stereo
        h = parse_mpa_header(hdr)
        assert h is not None and h.layer == 3
        dec = mp3dec.Mp3Decoder()
        assert dec.decode_frame(hdr + b"\x00" * 8) is None

    def test_huff_tables_complete(self):
        # every embedded table must consume the code space exactly
        for tab in mp3dec._BIG_TABLES[1:]:
            assert (tab.len > 0).all()

    def test_lsf_zero_frame_decodes(self):
        # MPEG-2 LSF header (22.05 kHz) with all-zero side info/main
        # data must decode (to silence), not raise: LSF is supported
        hdr = bytes([0xFF, 0xF3, 0x90, 0x00])
        h = parse_mpa_header(hdr)
        assert h is not None and h.version == 2
        dec = mp3dec.Mp3Decoder()
        out = dec.decode_frame(hdr + b"\x00" * (h.frame_bytes - 4))
        assert out is not None and out.shape == (576, 2)
        assert np.abs(out).max() == 0


@needs_bridge
class TestLsfLayer3:
    """MPEG-2 LSF + MPEG-2.5 Layer III: one granule per frame, 8-bit
    main_data_begin, 9-bit scalefac_compress expanded over the LSF
    sfb-count table, and the LSF region-boundary rule for window-
    switched granules (54, or 108/72 on the 8 kHz row — MPEG-1's 36
    decodes garbage there)."""

    @pytest.mark.parametrize("rate,nch,kbps", [
        (24000, 2, 64), (22050, 2, 96), (16000, 1, 48),
        (12000, 2, 32), (11025, 1, 24), (8000, 1, 32)])
    def test_matches_lavc_1lsb(self, rate, nch, kbps):
        t = np.arange(rate) / rate
        p0 = np.rint(15000 * (0.5 * np.sin(2 * np.pi * 440 * t)
                              + 0.2 * np.sin(2 * np.pi * 1500 * t))
                     ).astype(np.int16)
        p = np.stack([p0] * nch, 1) if nch == 2 else p0[:, None]
        e = _av.AvAudioEncoder("mp3", rate, nch, kbps * 1000)
        e.set_framed(True)
        e.feed(p)
        e.flush()
        s = b"".join(e.read_packets())
        own, r, ch = mp3dec.decode_stream(s)
        assert (r, ch) == (rate, nch)
        d = _av.AvAudioDecoder("mp3")
        d.feed(s)
        d.flush()
        ext = np.asarray(d.read())
        m = min(len(own), len(ext))
        diff = np.abs(own[:m].astype(np.int32)
                      - ext[:m].astype(np.int32)).max()
        assert diff <= 1
