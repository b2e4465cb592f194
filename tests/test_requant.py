"""tcrequant (MPEG-2 bitstream requantizer) tests."""

import numpy as np
import pytest

from tcforge_tpu.io.mpeg2codec import Mpeg2Encoder, native_decode_stream

RNG = np.random.default_rng(33)


@pytest.fixture(scope="module")
def native():
    from tcforge_tpu import native as n
    if not n.available():
        pytest.skip("native library not built")
    return n


@pytest.fixture(scope="module")
def detailed_es():
    """A detailed intra ES at fine quantization (compressible)."""
    w, h = 176, 144
    enc = Mpeg2Encoder(w, h, 25.0, qscale=2)
    yy, xx = np.mgrid[0:h, 0:w]
    es = bytearray()
    frames = []
    for i in range(12):
        base = RNG.integers(0, 220, (h // 8, w // 8)).astype(np.uint8)
        y = (np.kron(base, np.ones((8, 8), np.uint8))
             + ((xx + yy + i) % 24)).astype(np.uint8)
        u = ((xx[:h // 2, :w // 2] + i * 3) % 200 + 20).astype(np.uint8)
        v = ((yy[:h // 2, :w // 2] * 2 + i) % 200 + 20).astype(np.uint8)
        frames.append((y, u, v))
        es += enc.encode_frame(y, u, v, with_seq=(i == 0))
    es += enc.sequence_end()
    return bytes(es), frames


def psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-9))


class TestRequant:
    def test_hits_target_ratio(self, native, detailed_es):
        es, _ = detailed_es
        out = native.requant(es, 1.5)
        ratio = len(es) / len(out)
        assert 1.25 < ratio < 1.8       # feedback loop converges

    def test_output_decodes(self, native, detailed_es):
        es, frames = detailed_es
        out = native.requant(es, 1.5)
        dec = native_decode_stream(out)
        assert len(dec) == len(frames)
        for k in (0, 5, 11):
            assert psnr(frames[k][0], dec[k][0]) > 30

    def test_factor_one_lossless_size(self, native, detailed_es):
        """factor=1: nothing is behind target, so every slice copies
        through verbatim (modulo the vbv_delay patch)."""
        es, frames = detailed_es
        out = native.requant(es, 1.0)
        assert len(out) == len(es)
        dec = native_decode_stream(out)
        ref = native_decode_stream(es)
        for a, b in zip(ref, dec):
            np.testing.assert_array_equal(a[0], b[0])

    def test_stronger_factor_smaller(self, native, detailed_es):
        es, _ = detailed_es
        mild = native.requant(es, 1.3)
        strong = native.requant(es, 2.5)
        assert len(strong) < len(mild) < len(es)

    def test_vbv_delay_patched(self, native, detailed_es):
        es, _ = detailed_es
        out = native.requant(es, 1.0)
        # picture header: 00 00 01 00 tt tttttt tt tTTvvvvv ...
        i = out.index(b"\x00\x00\x01\x00")
        vbv = ((out[i + 5] & 0x7) << 13) | (out[i + 6] << 5) \
            | (out[i + 7] >> 3)
        assert vbv == 0xFFFF

    def test_garbage_passthrough(self, native):
        """No valid headers -> everything copies through unchanged."""
        junk = bytes(RNG.integers(0, 256, 500, dtype=np.uint8))
        out = native.requant(junk, 2.0)
        assert out == junk

    def test_tool_cli(self, native, detailed_es, tmp_path):
        from tcforge_tpu.tools import tcrequant as tool
        es, _ = detailed_es
        src = tmp_path / "in.m2v"
        dst = tmp_path / "out.m2v"
        src.write_bytes(es)
        rc = tool.main(["-i", str(src), "-o", str(dst), "-f", "1.5"])
        assert rc == 0
        assert 0 < dst.stat().st_size < len(es)


def test_422_stream_refused():
    """4:2:2 input must fail loudly — the requant slice walk is
    4:2:0-only (6-block MBs); silently corrupting is worse."""
    import numpy as np
    import pytest

    from tcforge_tpu import native
    from tcforge_tpu.io.mpeg2codec import Mpeg2Encoder
    if not native.available():
        pytest.skip("native library not built")
    y = np.full((32, 32), 128, np.uint8)
    u = np.full((32, 16), 90, np.uint8)
    enc = Mpeg2Encoder(32, 32, 25.0, qscale=2, chroma=422)
    es = enc.encode_frame(y, u, u) + enc.sequence_end()
    with pytest.raises(ValueError):
        native.requant(es, 1.3)
