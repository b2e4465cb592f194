"""Batched device MPEG-4 reconstruction (io/mpeg4jax.py) must be
BIT-IDENTICAL to the per-MB numpy decode path (io/mpeg4dec.py) —
the numpy path carries the libavcodec oracle coverage
(tests/test_mpeg4dec.py), so identity here transfers it.

The device MC is the shift-select form at 8x8-block granularity
(4MV), the IDCT is the XVID integer transform in int32 (jnp int32
wraps two's-complement like the C reference), and display order
falls out of the GOP lax.scan (B emits own recon, anchors emit the
carried previous anchor)."""

import numpy as np
import pytest

from tcforge_tpu.io.mpeg4dec import Mpeg4Decoder
from tcforge_tpu.io.mpeg4enc import Mpeg4NativeEncoder
from tcforge_tpu.io import mpeg4jax

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available() and _av.have_codec("mpeg4")
except Exception:
    HAVE_BRIDGE = False

W, H = 176, 144


def _frames(n, seed=0, w=W, h=H, still=False):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h + 64, w + 64)).astype(float)
    for ax in range(2):
        base = (base + np.roll(base, 1, ax)
                + np.roll(base, -1, ax)) / 3
    out = []
    for i in range(n):
        j = 0 if still else i
        out.append((
            np.clip(base[2 * j:2 * j + h, 3 * j:3 * j + w], 0,
                    255).astype(np.uint8),
            np.clip(base[j:j + h // 2, j:j + w // 2], 0,
                    255).astype(np.uint8),
            np.clip(base[8:8 + h // 2, 4:4 + w // 2], 0,
                    255).astype(np.uint8)))
    return out


def _numpy_decode(chunks):
    dec = Mpeg4Decoder()
    out = []
    for c in chunks:
        out += dec.decode_frames(c)
    tail = dec.flush()
    if tail is not None:
        out.append(tail)
    return out


def _assert_identical(chunks, bucket=False):
    ref = _numpy_decode(chunks)
    got = mpeg4jax.decode_stream_jax(b"".join(chunks),
                                     bucket_lengths=bucket)
    assert len(ref) == len(got)
    for fi, (r, g) in enumerate(zip(ref, got)):
        for pi, (a, b) in enumerate(zip(r, g)):
            assert np.array_equal(a, b), (
                f"frame {fi} plane {pi}: max diff "
                f"{np.abs(a.astype(int) - b.astype(int)).max()}")


def _native_chunks(n=10, bframes=0, gop=8, qscale=6, w=W, h=H):
    enc = Mpeg4NativeEncoder(w, h, bframes=bframes, gop=gop,
                             qscale=qscale)
    chunks = []
    for f in _frames(n, w=w, h=h):
        chunks += [c for c, _ in enc.push(*f)]
    chunks += [c for c, _ in enc.flush()]
    return chunks


class TestNativeStreams:
    def test_ip(self):
        _assert_identical(_native_chunks())

    def test_b_vops(self):
        _assert_identical(_native_chunks(n=12, bframes=2))

    def test_bucketed(self):
        _assert_identical(_native_chunks(n=11, bframes=1),
                          bucket=True)

    def test_odd_size(self):
        # 180x140: partial-MB crop (VOL dims not multiples of 16)
        _assert_identical(_native_chunks(n=6, w=180, h=140))


class TestStreamingCarry:
    def test_chunked_refs_carry(self):
        """Splitting the plan list across run_plans calls with the
        refs carry must equal the one-shot scan."""
        chunks = _native_chunks(n=12, bframes=2)
        data = b"".join(chunks)
        one = mpeg4jax.decode_stream_jax(data)
        dec = Mpeg4Decoder()
        plans = dec.parse_plans(data)
        frames = []
        refs = None
        for i in range(0, len(plans), 5):
            part, refs = mpeg4jax.run_plans(plans[i:i + 5],
                                            refs0=refs)
            frames += part
        frames.append(tuple(np.asarray(p) for p in refs[3:]))
        vol = dec.vol
        crop = [(fy[:vol.height, :vol.width],
                 fu[:(vol.height + 1) // 2, :(vol.width + 1) // 2],
                 fv[:(vol.height + 1) // 2, :(vol.width + 1) // 2])
                for fy, fu, fv in frames]
        assert len(one) == len(crop)
        for r, g in zip(one, crop):
            for a, b in zip(r, g):
                assert np.array_equal(a, b)


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required")
class TestLavcStreams:
    def _lavc_chunks(self, opts, n=10, gop=8, still=False):
        enc = _av.AvVideoEncoder("mpeg4", W, H, fps=25.0, gop=gop,
                                 opts=opts)
        pkts = []
        for f in _frames(n, still=still):
            pkts += [p for p, _ in enc.encode(*f)]
        pkts += [p for p, _ in enc.flush()]
        return pkts

    def test_default(self):
        _assert_identical(self._lavc_chunks({}))

    def test_4mv(self):
        _assert_identical(self._lavc_chunks({"flags": "+4mv"}))

    def test_mpeg_quant(self):
        _assert_identical(self._lavc_chunks({"mpeg_quant": "1"}))

    def test_b_vops(self):
        _assert_identical(self._lavc_chunks({"bf": "2"}, n=12))

    def test_b_vops_4mv(self):
        _assert_identical(
            self._lavc_chunks({"bf": "2", "flags": "+4mv"}, n=12))

    def test_still_skip_mbs(self):
        # still content: not_coded MBs / skipped VOPs
        _assert_identical(self._lavc_chunks({}, n=8, still=True))

    def test_ac_pred(self):
        _assert_identical(
            self._lavc_chunks({"flags": "+aic"}, n=6, gop=1))

    def test_video_packets(self):
        # resync markers WITHOUT data partitioning: per-packet
        # DC/AC/MV predictor isolation must record the same plans
        _assert_identical(self._lavc_chunks({"ps": "250"}))

    def test_video_packets_4mv_b(self):
        _assert_identical(self._lavc_chunks(
            {"ps": "250", "flags": "+4mv", "bf": "2"}, n=12))

    def test_data_partitioned(self):
        _assert_identical(
            self._lavc_chunks({"data_partitioning": "1"}))

    def test_data_partitioned_multi_packet(self):
        # resync markers + per-packet predictor resets inside every
        # partitioned VOP
        _assert_identical(self._lavc_chunks(
            {"data_partitioning": "1", "ps": "250"}))

    def test_data_partitioned_4mv(self):
        _assert_identical(self._lavc_chunks(
            {"data_partitioning": "1", "flags": "+4mv"}))

    def test_unsupported_vol_raises(self):
        pkts = self._lavc_chunks({"flags": "+qpel"}, n=4)
        dec = Mpeg4Decoder()
        with pytest.raises(NotImplementedError):
            dec.parse_plans(b"".join(pkts))

    def test_short_header_raises(self):
        """Short-header chunks have NO MPEG-4 start codes; plan mode
        must raise (so importers fall back) instead of silently
        yielding zero plans."""
        enc = _av.AvVideoEncoder("h263", 176, 144, fps=25.0, gop=8)
        y, u, v = _frames(1, w=176, h=144)[0]
        pkts = [p for p, _ in enc.encode(y, u, v)]
        pkts += [p for p, _ in enc.flush()]
        dec = Mpeg4Decoder()
        with pytest.raises(NotImplementedError):
            dec.parse_plans(pkts[0])
