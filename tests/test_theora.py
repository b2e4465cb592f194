"""Native Theora decoder (io/theora.py) validated BIT-EXACT against
the bundled libavcodec decoder on libtheora-encoded streams — the
same in-container oracle method used for Vorbis and LZO.  The
reference has no in-tree theora decoder (import/import_ogg.c hands
packets to libtheora); this one is a from-scratch spec
implementation."""

import numpy as np
import pytest

from tcforge_tpu.io import theora as th

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available() and _av.have_codec("theora")
except Exception:
    HAVE_BRIDGE = False

pytestmark = pytest.mark.skipif(
    not HAVE_BRIDGE, reason="FFmpeg bridge with libtheora required "
    "for the encode side of the oracle round-trip")


def _encode(frames, w, h, gop=8, opts=None):
    enc = _av.AvVideoEncoder("libtheora", w, h, fps=25.0, gop=gop,
                             global_header=True, opts=opts)
    hdrs = _av.split_xiph_extradata(enc.extradata)
    pkts = []
    for y, u, v in frames:
        pkts += [p for p, k in enc.encode(y, u, v)]
    pkts += [p for p, k in enc.flush()]
    return hdrs, pkts


def _moving_frames(w, h, n, seed=1):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h + 64, w + 64), np.uint8)
    out = []
    for i in range(n):
        out.append((
            np.ascontiguousarray(base[8 + i:8 + i + h,
                                      8 + 2 * i:8 + 2 * i + w]),
            np.ascontiguousarray(base[i:i + h // 2, i:i + w // 2]),
            np.ascontiguousarray(base[32 + i:32 + i + h // 2,
                                      20:20 + w // 2])))
    return out


def _assert_stream_exact(hdrs, pkts):
    oracle = _av.AvVideoDecoder("theora", header_packets=hdrs)
    mine = th.TheoraDecoder(hdrs)
    n = 0
    for fi, pkt in enumerate(pkts):
        ref = oracle.decode(pkt)
        got = mine.decode(pkt)
        assert (ref is None) == (got is None), f"frame {fi} presence"
        if ref is None:
            continue
        for pi, (r, g) in enumerate(zip(ref, got)):
            assert r.shape == g.shape, f"frame {fi} plane {pi} shape"
            np.testing.assert_array_equal(
                g, r, err_msg=f"frame {fi} plane {pi}")
        n += 1
    assert n > 0
    return n


class TestHeaders:
    def test_ident_parse(self):
        hdrs, _ = _encode(_moving_frames(64, 48, 1), 64, 48)
        info = th.parse_ident(hdrs[0])
        assert (info.fmbw, info.fmbh) == (4, 3)
        assert (info.pic_w, info.pic_h) == (64, 48)
        assert info.pixel_format == 0
        assert info.version[:2] == (3, 2)

    def test_setup_parse_consumes_packet(self):
        """The setup parse (scales, matrices, quant ranges, 80
        Huffman trees) must land exactly at the packet end."""
        hdrs, _ = _encode(_moving_frames(64, 48, 1), 64, 48)
        setup = th.parse_setup(hdrs[2])
        assert len(setup.huff) == 80
        assert all(len(np.unique(t[0])) <= 32 for t in setup.huff)

    def test_bad_headers_raise(self):
        with pytest.raises(ValueError):
            th.parse_ident(b"\x81theora" + b"\x00" * 40)
        with pytest.raises(ValueError):
            th.parse_setup(b"\x80theora")


class TestBitExact:
    def test_intra_only_noise(self):
        """Keyframes over full-range noise exercise every token
        class, all Huffman groups and the DC predictor."""
        rng = np.random.RandomState(0)
        w, h = 64, 48
        frames = [(rng.randint(0, 256, (h, w), np.uint8),
                   rng.randint(0, 256, (h // 2, w // 2), np.uint8),
                   rng.randint(0, 256, (h // 2, w // 2), np.uint8))]
        hdrs, pkts = _encode(frames, w, h)
        _assert_stream_exact(hdrs, pkts)

    def test_motion_gop(self):
        """Inter frames with real motion: coded-block flags, MB
        modes, MV chains (LAST/LAST2/GOLDEN), half-pel MC incl. the
        mixed-sign diagonal case, block-level qi."""
        w, h = 64, 48
        hdrs, pkts = _encode(_moving_frames(w, h, 10), w, h, gop=8)
        _assert_stream_exact(hdrs, pkts)

    def test_quality_mode_loop_filter(self):
        """Low qi -> the loop filter is active on partially coded
        inter frames (edge rules toward uncoded neighbours)."""
        w, h = 96, 80
        hdrs, pkts = _encode(
            _moving_frames(w, h, 8), w, h, gop=4,
            opts={"flags": "+qscale", "global_quality": "354"})
        _assert_stream_exact(hdrs, pkts)

    def test_cropped_geometry(self):
        """Non-multiple-of-16 picture: PICY offsets count from the
        BOTTOM of the coded (upside-down) frame."""
        w, h = 50, 34
        hdrs, pkts = _encode(
            _moving_frames(w, h, 6), w, h, gop=5,
            opts={"flags": "+qscale", "global_quality": "826"})
        _assert_stream_exact(hdrs, pkts)

    def test_sparse_inter_patch(self):
        """One changed block per frame: partial superblocks, short
        block-flag runs, chroma blocks in modeless macroblocks."""
        w, h = 64, 48
        rng = np.random.RandomState(1)
        y0 = rng.randint(0, 256, (h, w), np.uint8)
        u0 = rng.randint(0, 256, (h // 2, w // 2), np.uint8)
        v0 = rng.randint(0, 256, (h // 2, w // 2), np.uint8)
        y1 = y0.copy()
        y1[16:24, 24:32] = rng.randint(0, 256, (8, 8))
        hdrs, pkts = _encode([(y0, u0, v0), (y1, u0, v0)], w, h,
                             gop=30)
        _assert_stream_exact(hdrs, pkts)


class TestOggImporterNative:
    def test_native_path_matches_bridge(self, tmp_path, monkeypatch):
        """The ogg importer decodes theora with the in-tree decoder
        when TCFORGE_NATIVE_THEORA=1, bit-identical to the bridge
        path."""
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module

        w, h = 64, 48
        frames = _moving_frames(w, h, 5)
        hdrs, pkts = _encode(frames, w, h, gop=8)
        # mux a minimal ogg with the native theora stream writer
        from tcforge_tpu.io.ogg import OggPageWriter
        path = tmp_path / "t.ogg"
        with open(path, "wb") as f:
            wtr = OggPageWriter(f, serial=0x1234)
            for hp in hdrs:
                wtr.write_packet(hp, granule=0, flush=True)
            for i, pkt in enumerate(pkts):
                wtr.write_packet(pkt, granule=i + 1)
            wtr.close(eos=True)

        def read_all(env):
            if env:
                monkeypatch.setenv("TCFORGE_NATIVE_THEORA", "1")
            else:
                monkeypatch.delenv("TCFORGE_NATIVE_THEORA",
                                   raising=False)
            imp = new_module(ModuleKind.DEMULTIPLEXOR, "ogg", Job())
            imp.open(str(path))
            out = []
            while True:
                b = imp.read_video_batch(4)
                if b is None:
                    break
                out.append(b)
            imp.close()
            return out

        native = read_all(True)
        bridge = read_all(False)
        assert len(native) == len(bridge) and native
        for bn, bb in zip(native, bridge):
            for k in ("y", "u", "v"):
                np.testing.assert_array_equal(bn[k], bb[k])

    def test_dup_marker_at_batch_boundary(self, tmp_path,
                                          monkeypatch):
        """A zero-length dup-frame packet landing FIRST in a
        read_video_batch call must still repeat the previous frame
        (the previous frame went out in the prior batch)."""
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        from tcforge_tpu.io.ogg import OggPageWriter

        w, h = 64, 48
        frames = _moving_frames(w, h, 4)
        hdrs, pkts = _encode(frames, w, h, gop=8)
        path = tmp_path / "d.ogg"
        with open(path, "wb") as f:
            wtr = OggPageWriter(f, serial=0x1234)
            for hp in hdrs:
                wtr.write_packet(hp, granule=0, flush=True)
            # 4 real frames, then a dup marker exactly at the start
            # of the second batch-of-4
            for i, pkt in enumerate(pkts):
                wtr.write_packet(pkt, granule=i + 1)
            wtr.write_packet(b"", granule=len(pkts) + 1)
            wtr.close(eos=True)
        monkeypatch.setenv("TCFORGE_NATIVE_THEORA", "1")
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "ogg", Job())
        imp.open(str(path))
        b1 = imp.read_video_batch(4)
        b2 = imp.read_video_batch(4)
        imp.close()
        assert b1 is not None and b2 is not None
        assert b2["y"].shape[0] == 1        # the repeated frame
        np.testing.assert_array_equal(b2["y"][0], b1["y"][-1])


@pytest.mark.skipif(not HAVE_BRIDGE, reason="oracle needs bridge")
class TestChromaFormats:
    """r5: 4:2:2 and 4:4:4 decode (libtheora handles all three spec
    pixel formats; the subsampled-axis MV halving, per-row/per-block
    4MV chroma vectors and crop geometry differ per format)."""

    def _battery(self, fmt, cdv):
        rng = np.random.RandomState(3)
        W, H = 96, 80
        base = rng.randint(0, 256, (H + 32, W + 32)).astype(float)
        for ax in range(2):
            base = (base + np.roll(base, 1, ax)
                    + np.roll(base, -1, ax)) / 3
        ch = H if cdv in (2, 4) else H // 2
        cw = W if cdv == 4 else W // 2
        frames = [(np.clip(base[i:i + H, 2 * i:2 * i + W], 0,
                           255).astype(np.uint8),
                   np.clip(base[i:i + ch, i:i + cw], 0,
                           255).astype(np.uint8),
                   np.clip(base[4:4 + ch, 4:4 + cw], 0,
                           255).astype(np.uint8)) for i in range(6)]
        opts = {"pixel_format": fmt}
        enc = _av.AvVideoEncoder("libtheora", W, H, fps=25.0, gop=4,
                                 bitrate=3_000_000,
                                 global_header=True, opts=opts)
        pkts = []
        for f in frames:
            pkts += [p for p, _ in enc.encode(*f)]
        pkts += [p for p, _ in enc.flush()]
        hdrs = _av.split_xiph_extradata(enc.extradata)
        oracle = _av.AvVideoDecoder("theora", header_packets=hdrs)
        mine = th.TheoraDecoder(hdrs)
        n = 0
        for p in pkts:
            r = oracle.decode(p, chroma=cdv)
            g = mine.decode(p)
            if r is None or g is None:
                continue
            n += 1
            for pi, (a, b) in enumerate(zip(r, g)):
                assert np.array_equal(a, b), \
                    f"{fmt} frame {n} plane {pi}"
        assert n == 6

    def test_422(self):
        self._battery("yuv422p", 2)

    def test_444(self):
        self._battery("yuv444p", 4)
