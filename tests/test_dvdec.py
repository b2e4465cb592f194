"""Native DV25 PAL decoder (io/dvdec.py) validated BIT-EXACT against
the bundled libavcodec dvvideo decoder — the oracle method used for
theora/LZO.  The reference has no in-tree DV decoder
(import/import_dv.c links libdv)."""

import numpy as np
import pytest

from tcforge_tpu.io.dvdec import DVDecoder, dv_frame_size

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available() and _av.have_codec("dvvideo")
except Exception:
    HAVE_BRIDGE = False

W, H = 720, 576


def _smooth(seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (H + 32, W + 32)).astype(float)
    for ax in range(2):
        base = (base + np.roll(base, 1, ax) + np.roll(base, -1, ax)) / 3
    y = np.clip(base[:H, :W], 0, 255).astype(np.uint8)
    u = np.clip(base[:H // 2, :W // 2], 0, 255).astype(np.uint8)
    v = np.clip(base[8:8 + H // 2, 4:4 + W // 2], 0,
                255).astype(np.uint8)
    return y, u, v


def _encode(frames):
    enc = _av.AvVideoEncoder("dvvideo", W, H, fps=25.0)
    pkts = []
    for y, u, v in frames:
        pkts += [p for p, _ in enc.encode(y, u, v)]
    pkts += [p for p, _ in enc.flush()]
    return pkts


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestOracleBitExact:
    def _assert_exact(self, frames):
        pkts = _encode(frames)
        assert pkts
        oracle = _av.AvVideoDecoder("dvvideo")
        mine = DVDecoder()
        for fi, pkt in enumerate(pkts):
            assert dv_frame_size(pkt) == 144000
            ref = oracle.decode(pkt)
            got = mine.decode(pkt)
            assert ref is not None
            for pi, (r, g) in enumerate(zip(ref, got)):
                np.testing.assert_array_equal(
                    g, r, err_msg=f"frame {fi} plane {pi}")

    def test_smooth_content(self):
        self._assert_exact([_smooth(s) for s in range(3)])

    def test_full_range_noise(self):
        """Maximum AC energy: every quant class, heavy bit spilling
        through the MB and segment pools."""
        rng = np.random.RandomState(1)
        self._assert_exact([(
            rng.randint(0, 256, (H, W), np.uint8),
            rng.randint(0, 256, (H // 2, W // 2), np.uint8),
            rng.randint(0, 256, (H // 2, W // 2), np.uint8))])

    def test_combed_interlace_248(self):
        """Fields with independent motion drive the 2x4x8 DCT mode
        (the 4-point field IDCT path)."""
        rng = np.random.RandomState(2)
        base = rng.randint(0, 256, (H // 2 + 16, W + 32)).astype(float)
        for ax in range(2):
            base = (base + np.roll(base, 1, ax)
                    + np.roll(base, -1, ax)) / 3
        y = np.zeros((H, W))
        y[0::2] = np.clip(base[:H // 2, :W], 0, 255)
        y[1::2] = np.clip(base[8:8 + H // 2, 16:16 + W], 0, 255)
        self._assert_exact([(y.astype(np.uint8),
                             np.full((H // 2, W // 2), 128, np.uint8),
                             np.full((H // 2, W // 2), 90, np.uint8))])

    def test_extremes_and_checkerboard(self):
        cb = (np.indices((H, W)).sum(0) % 2 * 255).astype(np.uint8)
        ccb = (np.indices((H // 2, W // 2)).sum(0) % 2
               * 255).astype(np.uint8)
        self._assert_exact([
            (np.full((H, W), 255, np.uint8),
             np.zeros((H // 2, W // 2), np.uint8),
             np.full((H // 2, W // 2), 255, np.uint8)),
            (cb, ccb, np.full((H // 2, W // 2), 128, np.uint8))])


class TestRobustness:
    def test_short_frame_raises(self):
        with pytest.raises(ValueError):
            DVDecoder().decode(b"\x00" * 1000)

    def test_ntsc_empty_frame_raises(self):
        data = bytearray(144000)
        data[3] = 0x00                  # DSF=0: NTSC
        with pytest.raises(ValueError):
            DVDecoder().decode(bytes(data))

    def test_garbage_no_crash(self):
        """Random bytes shaped like a PAL frame either decode to
        something or raise a loud error — never hang or crash."""
        rng = np.random.RandomState(3)
        data = bytearray(rng.randint(0, 256, 144000, np.uint8))
        data[3] = 0x80                  # PAL flag
        # force plausible video DIF headers so sequences are complete
        i = 0
        for seq in range(12):
            for off in range(150):
                pos = (seq * 150 + off) * 80
                if off < 15:
                    data[pos] = 0x00    # non-video SCT
                else:
                    data[pos] = 0x80 | 0x1E  # SCT=4 pattern bits
                    data[pos] = 0x9E
                    data[pos + 1] = seq << 4
                    data[pos + 2] = i % 135
                    i += 1
        try:
            y, u, v = DVDecoder().decode(bytes(data))
            assert y.shape == (576, 720)
        except ValueError:
            pass


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="bridge needed to build the fixture")
class TestImporterNative:
    def test_native_path_matches_bridge(self, tmp_path, monkeypatch):
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module

        pkts = _encode([_smooth(s) for s in range(3)])
        path = tmp_path / "t.dv"
        path.write_bytes(b"".join(pkts))

        def read_all(env):
            if env:
                monkeypatch.setenv("TCFORGE_NATIVE_DV", "1")
            else:
                monkeypatch.delenv("TCFORGE_NATIVE_DV", raising=False)
            imp = new_module(ModuleKind.DEMULTIPLEXOR, "dv", Job())
            imp.open(str(path))
            out = []
            while True:
                b = imp.read_video_batch(2)
                if b is None:
                    break
                out.append(b)
            imp.close()
            return out

        nat = read_all(True)
        br = read_all(False)
        assert len(nat) == len(br) and nat
        for a, b in zip(nat, br):
            for k in ("y", "u", "v"):
                np.testing.assert_array_equal(a[k], b[k])


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestEncoderOracle:
    """The in-tree DV encoder (io/dvenc.py): every emitted frame
    decodes BIT-IDENTICALLY through the in-tree decoder and through
    libavcodec (recon exact by construction)."""

    def _assert_both_decoders_agree(self, frames, min_psnr):
        from tcforge_tpu.io.dvenc import DVEncoder
        enc = DVEncoder()
        dec = DVDecoder()
        oracle = _av.AvVideoDecoder("dvvideo")
        for fi, (y, u, v) in enumerate(frames):
            pkt = enc.encode(y, u, v)
            assert len(pkt) == 144000
            mine = dec.decode(pkt)
            ref = oracle.decode(pkt)
            assert ref is not None, f"frame {fi} rejected by lavc"
            for pi, (r, g) in enumerate(zip(ref, mine)):
                np.testing.assert_array_equal(
                    g, r, err_msg=f"frame {fi} plane {pi}")
            mse = np.mean((mine[0].astype(float) - y) ** 2)
            psnr = 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)
            assert psnr > min_psnr, f"frame {fi}: {psnr:.1f} dB"

    def test_smooth_content_quality(self):
        self._assert_both_decoders_agree(
            [_smooth(s) for s in range(2)], 25.0)

    def test_flat_lossless(self):
        y = np.full((H, W), 77, np.uint8)
        u = np.full((H // 2, W // 2), 128, np.uint8)
        v = np.full((H // 2, W // 2), 200, np.uint8)
        self._assert_both_decoders_agree([(y, u, v)], 90.0)

    def test_noise_truncation_path(self):
        """Full-range noise saturates every segment: the qno floor
        and coefficient-drop truncation paths, still valid streams."""
        rng = np.random.RandomState(7)
        self._assert_both_decoders_agree([(
            rng.randint(0, 256, (H, W), np.uint8),
            rng.randint(0, 256, (H // 2, W // 2), np.uint8),
            rng.randint(0, 256, (H // 2, W // 2), np.uint8))], 10.0)

    def test_combed_248_mode(self):
        """Field-independent motion drives the 2-4-8 forward path
        (cross-field butterfly + 4-point field IDCT)."""
        rng = np.random.RandomState(2)
        b = rng.randint(0, 256, (H // 2 + 16, W + 32)).astype(float)
        for ax in range(2):
            b = (b + np.roll(b, 1, ax) + np.roll(b, -1, ax)) / 3
        y = np.zeros((H, W))
        y[0::2] = np.clip(b[:H // 2, :W], 0, 255)
        y[1::2] = np.clip(b[8:8 + H // 2, 16:16 + W], 0, 255)
        self._assert_both_decoders_agree(
            [(y.astype(np.uint8),
              np.full((H // 2, W // 2), 128, np.uint8),
              np.full((H // 2, W // 2), 90, np.uint8))], 25.0)

    def test_geometry_rejected(self):
        from tcforge_tpu.io.dvenc import DVEncoder
        with pytest.raises(ValueError):
            DVEncoder().encode(np.zeros((480, 720), np.uint8),
                               np.zeros((240, 360), np.uint8),
                               np.zeros((240, 360), np.uint8))


class TestAudio:
    def test_inject_extract_roundtrip(self):
        from tcforge_tpu.io.dvenc import DVEncoder, inject_audio
        from tcforge_tpu.io.dvdec import extract_audio
        enc = DVEncoder()
        fr = enc.encode(np.full((H, W), 128, np.uint8),
                        np.full((H // 2, W // 2), 128, np.uint8),
                        np.full((H // 2, W // 2), 128, np.uint8))
        rng = np.random.RandomState(0)
        pcm = rng.randint(-30000, 30000, (1920, 2)).astype(np.int16)
        fr2 = inject_audio(fr, pcm)
        got, rate = extract_audio(fr2)
        assert rate == 48000
        np.testing.assert_array_equal(got, pcm)

    def test_no_audio_raises(self):
        from tcforge_tpu.io.dvenc import DVEncoder
        from tcforge_tpu.io.dvdec import extract_audio
        fr = DVEncoder().encode(
            np.full((H, W), 128, np.uint8),
            np.full((H // 2, W // 2), 128, np.uint8),
            np.full((H // 2, W // 2), 128, np.uint8))
        with pytest.raises(ValueError):
            extract_audio(fr)        # AAUX says no audio

    @pytest.mark.skipif(not HAVE_BRIDGE, reason="oracle")
    def test_cross_validated_with_lavf(self, tmp_path):
        """Our injected audio reads back identically through
        libavformat, and we read lavf-muxed DV audio exactly — the
        shuffle formula agrees with the standard in both
        directions."""
        from tcforge_tpu.io.dvenc import DVEncoder, inject_audio
        from tcforge_tpu.io.dvdec import extract_audio
        enc = DVEncoder()
        y, u, v = _smooth(0)
        fr = enc.encode(y, u, v)
        rng = np.random.RandomState(1)
        pcm = rng.randint(-32000, 32000, (1920, 2)).astype(np.int16)
        p = tmp_path / "a.dv"
        p.write_bytes(inject_audio(fr, pcm))
        a = _av.AvFileAudio(str(p))
        chunks = []
        while True:
            b = a.read(65536)
            if b is None or not len(b):
                break
            chunks.append(b)
        g = np.concatenate(chunks).reshape(-1, 2).astype(np.int16)
        np.testing.assert_array_equal(g[:1920], pcm)
        # reverse: lavf muxes, we extract
        mux = _av.AvMuxer(str(tmp_path / "b.dv"), format="dv")
        vi = mux.add_video("dvvideo", W, H, 25.0)
        ai = mux.add_audio("pcm_s16le", 48000, 2)
        mux.write_header()
        mux.write(vi, fr, 0)
        mux.write(ai, pcm.tobytes(), 0)
        mux.close()
        d = (tmp_path / "b.dv").read_bytes()[:144000]
        got, _ = extract_audio(d)
        np.testing.assert_array_equal(got, pcm)

    @pytest.mark.skipif(not HAVE_BRIDGE, reason="fixture")
    def test_importer_native_audio_matches_bridge(self, tmp_path,
                                                  monkeypatch):
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io.dvenc import DVEncoder, inject_audio
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        enc = DVEncoder()
        rng = np.random.RandomState(2)
        frames = []
        for s in range(3):
            fr = enc.encode(*_smooth(s))
            frames.append(inject_audio(
                fr, rng.randint(-30000, 30000, (1920, 2)
                                ).astype(np.int16)))
        p = tmp_path / "av.dv"
        p.write_bytes(b"".join(frames))

        def read_aud(env):
            if env:
                monkeypatch.setenv("TCFORGE_NATIVE_DV", "1")
            else:
                monkeypatch.delenv("TCFORGE_NATIVE_DV", raising=False)
            imp = new_module(ModuleKind.DEMULTIPLEXOR, "dv", Job())
            imp.open(str(p))
            out = []
            while True:
                b = imp.read_audio_batch(1920)
                if b is None:
                    break
                out.append(np.asarray(b))
            imp.close()
            return np.concatenate(out) if out else None

        nat = read_aud(True)
        br = read_aud(False)
        assert nat is not None and br is not None
        m = min(len(nat), len(br))
        np.testing.assert_array_equal(
            np.asarray(nat[:m], np.int16).reshape(m, -1),
            np.asarray(br[:m], np.int16).reshape(m, -1))


# ------------------------------------------------------------------ #
# NTSC 4:1:1 (r5): decode AND encode, both oracle-validated
# ------------------------------------------------------------------ #

WN, HN = 720, 480


def _smooth_ntsc(seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (HN + 32, WN + 32)).astype(float)
    for ax in range(2):
        base = (base + np.roll(base, 1, ax)
                + np.roll(base, -1, ax)) / 3
    y = np.clip(base[:HN, :WN], 0, 255).astype(np.uint8)
    u = np.clip(base[:HN, :WN // 4], 0, 255).astype(np.uint8)
    v = np.clip(base[8:8 + HN, 4:4 + WN // 4], 0,
                255).astype(np.uint8)
    return y, u, v


def _encode_ntsc(frames):
    enc = _av.AvVideoEncoder("dvvideo", WN, HN, fps=30000 / 1001.0,
                             opts={"pixel_format": "yuv411p"})
    pkts = []
    for y, u, v in frames:
        pkts += [p for p, _ in enc.encode(y, u, v)]
    pkts += [p for p, _ in enc.flush()]
    return pkts


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestNtscDecodeOracle:
    def _assert_exact(self, frames):
        pkts = _encode_ntsc(frames)
        assert pkts
        oracle = _av.AvVideoDecoder("dvvideo")
        mine = DVDecoder()
        for fi, pkt in enumerate(pkts):
            assert dv_frame_size(pkt) == 120000
            ref = oracle.decode(pkt, chroma=3)
            got = mine.decode(pkt)
            assert ref is not None
            assert got[1].shape == (HN, WN // 4)
            for pi, (r, g) in enumerate(zip(ref, got)):
                np.testing.assert_array_equal(
                    g, r, err_msg=f"frame {fi} plane {pi}")

    def test_smooth_content(self):
        self._assert_exact([_smooth_ntsc(s) for s in range(3)])

    def test_full_range_noise(self):
        rng = np.random.RandomState(5)
        frames = [(rng.randint(0, 256, (HN, WN)).astype(np.uint8),
                   rng.randint(0, 256, (HN, WN // 4)
                               ).astype(np.uint8),
                   rng.randint(0, 256, (HN, WN // 4)
                               ).astype(np.uint8))]
        self._assert_exact(frames)

    def test_right_edge_detail(self):
        """Structured detail in the 16-wide right edge exercises the
        2x2-block MBs and the split 4x16 chroma packing."""
        y, u, v = _smooth_ntsc(7)
        y = y.copy()
        u = u.copy()
        y[:, 704:] = np.arange(480 * 16).reshape(480, 16) % 256
        u[:, 176:] = np.arange(480 * 4).reshape(480, 4) % 256
        self._assert_exact([(y, u, v)])


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestNtscEncoderOracle:
    def _psnr(self, a, b):
        m = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 10 * np.log10(255 ** 2 / m) if m else float("inf")

    def test_both_decoders_agree_and_quality(self):
        from tcforge_tpu.io.dvenc import DVEncoder
        enc = DVEncoder()
        oracle = _av.AvVideoDecoder("dvvideo")
        mine = DVDecoder()
        for s in range(2):
            src = _smooth_ntsc(s)
            frame = enc.encode(*src)
            assert len(frame) == 120000
            ref = oracle.decode(frame, chroma=3)
            got = mine.decode(frame)
            assert ref is not None
            for pi, (r, g) in enumerate(zip(ref, got)):
                np.testing.assert_array_equal(
                    g, r, err_msg=f"plane {pi}")
            for p, q in zip(got, src):
                assert self._psnr(p, q) > 25.0

    def test_flat_lossless(self):
        from tcforge_tpu.io.dvenc import DVEncoder
        y = np.full((HN, WN), 128, np.uint8)
        u = np.full((HN, WN // 4), 64, np.uint8)
        v = np.full((HN, WN // 4), 192, np.uint8)
        frame = DVEncoder().encode(y, u, v)
        gy, gu, gv = DVDecoder().decode(frame)
        np.testing.assert_array_equal(gy, y)
        np.testing.assert_array_equal(gu, u)
        np.testing.assert_array_equal(gv, v)


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestNtscImporter:
    def test_native_matches_bridge_e2e(self, tmp_path, monkeypatch):
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io.dvenc import DVEncoder
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        enc = DVEncoder()
        frames = [enc.encode(*_smooth_ntsc(s)) for s in range(2)]
        p = tmp_path / "n.dv"
        p.write_bytes(b"".join(frames))

        def read(env):
            if env:
                monkeypatch.setenv("TCFORGE_NATIVE_DV", "1")
            else:
                monkeypatch.delenv("TCFORGE_NATIVE_DV",
                                   raising=False)
            imp = new_module(ModuleKind.DEMULTIPLEXOR, "dv", Job())
            imp.open(str(p))
            assert (imp.width, imp.height) == (WN, HN)
            out = imp.read_video_batch(2)
            imp.close()
            return out

        nat = read(True)
        assert nat["y"].shape == (2, HN, WN)
        assert nat["u"].shape == (2, HN // 2, WN // 2)
        br = read(False)
        # both are 4:2:0 sessions; resite policies differ (ours is
        # pair-average+repeat, sws interpolates) so compare luma
        # exactly and chroma loosely
        np.testing.assert_array_equal(nat["y"], br["y"])
        assert np.abs(nat["u"].astype(int)
                      - br["u"].astype(int)).mean() < 4.0
