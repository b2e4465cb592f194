"""Native Theora encoder (io/theoraenc.py).

Validation is two-layered: (1) the emitted stream decodes through the
in-tree decoder (itself validated bit-exact against libavcodec) with
the encoder's own reconstruction, and (2) when the FFmpeg bridge is
present, libavcodec decodes the same stream BIT-IDENTICALLY to the
in-tree decoder — proving the stream is spec-valid to an independent
implementation, custom setup-header tables included.  The reference
could only encode theora by linking libtheora
(/root/reference/encode/encode_theora.c)."""

import numpy as np
import pytest

from tcforge_tpu.io import theora as th
from tcforge_tpu.io.theoraenc import TheoraNativeEncoder

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available() and _av.have_codec("theora")
except Exception:
    HAVE_BRIDGE = False


def _smooth_frames(w, h, n, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h + 32, w + 32)).astype(np.float64)
    for ax in range(2):
        base = (base + np.roll(base, 1, ax) + np.roll(base, -1, ax)) / 3
    out = []
    for i in range(n):
        out.append((
            np.clip(base[i:i + h, 2 * i:2 * i + w], 0,
                    255).astype(np.uint8),
            np.clip(base[i:i + (h + 1) // 2, i:i + (w + 1) // 2], 0,
                    255).astype(np.uint8),
            np.clip(base[8:8 + (h + 1) // 2, 4:4 + (w + 1) // 2], 0,
                    255).astype(np.uint8)))
    return out


def _noise_frames(w, h, n, seed=3):
    rng = np.random.RandomState(seed)
    return [(rng.randint(0, 256, (h, w), np.uint8),
             rng.randint(0, 256, ((h + 1) // 2, (w + 1) // 2),
                         np.uint8),
             rng.randint(0, 256, ((h + 1) // 2, (w + 1) // 2),
                         np.uint8)) for _ in range(n)]


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


class TestHeaders:
    def test_headers_roundtrip_own_parser(self):
        enc = TheoraNativeEncoder(64, 48, qi=40, gop=8)
        info = th.parse_ident(enc.headers[0])
        assert (info.fmbw, info.fmbh) == (4, 3)
        assert (info.pic_w, info.pic_h) == (64, 48)
        assert info.pixel_format == 0
        assert len(enc.headers[0]) == 42
        setup = th.parse_setup(enc.headers[2])
        assert len(setup.huff) == 80

    def test_kfgshift_field_position(self):
        """The ogg muxer reads KFGSHIFT from ident bytes 40-41."""
        enc = TheoraNativeEncoder(64, 48, gop=64)
        ident = enc.headers[0]
        word = (ident[40] << 8) | ident[41]
        assert (word >> 5) & 0x1F == enc.kfgshift == 6

    def test_bad_params(self):
        with pytest.raises(ValueError):
            TheoraNativeEncoder(0, 48)
        with pytest.raises(ValueError):
            TheoraNativeEncoder(64, 48, qi=64)


class TestRoundTrip:
    def test_quality_ladder(self):
        """Decode through the in-tree decoder: PSNR rises with qi."""
        w, h = 64, 48
        frames = _smooth_frames(w, h, 3)
        got = {}
        for qi in (10, 40, 60):
            enc = TheoraNativeEncoder(w, h, qi=qi, gop=8)
            dec = th.TheoraDecoder(enc.headers)
            ps = []
            for f in frames:
                pkt, _ = enc.encode(*f)
                out = dec.decode(pkt)
                ps.append(_psnr(out[0], f[0]))
            got[qi] = np.mean(ps)
        assert got[10] < got[40] < got[60]
        assert got[60] > 40.0

    def test_inter_skip_blocks_are_cheap(self):
        """A static scene converges: the first delta refines the
        keyframe's quantization error toward the source, after which
        every block skips (uncoded-superblock runs)."""
        w, h = 96, 80
        f = _noise_frames(w, h, 1)[0]
        enc = TheoraNativeEncoder(w, h, qi=50, gop=30)
        key, _ = enc.encode(*f)
        enc.encode(*f)                       # refinement delta
        delta2, is_key = enc.encode(*f)      # converged: all skip
        assert not is_key
        assert len(delta2) < len(key) // 20

    def test_recon_matches_decoder(self):
        """Encoder-side reconstruction IS the in-tree decoder: a
        fresh decoder over the emitted packets agrees exactly."""
        w, h = 50, 34                       # non-multiple-of-16 crop
        enc = TheoraNativeEncoder(w, h, qi=35, gop=3)
        dec = th.TheoraDecoder(enc.headers)
        for f in _smooth_frames(w, h, 6, seed=5):
            pkt, _ = enc.encode(*f)
            out = dec.decode(pkt)
            for a, b in zip(out, enc.dec._crop()):
                np.testing.assert_array_equal(a, b)

    def test_motion_beats_nomv_rate(self):
        """MC must pay for itself: panning content codes in well
        under the bytes of a pure copy-through delta stream."""
        w, h = 96, 80
        rng = np.random.RandomState(0)
        base = rng.randint(0, 256, (h + 64, w + 64)).astype(float)
        for ax in range(2):
            base = (base + np.roll(base, 1, ax)
                    + np.roll(base, -1, ax) + np.roll(base, 2, ax)) / 4
        frames = []
        for i in range(8):
            dy, dx = 2 * i, 3 * i
            frames.append((
                np.clip(base[dy:dy + h, dx:dx + w], 0,
                        255).astype(np.uint8),
                np.clip(base[:h // 2, :w // 2], 0,
                        255).astype(np.uint8),
                np.clip(base[8:8 + h // 2, 4:4 + w // 2], 0,
                        255).astype(np.uint8)))
        import tcforge_tpu.io.theora as _th
        enc = TheoraNativeEncoder(w, h, qi=45, gop=30)
        mc_bytes = sum(len(enc.encode(*f)[0]) for f in frames)
        enc2 = TheoraNativeEncoder(w, h, qi=45, gop=30)
        orig = TheoraNativeEncoder._choose_modes

        def force_nomv(planes):
            mm, mv, coded = orig(enc2, planes)
            mm = {k: (v if v < 0 else _th.MODE_NO_MV)
                  for k, v in mm.items()}
            return mm, {k: (0, 0) for k in mv}, coded
        enc2._choose_modes = force_nomv
        nomv_bytes = sum(len(enc2.encode(*f)[0]) for f in frames)
        assert mc_bytes < 0.65 * nomv_bytes

    def test_gop_cadence_and_packet_flags(self):
        enc = TheoraNativeEncoder(64, 48, qi=40, gop=4)
        keys = []
        for f in _smooth_frames(64, 48, 9):
            pkt, key = enc.encode(*f)
            keys.append(key)
            # the ogg muxer keys granulepos off bit 0x40
            assert bool(pkt[0] & 0x40) == (not key)
        assert keys == [True, False, False, False,
                        True, False, False, False, True]


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestOracleBitExact:
    def _assert_oracle_exact(self, enc, pkts):
        oracle = _av.AvVideoDecoder("theora",
                                    header_packets=enc.headers)
        mine = th.TheoraDecoder(enc.headers)
        for fi, pkt in enumerate(pkts):
            ref = oracle.decode(pkt)
            got = mine.decode(pkt)
            assert ref is not None, f"frame {fi} rejected by oracle"
            for pi, (r, g) in enumerate(zip(ref, got)):
                np.testing.assert_array_equal(
                    g, r, err_msg=f"frame {fi} plane {pi}")

    def test_noise_keyframes(self):
        """Full-range noise exercises every value-token class and
        the DC predictor at high amplitude."""
        w, h = 64, 48
        enc = TheoraNativeEncoder(w, h, qi=40, gop=2)
        pkts = [enc.encode(*f)[0] for f in _noise_frames(w, h, 3)]
        self._assert_oracle_exact(enc, pkts)

    def test_moving_gop(self):
        w, h = 64, 48
        enc = TheoraNativeEncoder(w, h, qi=55, gop=5)
        pkts = [enc.encode(*f)[0] for f in _smooth_frames(w, h, 8)]
        self._assert_oracle_exact(enc, pkts)

    def test_sparse_inter(self):
        """One changed block per frame: partial superblocks, short
        block-flag runs, EOB runs spanning group boundaries."""
        w, h = 64, 48
        rng = np.random.RandomState(1)
        y0 = rng.randint(0, 256, (h, w), np.uint8)
        u0 = rng.randint(0, 256, (h // 2, w // 2), np.uint8)
        v0 = rng.randint(0, 256, (h // 2, w // 2), np.uint8)
        frames = [(y0, u0, v0)]
        for i in range(4):
            y = y0.copy()
            y[8 * i:8 * i + 8, 16:24] = rng.randint(0, 256, (8, 8))
            frames.append((y, u0, v0))
        enc = TheoraNativeEncoder(w, h, qi=63, gop=30)
        pkts = [enc.encode(*f)[0] for f in frames]
        self._assert_oracle_exact(enc, pkts)

    def test_coarse_quant_loop_filter(self):
        """qi=5 drives large loop-filter limits on partially coded
        frames."""
        w, h = 64, 48
        enc = TheoraNativeEncoder(w, h, qi=5, gop=4)
        pkts = [enc.encode(*f)[0] for f in _smooth_frames(w, h, 8)]
        self._assert_oracle_exact(enc, pkts)

    def test_panning_motion_vectors(self):
        """A translating texture engages the MV/LAST/LAST2 chain:
        one searched vector per frame, the rest ride MODE_LAST."""
        w, h = 96, 80
        rng = np.random.RandomState(0)
        base = rng.randint(0, 256, (h + 64, w + 64)).astype(float)
        for ax in range(2):
            base = (base + np.roll(base, 1, ax)
                    + np.roll(base, -1, ax) + np.roll(base, 2, ax)) / 4
        frames = []
        for i in range(8):
            dy, dx = 2 * i, 3 * i
            frames.append((
                np.clip(base[dy:dy + h, dx:dx + w], 0,
                        255).astype(np.uint8),
                np.clip(base[dy // 2:dy // 2 + h // 2,
                             dx // 2:dx // 2 + w // 2], 0,
                        255).astype(np.uint8),
                np.clip(base[dy // 2 + 8:dy // 2 + 8 + h // 2,
                             dx // 2 + 4:dx // 2 + 4 + w // 2], 0,
                        255).astype(np.uint8)))
        enc = TheoraNativeEncoder(w, h, qi=45, gop=30)
        pkts = [enc.encode(*f)[0] for f in frames]
        self._assert_oracle_exact(enc, pkts)

    def test_negative_diagonal_motion(self):
        """Reverse pan drives negative MV components through the
        toward-zero half-pel rule (the decoder's hard-won case)."""
        w, h = 96, 80
        rng = np.random.RandomState(4)
        base = rng.randint(0, 256, (h + 64, w + 64)).astype(float)
        for ax in range(2):
            base = (base + np.roll(base, 1, ax)
                    + np.roll(base, -1, ax)) / 3
        frames = []
        for i in range(6):
            dy, dx = 40 - 3 * i, 40 - 5 * i
            frames.append((
                np.clip(base[dy:dy + h, dx:dx + w], 0,
                        255).astype(np.uint8),
                np.clip(base[dy // 2:dy // 2 + h // 2,
                             dx // 2:dx // 2 + w // 2], 0,
                        255).astype(np.uint8),
                np.clip(base[dy // 2:dy // 2 + h // 2,
                             dx // 2 + 4:dx // 2 + 4 + w // 2], 0,
                        255).astype(np.uint8)))
        enc = TheoraNativeEncoder(w, h, qi=45, gop=30)
        pkts = [enc.encode(*f)[0] for f in frames]
        self._assert_oracle_exact(enc, pkts)

    def test_cropped_geometry(self):
        w, h = 50, 34
        enc = TheoraNativeEncoder(w, h, qi=30, gop=3)
        pkts = [enc.encode(*f)[0]
                for f in _smooth_frames(w, h, 5, seed=7)]
        self._assert_oracle_exact(enc, pkts)


class TestModuleE2E:
    def test_native_module_to_ogg_and_back(self, tmp_path,
                                           monkeypatch):
        """theora encoder module (forced native) -> ogg muxer ->
        ogg importer (forced native decode) round trip."""
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.formats import ImageFormat
        from tcforge_tpu.core.frame import FrameBatch
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module

        monkeypatch.setenv("TCFORGE_NATIVE_THEORAENC", "1")
        monkeypatch.setenv("TCFORGE_NATIVE_THEORA", "1")
        w, h = 64, 48
        frames = _smooth_frames(w, h, 5, seed=2)
        job = Job()
        job.ex_v_width = w
        job.ex_v_height = h
        job.fps = 25.0
        enc = new_module(ModuleKind.ENCODER, "theora", job,
                         "qi=60:keyint=4")
        payloads = []
        for f in frames:
            fb = FrameBatch.from_numpy(
                y=np.asarray(f[0])[None], u=np.asarray(f[1])[None],
                v=np.asarray(f[2])[None], fmt=ImageFormat.YUV420P, device=False)
            payloads += enc.encode_video(fb)
        payloads += enc.flush()
        assert len(payloads) == 5
        assert "theora_headers" in job.extradata

        mux = new_module(ModuleKind.MULTIPLEXOR, "ogg", job)
        path = tmp_path / "native.ogg"
        mux.open(str(path))
        for p in payloads:
            mux.write_video(p)
        mux.close()

        imp = new_module(ModuleKind.DEMULTIPLEXOR, "ogg", Job())
        imp.open(str(path))
        got = []
        while True:
            b = imp.read_video_batch(4)
            if b is None:
                break
            got.append(b)
        imp.close()
        ys = np.concatenate([b["y"] for b in got])
        assert ys.shape == (5, h, w)
        for i, f in enumerate(frames):
            assert _psnr(ys[i], f[0]) > 38.0
