"""Native MPEG-4 part 2 decoder (io/mpeg4dec.py) validated against
the bundled libavcodec decoder.

MPEG-4 part 2 does NOT specify a bit-exact IDCT (IEEE-1180 drift
classes); the runtime reference uses its SIMD variant of the XVID
transform while this decoder implements the exact C reference of the
same transform — outputs agree within +-1 LSB per frame, with the
prediction loop bounding accumulation to a few LSB across a GOP
(every parse path is exact: a single wrong bit desyncs the stream,
so the tolerance checks are strict drift bounds, not hand-waving).
The reference imported DivX/Xvid through libavcodec/divx4linux
(import_ffmpeg.c, import_divx.c) — transcode's flagship use case."""

import numpy as np
import pytest

from tcforge_tpu.io.mpeg4dec import Mpeg4Decoder

try:
    from tcforge_tpu.native import av as _av
    HAVE_BRIDGE = _av.available() and _av.have_codec("mpeg4")
except Exception:
    HAVE_BRIDGE = False

W, H = 320, 240


def _frames(n, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (H + 64, W + 64)).astype(float)
    for ax in range(2):
        base = (base + np.roll(base, 1, ax) + np.roll(base, -1, ax)) / 3
    out = []
    for i in range(n):
        out.append((
            np.clip(base[2 * i:2 * i + H, 3 * i:3 * i + W], 0,
                    255).astype(np.uint8),
            np.clip(base[i:i + H // 2, i:i + W // 2], 0,
                    255).astype(np.uint8),
            np.clip(base[8:8 + H // 2, 4:4 + W // 2], 0,
                    255).astype(np.uint8)))
    return out


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestOracleDrift:
    def _assert_sequence(self, opts, tol, n=10, gop=8):
        """B-VOP streams: compare full DISPLAY-ORDER sequences (the
        decoder holds one non-B frame back; flush() emits it)."""
        enc = _av.AvVideoEncoder("mpeg4", W, H, fps=25.0, gop=gop,
                                 opts=opts)
        pkts = []
        for f in _frames(n):
            pkts += [p for p, _ in enc.encode(*f)]
        pkts += [p for p, _ in enc.flush()]
        oracle = _av.AvVideoDecoder("mpeg4")
        mine = Mpeg4Decoder()
        refs, gots = [], []
        for pkt in pkts:
            r = oracle.decode(pkt)
            if r is not None:
                refs.append(r)
            gots.extend(mine.decode_frames(pkt))
        refs += oracle.flush()
        g = mine.flush()
        if g is not None:
            gots.append(g)
        assert len(gots) == n
        assert len(refs) == n
        for fi, (r, g) in enumerate(zip(refs, gots)):
            for pi, (a, c) in enumerate(zip(r, g)):
                d = int(np.abs(a.astype(int) - c.astype(int)).max())
                assert d <= tol, f"frame {fi} plane {pi}: {d} > {tol}"

    def _assert_within(self, opts, tol_i, tol_gop, n=8, gop=8):
        enc = _av.AvVideoEncoder("mpeg4", W, H, fps=25.0, gop=gop,
                                 opts=opts)
        pkts = []
        for f in _frames(n):
            pkts += [p for p, _ in enc.encode(*f)]
        pkts += [p for p, _ in enc.flush()]
        oracle = _av.AvVideoDecoder("mpeg4")
        mine = Mpeg4Decoder()
        first = True
        for fi, pkt in enumerate(pkts):
            ref = oracle.decode(pkt)
            got = mine.decode(pkt)
            if ref is None:
                continue
            tol = tol_i if first else tol_gop
            first = False
            for pi, (r, g) in enumerate(zip(ref, got)):
                d = int(np.abs(r.astype(int) - g.astype(int)).max())
                assert d <= tol, f"frame {fi} plane {pi}: {d} > {tol}"

    def test_intra_only(self):
        self._assert_within({}, tol_i=1, tol_gop=1, n=4, gop=1)

    def test_p_vops(self):
        self._assert_within({}, tol_i=1, tol_gop=4)

    def test_4mv(self):
        self._assert_within({"flags": "+mv4"}, tol_i=1, tol_gop=4)

    def test_ac_pred(self):
        self._assert_within({"flags": "+aic"}, tol_i=1, tol_gop=4)

    def test_rd_mode_decision(self):
        """mbd=rd mixes INTRA MBs into P-VOPs and exercises the
        bitmask MCBPC layout (intra at index group 1, +Q at group 2,
        4MV at group 4)."""
        self._assert_within({"mbd": "rd"}, tol_i=1, tol_gop=4)

    def test_kitchen_sink(self):
        self._assert_within({"flags": "+mv4+aic", "mbd": "rd"},
                            tol_i=1, tol_gop=4)

    def test_mpeg_quant(self):
        """quant_type 1: matrix dequant with the reference's
        MPEG-2-routine mismatch control on inter blocks."""
        self._assert_within({"mpeg_quant": "1"}, tol_i=1, tol_gop=4)

    def test_b_vops(self):
        """I/P/B with direct + forward/backward/interpolated modes;
        P-VOPs in B streams carry vop_rounding_type=1 and large MVs
        (the 3-frames-away reference), so this also pins the MV
        wraparound and the 4MV blk-2 predictor."""
        self._assert_sequence({"bf": "2"}, tol=4)

    def test_b_vops_single(self):
        self._assert_sequence({"bf": "1"}, tol=4)

    def test_b_vops_4mv(self):
        self._assert_sequence({"bf": "2", "flags": "+mv4"}, tol=4)

    def test_b_vops_kitchen_sink(self):
        self._assert_sequence({"bf": "2", "flags": "+mv4+aic",
                               "mbd": "rd"}, tol=4)

    def test_b_vops_mpeg_quant(self):
        self._assert_sequence({"bf": "2", "mpeg_quant": "1"}, tol=4)

    def test_b_vops_adaptive(self):
        """b_strategy=2 varies the B-run length per GOP, exercising
        the modulo-time-base/TRB bookkeeping across uneven gaps."""
        self._assert_sequence({"bf": "2", "b_strategy": "2"}, tol=4)

    def test_rate_control_dquant(self):
        self._assert_within({"bf": "0", "qmin": "2", "qmax": "31",
                             "b": "200000"}, tol_i=1, tol_gop=4)

    def test_noise_intra(self):
        rng = np.random.RandomState(1)
        enc = _av.AvVideoEncoder("mpeg4", W, H, fps=25.0, gop=1)
        y = rng.randint(0, 256, (H, W), np.uint8)
        u = rng.randint(0, 256, (H // 2, W // 2), np.uint8)
        v = rng.randint(0, 256, (H // 2, W // 2), np.uint8)
        pkts = [p for p, _ in enc.encode(y, u, v)]
        ref = _av.AvVideoDecoder("mpeg4").decode(pkts[0])
        got = Mpeg4Decoder().decode(pkts[0])
        for r, g in zip(ref, got):
            assert np.abs(r.astype(int) - g.astype(int)).max() <= 1


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestQuarterPel(TestOracleDrift):
    """Quarter-sample mode: the 8-tap mirrored-block interpolation
    (horizontal stage first over s+1 rows, vertical stage on the
    clipped intermediates) and the per-block truncated-halve chroma
    sums — every phase derived empirically with crafted constant-MV
    probe streams (see io/mpeg4dec.py docstring)."""

    def test_qpel_p(self):
        self._assert_sequence({"flags": "+qpel"}, tol=4)

    def test_qpel_4mv(self):
        self._assert_sequence({"flags": "+qpel+mv4"}, tol=4)

    def test_qpel_b(self):
        self._assert_sequence({"flags": "+qpel", "bf": "2"}, tol=4)

    def test_qpel_kitchen_sink(self):
        self._assert_sequence({"flags": "+qpel+mv4+aic", "mbd": "rd",
                               "bf": "2"}, tol=4)

    def test_qpel_mpeg_quant(self):
        self._assert_sequence({"flags": "+qpel", "mpeg_quant": "1"},
                              tol=4)


class TestGates:
    def test_garbage_no_crash(self):
        rng = np.random.RandomState(3)
        dec = Mpeg4Decoder()
        for n in (0, 10, 1000):
            data = bytes(rng.randint(0, 256, n, np.uint8))
            try:
                dec.decode(data)
            except (ValueError, NotImplementedError):
                pass

    def test_vop_before_vol(self):
        with pytest.raises(ValueError):
            Mpeg4Decoder().decode(b"\x00\x00\x01\xb6" + b"\x00" * 50)


@pytest.mark.skipif(not HAVE_BRIDGE, reason="fixture")
class TestAviImporterNative:
    def test_xvid_avi_native_route(self, tmp_path, monkeypatch):
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io.avi import AviVideoStream, AviWriter
        from tcforge_tpu.modules.registry import ModuleKind, new_module

        enc = _av.AvVideoEncoder("mpeg4", W, H, fps=25.0, gop=6)
        pkts = []
        for f in _frames(6):
            pkts += [p for p, _ in enc.encode(*f)]
        path = tmp_path / "x.avi"
        wtr = AviWriter(str(path), AviVideoStream(
            width=W, height=H, fps=25.0, fourcc="XVID"))
        for i, p in enumerate(pkts):
            wtr.write_video_frame(p, keyframe=(i == 0))
        wtr.close()

        monkeypatch.setenv("TCFORGE_NATIVE_MPEG4", "1")
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "avi", Job())
        imp.open(str(path))
        ys = []
        while True:
            b = imp.read_video_batch(4)
            if b is None:
                break
            ys.append(b["y"])
        imp.close()
        ys = np.concatenate(ys)
        assert ys.shape == (6, H, W)
        oracle = _av.AvVideoDecoder("mpeg4")
        for i, p in enumerate(pkts):
            ref = oracle.decode(p)
            assert np.abs(ref[0].astype(int)
                          - ys[i].astype(int)).max() <= 4

    def test_bframe_avi_reorder_and_flush(self, tmp_path,
                                          monkeypatch):
        """B-frame AVIs: the importer must deliver DISPLAY order and
        flush the reorder-delayed final frame at EOF (frame count
        preserved)."""
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io.avi import AviVideoStream, AviWriter
        from tcforge_tpu.modules.registry import ModuleKind, new_module

        N = 8
        enc = _av.AvVideoEncoder("mpeg4", W, H, fps=25.0, gop=6,
                                 opts={"bf": "2"})
        pkts = []
        for f in _frames(N):
            pkts += [p for p, _ in enc.encode(*f)]
        pkts += [p for p, _ in enc.flush()]
        path = tmp_path / "b.avi"
        wtr = AviWriter(str(path), AviVideoStream(
            width=W, height=H, fps=25.0, fourcc="XVID"))
        for i, p in enumerate(pkts):
            wtr.write_video_frame(p, keyframe=(i == 0))
        wtr.close()

        oracle = _av.AvVideoDecoder("mpeg4")
        refs = []
        for p in pkts:
            r = oracle.decode(p)
            if r is not None:
                refs.append(r)
        refs += oracle.flush()

        monkeypatch.setenv("TCFORGE_NATIVE_MPEG4", "1")
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "avi", Job())
        imp.open(str(path))
        ys = []
        while True:
            b = imp.read_video_batch(3)
            if b is None:
                break
            ys.append(b["y"])
        imp.close()
        ys = np.concatenate(ys)
        assert ys.shape == (N, H, W)
        for i, r in enumerate(refs):
            assert np.abs(r[0].astype(int)
                          - ys[i].astype(int)).max() <= 4


@pytest.mark.skipif(not HAVE_BRIDGE, reason="fixture")
class TestAviImporterJax:
    """TCFORGE_MPEG4_JAX=1: the importer stages recon plans and
    reconstructs GOP batches on the device (io/mpeg4jax.py).  Must
    be BIT-IDENTICAL to the numpy decode path (both run the exact
    XVID IDCT), including across read-batch and plan-batch
    boundaries, and fall back wholesale on unsupported VOLs."""

    def _make_avi(self, tmp_path, n, opts=None, name="j.avi"):
        from tcforge_tpu.io.avi import AviVideoStream, AviWriter
        enc = _av.AvVideoEncoder("mpeg4", W, H, fps=25.0, gop=6,
                                 opts=opts)
        pkts = []
        for f in _frames(n):
            pkts += [p for p, _ in enc.encode(*f)]
        pkts += [p for p, _ in enc.flush()]
        path = tmp_path / name
        wtr = AviWriter(str(path), AviVideoStream(
            width=W, height=H, fps=25.0, fourcc="XVID"))
        for i, p in enumerate(pkts):
            wtr.write_video_frame(p, keyframe=(i == 0))
        wtr.close()
        return str(path)

    @staticmethod
    def _pull(path, batch):
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "avi", Job())
        imp.open(path)
        out = []
        while True:
            b = imp.read_video_batch(batch)
            if b is None:
                break
            out.append(b)
        imp.close()
        return tuple(np.concatenate([b[k] for b in out])
                     for k in ("y", "u", "v"))

    def _assert_identical(self, tmp_path, monkeypatch, opts,
                          n=11, batch=3):
        path = self._make_avi(tmp_path, n, opts)
        monkeypatch.setenv("TCFORGE_NATIVE_MPEG4", "1")
        monkeypatch.delenv("TCFORGE_MPEG4_JAX", raising=False)
        ref = self._pull(path, batch)
        monkeypatch.setenv("TCFORGE_MPEG4_JAX", "1")
        got = self._pull(path, batch)
        assert got[0].shape == ref[0].shape == (n, H, W)
        for r, g in zip(ref, got):
            assert np.array_equal(r, g)

    def test_ip_bit_identical(self, tmp_path, monkeypatch):
        self._assert_identical(tmp_path, monkeypatch, None)

    def test_ipb_bit_identical(self, tmp_path, monkeypatch):
        self._assert_identical(tmp_path, monkeypatch, {"bf": "2"})

    def test_4mv_bit_identical(self, tmp_path, monkeypatch):
        self._assert_identical(tmp_path, monkeypatch,
                               {"flags": "+mv4", "mbd": "rd"})

    def test_batch_boundary_invariance(self, tmp_path, monkeypatch):
        """Different read-batch sizes cross the _MP4_BATCH plan
        boundary at different points; output must not change."""
        path = self._make_avi(tmp_path, 19, {"bf": "2"})
        monkeypatch.setenv("TCFORGE_NATIVE_MPEG4", "1")
        monkeypatch.setenv("TCFORGE_MPEG4_JAX", "1")
        a = self._pull(path, 1)
        b = self._pull(path, 7)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)

    def test_qpel_fallback(self, tmp_path, monkeypatch):
        """Quarter-sample VOLs raise in plan mode; the importer must
        replay through the numpy path and still match it exactly."""
        self._assert_identical(tmp_path, monkeypatch,
                               {"flags": "+qpel"}, n=7)

    @pytest.mark.skipif(
        not __import__("os").environ.get("TCFORGE_SLOW_TESTS"),
        reason="subprocess CLI e2e (TCFORGE_SLOW_TESTS=1)")
    def test_cli_e2e_bit_identical(self, tmp_path):
        """Full CLI sessions over an XVID AVI with and without
        TCFORGE_MPEG4_JAX=1 must produce byte-identical Y4M."""
        import os
        import subprocess
        import sys
        path = self._make_avi(tmp_path, 9, {"bf": "2"}, "cli.avi")
        outs = []
        for jx in ("0", "1"):
            dst = tmp_path / f"out{jx}.y4m"
            env = dict(os.environ, JAX_PLATFORMS="cpu",
                       PYTHONPATH="/root/repo",
                       TCFORGE_NATIVE_MPEG4="1",
                       TCFORGE_MPEG4_JAX=jx)
            r = subprocess.run(
                [sys.executable, "-m", "tcforge_tpu.cli", "-i", path,
                 "-o", str(dst), "--progress_off", "-q"],
                env=env, capture_output=True, timeout=600)
            assert r.returncode == 0, r.stderr.decode()[-500:]
            outs.append(dst.read_bytes())
        assert outs[0] == outs[1] and len(outs[0]) > 1000

    def test_drop_frame_chunks(self, tmp_path, monkeypatch):
        """Zero-size chunks (avilib drop frames): the numpy path
        repeats the last anchor, the device path synthesizes an
        all-skip P plan — the emitted frame sequence must be
        identical."""
        from tcforge_tpu.io.avi import AviVideoStream, AviWriter
        enc = _av.AvVideoEncoder("mpeg4", W, H, fps=25.0, gop=6)
        pkts = []
        for f in _frames(8):
            pkts += [p for p, _ in enc.encode(*f)]
        pkts += [p for p, _ in enc.flush()]
        path = tmp_path / "drop.avi"
        wtr = AviWriter(str(path), AviVideoStream(
            width=W, height=H, fps=25.0, fourcc="XVID"))
        for i, p in enumerate(pkts):
            wtr.write_video_frame(p, keyframe=(i == 0))
            if i in (2, 5):                  # drop after these
                wtr.write_video_frame(b"", keyframe=False)
        wtr.close()
        monkeypatch.setenv("TCFORGE_NATIVE_MPEG4", "1")
        monkeypatch.delenv("TCFORGE_MPEG4_JAX", raising=False)
        ref = self._pull(str(path), 3)
        monkeypatch.setenv("TCFORGE_MPEG4_JAX", "1")
        got = self._pull(str(path), 3)
        assert ref[0].shape[0] == 10         # 8 coded + 2 repeats
        for r, g in zip(ref, got):
            assert np.array_equal(r, g)


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestVideoPackets:
    """Resync markers / video_packet_header (14496-2 6.2.5.2):
    libavcodec's mpeg4 encoder splits VOPs into video packets when
    'ps' (RTP payload size) is set.  Prediction (DC/AC, MV medians,
    B-VOP per-row predictors) must not cross a packet boundary."""

    def _run(self, opts, tol, n=8, gop=8, min_packets=4):
        enc = _av.AvVideoEncoder("mpeg4", W, H, fps=25.0, gop=gop,
                                 opts=opts)
        pkts = []
        for f in _frames(n):
            pkts += [p for p, _ in enc.encode(*f)]
        pkts += [p for p, _ in enc.flush()]
        oracle = _av.AvVideoDecoder("mpeg4")
        mine = Mpeg4Decoder()
        refs, gots = [], []
        for pkt in pkts:
            r = oracle.decode(pkt)
            if r is not None:
                refs.append(r)
            gots.extend(mine.decode_frames(pkt))
        refs += oracle.flush()
        g = mine.flush()
        if g is not None:
            gots.append(g)
        assert len(gots) == n and len(refs) == n
        for fi, (r, g) in enumerate(zip(refs, gots)):
            for pi, (a, c) in enumerate(zip(r, g)):
                d = int(np.abs(a.astype(int) - c.astype(int)).max())
                assert d <= tol, f"frame {fi} plane {pi}: {d}"
        assert mine._vp_count >= min_packets, \
            f"only {mine._vp_count} video packets seen"

    def test_ip_packets(self):
        self._run({"ps": "200"}, tol=4)

    def test_small_packets_i_only(self):
        """gop=1: every VOP is intra; 100-byte packets make dozens
        of DC-prediction resets per frame."""
        self._run({"ps": "100"}, tol=1, n=3, gop=1, min_packets=20)

    def test_packets_with_4mv(self):
        self._run({"ps": "200", "flags": "+mv4"}, tol=4)

    def test_packets_with_b_vops(self):
        """B-VOP packets use the max(fcode_f, fcode_b, 2)+15 zero
        prefix and reset the per-row MV predictors."""
        self._run({"ps": "300", "bf": "2"}, tol=5, n=9)

    def test_packets_with_qpel(self):
        self._run({"ps": "300", "flags": "+qpel"}, tol=4)

    def test_mb_number_mismatch_raises(self):
        """A packet that resumes at the wrong MB must fail loudly,
        not desync silently."""
        enc = _av.AvVideoEncoder(
            "mpeg4", W, H, fps=25.0, gop=1, opts={"ps": "100"})
        pkts = [p for p, _ in enc.encode(*_frames(1)[0])]
        pkts += [p for p, _ in enc.flush()]
        data = bytearray(pkts[0])
        # find the first resync marker (byte-aligned 00 00 80.. after
        # the VOP header) and corrupt the MB number bits after it
        vop = data.find(b"\x00\x00\x01\xb6")
        idx = data.find(b"\x00\x00\x80", vop + 4)
        assert idx > 0, "no resync marker found in fixture"
        data[idx + 2] ^= 0x60            # flip MB-number bits
        dec = Mpeg4Decoder()
        with pytest.raises(ValueError):
            dec.decode(bytes(data))


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestInterlaced:
    """Interlaced coding tools (14496-2 6.2/7.6.2): dct_type field
    DCT, field prediction (2 field MVs + field selects), alternate
    vertical scan, field MV neighbour prediction.  Streams from
    libavcodec's +ildct/+ilme encoder.  Empirically pinned
    semantics: field reads past the frame bottom see the FRAME's
    last row (frame-space edge padding), chroma field vectors use
    the (m>>1)|(m&1) rounding map."""

    def _frames(self, n):
        out = []
        for i, (y, u, v) in enumerate(_frames(n)):
            y = y.copy()
            # field-phase wobble so interlaced ME picks field MVs
            y[i % 2::2] = np.roll(y[i % 2::2], i, axis=1)
            out.append((y, u, v))
        return out

    def _run(self, flags, gop=8, q=4, n=10, expect_field=False):
        enc = _av.AvVideoEncoder(
            "mpeg4", W, H, fps=25.0, gop=gop,
            opts={"qmin": str(q), "qmax": str(q),
                  "flags": "+qscale" + flags,
                  "global_quality": str(q * 118)})
        pkts = []
        for f in self._frames(n):
            pkts += [p for p, _ in enc.encode(*f)]
        pkts += [p for p, _ in enc.flush()]
        dec = Mpeg4Decoder()
        oracle = _av.AvVideoDecoder("mpeg4")
        saw_field = False
        cnt = 0
        for i, p in enumerate(pkts):
            g = dec.decode(p)
            r = oracle.decode(p)
            if r is None:
                continue
            cnt += 1
            for k in range(3):
                d = int(np.abs(np.asarray(r[k]).astype(int)
                               - g[k].astype(int)).max())
                assert d <= 4, f"frame {i} plane {k}: drift {d}"
            if dec._co_field and any(any(row) for row in
                                     dec._co_field):
                saw_field = True
        assert cnt == n
        if expect_field:
            assert saw_field, "no field-predicted MBs exercised"

    def test_field_dct(self):
        self._run("+ildct")

    def test_field_mc(self):
        self._run("+ilme", gop=4, q=5, expect_field=True)

    def test_field_dct_and_mc(self):
        self._run("+ildct+ilme", expect_field=True)

    def test_low_quant_long_gop(self):
        self._run("+ildct+ilme", gop=12, q=2, n=12,
                  expect_field=True)

    def test_with_4mv(self):
        self._run("+ildct+ilme+mv4", expect_field=True)

    def test_with_ac_pred(self):
        self._run("+ildct+ilme+aic", expect_field=True)

    def _run_b(self, flags, bf, gop=8, q=4, n=12):
        enc = _av.AvVideoEncoder(
            "mpeg4", W, H, fps=25.0, gop=gop,
            opts={"qmin": str(q), "qmax": str(q), "bf": str(bf),
                  "flags": "+qscale" + flags,
                  "global_quality": str(q * 118)})
        pkts = []
        for f in self._frames(n):
            pkts += [p for p, _ in enc.encode(*f)]
        pkts += [p for p, _ in enc.flush()]
        dec = Mpeg4Decoder()
        dec._mb_trace = trace = []
        oracle = _av.AvVideoDecoder("mpeg4")
        refs, gots = [], []
        for p in pkts:
            r = oracle.decode(p)
            if r is not None:
                refs.append(r)
            gots.extend(dec.decode_frames(p))
        refs += oracle.flush()
        t = dec.flush()
        if t is not None:
            gots.append(t)
        assert len(refs) == len(gots) == n
        for fi, (r, g) in enumerate(zip(refs, gots)):
            for k in range(3):
                d = int(np.abs(np.asarray(r[k]).astype(int)
                               - g[k].astype(int)).max())
                assert d <= 4, f"frame {fi} plane {k}: {d}"
        return trace

    def test_interlaced_b_vops(self):
        """Interlaced B-VOPs from a lavc +ildct+ilme encode decode
        bit-tight.  lavc's encoder never codes direct mode over an
        interlaced co-located MB, so this stream exercises field
        forward/backward/bidir B prediction only — the field-DIRECT
        path is oracle-covered by TestFieldDirectProbe's crafted
        streams instead."""
        trace = self._run_b("+ildct+ilme", bf=2)
        assert len(trace) > 0

    def test_interlaced_b_vops_bf1(self):
        self._run_b("+ildct+ilme", bf=1, gop=4)

    def test_interlaced_b_vops_low_q(self):
        self._run_b("+ilme", bf=3, q=2)


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestFieldDirectProbe:
    """libavcodec's ENCODER never emits direct mode over an
    interlaced co-located MB, so field direct can't be validated
    from encoder streams.  Craft the stream instead: an interlaced
    VOL + textured I-VOP, a P-VOP of hand-written field-predicted
    MBs with known MVs/selects, and a B-VOP of modb=1 MBs (forced
    field direct) — then require libavcodec's DECODER and ours to
    agree on every frame."""

    def _build(self, delta=None):
        from tcforge_tpu.io.mpeg4enc import (BitWriter, _MCBPC_P,
                                             _CBPY_CODES, _write_mv,
                                             Mpeg4NativeEncoder)

        W_, H_ = 64, 32

        # Source the interlaced VOS/VOL header from a throwaway
        # libavcodec encode at the same geometry — a hand-written
        # VOL that MY parser accepts can still be read as
        # progressive by the oracle (its exact VOL expectations are
        # not worth reverse-engineering for a fixture header).
        henc = _av.AvVideoEncoder(
            "mpeg4", W_, H_, fps=25.0, gop=10,
            opts={"qmin": "4", "qmax": "4",
                  "flags": "+qscale+ildct+ilme",
                  "global_quality": str(4 * 118)})
        hy = np.zeros((H_, W_), np.uint8)
        hc = np.full((H_ // 2, W_ // 2), 128, np.uint8)
        hpkts = [p for p, _ in henc.encode(hy, hc, hc)]
        lavc_hdr = hpkts[0][:hpkts[0].find(b"\x00\x00\x01\xb6")]

        class ProbeEnc(Mpeg4NativeEncoder):
            def _headers(self):
                return lavc_hdr

        enc = ProbeEnc(W_, H_, fps=25.0, qscale=4, gop=100)
        mbw, mbh = enc.mbw, enc.mbh

        def vop_header(w, vop_type, tinc):
            w.put(0x000001B6, 32)
            w.put(vop_type, 2)
            w.put(0, 1)                  # modulo time base: 0
            w.put(1, 1)
            w.put(tinc, enc.time_inc_bits)
            w.put(1, 1)
            w.put(1, 1)                  # coded
            if vop_type == 1:
                w.put(0, 1)              # rounding
            w.put(0, 3)                  # intra_dc_vlc_thr
            w.put(0, 1)                  # top_field_first
            w.put(0, 1)                  # alternate_vertical_scan
            w.put(4, 5)                  # quant
            if vop_type in (1, 2):
                w.put(1, 3)              # fcode fwd
            if vop_type == 2:
                w.put(1, 3)              # fcode bwd

        # I-VOP: textured fields, intra-coded with dct_type=0 bits
        rng = np.random.RandomState(7)
        yy = rng.randint(0, 256, (H_, W_)).astype(np.uint8)
        yy[0::2] = np.clip(yy[0::2].astype(int) + 40, 0, 255)
        uu = rng.randint(0, 256, (H_ // 2, W_ // 2)).astype(np.uint8)
        vv = rng.randint(0, 256, (H_ // 2, W_ // 2)).astype(np.uint8)
        w = BitWriter()
        w.buf.extend(enc._headers())
        vop_header(w, 0, 0)
        dcs = [np.full((2 * mbh + 1, 2 * mbw + 2), 1024, np.int64)
               for _ in range(3)]
        yp, up, vp = enc._pad_planes(yy, uu, vv)
        ry = np.zeros_like(yp)
        ru = np.zeros_like(up)
        rv = np.zeros_like(vp)
        for mby in range(mbh):
            for mbx in range(mbw):
                src6 = enc._mb_blocks(yp, up, vp, mbx, mby)
                cbp, entries, recon = enc._code_intra_mb(
                    src6, mbx, mby, dcs)
                # intra MB with the interlaced dct_type bit: write
                # mcbpc/ac_pred/cbpy, then dct_type=0, then blocks
                cbpc = cbp & 3
                cbpy = (cbp >> 2) & 0xF
                from tcforge_tpu.io.mpeg4enc import (_MCBPC_I,
                                                     _write_dc,
                                                     _write_block)
                code, bits = _MCBPC_I[(3, cbpc)]
                w.put(code, bits)
                w.put(0, 1)              # ac_pred
                code, bits = _CBPY_CODES[cbpy]
                w.put(code, bits)
                w.put(0, 1)              # dct_type = frame
                for n, (dcd, lv) in enumerate(entries):
                    _write_dc(w, dcd, 0 if n < 4 else 1)
                    if (cbp >> (5 - n)) & 1:
                        _write_block(w, lv, True, 1)
                enc._store_mb(ry, ru, rv, mbx, mby, recon)
        w.stuff()
        chunks = [w.getvalue()]

        # P-VOP: every MB field-predicted, cbp=0, known MVs/selects
        fmv_of = lambda mbx, mby: [((mbx - mby) % 5 - 2,
                                    (mbx + mby) % 3 - 1),
                                   ((mbx + 2 * mby) % 5 - 2,
                                    (mbx * mby) % 3 - 1)]
        fsel_of = lambda mbx, mby: ((mbx ^ mby) & 1,
                                    ((mbx >> 1) ^ mby) & 1)
        w = BitWriter()
        vop_header(w, 1, 2)      # P displays at t=2
        from tcforge_tpu.io.mpeg4dec import Mpeg4Decoder as D
        mvgrid = [[(0, 0)] * (2 * mbw) for _ in range(2 * mbh)]
        dec_helper = Mpeg4Decoder()
        dec_helper._mbw = mbw
        for mby in range(mbh):
            for mbx in range(mbw):
                bx, by = 2 * mbx, 2 * mby
                w.put(0, 1)              # coded
                code, bits = _MCBPC_P[(0, 0)]
                w.put(code, bits)        # inter, cbpc 0
                code, bits = _CBPY_CODES[0 ^ 0xF]
                w.put(code, bits)        # cbpy 0 (inter inversion)
                # cbp==0: no dct_type bit; field flag + selects
                w.put(1, 1)              # field prediction
                fs = fsel_of(mbx, mby)
                w.put(fs[0], 1)
                w.put(fs[1], 1)
                px, py = dec_helper._pred_mv(mvgrid, bx, by, 0)
                hpy = D._cdiv2(py)
                mvs = fmv_of(mbx, mby)
                for i in range(2):
                    _write_mv(w, mvs[i][0] - px)
                    _write_mv(w, mvs[i][1] - hpy)
                sx = mvs[0][0] + mvs[1][0]
                avg = ((sx >> 1) | (sx & 1),
                       mvs[0][1] + mvs[1][1])
                for k in range(4):
                    mvgrid[by + (k >> 1)][bx + (k & 1)] = avg
        w.stuff()
        chunks.append(w.getvalue())

        # B-VOP between them: forced field direct
        w = BitWriter()
        vop_header(w, 2, 1)      # B displays at t=1 (trb=1, trd=2)
        for mby in range(mbh):
            for mbx in range(mbw):
                if delta is None:
                    w.put(1, 1)          # modb=1: direct, no bits
                else:
                    w.put(0, 1)          # modb
                    w.put(1, 1)          # modb2 (no cbp)
                    w.put(1, 1)          # mb_type: direct
                    # interlaced: no dct (cbp 0), NO field flag for
                    # direct; delta MVs at fcode 1
                    _write_mv(w, delta[0])
                    _write_mv(w, delta[1])
        w.stuff()
        chunks.append(w.getvalue())

        # all-skip P at t=3: pushes the target P out through the
        # NORMAL display path.  (libavcodec's drain path returns an
        # anomalous frame for this crafted 3-frame stream even
        # though its normally-displayed P is bit-tight with ours —
        # so the probe never relies on flush()).
        w = BitWriter()
        vop_header(w, 1, 3)
        for _ in range(mbw * mbh):
            w.put(1, 1)                  # not_coded
        w.stuff()
        chunks.append(w.getvalue())
        return chunks

    def _check(self, delta):
        chunks = self._build(delta)
        mine = Mpeg4Decoder()
        oracle = _av.AvVideoDecoder("mpeg4")
        gots, refs = [], []
        for c in chunks:
            g = mine.decode_frames(c)
            gots.extend(g)
            r = oracle.decode(c)
            if r is not None:
                refs.append(r)
        refs, gots = refs[:3], gots[:3]
        assert len(refs) == 3 and len(gots) == 3
        for fi, (r, g) in enumerate(zip(refs, gots)):
            for k in range(3):
                d = int(np.abs(np.asarray(r[k]).astype(int)
                               - g[k].astype(int)).max())
                assert d <= 2, f"frame {fi} plane {k}: {d}"

    def test_field_direct_zero_delta(self):
        self._check(None)

    def test_field_direct_with_delta(self):
        self._check((1, -1))

    def test_field_direct_delta_one_component(self):
        """(d,0) deltas: the backward vector differences x but
        scales y — per-component gating."""
        self._check((2, 0))


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestShortHeader:
    """r5: short video header (H.263 baseline flavor) decode —
    8-bit INTRADC, single H.263 escape in the TCOEF table, H.263
    dequant, COD skip, optional GOB resync.  Oracle: lavc h263
    encode -> both decoders agree within the IDCT drift budget."""

    def _roundtrip(self, w, h, n=8, gop=6, tol=4):
        rng = np.random.RandomState(2)
        base = rng.randint(0, 256, (h + 64, w + 64)).astype(float)
        for ax in range(2):
            base = (base + np.roll(base, 1, ax)
                    + np.roll(base, -1, ax)) / 3
        frames = [(np.clip(base[2 * i:2 * i + h, 3 * i:3 * i + w],
                           0, 255).astype(np.uint8),
                   np.clip(base[i:i + h // 2, i:i + w // 2], 0,
                           255).astype(np.uint8),
                   np.clip(base[8:8 + h // 2, 4:4 + w // 2], 0,
                           255).astype(np.uint8))
                  for i in range(n)]
        enc = _av.AvVideoEncoder("h263", w, h, fps=25.0, gop=gop,
                                 bitrate=800_000)
        pkts = []
        for f in frames:
            pkts += [p for p, _ in enc.encode(*f)]
        pkts += [p for p, _ in enc.flush()]
        assert pkts and (pkts[0][2] & 0xFC) == 0x80
        oracle = _av.AvVideoDecoder("h263")
        mine = Mpeg4Decoder()
        for fi, p in enumerate(pkts):
            r = oracle.decode(p)
            g = mine.decode_frames(p)
            assert r is not None and len(g) == 1
            for pi, (a, b) in enumerate(zip(r, g[0])):
                d = int(np.abs(a.astype(int)
                               - b.astype(int)).max())
                assert d <= tol, f"frame {fi} plane {pi}: {d}"

    def test_qcif(self):
        self._roundtrip(176, 144)

    def test_cif(self):
        self._roundtrip(352, 288, n=6)

    def test_sub_qcif(self):
        self._roundtrip(128, 96)

    def test_still_skip(self):
        rng = np.random.RandomState(5)
        y = rng.randint(0, 256, (144, 176)).astype(np.uint8)
        u = rng.randint(0, 256, (72, 88)).astype(np.uint8)
        v = rng.randint(0, 256, (72, 88)).astype(np.uint8)
        enc = _av.AvVideoEncoder("h263", 176, 144, fps=25.0, gop=8,
                                 bitrate=400_000)
        pkts = []
        for _ in range(6):
            pkts += [p for p, _ in enc.encode(y, u, v)]
        pkts += [p for p, _ in enc.flush()]
        oracle = _av.AvVideoDecoder("h263")
        mine = Mpeg4Decoder()
        for p in pkts:
            r = oracle.decode(p)
            g = mine.decode_frames(p)
            for a, b in zip(r, g[0]):
                assert np.abs(a.astype(int)
                              - b.astype(int)).max() <= 4


@pytest.mark.skipif(not HAVE_BRIDGE,
                    reason="FFmpeg bridge required for the oracle")
class TestDataPartitioning:
    """r5: data-partitioned I/P decode (6.2.9): partition A
    (mcbpc/dquant/DC for I; not_coded/mcbpc/MVs for P), DC_MARKER /
    MOTION_MARKER, partition B (ac_pred/cbpy [+dquant/DC for
    P-intra]), texture blocks; per-packet predictor isolation.
    RVLC texture stays gated."""

    def _battery(self, opts, n=8, gop=6, tol=4, w=W, h=H):
        enc = _av.AvVideoEncoder("mpeg4", w, h, fps=25.0, gop=gop,
                                 bitrate=800_000, opts=opts)
        pkts = []
        for f in _frames(n):
            pkts += [p for p, _ in enc.encode(*f)]
        pkts += [p for p, _ in enc.flush()]
        oracle = _av.AvVideoDecoder("mpeg4")
        mine = Mpeg4Decoder()
        cnt = 0
        for fi, pk in enumerate(pkts):
            r = oracle.decode(pk)
            g = mine.decode_frames(pk)
            if r is None or not g:
                continue
            cnt += 1
            for pi, (a, b) in enumerate(zip(r, g[0])):
                d = int(np.abs(a.astype(int) - b.astype(int)).max())
                assert d <= tol, f"frame {fi} plane {pi}: {d}"
        assert cnt == n
        assert mine.vol.data_partitioned

    def test_dp_basic(self):
        self._battery({"data_partitioning": "1"})

    def test_dp_multi_packet(self):
        # small video packets force resync markers + per-packet
        # predictor resets inside every partitioned VOP
        self._battery({"data_partitioning": "1", "ps": "250"})

    def test_dp_with_4mv(self):
        self._battery({"data_partitioning": "1", "flags": "+mv4"})
