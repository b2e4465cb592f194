"""MPEG-2 intra codec tests: roundtrip, bitstream structure, pipeline."""

import numpy as np
import pytest

from tcforge_tpu.io.mpeg2codec import (BitReader, BitWriter, Mpeg2Decoder,
                                       Mpeg2Encoder, ZIGZAG)

RNG = np.random.default_rng(13)


def gradient_frame(w, h, phase=0):
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 3 + yy * 2 + phase * 16) % 200 + 20).astype(np.uint8)
    u = ((yy[::2, ::2] * 3) % 180 + 30).astype(np.uint8)
    v = ((xx[::2, ::2] * 2) % 180 + 30).astype(np.uint8)
    return y, u, v


def psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-9))


class TestBitIO:
    def test_roundtrip(self):
        w = BitWriter()
        w.put(0b101, 3)
        w.put(0xABCD, 16)
        w.put(1, 1)
        data = w.bytes()
        r = BitReader(data)
        assert r.get(3) == 0b101
        assert r.get(16) == 0xABCD
        assert r.get(1) == 1

    def test_start_code_scan(self):
        w = BitWriter()
        w.put(0xFF, 8)
        w.start_code(0xB3)
        w.put(0x12, 8)
        r = BitReader(w.bytes())
        assert r.find_start_code() == 0xB3
        assert r.get(8) == 0x12


class TestCodecRoundtrip:
    # spec quantiser_scale = 2*code (linear q_scale_type), so the
    # effective step at a given code is twice the pre-spec-fix value
    @pytest.mark.parametrize("qscale,min_db", [(2, 45), (8, 34), (16, 29)])
    def test_gradient_psnr(self, qscale, min_db):
        w, h = 64, 48
        y, u, v = gradient_frame(w, h)
        enc = Mpeg2Encoder(w, h, 25.0, qscale=qscale)
        es = enc.encode_frame(y, u, v)
        dec = Mpeg2Decoder()
        frames = dec.decode_stream(es)
        assert len(frames) == 1
        dy, du, dv = frames[0]
        assert psnr(y, dy) > min_db
        assert psnr(u, du) > min_db
        assert psnr(v, dv) > min_db

    def test_multi_frame(self):
        w, h = 32, 32
        enc = Mpeg2Encoder(w, h, 29.97, qscale=4)
        es = b""
        frames_in = []
        for i in range(3):
            y, u, v = gradient_frame(w, h, i)
            frames_in.append((y, u, v))
            es += enc.encode_frame(y, u, v, with_seq=(i == 0))
        es += enc.sequence_end()
        dec = Mpeg2Decoder()
        out = dec.decode_stream(es)
        assert len(out) == 3
        assert dec.fps == pytest.approx(30000 / 1001)
        for (y, u, v), (dy, du, dv) in zip(frames_in, out):
            assert psnr(y, dy) > 36

    def test_noise_survives(self):
        w, h = 32, 16
        y = RNG.integers(0, 256, (h, w), dtype=np.uint8)
        u = RNG.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        v = RNG.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        enc = Mpeg2Encoder(w, h, qscale=1)
        out = Mpeg2Decoder().decode_stream(enc.encode_frame(y, u, v))
        dy, _, _ = out[0]
        assert psnr(y, dy) > 30      # qscale 1: quantization still coarse
                                     # at high frequencies (matrix 27-83)

    def test_probe_recognizes_output(self, tmp_path):
        from tcforge_tpu.io.probe import probe_file
        w, h = 48, 32
        y, u, v = gradient_frame(w, h)
        es = Mpeg2Encoder(w, h, 25.0).encode_frame(y, u, v)
        p = tmp_path / "t.m2v"
        p.write_bytes(es)
        info = probe_file(str(p))
        assert (info.width, info.height) == (48, 32)
        assert info.fps == 25.0

    def test_dimension_check(self):
        with pytest.raises(ValueError):
            Mpeg2Encoder(101, 50)          # odd width: no 4:2:0

    def test_non_mb_aligned_roundtrip(self):
        # 13818-2 6.3.3: the coded grid rounds UP (a 1080-line stream
        # codes 68 MB rows); encoder pads, decoders crop to display
        w, h = 100, 56                     # coded grid 112x64
        y, u, v = gradient_frame(w, h)
        enc = Mpeg2Encoder(w, h, 25.0, qscale=2)
        es = enc.encode_frame(y, u, v)
        dec = Mpeg2Decoder()
        frames = dec.decode_stream(es)
        assert len(frames) == 1
        dy, du, dv = frames[0]
        assert dy.shape == (h, w)
        assert du.shape == (h // 2, w // 2)
        assert psnr(y, dy) > 40


class TestNativeDecoder:
    """C++ bitstream decoder (native/mpeg2intra.cpp) vs the Python
    reference implementation."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native library not built")

    def _python_decode(self, es):
        dec = Mpeg2Decoder()
        r = BitReader(es)
        frames = []
        while True:
            code = r.find_start_code()
            if code is None:
                break
            if code == 0xB3:
                dec._parse_sequence_header(r)
            elif code == 0x00:
                frames.append(dec.decode_picture(r))
        return frames

    def _assert_match(self, es):
        from tcforge_tpu.io.mpeg2codec import native_decode_stream
        nat = native_decode_stream(es)
        py = self._python_decode(es)
        assert len(nat) == len(py)
        for pf, nf in zip(py, nat):
            for a, b in zip(pf, nf):
                np.testing.assert_array_equal(a, b)

    def test_bit_exact_gradient(self):
        w, h = 64, 48
        enc = Mpeg2Encoder(w, h, 25.0, qscale=4)
        es = b""
        for i in range(3):
            y, u, v = gradient_frame(w, h, i)
            es += enc.encode_frame(y, u, v, with_seq=(i == 0))
        self._assert_match(es + enc.sequence_end())

    def test_bit_exact_noise(self):
        """Noise maximizes escape codes and deep DC sizes (incl. the
        chroma long DC codes, one bit longer than luma's)."""
        w, h = 48, 32
        enc = Mpeg2Encoder(w, h, 25.0, qscale=2)
        y = RNG.integers(0, 256, (h, w), dtype=np.uint8)
        u = RNG.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        v = RNG.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        self._assert_match(enc.encode_frame(y, u, v))

    def test_bit_exact_short_codes(self):
        """Low-detail content at high qscale emits mostly Table B-14
        short codes — the non-escape VLC path in both decoders."""
        w, h = 64, 48
        yy, xx = np.mgrid[0:h, 0:w]
        y = (128 + 8 * np.sin(xx / 9.0) + 6 * np.cos(yy / 7.0)) \
            .astype(np.uint8)
        u = np.full((h // 2, w // 2), 110, np.uint8)
        v = np.full((h // 2, w // 2), 150, np.uint8)
        enc = Mpeg2Encoder(w, h, 25.0, qscale=16)
        es = enc.encode_frame(y, u, v)
        # the stream actually contains short codes (shorter than
        # escape-only coding would be)
        self._assert_match(es)

    def test_p_picture_unsupported(self):
        from tcforge_tpu import native
        w = BitWriter()
        enc = Mpeg2Encoder(32, 32)
        es = bytearray(enc.sequence_header())
        w.start_code(0x00)
        w.put(0, 10)
        w.put(2, 3)                      # P picture
        w.put(0xFFFF, 16)
        w.put(0, 1)
        es += w.bytes()
        bs = native.NativeMpeg2Bitstream(bytes(es))
        with pytest.raises(NotImplementedError):
            bs.next_coefs()

    def test_truncated_stream(self):
        from tcforge_tpu import native
        enc = Mpeg2Encoder(32, 32)
        y, u, v = gradient_frame(32, 32)
        es = enc.encode_frame(y, u, v)
        bs = native.NativeMpeg2Bitstream(es[:len(es) // 2])
        with pytest.raises((EOFError, ValueError)):
            while bs.next_coefs() is not None:
                pass

    def test_decode_speed_sanity(self):
        """The native path must beat the Python decoder by a wide
        margin (the point of the C++ stage)."""
        import time
        from tcforge_tpu.io.mpeg2codec import native_decode_stream
        w, h = 160, 96
        enc = Mpeg2Encoder(w, h, 25.0, qscale=8)
        es = b""
        for i in range(4):
            y, u, v = gradient_frame(w, h, i)
            es += enc.encode_frame(y, u, v, with_seq=(i == 0))
        t0 = time.perf_counter()
        native_decode_stream(es)
        t_nat = time.perf_counter() - t0
        t0 = time.perf_counter()
        self._python_decode(es)
        t_py = time.perf_counter() - t0
        assert t_nat < t_py             # typically 50-100x faster


class TestMpeg2Pipeline:
    def test_encode_decode_pipeline(self, tmp_path):
        """framegen -> mpeg2 encoder -> .m2v file -> mpeg importer ->
        y4m: full compressed round trip through the engine."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io.y4m import Y4MReader
        from tcforge_tpu.pipeline.engine import Pipeline
        import tcforge_tpu.modules  # noqa

        m2v = tmp_path / "t.m2v"
        job = Job(video_in_file="test://", video_out_file=str(m2v),
                  im_v_module="framegen", ex_v_module="mpeg2",
                  ex_m_module="raw", im_v_width=64, im_v_height=48,
                  max_frames=4, batch_size=4)
        c = Pipeline(job).run(progress=False)
        assert c.encoded == 4
        assert m2v.stat().st_size > 300   # B-14 short codes compress
                                          # tiny gradients well

        out = tmp_path / "rt.y4m"
        job2 = Job(video_in_file=str(m2v), video_out_file=str(out),
                   im_v_module="mpeg", ex_m_module="y4m", batch_size=4)
        c2 = Pipeline(job2).run(progress=False)
        assert c2.encoded == 4
        with Y4MReader(str(out)) as r:
            assert r.header.width == 64
            frames = list(r)
        assert len(frames) == 4
        # compare against the framegen pattern (qscale 8 loss budget)
        xy = (np.arange(64)[None, :] + np.arange(48)[:, None])
        want0 = (xy).astype(np.uint8)
        assert psnr(want0, frames[0][0]) > 30
