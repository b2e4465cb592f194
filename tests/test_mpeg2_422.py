"""MPEG-2 4:2:2 profile (IMX/D10, intra-only): encode round trip,
importer path, and the chroma_format plumbing (reference decoded 4:2:2
via libmpeg2 in import_mpeg2.c; here it's the native decoder +
reconstruct_intra_422)."""

import numpy as np
import pytest

from tcforge_tpu import native
from tcforge_tpu.io.mpeg2codec import (Mpeg2Encoder, chroma_422_to_420,
                                       native_decode_stream)

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library not built")


def _planes_422(w, h, seed=5):
    rng = np.random.default_rng(seed)
    y = (np.linspace(16, 234, w * h).reshape(h, w)
         + rng.integers(-8, 8, (h, w))).clip(0, 255).astype(np.uint8)
    u = (np.linspace(40, 200, (w // 2) * h).reshape(h, w // 2)
         + rng.integers(-8, 8, (h, w // 2))).clip(0, 255) \
        .astype(np.uint8)
    v = (255 - u).astype(np.uint8)
    return y, u, v


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-9))


@needs_native
class Test422RoundTrip:
    def test_intra_roundtrip(self):
        w, h = 48, 32
        y, u, v = _planes_422(w, h)
        enc = Mpeg2Encoder(w, h, 25.0, qscale=2, chroma=422)
        es = enc.encode_frame(y, u, v) + enc.sequence_end()
        frames = native_decode_stream(es)
        assert len(frames) == 1
        dy, du, dv = frames[0]
        assert dy.shape == (h, w)
        assert du.shape == (h, w // 2)      # full vertical chroma res
        assert dv.shape == (h, w // 2)
        assert _psnr(y, dy) > 40
        assert _psnr(u, du) > 38
        assert _psnr(v, dv) > 38

    def test_chroma_format_reported(self):
        w, h = 32, 32
        y, u, v = _planes_422(w, h)
        enc = Mpeg2Encoder(w, h, 25.0, qscale=4, chroma=422)
        es = enc.encode_frame(y, u, v)
        bs = native.NativeMpeg2Bitstream(es)
        assert bs.chroma == 2
        bs.close()
        enc420 = Mpeg2Encoder(w, h, 25.0, qscale=4)
        bs = native.NativeMpeg2Bitstream(
            enc420.encode_frame(y[:, :], u[::2], v[::2]))
        assert bs.chroma == 1
        bs.close()

    def test_nonmultiple16_padding(self):
        """Display 40x18 -> coded 48x32 grid; crop must round-trip."""
        w, h = 40, 18
        y, u, v = _planes_422(w, h)
        enc = Mpeg2Encoder(w, h, 25.0, qscale=2, chroma=422)
        es = enc.encode_frame(y, u, v)
        dy, du, dv = native_decode_stream(es)[0]
        assert dy.shape == (h, w) and du.shape == (h, w // 2)
        assert _psnr(y, dy) > 40

    def test_multi_frame_stream(self):
        w, h = 32, 16
        enc = Mpeg2Encoder(w, h, 25.0, qscale=2, chroma=422)
        es = b""
        srcs = []
        for i in range(3):
            y, u, v = _planes_422(w, h, seed=i)
            srcs.append((y, u, v))
            es += enc.encode_frame(y, u, v, with_seq=(i == 0))
        frames = native_decode_stream(es + enc.sequence_end())
        assert len(frames) == 3
        for (sy, su, sv), (dy, du, dv) in zip(srcs, frames):
            assert _psnr(sy, dy) > 40
            assert _psnr(su, du) > 38


@needs_native
class Test422Importer:
    def _make_es(self, tmp_path, w=48, h=32, n=4):
        enc = Mpeg2Encoder(w, h, 25.0, qscale=2, chroma=422)
        es = b""
        srcs = []
        for i in range(n):
            y, u, v = _planes_422(w, h, seed=10 + i)
            srcs.append((y, u, v))
            es += enc.encode_frame(y, u, v, with_seq=(i == 0))
        p = tmp_path / "imx.m2v"
        p.write_bytes(es + enc.sequence_end())
        return p, srcs

    def test_importer_downconverts_to_420(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.importers.mpeg_import import MpegImporter
        path, srcs = self._make_es(tmp_path)
        imp = MpegImporter(Job())
        imp.open(str(path))
        assert (imp.width, imp.height) == (48, 32)
        batch = imp.read_video_batch(8)
        imp.close()
        assert batch["y"].shape == (4, 32, 48)
        assert batch["u"].shape == (4, 16, 24)   # 4:2:0 for the core
        for i, (sy, su, sv) in enumerate(srcs):
            assert _psnr(sy, batch["y"][i]) > 40
            assert _psnr(chroma_422_to_420(su), batch["u"][i]) > 36

    def test_tcdecode_422(self, tmp_path):
        from tcforge_tpu.tools.tcdecode import main
        path, srcs = self._make_es(tmp_path, n=2)
        out = tmp_path / "out.raw"
        assert main(["-i", str(path), "-o", str(out),
                     "-x", "mpeg2"]) == 0
        raw = out.read_bytes()
        assert len(raw) == 2 * (48 * 32 * 3 // 2)   # emitted as 4:2:0

    def test_inter_picture_rejected(self, tmp_path):
        """A P picture inside a 4:2:2 sequence must fail loudly, not
        mis-reconstruct (4:2:2 inter MC is out of scope: the IMX/D10
        format never codes it)."""
        from tcforge_tpu.io.mpeg2codec import BitWriter
        w, h = 32, 16
        y, u, v = _planes_422(w, h)
        enc = Mpeg2Encoder(w, h, 25.0, qscale=2, chroma=422)
        es = bytearray(enc.encode_frame(y, u, v))
        # append a minimal P picture header + empty-ish slice
        bw = BitWriter()
        bw.start_code(0x00)
        bw.put(1, 10)                  # temporal ref
        bw.put(2, 3)                   # P picture
        bw.put(0xFFFF, 16)
        bw.put(0, 1)                   # full_pel (mpeg1 bit)
        bw.put(7, 3)                   # forward f_code
        bw.put(0, 1)
        es += bw.bytes()
        from tcforge_tpu.io.mpeg2codec import iter_decode_full
        it = iter_decode_full(bytes(es))
        next(it)                       # the intra frame decodes
        with pytest.raises((NotImplementedError, ValueError,
                            EOFError, StopIteration)):
            next(it)


class Test422Helpers:
    def test_chroma_downconvert_exact(self):
        p = np.array([[10, 20], [30, 40], [0, 255], [2, 1]], np.uint8)
        got = chroma_422_to_420(p)
        np.testing.assert_array_equal(got, [[20, 30], [1, 128]])

    def test_encoder_rejects_bad_chroma(self):
        with pytest.raises(ValueError):
            Mpeg2Encoder(32, 32, chroma=444)
