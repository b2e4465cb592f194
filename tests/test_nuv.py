"""RTjpeg codec + NuppelVideo container tests."""

import numpy as np
import pytest

from tcforge_tpu.io import nuv
from tcforge_tpu.io.rtjpeg import (RTjpegCompressor, RTjpegDecompressor,
                                   b2s, s2b, init_q)
import tcforge_tpu.modules  # noqa: F401

RNG = np.random.default_rng(66)


def psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-9))


def content(w, h, block=8, phase=0):
    base = np.kron(RNG.integers(20, 220, (h // block, w // block)),
                   np.ones((block, block))).astype(np.uint8)
    return np.clip(base + phase, 16, 235).astype(np.uint8)


class TestEntropy:
    def test_b2s_s2b_roundtrip(self):
        _, _, liqt, _, lb8, _ = init_q(255)
        one = np.ones(64, np.int64)
        for _ in range(50):
            blk = RNG.integers(-40, 40, 64).astype(np.int16)
            blk[RNG.random(64) < 0.6] = 0
            blk[0] = RNG.integers(0, 254)
            data = b2s(blk, lb8)
            out, used = s2b(memoryview(data), 0, lb8, one)
            np.testing.assert_array_equal(
                np.clip(blk, -64, 63) * 1,
                np.clip(out, -64, 63))
            assert used == len(data)

    def test_zero_run_compression(self):
        _, _, _, _, lb8, _ = init_q(255)
        blk = np.zeros(64, np.int16)
        blk[0] = 100
        data = b2s(blk, lb8)
        assert len(data) < 16        # runs collapse


class TestCodec:
    @pytest.mark.parametrize("q,min_db", [(255, 48), (192, 42),
                                          (128, 40)])
    def test_roundtrip_quality(self, q, min_db):
        w, h = 128, 96
        y = content(w, h)
        # chroma: smooth ramp (the RTjpeg chroma table is coarse at
        # high frequencies by design, like JPEG's)
        u = (np.mgrid[0:h // 2, 0:w // 2][1] * 2 + 40) \
            .clip(16, 235).astype(np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        enc = RTjpegCompressor(w, h, quality=q)
        data = enc.compress(y, u, v)
        dec = RTjpegDecompressor(enc.tables(), w, h)
        dy, du, dv = dec.decompress(data)
        assert psnr(y, dy) > min_db
        assert psnr(u, du) > min_db - 4
        assert psnr(v, dv) > 50

    def test_lower_quality_smaller(self):
        w, h = 64, 48
        y = content(w, h, 4)
        u = v = np.full((h // 2, w // 2), 128, np.uint8)
        hi = RTjpegCompressor(w, h, 255).compress(y, u, v)
        lo = RTjpegCompressor(w, h, 64).compress(y, u, v)
        assert len(lo) < len(hi)

    def test_geometry_check(self):
        with pytest.raises(ValueError):
            RTjpegCompressor(100, 50)


class TestContainer:
    def test_header_roundtrip(self, tmp_path):
        p = tmp_path / "t.nuv"
        with open(p, "wb") as f:
            nuv.write_file_header(f, nuv.NuvHeader(
                width=320, height=240, fps=29.97, keyframedist=30))
        with open(p, "rb") as f:
            hdr = nuv.read_file_header(f)
        assert (hdr.width, hdr.height) == (320, 240)
        assert hdr.fps == pytest.approx(29.97)
        assert hdr.keyframedist == 30

    def test_frame_stream(self, tmp_path):
        p = tmp_path / "t.nuv"
        with open(p, "wb") as f:
            nuv.write_file_header(f, nuv.NuvHeader(width=32, height=16))
            nuv.write_frame(f, "D", "R", b"tables")
            nuv.write_frame(f, "V", "1", b"frame1", timecode=0)
            nuv.write_frame(f, "A", "0", b"pcm", timecode=0)
            nuv.write_frame(f, "V", "N", b"", timecode=40)
        with open(p, "rb") as f:
            nuv.read_file_header(f)
            frames = list(nuv.iter_frames(f))
        assert [(t, c) for t, c, _, _ in frames] == \
            [("D", "R"), ("V", "1"), ("A", "0"), ("V", "N")]


class TestPipeline:
    def test_nuv_export_import_roundtrip(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        out = tmp_path / "t.nuv"
        job = Job(video_in_file="test://", im_v_module="framegen",
                  video_out_file=str(out), ex_v_module="nuvrtj",
                  ex_m_module="nuv", im_v_width=64, im_v_height=48,
                  fps=25.0, max_frames=5, batch_size=5)
        c = Pipeline(job).run(progress=False)
        assert c.encoded == 5

        job2 = Job(video_in_file=str(out), im_v_module="auto",
                   video_out_file=str(tmp_path / "o.y4m"),
                   ex_m_module="y4m", batch_size=5)
        c2 = Pipeline(job2).run(progress=False)
        assert c2.encoded == 5
        from tcforge_tpu.io.y4m import Y4MReader
        with Y4MReader(str(tmp_path / "o.y4m")) as r:
            assert r.header.width == 64
            frames = list(r)
        assert len(frames) == 5
        # framegen colorwave within codec loss (RTjpeg clamps 16..235)
        xy = np.arange(64)[None, :] + np.arange(48)[:, None]
        want = np.clip((xy + 0) % 256, 16, 235).astype(np.uint8)
        got = frames[0][0]
        match = np.abs(got.astype(int) - want.astype(int))
        assert np.median(match) < 8

    def test_probe(self, tmp_path):
        from tcforge_tpu.io.probe import sniff_magic
        from tcforge_tpu.core.codecs import ContainerFormat
        p = tmp_path / "t.nuv"
        with open(p, "wb") as f:
            nuv.write_file_header(f, nuv.NuvHeader(width=32, height=16))
        assert sniff_magic(str(p)) == ContainerFormat.NUV
