"""PNG codec (stdlib-zlib, full filter set) + the im / yuv4mpeg
encoder modules (encode_im.c / encode_yuv4mpeg.c analogues)."""

import struct
import zlib

import numpy as np
import pytest

from tcforge_tpu.cli import main
from tcforge_tpu.io.image import read_image, read_png, write_png
from tcforge_tpu.io.y4m import Y4MHeader, Y4MReader, Y4MWriter


def _chunk(tag, payload):
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


class TestPng:
    def test_roundtrip_rgb_and_gray(self, tmp_path):
        rng = np.random.default_rng(5)
        for img in (rng.integers(0, 256, (37, 41, 3), np.uint8),
                    rng.integers(0, 256, (12, 63), np.uint8),
                    (np.arange(48)[:, None] * 5
                     + np.arange(32)[None, :]).astype(np.uint8)):
            p = str(tmp_path / "t.png")
            write_png(p, img)
            np.testing.assert_array_equal(read_png(p), img)

    def test_every_filter_type_decodes(self, tmp_path):
        """Hand-build one PNG per spec filter (0,1,2,3,4) and check the
        defilter against an independent reconstruction."""
        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (5, 7, 3), np.uint8).astype(np.int32)
        for ftype in range(5):
            rows = bytearray()
            prev = np.zeros(21, np.int32)
            for y in range(img.shape[0]):
                cur = img[y].reshape(-1)
                a = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
                c = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
                if ftype == 0:
                    enc = cur
                elif ftype == 1:
                    enc = cur - a
                elif ftype == 2:
                    enc = cur - prev
                elif ftype == 3:
                    enc = cur - (a + prev) // 2
                else:
                    p = a + prev - c
                    pa, pb, pc = (np.abs(p - a), np.abs(p - prev),
                                  np.abs(p - c))
                    pred = np.where((pa <= pb) & (pa <= pc), a,
                                    np.where(pb <= pc, prev, c))
                    enc = cur - pred
                rows.append(ftype)
                rows += (enc % 256).astype(np.uint8).tobytes()
                prev = cur
            ihdr = struct.pack(">IIBBBBB", 7, 5, 8, 2, 0, 0, 0)
            data = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
                    + _chunk(b"IDAT", zlib.compress(bytes(rows)))
                    + _chunk(b"IEND", b""))
            p2 = tmp_path / f"f{ftype}.png"
            p2.write_bytes(data)
            np.testing.assert_array_equal(
                read_png(str(p2)), img.astype(np.uint8),
                err_msg=f"filter {ftype}")

    def test_rgba_palette_gray_alpha(self, tmp_path):
        ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0)
        raw = bytes([0, 9, 8, 7, 255, 1, 2, 3, 0])
        p = tmp_path / "a.png"
        p.write_bytes(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
                      + _chunk(b"IDAT", zlib.compress(raw))
                      + _chunk(b"IEND", b""))
        out = read_png(str(p))
        np.testing.assert_array_equal(
            out, np.array([[[9, 8, 7], [1, 2, 3]]], np.uint8))


def _write_y4m(path, n, w, h):
    rng = np.random.default_rng(8)
    frames = []
    with Y4MWriter(str(path), Y4MHeader(width=w, height=h,
                                        fps_num=25, fps_den=1)) as wr:
        for i in range(n):
            y = rng.integers(0, 256, (h, w), np.uint8)
            c = np.full((h // 2, w // 2), 128, np.uint8)
            frames.append((y, c, c))
            wr.write_frame(y, c, c)
    return frames


class TestImEncoder:
    def test_png_stills_roundtrip(self, tmp_path):
        src = tmp_path / "in.y4m"
        frames = _write_y4m(src, 3, 32, 16)
        out = tmp_path / "seq.png"
        rc = main(["-i", str(src), "-y", "im,null,im",
                   "-F", "format=png", "-o", str(out),
                   "--progress_off", "-q"])
        assert rc == 0
        import os
        stills = sorted(f for f in os.listdir(tmp_path)
                        if f.startswith("seq-") and f.endswith(".png"))
        assert len(stills) == 3
        img = read_image(str(tmp_path / stills[0]))
        assert img.shape == (16, 32, 3)

    def test_png_sequence_imports_back(self, tmp_path):
        """Full circle: y4m -> PNG stills -> y4m (the im importer reads
        the PNG codec's own output)."""
        src = tmp_path / "in.y4m"
        _write_y4m(src, 3, 32, 16)
        out = tmp_path / "seq.png"
        assert main(["-i", str(src), "-y", "im,null,im",
                     "-F", "format=png", "-o", str(out),
                     "--progress_off", "-q"]) == 0
        back = tmp_path / "back.y4m"
        rc = main(["-i", str(tmp_path / "seq-%06d.png"), "-x", "im",
                   "-g", "32x16", "-f", "25", "-o", str(back),
                   "--progress_off", "-q"])
        assert rc == 0
        with Y4MReader(str(back)) as r:
            assert len(list(r)) == 3


class TestYuv4mpegEncoder:
    def test_stream_chunks_form_valid_y4m(self, tmp_path):
        src = tmp_path / "in.y4m"
        frames = _write_y4m(src, 4, 32, 16)
        out = tmp_path / "enc.y4m"
        rc = main(["-i", str(src), "-y", "yuv4mpeg,null,raw",
                   "-o", str(out), "--progress_off", "-q"])
        assert rc == 0
        with Y4MReader(str(out)) as r:
            got = list(r)
        assert len(got) == 4
        for (ys, us, vs), (yg, ug, vg) in zip(frames, got):
            np.testing.assert_array_equal(ys, yg)
            np.testing.assert_array_equal(us, ug)


class TestJpegSupport:
    """Baseline JPEG via Pillow: stills + Motion-JPEG AVI (the
    GraphicsMagick/libjpeg roles of import_im/encode_im)."""

    def test_jpg_write_read_roundtrip(self, tmp_path):
        from tcforge_tpu.io.image import read_image, write_image
        rng = np.random.default_rng(0)
        # smooth image: JPEG round trip should stay close
        x = np.linspace(0, 255, 64, dtype=np.uint8)
        img = np.stack([np.tile(x, (48, 1))] * 3, axis=2)
        p = tmp_path / "a.jpg"
        write_image(str(p), img)
        back = read_image(str(p))
        assert back.shape == img.shape
        assert np.abs(back.astype(int) - img.astype(int)).mean() < 4

    def test_probe_jpeg_is_images(self, tmp_path):
        from tcforge_tpu.core.codecs import ContainerFormat
        from tcforge_tpu.io.image import write_image
        from tcforge_tpu.io.probe import sniff_magic
        img = np.full((16, 16, 3), 128, np.uint8)
        p = tmp_path / "a.jpg"
        write_image(str(p), img)
        assert sniff_magic(str(p)) == ContainerFormat.IMAGES

    def test_im_importer_reads_jpg_sequence(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io.image import write_image
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        for i in range(3):
            write_image(str(tmp_path / f"f{i:03d}.jpg"),
                        np.full((32, 32, 3), 50 * i + 10, np.uint8))
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "im", Job())
        imp.open(str(tmp_path / "f*.jpg"))
        b = imp.read_video_batch(8)
        assert b["rgb"].shape == (3, 32, 32, 3)
        assert abs(int(b["rgb"][1].mean()) - 60) < 6

    def test_mjpg_avi_roundtrip(self, tmp_path):
        """movjpeg encoder -> avi(MJPG) -> avi importer decode."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        from tcforge_tpu.pipeline.engine import Pipeline
        avi = tmp_path / "m.avi"
        job = Job(video_in_file="test://", video_out_file=str(avi),
                  im_v_module="framegen", ex_v_module="movjpeg",
                  ex_m_module="avi", im_v_width=64, im_v_height=48,
                  fps=25.0, max_frames=5, batch_size=4)
        job.ex_v_fcc = "MJPG"
        Pipeline(job).run(progress=False)

        imp = new_module(ModuleKind.DEMULTIPLEXOR, "avi", Job())
        imp.open(str(avi))
        got = 0
        while True:
            b = imp.read_video_batch(4)
            if b is None:
                break
            assert "rgb" in b
            got += b["rgb"].shape[0]
        assert got == 5

    def test_pillow_formats_roundtrip(self, tmp_path):
        from tcforge_tpu.io.image import read_image, write_image
        img = (np.arange(32 * 32 * 3, dtype=np.uint32) % 256) \
            .astype(np.uint8).reshape(32, 32, 3)
        for ext in ("bmp", "tif"):
            p = tmp_path / f"a.{ext}"
            write_image(str(p), img)
            np.testing.assert_array_equal(read_image(str(p)), img)
