"""PVN reader/writer + imlist tests (import_pvn.c / import_imlist.c
parity)."""

import io
import os

import numpy as np
import pytest

from tcforge_tpu.io import pvn


def _roundtrip_header(hdr):
    buf = io.BytesIO()
    pvn.write_header(buf, hdr)
    buf.seek(0)
    return pvn.read_header(buf)


class TestHeader:
    def test_basic(self):
        buf = io.BytesIO(b"PV6a 320 240 10 8 29.97\n" + b"\x00" * 8)
        h = pvn.read_header(buf)
        assert (h.imagetype, h.width, h.height) == (6, 320, 240)
        assert h.nframes == 10 and h.bits == 8
        assert abs(h.framerate - 29.97) < 1e-9
        assert h.framesize == 320 * 240 * 3

    def test_comment_and_whitespace(self):
        buf = io.BytesIO(b"PV5a  # rgb comment\n 16\t8 2 16 0\n")
        h = pvn.read_header(buf)
        assert (h.imagetype, h.width, h.height, h.bits) == (5, 16, 8, 16)
        assert h.framerate == 15.0          # 0 -> default 15
        assert h.framesize == 16 * 8 * 2

    def test_float_maxval_signs(self):
        h = pvn.read_header(io.BytesIO(b"PV5f 4 4 1 +2.0 10\n"))
        assert (h.base, h.range) == (0.0, 2.0)
        h = pvn.read_header(io.BytesIO(b"PV5f 4 4 1 -2.0 10\n"))
        assert (h.base, h.range) == (-2.0, 2.0)
        h = pvn.read_header(io.BytesIO(b"PV5f 4 4 1 2.0 10\n"))
        assert (h.base, h.range) == (-2.0, 4.0)

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            pvn.read_header(io.BytesIO(b"PX5a 4 4 1 8 10\n"))

    def test_bad_int_maxval(self):
        with pytest.raises(ValueError):
            pvn.read_header(io.BytesIO(b"PV5a 4 4 1 12 10\n"))


class TestDecode:
    def test_uint8_rgb(self):
        h = pvn.read_header(io.BytesIO(b"PV6a 2 2 1 8 10\n"))
        raw = bytes(range(12))
        img = pvn.decode_frame(h, raw)
        assert img.shape == (2, 2, 3)
        assert img[0, 0, 0] == 0 and img[1, 1, 2] == 11

    def test_uint16_keeps_top_byte(self):
        h = pvn.read_header(io.BytesIO(b"PV5a 2 1 1 16 10\n"))
        raw = np.array([0x1234, 0xFF00], ">u2").tobytes()
        img = pvn.decode_frame(h, raw)
        assert list(img.ravel()) == [0x12, 0xFF]

    def test_sint8_flips_sign(self):
        h = pvn.read_header(io.BytesIO(b"PV5b 2 1 1 8 10\n"))
        raw = np.array([-128, 127], np.int8).tobytes()
        img = pvn.decode_frame(h, raw)
        assert list(img.ravel()) == [0, 255]

    def test_float_scaling(self):
        h = pvn.read_header(io.BytesIO(b"PV5f 2 1 1 +1.0 10\n"))
        raw = np.array([0.0, 1.0], ">f4").tobytes()
        img = pvn.decode_frame(h, raw)
        assert list(img.ravel()) == [0, 255]

    def test_double_symmetric_range(self):
        h = pvn.read_header(io.BytesIO(b"PV5d 2 1 1 1.0 10\n"))
        raw = np.array([-1.0, 0.0], ">f8").tobytes()
        img = pvn.decode_frame(h, raw)
        assert list(img.ravel()) == [0, 128]

    def test_bitmap_row_padding(self):
        # 10 px wide -> 2 bytes/row
        h = pvn.read_header(io.BytesIO(b"PV4a 10 2 1 1 10\n"))
        row = bytes([0b10100000, 0b01000000])
        img = pvn.decode_frame(h, row * 2)
        assert img.shape == (2, 10)
        assert img[0, 0] == 255 and img[0, 1] == 0
        assert img[0, 2] == 255 and img[0, 8] == 0 and img[0, 9] == 255

    def test_iter_frames(self):
        h = pvn.PvnHeader(5, "a", 8, 2, 2, 0, 10.0)
        buf = io.BytesIO(bytes(range(4)) + bytes(range(4, 8)) + b"\x01")
        frames = list(pvn.iter_frames(buf, h))
        assert len(frames) == 2          # trailing partial dropped


class TestEndToEnd:
    def _write_pvn(self, path, n=6, w=32, h=16):
        with open(path, "wb") as f:
            hdr = pvn.PvnHeader(6, "a", 8, w, h, n, 12.0)
            pvn.write_header(f, hdr)
            for i in range(n):
                img = np.full((h, w, 3), i * 20, np.uint8)
                pvn.write_frame(f, hdr, img)

    def test_probe(self, tmp_path):
        p = str(tmp_path / "a.pvn")
        self._write_pvn(p)
        from tcforge_tpu.io.probe import probe_file
        from tcforge_tpu.core.codecs import ContainerFormat
        info = probe_file(p)
        assert info.magic == ContainerFormat.PVN
        assert (info.width, info.height) == (32, 16)
        assert info.num_frames == 6 and abs(info.fps - 12.0) < 1e-9

    def test_cli_pvn_to_y4m(self, tmp_path):
        p = str(tmp_path / "a.pvn")
        self._write_pvn(p)
        out = str(tmp_path / "o.y4m")
        from tcforge_tpu.cli import main
        rc = main(["-i", p, "-o", out, "-y", "raw,null,y4m"])
        assert rc == 0
        from tcforge_tpu.io.y4m import Y4MReader
        r = Y4MReader(out)
        n = 0
        while r.read_frame() is not None:
            n += 1
        assert n == 6

    def test_cli_y4m_to_pvn(self, tmp_path):
        from tcforge_tpu.io.y4m import Y4MWriter, Y4MHeader
        src = str(tmp_path / "in.y4m")
        w = Y4MWriter(src, Y4MHeader(width=32, height=16, fps_num=25,
                                     fps_den=1))
        c = np.full((8, 16), 128, np.uint8)
        for i in range(4):
            w.write_frame(np.full((16, 32), i * 30, np.uint8), c, c)
        w.close()
        out = str(tmp_path / "o.pvn")
        from tcforge_tpu.cli import main
        rc = main(["-i", src, "-o", out, "-V", "rgb24",
                   "-y", "raw,null,pvn"])
        assert rc == 0
        with open(out, "rb") as f:
            hdr = pvn.read_header(f)
            assert (hdr.width, hdr.height) == (32, 16)
            assert hdr.imagetype == 6
            assert hdr.nframes == 4      # patched on close
            frames = list(pvn.iter_frames(f, hdr))
        assert len(frames) == 4


class TestImlist:
    def test_imlist_reads_listed_files(self, tmp_path):
        from tcforge_tpu.io.image import write_image
        paths = []
        for i in range(5):
            p = str(tmp_path / f"f{i}.ppm")
            write_image(p, np.full((8, 12, 3), i * 40, np.uint8))
            paths.append(p)
        lst = str(tmp_path / "list.txt")
        with open(lst, "w") as f:
            f.write("# comment\n" + "\n".join(paths) + "\n\n")
        from tcforge_tpu.modules.registry import new_module, ModuleKind
        from tcforge_tpu.core.job import Job
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "imlist",
                         Job(fps=10.0))
        imp.open(lst)
        assert imp.total_frames == 5
        assert (imp.width, imp.height) == (12, 8)
        batch = imp.read_video_batch(3)
        assert batch["rgb"].shape == (3, 8, 12, 3)
        batch = imp.read_video_batch(8)
        assert batch["rgb"].shape == (2, 8, 12, 3)
        assert imp.read_video_batch(1) is None
