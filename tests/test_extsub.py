"""SPU codec + extsub DVD subtitle overlay tests."""

import struct

import numpy as np
import jax.numpy as jnp
import pytest

from tcforge_tpu.core.formats import ImageFormat as F
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.job import Job
from tcforge_tpu.io import spu
import tcforge_tpu.modules  # noqa: F401
from tcforge_tpu.modules.registry import ModuleKind, new_module

RNG = np.random.default_rng(44)


def sub_bitmap(h=12, w=40):
    """A 2-bit 'text-like' bitmap: outline color 1, fill color 2."""
    bm = np.zeros((h, w), np.uint8)
    bm[2:-2, 2:-2] = 1
    bm[4:-4, 4:-4] = 2
    return bm


class TestSpuCodec:
    def test_roundtrip(self):
        bm = sub_bitmap()
        pkt = spu.encode_spu(bm, x=100, y=200, duration_ticks=88)
        s = spu.decode_spu(pkt)
        np.testing.assert_array_equal(s.bitmap, bm)
        assert (s.x, s.y) == (100, 200)
        assert s.stop_ticks == 88
        assert s.alpha == (0, 15, 15, 15)

    def test_roundtrip_random(self):
        bm = RNG.integers(0, 4, (17, 33), dtype=np.uint8)
        pkt = spu.encode_spu(bm, x=0, y=0, palette=(5, 6, 7, 8),
                             alpha=(0, 8, 12, 15))
        s = spu.decode_spu(pkt)
        np.testing.assert_array_equal(s.bitmap, bm)
        assert s.palette == (5, 6, 7, 8)
        assert s.alpha == (0, 8, 12, 15)

    def test_long_runs(self):
        bm = np.zeros((4, 300), np.uint8)
        bm[:, 100:250] = 3
        s = spu.decode_spu(spu.encode_spu(bm, 0, 0))
        np.testing.assert_array_equal(s.bitmap, bm)

    def test_stream_split(self):
        a = spu.encode_spu(sub_bitmap(), 0, 0)
        b = spu.encode_spu(sub_bitmap(8, 16), 10, 20)
        pkts = list(spu.iter_spu_packets(a + b))
        assert len(pkts) == 2
        assert spu.decode_spu(pkts[1]).x == 10

    def test_corrupt(self):
        with pytest.raises(ValueError):
            spu.decode_spu(b"\x00\x02\x00")


def make_vob(tmp_path, entries):
    """Minimal program stream: private-stream-1 PES packets with PTS
    carrying subpicture units (substream 0x20)."""
    out = bytearray()
    for pts, pkt in entries:
        payload = bytes([0x20]) + pkt
        pes_hdr = bytes([0x80, 0x80, 5]) + bytes([
            0x21 | (((pts >> 30) & 7) << 1),
            (pts >> 22) & 0xFF,
            0x01 | (((pts >> 15) & 0x7F) << 1),
            (pts >> 7) & 0xFF,
            0x01 | ((pts & 0x7F) << 1)])
        body = pes_hdr + payload
        out += b"\x00\x00\x01\xBD" + struct.pack(">H", len(body)) + body
    p = tmp_path / "subs.vob"
    p.write_bytes(bytes(out))
    return p


def yuv(n, h, w, first=0, fill=60):
    y = np.full((n, h, w), fill, np.uint8)
    c = np.full((n, h // 2, w // 2), 128, np.uint8)
    fb = FrameBatch.from_numpy(y=y, u=c, v=c, fmt=F.YUV420P)
    return FrameBatch(format=fb.format, y=fb.y, u=fb.u, v=fb.v,
                      attrs=fb.attrs,
                      frame_ids=jnp.arange(first, first + n,
                                           dtype=jnp.int32), fps=25.0)


class TestVobDemux:
    def test_collect_with_pts(self, tmp_path):
        pkt = spu.encode_spu(sub_bitmap(), 30, 40, duration_ticks=100)
        vob = make_vob(tmp_path, [(90000, pkt), (270000, pkt)])
        spus = spu.collect_vob_spus(str(vob))
        assert len(spus) == 2
        assert spus[0].pts == 90000
        assert spus[1].pts == 270000

    def test_split_units_reassemble(self, tmp_path):
        pkt = spu.encode_spu(sub_bitmap(16, 60), 0, 0)
        half = len(pkt) // 2
        out = bytearray()
        for pts, chunk in ((90000, pkt[:half]), (None, pkt[half:])):
            payload = bytes([0x20]) + chunk
            if pts is not None:
                hdr = bytes([0x80, 0x80, 5]) + bytes([
                    0x21 | (((pts >> 30) & 7) << 1), (pts >> 22) & 0xFF,
                    0x01 | (((pts >> 15) & 0x7F) << 1),
                    (pts >> 7) & 0xFF, 0x01 | ((pts & 0x7F) << 1)])
            else:
                hdr = bytes([0x80, 0x00, 0])
            body = hdr + payload
            out += b"\x00\x00\x01\xBD" + struct.pack(">H",
                                                     len(body)) + body
        p = tmp_path / "split.vob"
        p.write_bytes(bytes(out))
        spus = spu.collect_vob_spus(str(p))
        assert len(spus) == 1
        assert spus[0].bitmap.shape == (16, 60)


class TestExtsubFilter:
    def test_overlay_timing(self, tmp_path):
        # subtitle displayed at pts=1s for 100*1024 ticks (~1.14 s)
        pkt = spu.encode_spu(sub_bitmap(), 30, 40, duration_ticks=100)
        vob = make_vob(tmp_path, [(90000, pkt)])
        filt = new_module(ModuleKind.FILTER, "extsub", Job(fps=25.0),
                          f"subtitle_file={vob}")
        st = filt.init_state(160, 96, F.YUV420P)
        out, _ = filt.apply(yuv(60, 96, 160), st)
        oy = np.asarray(out.y)
        assert (oy[10] == 60).all()            # before pts (frame 25)
        assert (oy[30, 40:52, 30:70] != 60).any()   # showing
        assert (oy[59] == 60).all()            # after stop
        # transparent background (color 0, alpha 0) stays untouched
        assert oy[30, 0, 0] == 60

    def test_raw_spu_stream(self, tmp_path):
        pkt = spu.encode_spu(sub_bitmap(), 10, 10, duration_ticks=50)
        p = tmp_path / "subs.spu"
        p.write_bytes(pkt)
        filt = new_module(ModuleKind.FILTER, "extsub", Job(fps=25.0),
                          f"subtitle_file={p}")
        st = filt.init_state(160, 96, F.YUV420P)
        out, _ = filt.apply(yuv(4, 96, 160), st)
        assert (np.asarray(out.y)[0] != 60).any()   # pts 0 -> frame 0

    def test_vertshift(self, tmp_path):
        pkt = spu.encode_spu(sub_bitmap(), 30, 10, duration_ticks=50)
        p = tmp_path / "subs.spu"
        p.write_bytes(pkt)
        f0 = new_module(ModuleKind.FILTER, "extsub", Job(fps=25.0),
                        f"subtitle_file={p}")
        f1 = new_module(ModuleKind.FILTER, "extsub", Job(fps=25.0),
                        f"subtitle_file={p}:vertshift=50")
        s0 = f0.init_state(160, 96, F.YUV420P)
        s1 = f1.init_state(160, 96, F.YUV420P)
        a, _ = f0.apply(yuv(1, 96, 160), s0)
        b, _ = f1.apply(yuv(1, 96, 160), s1)
        ya, yb = np.asarray(a.y)[0], np.asarray(b.y)[0]
        top_a = np.nonzero((ya != 60).any(axis=1))[0][0]
        top_b = np.nonzero((yb != 60).any(axis=1))[0][0]
        assert top_b == top_a + 48             # shifted down 50%

    def test_missing_file(self):
        with pytest.raises((ValueError, OSError)):
            new_module(ModuleKind.FILTER, "extsub", Job(),
                       "subtitle_file=/nonexistent.vob")


class TestReferenceRender:
    def _c_class_fill(self, bitmap, ca, cb, c1, c2, black=16):
        # anti_alias_subtitle walk (filter_extsub.c:203-241)
        c1 = max(c1, black + 1)
        c2 = max(c2, black + 1)
        out = np.empty(bitmap.size, np.int64)
        back = black
        for n, v in enumerate(bitmap.reshape(-1)):
            if v == ca:
                out[n] = c1
                back = black
            elif v == cb:
                out[n] = c2
                back = 255
            else:
                out[n] = back
        return out.reshape(bitmap.shape)

    def test_class_fill_golden(self, tmp_path):
        pkt = spu.encode_spu(sub_bitmap(), 10, 10, duration_ticks=50)
        p = tmp_path / "subs.spu"
        p.write_bytes(pkt)
        filt = new_module(ModuleKind.FILTER, "extsub", Job(fps=25.0),
                          f"subtitle_file={p}:color1=80:color2=200:"
                          "ca=1:cb=2:antialias=0")
        rng = np.random.default_rng(3)
        bm = rng.integers(0, 4, (9, 14)).astype(np.uint8)
        got = filt._class_fill(bm)
        want = self._c_class_fill(bm, 1, 2, 80, 200)
        np.testing.assert_array_equal(got.astype(np.int64), want)

    def test_timeshift_and_pre(self, tmp_path):
        pkt = spu.encode_spu(sub_bitmap(), 10, 10, duration_ticks=50)
        p = tmp_path / "subs.spu"
        p.write_bytes(pkt)
        f = new_module(ModuleKind.FILTER, "extsub", Job(fps=25.0),
                       f"subtitle_file={p}:timeshift=1000:pre=0")
        from tcforge_tpu.modules.registry import FilterSlot
        assert f.slots == FilterSlot.POST_M
        st = f.init_state(160, 96, F.YUV420P)
        out, _ = f.apply(yuv(30, 96, 160), st)
        oy = np.asarray(out.y)
        assert (oy[10] == 60).all()            # shifted to t=1s
        assert (oy[26] != 60).any()

    def test_ref_render_path(self, tmp_path):
        pkt = spu.encode_spu(sub_bitmap(), 10, 10, duration_ticks=50)
        p = tmp_path / "subs.spu"
        p.write_bytes(pkt)
        f = new_module(ModuleKind.FILTER, "extsub", Job(fps=25.0),
                       f"subtitle_file={p}:color1=90:color2=210")
        st = f.init_state(160, 96, F.YUV420P)
        out, _ = f.apply(yuv(4, 96, 160), st)
        assert (np.asarray(out.y)[0] != 60).any()


class TestVobsub:
    """VobSub .idx/.sub file pairs (capability beyond the reference,
    which only consumed in-stream subpictures)."""

    def _make_pair(self, tmp_path, track=0):
        bmp = sub_bitmap()
        pkt = spu.encode_spu(bmp, x=8, y=4)
        sub = make_vob(tmp_path, [(90000, pkt)])
        sub_path = tmp_path / "subs.sub"
        sub_path.write_bytes(sub.read_bytes())
        idx = tmp_path / "subs.idx"
        idx.write_text(
            "# VobSub index file, v7\n"
            "size: 720x576\n"
            "palette: 000000, ffffff, 808080, 404040, 000000, "
            "000000, 000000, 000000, 000000, 000000, 000000, "
            "000000, 000000, 000000, 000000, 000000\n"
            f"id: en, index: {track}\n"
            "timestamp: 00:00:02:500, filepos: 000000000\n")
        return idx, bmp

    def test_parse_idx(self, tmp_path):
        from tcforge_tpu.io import vobsub
        idx, _ = self._make_pair(tmp_path)
        info = vobsub.parse_idx(str(idx))
        assert info.size == (720, 576)
        assert len(info.palette) == 16
        assert info.palette[1] == (255, 255, 255)
        assert info.langs[0].lang == "en"
        assert info.langs[0].entries == [(2500, 0)]

    def test_read_vobsub_decodes_with_idx_pts(self, tmp_path):
        from tcforge_tpu.io import vobsub
        idx, bmp = self._make_pair(tmp_path)
        spus, info = vobsub.read_vobsub(str(idx))
        assert len(spus) == 1
        assert (spus[0].bitmap == bmp).all()
        assert spus[0].pts == 2500 * 90       # idx wins over PES pts
        luma = vobsub.palette_luma(info.palette)
        assert luma[1] == 255 and luma[0] == 0

    def test_extsub_filter_accepts_idx(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.filters.extsub import ExtsubFilter
        idx, _ = self._make_pair(tmp_path)
        f = ExtsubFilter(Job(fps=25.0),
                         f"subtitle_file={idx}:forceshow=1")
        assert len(f.spus) == 1
        # idx palette luma reached the CLUT (index 1 = white)
        assert f.clut_y[1] == 255
