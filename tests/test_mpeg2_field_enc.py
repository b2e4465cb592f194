"""Field-picture P/B ENCODING + alternate_scan emission: GOP streams
coded as pairs of field pictures (picture_structure 1/2, 16x16 field
prediction with same-parity field select) round-trip through the
repo's own decoders (io/mpeg2enc.py fields mode vs mpeg2intra.cpp +
reconstruct_field_picture)."""

import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _need_native():
    from tcforge_tpu import native
    if not native.available():
        pytest.skip("native library not built")


W, H, FPS = 96, 64, 25.0       # height % 32 == 0 (mb-aligned fields)


def interlaced_scene(n, amp=3):
    """Moving gradient whose fields move differently (real interlace:
    the bottom field samples half a frame-time later)."""
    base = (np.arange(H)[:, None] * 2
            + np.arange(W)[None, :]).astype(np.float64)
    out = []
    for i in range(n):
        y = np.empty((H, W), np.uint8)
        y[0::2] = ((base[0::2] + i * amp) % 220 + 10).astype(np.uint8)
        y[1::2] = ((base[1::2] + i * amp + amp / 2.0)
                   % 220 + 10).astype(np.uint8)
        u = ((base[::2, ::2] + i) % 200 + 20).astype(np.uint8)
        v = np.full((H // 2, W // 2), 140, np.uint8)
        out.append((y, u, v))
    return out


def encode(frames, **kw):
    from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
    enc = Mpeg2FullEncoder(W, H, FPS, **kw)
    es = b""
    for f in frames:
        es += enc.push_frame(*f)
    return es + enc.flush()


def decode(es):
    from tcforge_tpu.io.mpeg2codec import iter_decode_full
    return list(iter_decode_full(es))


def psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255 ** 2 / max(mse, 1e-9))


def picture_structures(es):
    """(picture_structure, ptype) per coded picture, from the headers."""
    out = []
    i = 0
    ptype = 0
    while True:
        i = es.find(b"\x00\x00\x01", i)
        if i < 0 or i + 4 > len(es):
            break
        code = es[i + 3]
        if code == 0x00:
            ptype = (es[i + 5] >> 3) & 7
        elif code == 0xB5 and (es[i + 4] >> 4) == 8:
            out.append((es[i + 6] & 3, ptype))
        i += 3
    return out


class TestFieldP:
    def test_ip_fields_roundtrip(self):
        frames = interlaced_scene(8)
        es = encode(frames, qscale=2, gop_n=8, gop_m=1, fields=True)
        ps = picture_structures(es)
        assert len(ps) == 16                     # two fields per frame
        assert ps[0] == (1, 1) and ps[1] == (2, 1)   # I fields
        assert ps[2] == (1, 2) and ps[3] == (2, 2)   # P fields
        out = decode(es)
        assert len(out) == len(frames)
        for f, d in zip(frames, out):
            for a, b in zip(f, d):
                assert psnr(a, b) >= 40.0

    def test_fields_beat_frame_coding_on_interlace(self):
        """Field prediction must track per-field motion: same quality
        coded size should not blow up vs frame coding on interlaced
        motion (sanity that the field path really predicts)."""
        frames = interlaced_scene(9, amp=6)
        es_f = encode(frames, qscale=4, gop_n=9, gop_m=1, fields=True)
        es_i = encode(frames, qscale=4, gop_n=1, gop_m=1)
        assert len(es_f) < 0.8 * len(es_i)

    def test_bottom_field_first(self):
        frames = interlaced_scene(4)
        es = encode(frames, qscale=3, gop_n=4, gop_m=1, fields=True,
                    top_field_first=False)
        ps = picture_structures(es)
        assert ps[0][0] == 2 and ps[1][0] == 1   # bottom coded first
        out = decode(es)
        for f, d in zip(frames, out):
            assert psnr(f[0], d[0]) >= 40.0


class TestFieldB:
    def test_ipb_fields_roundtrip(self):
        frames = interlaced_scene(9)
        es = encode(frames, qscale=3, gop_n=8, gop_m=2, fields=True)
        ps = picture_structures(es)
        assert (3, 3) not in ps                  # no frame B pictures
        assert any(t == 3 for _, t in ps)        # B fields present
        out = decode(es)
        assert len(out) == len(frames)
        for i, (f, d) in enumerate(zip(frames, out)):
            assert psnr(f[0], d[0]) >= 38.0, f"frame {i}"

    def test_display_order(self):
        frames = interlaced_scene(7)
        es = encode(frames, qscale=3, gop_n=6, gop_m=3, fields=True)
        out = decode(es)
        assert len(out) == 7
        for i, (f, d) in enumerate(zip(frames, out)):
            own = psnr(f[0], d[0])
            other = max(psnr(frames[j][0], d[0])
                        for j in range(len(frames)) if j != i)
            assert own > other, f"frame {i} out of display order"


class TestImporterFieldGop:
    def test_importer_decodes_field_gop(self, tmp_path):
        """The production import path (native bitstream + jitted field
        reconstruction) decodes an encoder-produced field GOP stream."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import (ModuleKind,
                                                  new_module)
        frames = interlaced_scene(6)
        es = encode(frames, qscale=2, gop_n=6, gop_m=2, fields=True)
        p = tmp_path / "fgop.m2v"
        p.write_bytes(es)
        job = Job(video_in_file=str(p))
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mpeg", job, "")
        imp.open(str(p))
        got = []
        while True:
            b = imp.read_video_batch(4)
            if b is None:
                break
            got.extend(np.asarray(b["y"]))
        assert len(got) == 6
        for f, y in zip(frames, got):
            assert psnr(f[0], y) >= 38.0


class TestAlternateScan:
    def test_alt_scan_bit_and_identical_recon(self):
        """alternate_scan changes only the coefficient ordering: the
        decoded pixels must be bit-identical to the zigzag stream."""
        frames = interlaced_scene(6)
        es0 = encode(frames, qscale=3, gop_n=6, gop_m=2)
        es1 = encode(frames, qscale=3, gop_n=6, gop_m=2, alt_scan=True)
        # the alternate_scan extension bit (byte 3 of the pce, bit 2)
        def scan_bits(es):
            return [(es[i + 7] >> 2) & 1 for i in range(len(es) - 8)
                    if es[i:i + 3] == b"\x00\x00\x01"
                    and es[i + 3] == 0xB5 and (es[i + 4] >> 4) == 8]
        assert set(scan_bits(es0)) == {0}
        assert set(scan_bits(es1)) == {1}
        d0 = decode(es0)
        d1 = decode(es1)
        for a, b in zip(d0, d1):
            for pa, pb in zip(a, b):
                np.testing.assert_array_equal(pa, pb)

    def test_alt_scan_fields(self):
        frames = interlaced_scene(5)
        es = encode(frames, qscale=3, gop_n=5, gop_m=1, fields=True,
                    alt_scan=True)
        out = decode(es)
        for f, d in zip(frames, out):
            assert psnr(f[0], d[0]) >= 40.0
