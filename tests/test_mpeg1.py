"""MPEG-1 (ISO 11172-2) decode semantics through the native decoder.

MPEG-1 streams carry no sequence_extension; the decoder must switch
to 11172-2 behavior: 8-bit escape levels with double escape,
dequantizer oddification (mismatch control), full_pel vectors, and
macroblock_stuffing.  Golden values are computed in-test from the
spec formulas (the test_mpeg2_fields.py pattern)."""

import numpy as np
import pytest

from tcforge_tpu.io.mpeg2codec import (DC_CHROMA, DC_LUMA, BitWriter,
                                       DEFAULT_INTRA_MATRIX,
                                       Mpeg2Encoder)

W, H = 32, 32
MBW, MBH = W // 16, H // 16
QS_CODE = 2                  # slice quantiser_scale_code


@pytest.fixture(scope="module", autouse=True)
def native():
    from tcforge_tpu import native as n
    if not n.available():
        pytest.skip("native library not built")
    return n


def mpeg1_seq_header() -> bytes:
    """Plain 11172-2 sequence header — NO sequence extension."""
    w = BitWriter()
    w.start_code(0xB3)
    w.put(W, 12)
    w.put(H, 12)
    w.put(1, 4)                        # square pixels
    w.put(3, 4)                        # 25 fps
    w.put(0x3FFFF, 18)                 # variable bitrate
    w.put(1, 1)
    w.put(16, 10)                      # vbv
    w.put(0, 1)
    w.put(0, 1)                        # default intra matrix
    w.put(0, 1)                        # default non-intra matrix
    return w.bytes()


def put_escape(w: BitWriter, run: int, level: int) -> None:
    """Table B.5f escape: 6-bit code, 6-bit run, MPEG-1 level bytes."""
    w.put(0b000001, 6)
    w.put(run, 6)
    if level >= 128:
        w.put(0, 8)
        w.put(level, 8)
    elif level <= -128:
        w.put(128, 8)
        w.put(level + 256, 8)
    elif level < 0:
        w.put(level + 256, 8)
    else:
        w.put(level, 8)


def put_mv(w: BitWriter, delta: int, fc_val=2):
    r = fc_val - 1
    if delta == 0:
        w.put(1, 1)
        return
    mag = abs(delta)
    code = ((mag - 1) >> r) + 1
    residual = (mag - 1) & ((1 << r) - 1)
    vlc = {1: (0b01, 2), 2: (0b001, 3), 3: (0b0001, 4)}
    bits, ln = vlc[code]
    w.put(bits, ln)
    w.put(1 if delta < 0 else 0, 1)
    if r:
        w.put(residual, r)


def intra_picture(escapes=(), stuffing=False, temporal=0) -> bytes:
    """I picture, flat DC 128 everywhere; `escapes` = list of
    (run, level) AC escapes written into the FIRST luma block."""
    w = BitWriter()
    w.start_code(0x00)
    w.put(temporal, 10)
    w.put(1, 3)                        # I
    w.put(0xFFFF, 16)
    w.put(0, 1)                        # no extra info
    for row in range(MBH):
        w.start_code(row + 1)
        w.put(QS_CODE, 5)
        w.put(0, 1)
        pred_y = pred_u = pred_v = 128
        first_mb = (row == 0)
        for col in range(MBW):
            if stuffing and first_mb and col == 0:
                w.put(0b00000001111, 11)   # macroblock_stuffing
            w.put(1, 1)                # MBA 1
            w.put(1, 1)                # intra
            for blk in range(4):
                Mpeg2Encoder._write_dc(w, 128 - pred_y, DC_LUMA)
                pred_y = 128
                if first_mb and col == 0 and blk == 0:
                    for run, level in escapes:
                        put_escape(w, run, level)
                w.put(0b10, 2)         # EOB
            Mpeg2Encoder._write_dc(w, 128 - pred_u, DC_CHROMA)
            pred_u = 128
            w.put(0b10, 2)
            Mpeg2Encoder._write_dc(w, 128 - pred_v, DC_CHROMA)
            pred_v = 128
            w.put(0b10, 2)
            first_mb = False
    return w.bytes()


def p_picture(mvx=0, mvy=0, full_pel=0, temporal=1) -> bytes:
    """P picture, every MB MC-not-coded with the same vector."""
    w = BitWriter()
    w.start_code(0x00)
    w.put(temporal, 10)
    w.put(2, 3)                        # P
    w.put(0xFFFF, 16)
    w.put(full_pel, 1)
    w.put(2, 3)                        # forward_f_code 2 (r = 1)
    w.put(0, 1)
    for row in range(MBH):
        w.start_code(row + 1)
        w.put(QS_CODE, 5)
        w.put(0, 1)
        first = True
        for col in range(MBW):
            w.put(1, 1)                # MBA 1
            w.put(0b001, 3)            # MC, not coded
            put_mv(w, mvx if first else 0)
            put_mv(w, mvy if first else 0)
            first = False
    return w.bytes()


def mpeg1_dequant_intra(level: int, natural: int) -> int:
    """11172-2 2.4.4.1: trunc division, then oddification."""
    qs = 2 * QS_CODE                   # decoder linear scale
    wgt = int(np.asarray(DEFAULT_INTRA_MATRIX).reshape(-1)[natural])
    mag = (2 * abs(level) * wgt * qs) // 32
    f = mag if level >= 0 else -mag
    if f != 0 and f % 2 == 0:
        f += -1 if f > 0 else 1
    return max(-2048, min(2047, f))


def decode_pictures(native, es):
    dec = native.NativeMpeg2Bitstream(es + b"\x00\x00\x01\xb7")
    pics = []
    while True:
        got = dec.next_picture_full()
        if got is None:
            break
        pics.append(got)
    dec.close()
    return pics


class TestMpeg1Intra:
    def test_flat_picture_decodes(self, native):
        es = mpeg1_seq_header() + intra_picture()
        pics = decode_pictures(native, es)
        assert len(pics) == 1
        ptype, tref, y, u, v, info = pics[0]
        assert ptype == 1
        # DC 128, precision 0 -> dequant 1024 in every block's [0]
        assert (y[..., 0] == 1024).all()
        assert (y[..., 1:] == 0).all()

    @pytest.mark.parametrize("run,level", [
        (0, 40),           # plain 8-bit escape level
        (2, -40),          # negative 8-bit
        (1, 200),          # double escape positive (128..255)
        (3, -200),         # double escape negative
        (0, 127), (0, -127), (0, 255), (0, -255),
    ])
    def test_escape_levels(self, native, run, level):
        es = mpeg1_seq_header() + intra_picture(escapes=[(run, level)])
        ptype, tref, y, u, v, info = decode_pictures(native, es)[0]
        from tcforge_tpu.io.mpeg2codec import ZIGZAG
        idx = 1 + run                  # first AC lands at scan 1+run
        natural = ZIGZAG[idx]
        want = mpeg1_dequant_intra(level, natural)
        got = y[0, 0]
        assert got[natural] == want, (got[natural], want)
        # oddification applied: nonzero coefficients must be odd
        assert want % 2 != 0

    def test_oddification_differs_from_mpeg2(self, native):
        """Pick a level whose MPEG-2 dequant is even: MPEG-1 output
        must differ by exactly the oddification step."""
        run, level = 0, 8
        natural = 16  # ZIGZAG[1]... computed below
        from tcforge_tpu.io.mpeg2codec import ZIGZAG
        natural = ZIGZAG[1]
        qs = 2 * QS_CODE
        wgt = int(np.asarray(DEFAULT_INTRA_MATRIX).reshape(-1)[natural])
        f2 = (2 * level * wgt * qs) // 32
        assert f2 % 2 == 0, "test premise: MPEG-2 value is even"
        es = mpeg1_seq_header() + intra_picture(escapes=[(run, level)])
        _, _, y, _, _, _ = decode_pictures(native, es)[0]
        assert y[0, 0][natural] == f2 - 1

    def test_macroblock_stuffing_skipped(self, native):
        es = mpeg1_seq_header() + intra_picture(stuffing=True)
        ptype, tref, y, u, v, info = decode_pictures(native, es)[0]
        assert (y[..., 0] == 1024).all()


class TestMpeg1Motion:
    def test_full_pel_vectors_scale(self, native):
        """full_pel=1, coded delta 3 -> half-pel vector 6."""
        es = (mpeg1_seq_header() + intra_picture()
              + p_picture(mvx=3, mvy=1, full_pel=1))
        pics = decode_pictures(native, es)
        assert len(pics) == 2
        _, _, _, _, _, info = pics[1]
        assert (info[:, 1] == 6).all()     # vx half-pel
        assert (info[:, 2] == 2).all()     # vy half-pel

    def test_half_pel_vectors_without_full_pel(self, native):
        es = (mpeg1_seq_header() + intra_picture()
              + p_picture(mvx=3, mvy=1, full_pel=0))
        _, _, _, _, _, info = decode_pictures(native, es)[1]
        assert (info[:, 1] == 3).all()
        assert (info[:, 2] == 1).all()


def put_dc_size(w: BitWriter, size: int, chroma: bool) -> None:
    """dct_dc_size VLC (tables B.5a/B.5b == 13818-2 B-12/B-13)."""
    luma = {0: (0b100, 3), 1: (0b00, 2), 2: (0b01, 2), 3: (0b101, 3),
            4: (0b110, 3), 5: (0b1110, 4), 6: (0b11110, 5),
            7: (0b111110, 6), 8: (0b1111110, 7)}
    chro = {0: (0b00, 2), 1: (0b01, 2), 2: (0b10, 2), 3: (0b110, 3),
            4: (0b1110, 4), 5: (0b11110, 5), 6: (0b111110, 6),
            7: (0b1111110, 7), 8: (0b11111110, 8)}
    code, ln = (chro if chroma else luma)[size]
    w.put(code, ln)


def put_dc_diff(w: BitWriter, diff: int, chroma: bool) -> None:
    size = 0 if diff == 0 else int(abs(diff)).bit_length()
    put_dc_size(w, size, chroma)
    if size:
        w.put(diff if diff > 0 else diff + (1 << size) - 1, size)


def d_picture(mb_dcs, temporal=0) -> bytes:
    """Hand-written MPEG-1 D-picture (11172-2 2.4.3.6): per MB a
    1-bit macroblock_type, six DC-only blocks, end_of_macroblock.
    mb_dcs = [(y0,y1,y2,y3,cb,cr), ...] row-major quantised DCs."""
    w = BitWriter()
    w.start_code(0x00)
    w.put(temporal, 10)
    w.put(4, 3)                        # picture_coding_type = D
    w.put(0xFFFF, 16)                  # vbv_delay
    w.put(0, 1)                        # extra_bit_picture
    for row in range(MBH):
        w.start_code(row + 1)
        w.put(QS_CODE, 5)
        w.put(0, 1)
        pred = [128, 128, 128]         # y, cb, cr
        for col in range(MBW):
            dcs = mb_dcs[row * MBW + col]
            w.put(1, 1)                # mba increment = 1
            w.put(1, 1)                # macroblock_type: intra
            for b in range(6):
                comp = 0 if b < 4 else b - 3
                diff = dcs[b] - pred[comp]
                pred[comp] = dcs[b]
                put_dc_diff(w, diff, b >= 4)
            w.put(1, 1)                # end_of_macroblock
    return w.bytes()


class TestMpeg1DPictures:
    """MPEG-1 D-pictures decode AND encode — the reference stack
    (libmpeg2) rejects these outright."""

    def test_hand_bitstream_decodes(self, native):
        rng = np.random.default_rng(11)
        mb_dcs = rng.integers(16, 240, (MBW * MBH, 6)).tolist()
        es = mpeg1_seq_header() + d_picture(mb_dcs)
        pics = decode_pictures(native, es)
        assert len(pics) == 1
        ptype, _tref, yc, uc, vc, _info = pics[0]
        assert ptype == 4
        # coefficient 0 of each block is QDC*8; all AC zero
        for mb, dcs in enumerate(mb_dcs):
            row, col = divmod(mb, MBW)
            for b in range(4):
                gy = row * 2 + (b >> 1)
                gx = col * 2 + (b & 1)
                blk = yc[gy, gx]
                assert blk[0] == dcs[b] * 8
                assert not blk[1:].any()
            assert uc[row, col][0] == dcs[4] * 8
            assert vc[row, col][0] == dcs[5] * 8
            assert not uc[row, col][1:].any()

    def test_end_of_macroblock_enforced(self, native):
        """A '0' where end_of_macroblock must be '1' is a parse
        error, not silence."""
        w = BitWriter()
        w.start_code(0x00)
        w.put(0, 10)
        w.put(4, 3)
        w.put(0xFFFF, 16)
        w.put(0, 1)
        w.start_code(1)
        w.put(QS_CODE, 5)
        w.put(0, 1)
        w.put(1, 1)                    # mba 1
        w.put(1, 1)                    # type intra
        for b in range(6):
            put_dc_diff(w, 0, b >= 4)
        w.put(0, 1)                    # BAD end_of_macroblock
        es = mpeg1_seq_header() + w.bytes()
        with pytest.raises(ValueError, match="end_of_macroblock"):
            decode_pictures(native, es)

    def test_rejected_in_mpeg2(self, native):
        """Type-4 pictures inside MPEG-2 (sequence extension present)
        stay invalid."""
        enc = Mpeg2Encoder(W, H, 25.0, qscale=4)
        seq = enc.sequence_header()    # has a sequence_extension
        w = BitWriter()
        w.start_code(0x00)
        w.put(0, 10)
        w.put(4, 3)
        w.put(0xFFFF, 16)
        es = seq + w.bytes()
        with pytest.raises(ValueError, match="MPEG-1 only"):
            decode_pictures(native, es)

    def test_encoder_roundtrip_bit_exact(self, native):
        """Mpeg2FullEncoder(dpict) → native decode: every frame is a
        type-4 picture whose recon is the flat per-block rounded
        means from encode_d_math."""
        from tcforge_tpu.io.mpeg2enc import (Mpeg2FullEncoder,
                                             encode_d_math)
        from tcforge_tpu.io.mpeg2codec import iter_decode_full
        rng = np.random.default_rng(7)
        enc = Mpeg2FullEncoder(W, H, 25.0, qscale=8, gop_n=3, gop_m=1,
                               mpeg1=True, dpict=True)
        frames, es = [], b""
        for _ in range(7):
            y = rng.integers(0, 256, (H, W), np.uint8)
            u = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
            v = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
            frames.append((y, u, v))
            es += enc.push_frame(y, u, v)
        es += enc.flush()
        ptypes = [p[0] for p in decode_pictures(
            pytest.importorskip("tcforge_tpu").native, es)]
        assert ptypes == [4] * 7
        dec = list(iter_decode_full(es))
        assert len(dec) == 7
        for (fy, fu, fv), (dy, du, dv) in zip(frames, dec):
            _lv, ry, ru, rv = encode_d_math(fy, fu, fv)
            np.testing.assert_array_equal(np.asarray(dy), ry)
            np.testing.assert_array_equal(np.asarray(du), ru)
            np.testing.assert_array_equal(np.asarray(dv), rv)

    def test_dpict_with_rate_control(self, native):
        """rc=1 + dpict must not crash (RC accounts type 4 like I)."""
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        from tcforge_tpu.io.mpeg2codec import iter_decode_full
        rng = np.random.default_rng(5)
        enc = Mpeg2FullEncoder(W, H, 25.0, gop_n=3, gop_m=1,
                               mpeg1=True, dpict=True,
                               rate_control=True, bitrate_kbps=500)
        es = b""
        for _ in range(5):
            es += enc.push_frame(
                rng.integers(0, 256, (H, W), np.uint8),
                rng.integers(0, 256, (H // 2, W // 2), np.uint8),
                rng.integers(0, 256, (H // 2, W // 2), np.uint8))
        es += enc.flush()
        assert len(list(iter_decode_full(es))) == 5

    def test_dpict_requires_mpeg1(self, native):
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        with pytest.raises(ValueError, match="MPEG-1 syntax"):
            Mpeg2FullEncoder(W, H, 25.0, mpeg1=False, dpict=True)

    def test_importer_reads_d_stream(self, native, tmp_path):
        """The production mpeg importer (streaming native path)
        serves an all-D .m1v in display order."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io.mpeg2enc import (Mpeg2FullEncoder,
                                             encode_d_math)
        from tcforge_tpu.modules.importers.mpeg_import import \
            MpegImporter
        rng = np.random.default_rng(3)
        enc = Mpeg2FullEncoder(W, H, 25.0, qscale=8, gop_n=4, gop_m=1,
                               mpeg1=True, dpict=True)
        frames, es = [], b""
        for _ in range(6):
            y = rng.integers(0, 256, (H, W), np.uint8)
            u = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
            v = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
            frames.append((y, u, v))
            es += enc.push_frame(y, u, v)
        es += enc.flush()
        src = tmp_path / "d.m1v"
        src.write_bytes(es)
        imp = MpegImporter(Job())
        imp.open(str(src))
        got = []
        while True:
            b = imp.read_video_batch(4)
            if b is None:
                break
            got.extend(zip(b["y"], b["u"], b["v"]))
        imp.close()
        assert len(got) == 6
        for (fy, fu, fv), (dy, du, dv) in zip(frames, got):
            _lv, ry, ru, rv = encode_d_math(fy, fu, fv)
            np.testing.assert_array_equal(dy, ry)
            np.testing.assert_array_equal(du, ru)
            np.testing.assert_array_equal(dv, rv)


class TestMpeg1Guards:

    def test_mpeg2_unaffected(self, native):
        """A stream WITH a sequence extension keeps 12-bit escapes."""
        enc = Mpeg2Encoder(W, H, 25.0, qscale=4)
        rng = np.random.default_rng(3)
        y = rng.integers(0, 256, (H, W), np.uint8)
        u = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
        v = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
        es = enc.sequence_header() + enc.encode_frame(y, u, v)
        pics = decode_pictures(native, es)
        assert len(pics) == 1


class TestMpeg1EndToEnd:
    def test_importer_decodes_mpeg1_es(self, native, tmp_path):
        """The mpeg import module round-trips an MPEG-1 ES."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        es = mpeg1_seq_header()
        for k in range(4):
            es += intra_picture(temporal=k)
        p = tmp_path / "a.m1v"
        p.write_bytes(es + b"\x00\x00\x01\xb7")
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mpeg", Job())
        imp.open(str(p))
        got = 0
        while True:
            b = imp.read_video_batch(4)
            if b is None:
                break
            got += b["y"].shape[0]
            assert (b["y"] == 128).all()
        assert got == 4


class TestMpeg1Encode:
    """The native encoder's MPEG-1 mode (VCD profile parity)."""

    def _scene(self, n, w=64, h=48, amp=6):
        rng = np.random.default_rng(9)
        base = rng.integers(0, 256, (h + 64, w + 64), np.uint8)
        out = []
        for i in range(n):
            dx = int(amp * np.sin(i / 2.0)) + 16
            out.append((base[i + 8:i + 8 + h, dx:dx + w].copy(),
                        np.full((h // 2, w // 2), 80 + i, np.uint8),
                        np.full((h // 2, w // 2), 170 - i, np.uint8)))
        return out

    def test_roundtrip_psnr(self, native):
        from tcforge_tpu.io.mpeg2codec import iter_decode_full
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        frames = self._scene(10)
        enc = Mpeg2FullEncoder(64, 48, 25.0, qscale=2, gop_n=6,
                               gop_m=3, search_range=8, mpeg1=True)
        es = b""
        for y, u, v in frames:
            es += enc.push_frame(y, u, v)
        es += enc.flush()
        # pure 11172-2: no extension start codes anywhere
        assert b"\x00\x00\x01\xb5" not in es
        out = list(iter_decode_full(es))
        assert len(out) == len(frames)
        for (fy, fu, fv), (dy, du, dv) in zip(frames, out):
            err = np.mean((fy.astype(np.float64) - dy) ** 2)
            psnr = 10 * np.log10(255.0 ** 2 / max(err, 1e-12))
            # random-noise test content clips the 8-bit MPEG-1 level
            # range on I pictures (39.4 dB); natural content stays
            # above 40 like the MPEG-2 path
            assert psnr >= 38.0, psnr

    def test_probe_reports_mpeg1(self, native, tmp_path):
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        from tcforge_tpu.io.probe import probe_file
        from tcforge_tpu.core.codecs import Codec
        enc = Mpeg2FullEncoder(64, 48, 25.0, qscale=4, gop_n=4,
                               gop_m=1, mpeg1=True)
        es = b""
        for y, u, v in self._scene(4):
            es += enc.push_frame(y, u, v)
        es += enc.flush()
        p = tmp_path / "a.m1v"
        p.write_bytes(es)
        info = probe_file(str(p))
        assert info.codec == Codec.MPEG1

    def test_mpeg2_flags_rejected(self, native):
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        with pytest.raises(ValueError, match="MPEG-2 syntax"):
            Mpeg2FullEncoder(64, 48, 25.0, mpeg1=True, alt_scan=True)

    def test_vcd_profile_triggers_mpeg1(self, native):
        from tcforge_tpu.core.codecs import Codec
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        job = Job()
        job.ex_v_codec = Codec.MPEG1
        enc = new_module(ModuleKind.ENCODER, "mpeg2", job)
        assert enc.options["mpeg1"] == 1
