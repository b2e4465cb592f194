"""PlayStation VAG ADPCM tests (io/vag.py vs an independent port of
the import_vag.c:325-390 decode formula)."""

import struct

import numpy as np
import pytest

from tcforge_tpu.io.vag import (BLOCK, SAMPLES_PER_BLOCK, VagReader,
                                VagState, decode_blocks, parse_header)


def golden_decode(data: bytes, prev=(0, 0)):
    """Direct scalar port of the C loop (import_vag.c do_decode)."""
    predict = [(0, 0), (60, 0), (115, 52), (98, 55), (122, 60),
               (0, 0), (0, 60)] + [(0, 0)] * 9
    p0, p1 = prev
    out = []
    for b in range(len(data) // 16):
        blk = data[b * 16:(b + 1) * 16]
        ptype = blk[0] >> 4
        scale = 16 - (blk[0] & 0x0F)
        for i in range(28):
            val = (blk[2 + i // 2] & 0x0F) if i % 2 == 0 \
                else (blk[2 + i // 2] >> 4)
            if val >= 8:
                val -= 16
            val <<= scale
            val = (p0 * predict[ptype][0] - p1 * predict[ptype][1]
                   + (val << 2)) >> 6
            val = max(-0x8000, min(0x7FFF, val))
            out.append(val)
            p1, p0 = p0, val
    return np.array(out, np.int16), (p0, p1)


def make_blocks(rng, nblk, max_pred=7):
    data = bytearray()
    for _ in range(nblk):
        pred = int(rng.integers(0, max_pred))
        shift = int(rng.integers(0, 13))
        data.append((pred << 4) | shift)
        data.append(0)
        data.extend(rng.integers(0, 256, 14, dtype=np.uint8).tobytes())
    return bytes(data)


class TestDecode:
    def test_matches_golden(self):
        rng = np.random.default_rng(0)
        data = make_blocks(rng, 64)
        st = VagState()
        got = decode_blocks(data, st)
        want, (p0, p1) = golden_decode(data)
        np.testing.assert_array_equal(got, want)
        assert st.prev[0] == p0 and st.prev[1] == p1

    def test_state_carries_across_calls(self):
        rng = np.random.default_rng(1)
        data = make_blocks(rng, 32)
        st = VagState()
        a = decode_blocks(data[:16 * 10], st)
        b = decode_blocks(data[16 * 10:], st)
        whole = decode_blocks(data, VagState())
        np.testing.assert_array_equal(np.concatenate([a, b]), whole)

    def test_clipping_saturates(self):
        # max shift + strong predictor drives values to the rails
        blk = bytes([(4 << 4) | 0, 0]) + b"\x77" * 14
        st = VagState()
        out = decode_blocks(blk * 8, st)
        assert out.max() == 0x7FFF or out.min() == -0x8000
        assert st.nclip > 0


class TestContainers:
    def _vagp(self, body, rate=22050):
        hdr = bytearray(48)
        hdr[0:4] = b"VAGp"
        hdr[0x0C:0x10] = struct.pack(">I", len(body))
        hdr[0x10:0x14] = struct.pack(">I", rate)
        return bytes(hdr) + body

    def _sshd(self, body, rate=44100, chans=2, block=64, bits=16):
        hdr = b"SShd" + struct.pack("<I", 24) + struct.pack(
            "<IIII", bits, rate, chans, block) + b"\x00" * 8
        return hdr + b"SSbd" + struct.pack("<I", len(body)) + body

    def test_parse_headers(self):
        i = parse_header(self._vagp(b"", rate=11025))
        assert i.rate == 11025 and i.channels == 1 and not i.is_pcm
        i = parse_header(self._sshd(b"", rate=48000, chans=2, block=32))
        assert i.rate == 48000 and i.channels == 2 and i.block == 32
        assert parse_header(b"nope" * 16) is None

    def test_vagp_mono_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        body = make_blocks(rng, 40)
        p = tmp_path / "a.vag"
        p.write_bytes(self._vagp(body))
        r = VagReader(str(p))
        chunks = []
        while True:
            c = r.read(512)
            if c is None:
                break
            chunks.append(c)
        got = np.concatenate(chunks)
        want, _ = golden_decode(body)
        assert got.shape == (40 * SAMPLES_PER_BLOCK, 1)
        np.testing.assert_array_equal(got[:, 0], want)

    def test_sshd_stereo_interleave(self, tmp_path):
        rng = np.random.default_rng(3)
        blk = 64                              # 4 ADPCM blocks per chunk
        lbody = make_blocks(rng, 8)
        rbody = make_blocks(rng, 8)
        inter = b"".join(lbody[i:i + blk] + rbody[i:i + blk]
                         for i in range(0, len(lbody), blk))
        p = tmp_path / "a.ss"
        p.write_bytes(self._sshd(inter, chans=2, block=blk))
        r = VagReader(str(p))
        got = r.read(10 ** 6)
        lw, _ = golden_decode(lbody)
        rw, _ = golden_decode(rbody)
        np.testing.assert_array_equal(got[:, 0], lw)
        np.testing.assert_array_equal(got[:, 1], rw)

    def test_sshd_pcm_payload(self, tmp_path):
        rng = np.random.default_rng(4)
        pcm = rng.integers(-3000, 3000, (256, 2)).astype("<i2")
        p = tmp_path / "a.ss"
        p.write_bytes(self._sshd(pcm.tobytes(), bits=1))
        r = VagReader(str(p))
        got = r.read(10 ** 6)
        np.testing.assert_array_equal(got, pcm)

    def test_probe_and_importer(self, tmp_path):
        from tcforge_tpu.core.codecs import ContainerFormat
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io.probe import sniff_magic
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        rng = np.random.default_rng(5)
        body = make_blocks(rng, 16)
        p = tmp_path / "a.vag"
        p.write_bytes(self._vagp(body, rate=18000))
        assert sniff_magic(str(p)) == ContainerFormat.VAG
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "vag", Job())
        imp.open(str(p))
        assert imp.audio_rate == 18000
        assert imp.audio_channels == 1
        got = imp.read_audio_batch(10 ** 6)
        want, _ = golden_decode(body)
        np.testing.assert_array_equal(got[:, 0], want)

    def test_audio_only_vag_to_wav(self, tmp_path):
        """vag -> engine (audio-only) -> wav, golden-checked."""
        import wave
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        rng = np.random.default_rng(6)
        body = make_blocks(rng, 64)
        src = tmp_path / "a.vag"
        src.write_bytes(self._vagp(body, rate=22050))
        out = tmp_path / "a.wav"
        job = Job()
        job.video_in_file = str(src)
        job.video_out_file = str(out)
        job.a_chan = 1
        Pipeline(job).run(progress=False)
        with wave.open(str(out)) as w:
            assert w.getframerate() == 22050
            got = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        want, _ = golden_decode(body)
        np.testing.assert_array_equal(got[:len(want)], want)


class TestVagInProgramStream:
    """PS private stream 1 sub-stream 0xFF (import_vag.c mpeg_mode)."""

    def _build_ps(self, tmp_path, vag_payload):
        import struct
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        rng = np.random.default_rng(11)
        W, H = 64, 32
        enc = Mpeg2FullEncoder(W, H, 25.0, qscale=4, gop_n=4, gop_m=1,
                               search_range=2)
        es = b""
        for i in range(6):
            es += enc.push_frame(
                rng.integers(0, 256, (H, W), np.uint8),
                np.full((H // 2, W // 2), 100, np.uint8),
                np.full((H // 2, W // 2), 150, np.uint8))
        es += enc.flush()

        def pes(sid, payload):
            hdr = b"\x80\x00\x00"
            return (b"\x00\x00\x01" + bytes([sid])
                    + struct.pack(">H", len(hdr) + len(payload)) + hdr
                    + payload)

        pack = b"\x00\x00\x01\xba" + bytes([0x44] + [0] * 8
                                           + [0, 0, 0xF8])
        out = bytearray()
        vpos = apos = 0
        while vpos < len(es) or apos < len(vag_payload):
            if vpos < len(es):
                out += pack + pes(0xE0, es[vpos:vpos + 2000])
                vpos += 2000
            if apos < len(vag_payload):
                chunk = vag_payload[apos:apos + 1024]
                apos += len(chunk)
                out += pes(0xBD, bytes([0xFF, 0, 0, 0]) + chunk)
        out += b"\x00\x00\x01\xb9"
        p = tmp_path / "vag.vob"
        p.write_bytes(bytes(out))
        return str(p)

    @pytest.mark.parametrize("options", ["window=16", "stream=0"])
    def test_ps_vag_audio_decodes(self, tmp_path, options):
        import struct
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        rng = np.random.default_rng(12)
        blk = 32
        lbody = make_blocks(rng, 8)
        rbody = make_blocks(rng, 8)
        inter = b"".join(lbody[i:i + blk] + rbody[i:i + blk]
                         for i in range(0, len(lbody), blk))
        sshd = (b"SShd" + struct.pack("<I", 24)
                + struct.pack("<IIII", 16, 32000, 2, blk)
                + b"\x00" * 8
                + b"SSbd" + struct.pack("<I", len(inter)))
        path = self._build_ps(tmp_path, sshd + inter)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mpeg", Job(),
                         options)
        imp.open(path)
        pcm = []
        while True:
            b = imp.read_video_batch(4)
            a = imp.read_audio_batch(4096)
            if a is not None:
                pcm.append(np.asarray(a))
            if b is None:
                break
        assert imp.audio_rate == 32000
        got = np.concatenate(pcm)
        lw, _ = golden_decode(lbody)
        rw, _ = golden_decode(rbody)
        np.testing.assert_array_equal(got[:, 0], lw)
        np.testing.assert_array_equal(got[:, 1], rw)
