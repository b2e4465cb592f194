"""Core modes: directory mode, multi-source -i, PSU mode
(transcode.c:597-790, decoder.c:834-887,1017)."""

import numpy as np
import pytest

from tcforge_tpu.cli import main
from tcforge_tpu.core.job import Job
from tcforge_tpu.io.y4m import Y4MHeader, Y4MReader, Y4MWriter


def write_y4m(path, vals, w=32, h=16):
    hdr = Y4MHeader(width=w, height=h, fps_num=25, fps_den=1)
    with Y4MWriter(str(path), hdr) as wr:
        for v in vals:
            y = np.full((h, w), v, np.uint8)
            c = np.full((h // 2, w // 2), 128, np.uint8)
            wr.write_frame(y, c, c)


class TestMultiSource:
    def test_two_inputs_chain(self, tmp_path):
        a, b = tmp_path / "a.y4m", tmp_path / "b.y4m"
        write_y4m(a, [10, 11, 12])
        write_y4m(b, [20, 21])
        dst = tmp_path / "out.y4m"
        rc = main(["-i", str(a), "-i", str(b), "-o", str(dst),
                   "--progress_off", "-q"])
        assert rc == 0
        with Y4MReader(str(dst)) as r:
            vals = [int(fr[0][0, 0]) for fr in r]
        assert vals == [10, 11, 12, 20, 21]

    def test_directory_mode(self, tmp_path):
        d = tmp_path / "clips"
        d.mkdir()
        write_y4m(d / "01.y4m", [1, 2])
        write_y4m(d / "02.y4m", [3])
        write_y4m(d / "03.y4m", [4, 5])
        dst = tmp_path / "out.y4m"
        rc = main(["-i", str(d), "-o", str(dst), "--progress_off",
                   "-q"])
        assert rc == 0
        with Y4MReader(str(dst)) as r:
            vals = [int(fr[0][0, 0]) for fr in r]
        assert vals == [1, 2, 3, 4, 5]

    def test_incompatible_geometry_rejected(self, tmp_path):
        a, b = tmp_path / "a.y4m", tmp_path / "b.y4m"
        write_y4m(a, [1], w=32, h=16)
        write_y4m(b, [2], w=64, h=32)
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        import tcforge_tpu.modules  # noqa: F401
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "multi", Job())
        imp.open([str(a), str(b)])
        with pytest.raises(ValueError, match="geometry"):
            while imp.read_video_batch(4) is not None:
                pass

    def test_mixed_formats_chain(self, tmp_path):
        """Different CONTAINERS with matching geometry chain fine."""
        a = tmp_path / "a.y4m"
        write_y4m(a, [50, 51])
        avi = tmp_path / "b.avi"
        rc = main(["-i", str(a), "-o", str(avi), "--progress_off",
                   "-q"])
        assert rc == 0
        dst = tmp_path / "out.y4m"
        rc = main(["-i", str(a), "-i", str(avi), "-o", str(dst),
                   "--progress_off", "-q"])
        assert rc == 0
        with Y4MReader(str(dst)) as r:
            vals = [int(fr[0][0, 0]) for fr in r]
        assert vals == [50, 51, 50, 51]


class TestPsuMode:
    @pytest.fixture(autouse=True)
    def _need_native(self):
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native library not built")

    def _mpeg_with_units(self, tmp_path, unit_frames=(3, 2, 4)):
        """Concatenated intra sequences: one seq header per unit."""
        from tcforge_tpu.io.mpeg2codec import Mpeg2Encoder
        es = bytearray()
        val = 40
        for n in unit_frames:
            enc = Mpeg2Encoder(48, 32, 25.0, qscale=2)
            for k in range(n):
                y = np.full((32, 48), val, np.uint8)
                c = np.full((16, 24), 128, np.uint8)
                es += enc.encode_frame(y, c, c, with_seq=(k == 0))
                val += 1
        es += b"\x00\x00\x01\xb7"
        p = tmp_path / "units.m2v"
        p.write_bytes(bytes(es))
        return p

    def test_unit_scan(self, tmp_path):
        from tcforge_tpu.io.mpeg import count_psus
        p = self._mpeg_with_units(tmp_path)
        assert count_psus(str(p)) == 3

    def test_psu_mode_outputs(self, tmp_path):
        p = self._mpeg_with_units(tmp_path)
        out = tmp_path / "unit-%d.y4m"
        rc = main(["-i", str(p), "-o", str(out), "--psu_mode",
                   "--progress_off", "-q"])
        assert rc == 0
        lens = []
        for k in range(3):
            with Y4MReader(str(tmp_path / f"unit-{k}.y4m")) as r:
                frames = list(r)
            lens.append(len(frames))
        assert lens == [3, 2, 4]
        # unit 1 starts at frame value 43
        with Y4MReader(str(tmp_path / "unit-1.y4m")) as r:
            first = next(iter(r))[0][0, 0]
        assert int(first) == 43

    def test_psu_range(self, tmp_path):
        p = self._mpeg_with_units(tmp_path)
        out = tmp_path / "u%d.y4m"
        rc = main(["-i", str(p), "-o", str(out), "--psu_mode",
                   "--psu_first", "1", "--psu_last", "2",
                   "--progress_off", "-q"])
        assert rc == 0
        assert (tmp_path / "u1.y4m").exists()
        assert not (tmp_path / "u0.y4m").exists()
        assert not (tmp_path / "u2.y4m").exists()

    def test_psu_needs_template(self, tmp_path):
        p = self._mpeg_with_units(tmp_path)
        rc = main(["-i", str(p), "-o", str(tmp_path / "x.y4m"),
                   "--psu_mode", "--progress_off", "-q"])
        assert rc == 1


class TestMpegSeek:
    @pytest.fixture(autouse=True)
    def _need_native(self):
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native library not built")

    def test_L_seek_mpeg_frame_exact(self, tmp_path):
        """-L on an MPEG-2 input cuts at the nearest sequence header
        (no full re-decode) and lands frame-exact."""
        from tcforge_tpu.io.mpeg2codec import Mpeg2Encoder
        es = bytearray()
        val = 60
        for unit in range(3):                  # 3 units x 4 frames
            enc = Mpeg2Encoder(48, 32, 25.0, qscale=2)
            for k in range(4):
                y = np.full((32, 48), val, np.uint8)
                c = np.full((16, 24), 128, np.uint8)
                es += enc.encode_frame(y, c, c, with_seq=(k == 0))
                val += 1
        es += b"\x00\x00\x01\xb7"
        src = tmp_path / "seek.m2v"
        src.write_bytes(bytes(es))
        dst = tmp_path / "out.y4m"
        rc = main(["-i", str(src), "-L", "6", "-o", str(dst),
                   "--progress_off", "-q"])
        assert rc == 0
        with Y4MReader(str(dst)) as r:
            vals = [int(fr[0][0, 0]) for fr in r]
        assert vals == [66, 67, 68, 69, 70, 71]


class TestMultiSourceAudio:
    def test_audio_contiguous_across_files(self, tmp_path):
        """The previous file's audio tail survives the file switch and
        short reads top up (code-review finding)."""
        from tcforge_tpu.io.avi import (AviAudioStream, AviVideoStream,
                                        AviWriter)
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.modules.registry import ModuleKind, new_module

        def make_avi(path, vals, base):
            w = AviWriter(path, AviVideoStream(
                fourcc="I420", width=32, height=16, fps=25.0),
                [AviAudioStream(rate=8000, channels=1, bits=16)])
            frame = np.full(32 * 16 * 3 // 2, 128, np.uint8).tobytes()
            for k in range(vals):
                w.write_video_frame(frame)
                pcm = (np.arange(320, dtype=np.int16)
                       + base + k * 320)
                w.write_audio(pcm.tobytes())
            w.close()

        a, b = tmp_path / "a.avi", tmp_path / "b.avi"
        make_avi(str(a), 3, 0)
        make_avi(str(b), 3, 10000)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "multi", Job())
        imp.open([str(a), str(b)])
        # read all video (forces the file switch)
        while imp.read_video_batch(8) is not None:
            pass
        got = []
        while True:
            chunk = imp.read_audio_batch(500)
            if chunk is None:
                break
            got.append(chunk[:, 0])
        pcm = np.concatenate(got)
        want = np.concatenate([np.arange(960) % 32768,
                               np.arange(960) + 10000])
        np.testing.assert_array_equal(pcm, want.astype(np.int16))
        imp.close()


class TestVobLpcm:
    @pytest.fixture(autouse=True)
    def _need_native(self):
        from tcforge_tpu import native
        if not native.available():
            pytest.skip("native library not built")

    def _make_vob(self, tmp_path):
        """Tiny PS: MPEG-2 intra video + a 48 kHz stereo LPCM track."""
        import struct
        from tcforge_tpu.io.mpeg2codec import Mpeg2Encoder

        def pes(sid, payload):
            hdr = b"\x80\x00\x00"        # MPEG-2 PES, no PTS
            return (b"\x00\x00\x01" + bytes([sid])
                    + struct.pack(">H", len(hdr) + len(payload))
                    + hdr + payload)

        enc = Mpeg2Encoder(48, 32, 25.0, qscale=2)
        n = 4
        rate, ch = 48000, 2
        spf = rate // 25
        pcm_all = (np.arange(n * spf * ch) % 20000).astype(">i2")
        pack = (b"\x00\x00\x01\xba"
                + bytes([0x44] + [0] * 8 + [0, 0, 0xF8]))
        out = bytearray()
        for k in range(n):
            y = np.full((32, 48), 50 + k, np.uint8)
            c = np.full((16, 24), 128, np.uint8)
            ves = enc.encode_frame(y, c, c, with_seq=(k == 0))
            out += pack + pes(0xE0, ves)
            # LPCM packet: substream 0xA0 + 7-byte private header
            samples = pcm_all[k * spf * ch:(k + 1) * spf * ch]
            info = (0 << 6) | (0 << 4) | (ch - 1)   # 16-bit 48k stereo
            priv = bytes([0xA0, 1, 0, 4, 0, info, 0]) \
                + samples.tobytes()
            out += pes(0xBD, priv)
        out += b"\x00\x00\x01\xb9"
        p = tmp_path / "disc.vob"
        p.write_bytes(bytes(out))
        return p, pcm_all.astype("<i2").reshape(-1, ch)

    def test_probe_reports_lpcm(self, tmp_path):
        from tcforge_tpu.io.probe import probe_file
        vob, _ = self._make_vob(tmp_path)
        info = probe_file(str(vob))
        assert info.tracks and info.tracks[0].samplerate == 48000
        assert info.tracks[0].channels == 2

    def test_lpcm_decodes_sample_exact(self, tmp_path):
        from tcforge_tpu.cli import main
        vob, want = self._make_vob(tmp_path)
        out = tmp_path / "out.avi"
        rc = main(["-i", str(vob), "-o", str(out), "--progress_off",
                   "-q"])
        assert rc == 0
        from tcforge_tpu.io.avi import AviReader
        r = AviReader(str(out))
        assert r.video_frames == 4
        assert r.audio[0].rate == 48000
        pcm = np.frombuffer(
            b"".join(r.read_audio_chunks(0)), np.int16).reshape(-1, 2)
        np.testing.assert_array_equal(pcm, want[:pcm.shape[0]])
        assert pcm.shape[0] >= want.shape[0] - 1920 * 2
