"""QuickTime/MOV container tests (import_mov.c parity: reader,
writer, importer/muxer modules end-to-end)."""

import numpy as np
import pytest

from tcforge_tpu.io import mov


def _write_yv12_mov(path, n=5, w=32, h=16, fps=25.0, audio=False):
    wr = mov.MovWriter(path, w, h, fps, fourcc="yv12",
                       audio_rate=8000 if audio else 0,
                       audio_channels=2)
    for i in range(n):
        y = np.full((h, w), 16 + i * 10, np.uint8)
        u = np.full((h // 2, w // 2), 100 + i, np.uint8)
        v = np.full((h // 2, w // 2), 200 - i, np.uint8)
        wr.write_video_frame((y, u, v))
        if audio:
            t = np.arange(320)
            pcm = (np.sin(t / 10) * 1000).astype(np.int16)
            wr.write_audio(np.stack([pcm, pcm], axis=1))
    wr.close()


class TestRoundtrip:
    def test_yv12_video(self, tmp_path):
        p = str(tmp_path / "a.mov")
        _write_yv12_mov(p)
        r = mov.MovReader(p)
        v = r.video
        assert v is not None
        assert (v.width, v.height) == (32, 16)
        assert abs(v.fps - 25.0) < 1e-6
        locs = v.sample_locations()
        assert len(locs) == 5
        dec = mov.decode_video_sample(v.fourcc, r.read_sample(locs[2]),
                                      32, 16)
        assert dec["y"][0, 0] == 36
        assert dec["u"][0, 0] == 102 and dec["v"][0, 0] == 198
        r.close()

    def test_audio_track(self, tmp_path):
        p = str(tmp_path / "a.mov")
        _write_yv12_mov(p, audio=True)
        r = mov.MovReader(p)
        a = r.audio
        assert a is not None
        assert a.samplerate == 8000 and a.channels == 2
        assert a.fourcc == "sowt"
        locs = a.sample_locations()
        assert len(locs) == 5 * 320           # one stsz entry per frame
        total = sum(sz for _, sz in locs)
        assert total == 5 * 320 * 4
        pcm = mov.decode_audio_bytes(a.fourcc, r.read_sample(locs[0]),
                                     2, 16)
        assert pcm.shape == (1, 2)
        r.close()

    def test_jpeg_video(self, tmp_path):
        p = str(tmp_path / "j.mov")
        wr = mov.MovWriter(p, 32, 16, 10.0, fourcc="jpeg")
        rgb = np.zeros((16, 32, 3), np.uint8)
        rgb[:, :16] = (255, 0, 0)
        wr.write_video_frame(rgb)
        wr.close()
        r = mov.MovReader(p)
        v = r.video
        assert v.fourcc == "jpeg"
        dec = mov.decode_video_sample(
            "jpeg", r.read_sample(v.sample_locations()[0]), 32, 16)
        assert dec["rgb"].shape == (16, 32, 3)
        assert dec["rgb"][0, 0, 0] > 200      # red survives JPEG
        assert dec["rgb"][0, 30, 0] < 60
        r.close()

    def test_raw_rgb(self, tmp_path):
        p = str(tmp_path / "r.mov")
        wr = mov.MovWriter(p, 8, 4, 30.0, fourcc="raw ")
        rgb = np.arange(8 * 4 * 3, dtype=np.uint8).reshape(4, 8, 3)
        wr.write_video_frame(rgb)
        wr.close()
        r = mov.MovReader(p)
        dec = mov.decode_video_sample(
            "raw ", r.read_sample(r.video.sample_locations()[0]), 8, 4)
        assert (dec["rgb"] == rgb).all()
        r.close()


class TestPackedFourccs:
    def test_2vuy(self):
        # u y0 v y1 per pair; 2x2 frame
        data = bytes([100, 10, 200, 20,
                      102, 30, 202, 40])
        dec = mov.decode_video_sample("2vuy", data, 2, 2)
        assert list(dec["y"].ravel()) == [10, 20, 30, 40]
        assert dec["u"][0, 0] == 101 and dec["v"][0, 0] == 201

    def test_yuv2_signed_chroma(self):
        # y0 u y1 v with signed chroma
        data = bytes([10, 0x00, 20, 0x80,
                      30, 0x00, 40, 0x80])
        dec = mov.decode_video_sample("yuv2", data, 2, 2)
        assert list(dec["y"].ravel()) == [10, 20, 30, 40]
        assert dec["u"][0, 0] == 128          # 0 signed -> 128
        assert dec["v"][0, 0] == 0            # -128 signed -> 0

    def test_unsupported_fourcc(self):
        with pytest.raises(NotImplementedError):
            mov.decode_video_sample("avc1", b"", 2, 2)


class TestAudioFourccs:
    def test_twos_be(self):
        pcm = mov.decode_audio_bytes("twos",
                                     np.array([1000, -1000],
                                              ">i2").tobytes(), 2, 16)
        assert list(pcm.ravel()) == [1000, -1000]

    def test_raw_unsigned8(self):
        pcm = mov.decode_audio_bytes("raw ", bytes([128, 255, 0, 128]),
                                     2, 8)
        assert pcm[0, 0] == 0 and pcm[0, 1] == 127 << 8
        assert pcm[1, 0] == -128 << 8


class TestEndToEnd:
    def test_probe(self, tmp_path):
        p = str(tmp_path / "a.mov")
        _write_yv12_mov(p, audio=True)
        from tcforge_tpu.io.probe import probe_file
        from tcforge_tpu.core.codecs import ContainerFormat
        info = probe_file(p)
        assert info.magic == ContainerFormat.MOV

    def test_cli_mov_to_y4m(self, tmp_path):
        p = str(tmp_path / "a.mov")
        _write_yv12_mov(p, n=6)
        out = str(tmp_path / "o.y4m")
        from tcforge_tpu.cli import main
        rc = main(["-i", p, "-o", out, "-y", "raw,null,y4m"])
        assert rc == 0
        from tcforge_tpu.io.y4m import Y4MReader
        r = Y4MReader(out)
        n = 0
        planes = r.read_frame()
        first_y = planes[0][0, 0]
        while planes is not None:
            n += 1
            planes = r.read_frame()
        assert n == 6
        assert first_y == 16

    def test_cli_y4m_to_mov_jpeg(self, tmp_path):
        from tcforge_tpu.io.y4m import Y4MWriter, Y4MHeader
        src = str(tmp_path / "in.y4m")
        w = Y4MWriter(src, Y4MHeader(width=32, height=16, fps_num=25,
                                     fps_den=1))
        c = np.full((8, 16), 128, np.uint8)
        for i in range(4):
            w.write_frame(np.full((16, 32), 60 + i * 20, np.uint8), c, c)
        w.close()
        out = str(tmp_path / "o.mov")
        from tcforge_tpu.cli import main
        rc = main(["-i", src, "-o", out, "-y", "movjpeg,null,mov"])
        assert rc == 0
        r = mov.MovReader(out)
        v = r.video
        assert v.fourcc == "jpeg"
        locs = v.sample_locations()
        assert len(locs) == 4
        dec = mov.decode_video_sample("jpeg", r.read_sample(locs[0]),
                                      32, 16)
        # grey Y=60 frame: RGB all within a few steps of 52 (bt601)
        assert abs(int(dec["rgb"][4, 4, 1]) - 51) < 12
        r.close()

    def test_mov_roundtrip_through_cli(self, tmp_path):
        """mov(yv12) -> chain -> mov(yv12) keeps geometry + count."""
        p = str(tmp_path / "a.mov")
        _write_yv12_mov(p, n=3)
        out = str(tmp_path / "o.mov")
        from tcforge_tpu.cli import main
        rc = main(["-i", p, "-o", out, "-y", "raw,null,mov"])
        assert rc == 0
        r = mov.MovReader(out)
        assert len(r.video.sample_locations()) == 3
        dec = mov.decode_video_sample(
            r.video.fourcc,
            r.read_sample(r.video.sample_locations()[0]), 32, 16)
        assert dec["y"][0, 0] == 16
        r.close()
