"""tcextract / tcscan payload breadth (extract_ac3.c, extract_ogm.c,
extract_lzo.c, extract_rgb.c, scan_pes.c, tcscan.c roles)."""

import io
import struct

import numpy as np
import pytest

from tcforge_tpu.tools import tcextract, tcscan


def _seq_header(w=64, h=48, bitrate_400=2500):
    b4 = (w >> 4) & 0xFF
    b5 = ((w & 0xF) << 4) | ((h >> 8) & 0xF)
    b6 = h & 0xFF
    b7 = (2 << 4) | 3            # aspect 4:3, 25 fps
    word = (bitrate_400 << 6) | (1 << 5) | 0x10
    return (bytes([0, 0, 1, 0xB3, b4, b5, b6, b7])
            + word.to_bytes(3, "big") + b"\x00\x00")


def _make_ps(path, ac3=b"", lpcm_pcm=None, vag=b"", n_video=3):
    """Hand-rolled program stream with video + substream tracks."""
    from tcforge_tpu.io import psmux
    with open(path, "wb") as f:
        f.write(psmux.pack_header(0))
        f.write(psmux.system_header(True))
        for i in range(n_video):
            f.write(psmux.pes_packet(0xE0, _seq_header()
                                     + bytes([0, 0, 1, 0, i, 0])))
        if ac3:
            f.write(psmux.pes_packet(
                0xBD, bytes([0x80, 1, 0, 0]) + ac3))
        if lpcm_pcm is not None:
            f.write(psmux.lpcm_packet(lpcm_pcm, 48000, 1))
        if vag:
            f.write(psmux.pes_packet(
                0xBD, bytes([0xFF, 1, 0, 0]) + vag))
        f.write(b"\x00\x00\x01\xB9")


class TestExtractPs1:
    def test_ac3_substream(self, tmp_path):
        src = tmp_path / "a.vob"
        payload = bytes(range(256)) * 4
        _make_ps(src, ac3=payload)
        out = tmp_path / "a.ac3"
        rc = tcextract.main(["-i", str(src), "-x", "ac3",
                             "-o", str(out)])
        assert rc == 0
        assert out.read_bytes() == payload

    def test_lpcm_raw_bigendian(self, tmp_path):
        src = tmp_path / "a.vob"
        pcm = (np.arange(2 * 300, dtype=np.int16)
               .reshape(300, 2) * 17)
        _make_ps(src, lpcm_pcm=pcm)
        out = tmp_path / "a.pcm"
        rc = tcextract.main(["-i", str(src), "-x", "lpcm",
                             "-o", str(out)])
        assert rc == 0
        got = np.frombuffer(out.read_bytes(), ">i2")
        np.testing.assert_array_equal(
            got[:600], pcm.astype(">i2").ravel().astype(np.int16))

    def test_vag_substream(self, tmp_path):
        src = tmp_path / "a.vob"
        payload = b"\x07" * 512
        _make_ps(src, vag=payload)
        out = tmp_path / "a.vag"
        rc = tcextract.main(["-i", str(src), "-x", "vag",
                             "-o", str(out)])
        assert rc == 0
        assert out.read_bytes() == payload

    def test_ps1_raw_packets(self, tmp_path):
        src = tmp_path / "a.vob"
        _make_ps(src, ac3=b"XYZ" * 10)
        out = tmp_path / "a.ps1"
        rc = tcextract.main(["-i", str(src), "-x", "ps1",
                             "-o", str(out)])
        assert rc == 0
        data = out.read_bytes()
        assert data.startswith(bytes([0x80, 1, 0, 0]))


class TestExtractOgg:
    def _build_ogg(self, path, vorbis_pkts, ogm_video_pkts):
        from tcforge_tpu.io import ogg as O
        with open(path, "wb") as f:
            wv = O.OggPageWriter(f, serial=111)   # fake vorbis
            wo = O.OggPageWriter(f, serial=222)   # OGM video
            # BOS pages first (both), then data
            vid_id = b"\x01vorbis" + b"\x00" * 4 + bytes([2]) \
                + struct.pack("<I", 44100) + b"\x00" * 12
            wv.write_packet(vid_id, 0, flush=True)
            hdr = O.ogm_video_header("mp4v", 64, 48, 25.0)
            wo.write_packet(hdr, 0, flush=True)
            for i, p in enumerate(vorbis_pkts):
                wv.write_packet(p, i + 1, flush=True)
            for i, p in enumerate(ogm_video_pkts):
                wo.write_packet(O.ogm_data_packet(p), i + 1,
                                flush=True)
            wv.close()
            wo.close()

    def test_vorbis_standalone_ogg(self, tmp_path):
        from tcforge_tpu.io import ogg as O
        src = tmp_path / "in.ogg"
        vp = [b"VORBISDATA%d" % i for i in range(5)]
        self._build_ogg(src, vp, [b"frame"])
        out = tmp_path / "out.ogg"
        rc = tcextract.main(["-i", str(src), "-x", "vorbis",
                             "-o", str(out)])
        assert rc == 0
        with open(out, "rb") as f:
            streams = O.identify_streams(f)
            assert [s.codec for s in streams] == ["vorbis"]
            f.seek(0)
            pkts = [p for _, p in
                    O.pages_to_packets(O.iter_pages(f), 111)]
        assert pkts[1:] == vp                 # id header + data

    def test_ogm_video_es(self, tmp_path):
        src = tmp_path / "in.ogg"
        frames = [b"ES%d" % i * 20 for i in range(4)]
        self._build_ogg(src, [b"x"], frames)
        out = tmp_path / "out.m4v"
        rc = tcextract.main(["-i", str(src), "-x", "video",
                             "-o", str(out)])
        assert rc == 0
        assert out.read_bytes() == b"".join(frames)


class TestExtractAvi:
    def test_rgb_and_lzo_modes_passthrough(self, tmp_path):
        from tcforge_tpu.io.avi import (AviReader, AviVideoStream,
                                        AviWriter)
        src = tmp_path / "x.avi"
        frames = [bytes([i]) * 100 for i in range(5)]
        w = AviWriter(str(src),
                      AviVideoStream(fourcc="RGB2", width=10,
                                     height=10, fps=25.0))
        for fr in frames:
            w.write_video_frame(fr, keyframe=True)
        w.close()
        for mode in ("rgb", "lzo", "video"):
            out = tmp_path / f"o.{mode}"
            rc = tcextract.main(["-i", str(src), "-x", mode,
                                 "-o", str(out)])
            assert rc == 0
            assert out.read_bytes() == b"".join(frames)


class TestScan:
    def test_mpeg_pes_scan(self, tmp_path, capsys):
        src = tmp_path / "a.vob"
        pcm = np.zeros((300, 2), np.int16)
        _make_ps(src, ac3=b"\x00" * 100, lpcm_pcm=pcm, n_video=4)
        rc = tcscan.main(["-i", str(src)])
        assert rc == 0
        out = capsys.readouterr().out
        assert "stream id [0xe0]" in out
        assert "found AC3 audio track 0" in out
        assert "found LPCM audio track 0" in out
        assert "4 MPEG video sequence(s)" in out
        assert "Average Bitrate is 1000000" in out   # 2500*400

    def test_ac3_scan(self, tmp_path, capsys):
        from tcforge_tpu.io.ac3 import parse_frame_header
        # build syncframes: 48 kHz, 128 kbps -> frmsizecod 16
        hdr = bytes([0x0B, 0x77, 0, 0, (0 << 6) | 16, 8, 0x40])
        fr = parse_frame_header(hdr)
        assert fr.size == 512 and fr.rate == 48000
        frame = hdr + b"\x00" * (fr.size - len(hdr))
        src = tmp_path / "a.ac3"
        src.write_bytes(frame * 10)
        rc = tcscan.main(["-i", str(src), "-x", "ac3"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Found 10 AC3 frames" in out
        assert "bitrate 128 kbps (cbr)" in out

    def test_mp3_scan(self, tmp_path, capsys):
        from tcforge_tpu.native import av
        if not av.available():
            pytest.skip("bridge not built")
        enc = av.AvAudioEncoder("mp3", 44100, 2, 128000)
        pcm = (np.sin(np.arange(44100 * 2) / 20) * 20000) \
            .astype(np.int16)
        enc.feed(pcm.reshape(-1, 2))
        enc.flush()
        data = enc.read()
        src = tmp_path / "a.mp3"
        src.write_bytes(bytes(data))
        rc = tcscan.main(["-i", str(src), "-x", "mp3"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "MPEG layer-3 stream" in out
        assert "MP3 chunks" in out

    def test_avi_scan(self, tmp_path, capsys):
        from tcforge_tpu.io.avi import AviVideoStream, AviWriter
        src = tmp_path / "x.avi"
        w = AviWriter(str(src),
                      AviVideoStream(fourcc="I420", width=32,
                                     height=24, fps=25.0))
        for i in range(6):
            w.write_video_frame(b"\x10" * (32 * 24 * 3 // 2),
                                keyframe=True)
        w.close()
        rc = tcscan.main(["-i", str(src)])
        assert rc == 0
        out = capsys.readouterr().out
        assert "6 frames 32x24 'I420'" in out


class TestExtractLavfFallback:
    """Containers only libavformat demuxes (mkv/mxf/asf...) extract
    their stored packets via the bridge (extract_mxf.c role)."""

    def test_mkv_h264_packet_passthrough(self, tmp_path):
        from tcforge_tpu.native import av
        if not av.available():
            pytest.skip("bridge not built")
        h, w = 48, 64
        enc = av.AvVideoEncoder("libx264", w, h, 25.0,
                                bitrate=300_000, gop=8,
                                global_header=True)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        pkts = []
        for i in range(6):
            y = np.full((h, w), 30 * i + 10, np.uint8)
            pkts += enc.encode(y, u, u)
        pkts += enc.flush()
        mkv = str(tmp_path / "p.mkv")
        mux = av.AvMuxer(mkv, "matroska")
        vi = mux.add_video("h264", w, h, 25.0,
                           extradata=enc.extradata)
        mux.write_header()
        for i, (p, k) in enumerate(pkts):
            mux.write(vi, p, i, 1, k)
        mux.close()

        out = tmp_path / "o.264"
        rc = tcextract.main(["-i", mkv, "-x", "video",
                             "-o", str(out)])
        assert rc == 0
        # stored payloads out verbatim, in order (the muxer may have
        # converted annex-b to AVCC at write time, so compare against
        # what the demuxer reports as stored)
        pk = av.AvFilePackets(mkv)
        assert pk.codec == "h264"
        want = b"".join(pk)
        pk.close()
        assert len(want) > 0
        assert out.read_bytes() == want
