"""OGG container layer tests (probe_ogg.c / ogmstreams.h parity)."""

import io
import struct

import numpy as np

from tcforge_tpu.io import ogg


def make_page(serial, seq, packets, bos=False, eos=False,
              continued=False, granule=0):
    """Build a well-formed page holding whole `packets`."""
    lacing = []
    body = b""
    for pkt in packets:
        n = len(pkt)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)
        body += pkt
    htype = (1 if continued else 0) | (2 if bos else 0) \
        | (4 if eos else 0)
    hdr = (b"OggS" + struct.pack("<BBqIIIB", 0, htype, granule,
                                 serial, seq, 0, len(lacing))
           + bytes(lacing))
    page = hdr + body
    crc = ogg.ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def vorbis_bos():
    return (b"\x01vorbis" + struct.pack("<IBI", 0, 2, 44100)
            + struct.pack("<iii", 0, 128000, 0) + b"\xb8\x01")


def theora_bos():
    return (b"\x80theora" + bytes([3, 2, 1])
            + struct.pack(">HH", 40, 30)          # frame macroblocks
            + (640).to_bytes(3, "big") + (480).to_bytes(3, "big")
            + bytes([0, 0])                       # pic offsets
            + struct.pack(">II", 30000, 1001)
            + bytes(10))


def ogm_video_bos():
    h = (b"\x01video\x00\x00\x00" + b"DIV3"
         + struct.pack("<i", 52)
         + struct.pack("<qq", 400000, 0)          # 25 fps time unit
         + struct.pack("<i", 1)
         + struct.pack("<i", 0) + struct.pack("<H", 0)
         + struct.pack("<H", 0)
         + struct.pack("<ii", 352, 288))
    return h


class TestCrc:
    def test_crc_known_zero(self):
        assert ogg.ogg_crc(b"") == 0

    def test_page_roundtrip_crc(self):
        pg = make_page(7, 0, [b"hello"], bos=True)
        pages = list(ogg.iter_pages(io.BytesIO(pg), check_crc=True))
        assert len(pages) == 1
        assert pages[0].serial == 7 and pages[0].bos

    def test_bad_crc_skipped(self):
        pg = bytearray(make_page(7, 0, [b"hello"], bos=True))
        pg[30] ^= 0xFF                      # corrupt body
        pages = list(ogg.iter_pages(io.BytesIO(bytes(pg)),
                                    check_crc=True))
        assert pages == []


class TestPackets:
    def test_simple_packets(self):
        pg = make_page(1, 0, [b"aa", b"bbb"], bos=True)
        pkts = list(ogg.pages_to_packets(
            ogg.iter_pages(io.BytesIO(pg))))
        assert pkts == [(1, b"aa"), (1, b"bbb")]

    def test_packet_spanning_pages(self):
        big = bytes(600)                    # needs 255,255,90 lacing
        p1_body = big[:510]
        # page 1 carries two full 255 segments (unterminated)
        hdr = (b"OggS" + struct.pack("<BBqIIIB", 0, 2, 0, 1, 0, 0, 2)
               + bytes([255, 255]) + p1_body)
        crc = ogg.ogg_crc(hdr)
        page1 = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
        page2 = make_page(1, 1, [big[510:]], continued=True)
        stream = io.BytesIO(page1 + page2)
        pkts = list(ogg.pages_to_packets(ogg.iter_pages(stream)))
        assert pkts == [(1, big)]

    def test_resync_on_garbage(self):
        pg = make_page(1, 0, [b"ok"], bos=True)
        stream = io.BytesIO(b"garbagegarbage" + pg)
        pages = list(ogg.iter_pages(stream))
        assert len(pages) == 1

    def test_serial_filter(self):
        pgs = make_page(1, 0, [b"a"], bos=True) + \
            make_page(2, 0, [b"b"], bos=True)
        pkts = list(ogg.pages_to_packets(
            ogg.iter_pages(io.BytesIO(pgs)), serial=2))
        assert pkts == [(2, b"b")]


class TestIdentify:
    def test_vorbis(self):
        s = ogg.identify_bos(vorbis_bos())
        assert s.kind == "audio" and s.codec == "vorbis"
        assert s.channels == 2 and s.samplerate == 44100

    def test_theora(self):
        s = ogg.identify_bos(theora_bos())
        assert s.kind == "video" and s.codec == "theora"
        assert (s.width, s.height) == (640, 480)
        assert abs(s.fps - 29.97) < 0.01

    def test_ogm_video(self):
        s = ogg.identify_bos(ogm_video_bos())
        assert s.kind == "video" and s.codec == "DIV3"
        assert (s.width, s.height) == (352, 288)
        assert abs(s.fps - 25.0) < 1e-9

    def test_unknown(self):
        s = ogg.identify_bos(b"\x55random")
        assert s.codec == "unknown"

    def test_identify_streams_multi(self, tmp_path):
        data = (make_page(10, 0, [theora_bos()], bos=True)
                + make_page(20, 0, [vorbis_bos()], bos=True)
                + make_page(10, 1, [b"frame"])
                + make_page(20, 1, [b"audio"]))
        streams = ogg.identify_streams(io.BytesIO(data))
        assert [s.codec for s in streams] == ["theora", "vorbis"]
        assert streams[0].serial == 10


class TestExtractAndTools:
    def _file(self, tmp_path):
        data = (make_page(10, 0, [theora_bos()], bos=True)
                + make_page(20, 0, [vorbis_bos()], bos=True)
                + make_page(10, 1, [b"frame0"])
                + make_page(20, 1, [b"aud0"])
                + make_page(10, 2, [b"frame1"], eos=True)
                + make_page(20, 2, [b"aud1"], eos=True))
        p = str(tmp_path / "a.ogg")
        with open(p, "wb") as f:
            f.write(data)
        return p

    def test_extract_stream(self, tmp_path):
        p = self._file(tmp_path)
        out = io.BytesIO()
        with open(p, "rb") as f:
            n = ogg.extract_stream(f, out, 20)
        assert n == 3
        out.seek(0)
        pkts = list(ogg.pages_to_packets(ogg.iter_pages(out)))
        assert pkts[1:] == [(20, b"aud0"), (20, b"aud1")]

    def test_probe_file(self, tmp_path):
        p = self._file(tmp_path)
        from tcforge_tpu.io.probe import probe_file
        from tcforge_tpu.core.codecs import Codec, ContainerFormat
        info = probe_file(p)
        assert info.magic == ContainerFormat.OGG
        assert info.is_video and (info.width, info.height) == (640, 480)
        assert info.codec == Codec.THEORA
        assert info.tracks and info.tracks[0].codec == Codec.VORBIS
        assert info.tracks[0].samplerate == 44100

    def test_tcdemux_ogg(self, tmp_path, capsys):
        p = self._file(tmp_path)
        from tcforge_tpu.tools.tcdemux import main
        rc = main(["-i", p, "-o", str(tmp_path / "out")])
        assert rc == 0
        txt = capsys.readouterr().out
        assert "theora 640x480" in txt
        assert "vorbis" in txt
        import os
        assert os.path.exists(str(tmp_path / "out-0000000a.ogg"))
        assert os.path.exists(str(tmp_path / "out-00000014.ogg"))


class TestOgmInterop:
    def test_audio_header_rate_convention(self):
        """libavformat derives rate = spu * 1e7 / time_unit from the
        OGM audio header; the header must carry time_unit = 1e7 and
        spu = rate (packing time_unit = 1e7/rate squares the rate
        and overflows int32 downstream)."""
        import struct
        from tcforge_tpu.io.ogg import ogm_audio_header
        hdr = ogm_audio_header(48000, 2, 16, 4)
        tu, spu = struct.unpack("<qq", hdr[17:33])
        assert spu * 10_000_000 // tu == 48000
        assert struct.unpack("<hh", hdr[45:49]) == (2, 4)
        assert struct.unpack("<I", hdr[49:53])[0] == 48000 * 2 * 2

    def test_ogm_streams_carry_two_headers(self, tmp_path):
        """OGM logical streams need BOS + comment header packets —
        demuxers (oggparseogm.c) wait for both."""
        import numpy as np
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io.ogg import iter_pages, pages_to_packets
        from tcforge_tpu.modules.registry import ModuleKind, new_module

        job = Job()
        job.ex_v_width, job.ex_v_height = 32, 32
        job.fps = 25.0
        job.dm_chan, job.dm_bits = 2, 16
        job.a_rate = 48000
        mux = new_module(ModuleKind.MULTIPLEXOR, "ogg", job,
                         "fourcc=RGB4")
        p = tmp_path / "two.ogg"
        mux.open(str(p))
        mux.write_video(b"\x00" * 128)
        mux.write_audio(b"\x00" * 192)
        mux.close()
        with open(p, "rb") as f:
            pkts = {}
            for ser, pkt in pages_to_packets(iter_pages(f)):
                pkts.setdefault(ser, []).append(pkt)
        for ser, lst in pkts.items():
            heads = [q for q in lst if q and (q[0] & 1)]
            assert len(heads) == 2, f"stream {ser:#x}"
            assert heads[1][0] == 0x03
