"""MPEG transport stream demux (io/ts.py, ts_reader.c analogue):
packetization round trip, PAT/PMT video-PID discovery, --ts_pid, TS
input through the production pipeline, tccat -x video on TS."""

import numpy as np
import pytest

from tcforge_tpu.io import ts as tsio


@pytest.fixture(scope="module", autouse=True)
def _need_native():
    from tcforge_tpu import native
    if not native.available():
        pytest.skip("native library not built")


W, H, N = 64, 48, 12


def _es():
    from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
    rng = np.random.default_rng(11)
    enc = Mpeg2FullEncoder(W, H, 25.0, qscale=2, gop_n=6, gop_m=2,
                           search_range=4)
    base = rng.integers(0, 256, (H + 32, W + 32), np.uint8)
    frames = []
    out = b""
    for i in range(N):
        y = base[i:i + H, i:i + W].copy()
        u = np.full((H // 2, W // 2), 80, np.uint8)
        v = np.full((H // 2, W // 2), 160, np.uint8)
        frames.append((y, u, v))
        out += enc.push_frame(y, u, v)
    return out + enc.flush(), frames


class TestTsLayer:
    def test_es_roundtrip_with_psi(self, tmp_path):
        es, _ = _es()
        p = tmp_path / "a.ts"
        p.write_bytes(tsio.wrap_ts(es, pid=0x100))
        back = b"".join(tsio.iter_video_es(str(p)))
        assert back == es

    def test_pid_autodetect_via_pat_pmt(self, tmp_path):
        es, _ = _es()
        p = tmp_path / "a.ts"
        p.write_bytes(tsio.wrap_ts(es, pid=0x1E1))
        assert tsio.find_video_pid(str(p)) == 0x1E1

    def test_pid_fallback_without_psi(self, tmp_path):
        es, _ = _es()
        p = tmp_path / "b.ts"
        p.write_bytes(tsio.wrap_ts(es, pid=0x42, with_psi=False))
        assert tsio.find_video_pid(str(p)) == 0x42
        back = b"".join(tsio.iter_video_es(str(p)))
        assert back == es

    def test_explicit_pid_filter(self, tmp_path):
        es, _ = _es()
        # two programs: the wanted pid second in the mux
        other = tsio.wrap_ts(b"\x00\x00\x01\xe0junk" * 50, pid=0x50,
                             with_psi=False)
        want = tsio.wrap_ts(es, pid=0x60, with_psi=False)
        p = tmp_path / "c.ts"
        p.write_bytes(other + want)
        back = b"".join(tsio.iter_video_es(str(p), pid=0x60))
        assert back == es

    def test_sniff(self, tmp_path):
        es, _ = _es()
        ts = tsio.wrap_ts(es)
        assert tsio.sniff_ts(ts[:400])
        assert not tsio.sniff_ts(es[:400])
        from tcforge_tpu.core.codecs import ContainerFormat
        from tcforge_tpu.io.probe import probe_file, sniff_magic
        p = tmp_path / "a.ts"
        p.write_bytes(ts)
        assert sniff_magic(str(p)) == ContainerFormat.MPEG_TS
        info = probe_file(str(p))
        assert info.is_video and (info.width, info.height) == (W, H)


class TestTsPipeline:
    def test_cli_ts_to_y4m(self, tmp_path):
        from tcforge_tpu.cli import main
        from tcforge_tpu.io.y4m import Y4MReader
        es, frames = _es()
        p = tmp_path / "in.ts"
        p.write_bytes(tsio.wrap_ts(es))
        out = tmp_path / "o.y4m"
        rc = main(["-i", str(p), "-o", str(out), "--progress_off",
                   "-q"])
        assert rc == 0
        with Y4MReader(str(out)) as r:
            got = list(r)
        assert len(got) == N
        y0 = frames[0][0].astype(float)
        mse = np.mean((got[0][0].astype(float) - y0) ** 2)
        assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 35

    def test_ts_pid_option(self, tmp_path):
        from tcforge_tpu.cli import main
        from tcforge_tpu.io.y4m import Y4MReader
        es, _ = _es()
        p = tmp_path / "in.ts"
        p.write_bytes(tsio.wrap_ts(es, pid=0x1E0, with_psi=False))
        out = tmp_path / "o.y4m"
        rc = main(["-i", str(p), "--ts_pid", "0x1e0", "-o", str(out),
                   "--progress_off", "-q"])
        assert rc == 0
        with Y4MReader(str(out)) as r:
            assert len(list(r)) == N


class TestTccatTs:
    def test_extract_video_es(self, tmp_path, capsys):
        from tcforge_tpu.tools.tccat import main as tccat
        es, _ = _es()
        p = tmp_path / "in.ts"
        p.write_bytes(tsio.wrap_ts(es))
        out = tmp_path / "out.m2v"
        rc = tccat(["-i", str(p), "-x", "video", "-o", str(out)])
        assert rc in (0, None)
        assert out.read_bytes() == es


class TestProgramScan:
    def test_pmt_census_reports_audio(self, tmp_path):
        """scan_programs + tcprobe list the PMT's audio streams."""
        import struct
        from tcforge_tpu.io import ts as T

        def section(table_id, body, ext):
            s = bytes([table_id]) + struct.pack(
                ">H", 0xB000 | (len(body) + 9)) \
                + struct.pack(">H", ext) + bytes([0xC1, 0, 0]) + body
            return s + struct.pack(">I", T._mpeg_crc32(s))

        def psi_packet(pid, payload, counter=0):
            body = b"\x00" + payload
            pad = T.TS_PACKET - 4 - len(body)
            hdr = bytes([T.SYNC, 0x40 | (pid >> 8), pid & 0xFF,
                         0x10 | counter])
            return hdr + body + b"\xff" * pad

        vpid, apid = 0x100, 0x101
        pat = section(0x00, struct.pack(">HH", 1, 0xE000 | 0x20), 1)
        es = (bytes([0x02, 0xE0 | (vpid >> 8), vpid & 0xFF, 0xF0, 0])
              + bytes([0x03, 0xE0 | (apid >> 8), apid & 0xFF,
                       0xF0, 0]))
        pmt = section(0x02, struct.pack(">H", 0xE000 | vpid)
                      + b"\xF0\x00" + es, 1)
        p = tmp_path / "prog.ts"
        p.write_bytes(psi_packet(0, pat) + psi_packet(0x20, pmt)
                      + psi_packet(vpid, b"\x00\x00\x01\xe0\x00\x00"))
        streams = T.scan_programs(str(p))
        assert streams == {vpid: 0x02, apid: 0x03}

        from tcforge_tpu.io.probe import probe_file
        info = probe_file(str(p))
        assert len(info.tracks) == 1
        assert info.tracks[0].lavf_codec == "mp2"


class TestTsAudioImport:
    def test_ts_with_mp2_audio_imports_av(self, tmp_path):
        """TS with a PMT audio stream: the mpeg importer decodes the
        audio through the bridge alongside the video ES."""
        import struct
        from tcforge_tpu.io import ts as T
        from tcforge_tpu.native import av
        if not av.available():
            pytest.skip("bridge not built")
        # real MP2 audio bytes
        enc = av.AvAudioEncoder("mp2", 48000, 2, 192000)
        pcm = (np.sin(np.arange(48000) / 20) * 18000).astype(np.int16)
        enc.feed(pcm.reshape(-1, 2))
        enc.flush()
        mp2 = bytes(enc.read())
        # real MPEG-2 video ES (native encoder, a few frames)
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        venc = Mpeg2FullEncoder(64, 48, 25.0, gop_n=4)
        rng = np.random.default_rng(0)
        es = b""
        for i in range(4):
            y = rng.integers(0, 256, (48, 64), np.uint8)
            u = rng.integers(0, 256, (24, 32), np.uint8)
            es += venc.push_frame(y, u, u)
        es += venc.flush()

        def section(table_id, body, ext):
            s = bytes([table_id]) + struct.pack(
                ">H", 0xB000 | (len(body) + 9)) \
                + struct.pack(">H", ext) + bytes([0xC1, 0, 0]) + body
            return s + struct.pack(">I", T._mpeg_crc32(s))

        def psi_packet(pid, payload):
            body = b"\x00" + payload
            pad = T.TS_PACKET - 4 - len(body)
            hdr = bytes([T.SYNC, 0x40 | (pid >> 8), pid & 0xFF, 0x10])
            return hdr + body + b"\xff" * pad

        def pes_packets(pid, stream_id, payload):
            pes = (b"\x00\x00\x01" + bytes([stream_id])
                   + b"\x00\x00\x80\x00\x00" + payload)
            out = bytearray()
            counter = 0
            pos = 0
            first = True
            while pos < len(pes):
                take = min(T.TS_PACKET - 4, len(pes) - pos)
                body = pes[pos:pos + take]
                pad = T.TS_PACKET - 4 - len(body)
                hdr = bytes([T.SYNC,
                             (0x40 if first else 0) | (pid >> 8),
                             pid & 0xFF, 0x10 | (counter & 0xF)])
                if pad:
                    hdr = hdr[:3] + bytes([hdr[3] | 0x20])
                    af = bytes([pad - 1]) + (b"\x00" + b"\xff"
                                             * (pad - 2)
                                             if pad > 1 else b"")
                    out += hdr + af + body
                else:
                    out += hdr + body
                counter += 1
                pos += take
                first = False
            return bytes(out)

        vpid, apid = 0x100, 0x101
        pat = section(0x00, struct.pack(">HH", 1, 0xE000 | 0x20), 1)
        esinfo = (bytes([0x02, 0xE0 | (vpid >> 8), vpid & 0xFF,
                         0xF0, 0])
                  + bytes([0x03, 0xE0 | (apid >> 8), apid & 0xFF,
                           0xF0, 0]))
        pmt = section(0x02, struct.pack(">H", 0xE000 | vpid)
                      + b"\xF0\x00" + esinfo, 1)
        tsf = tmp_path / "av.ts"
        tsf.write_bytes(psi_packet(0, pat) + psi_packet(0x20, pmt)
                        + pes_packets(vpid, 0xE0, es)
                        + pes_packets(apid, 0xC0, mp2))

        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mpeg", Job())
        imp.open(str(tsf))
        assert (imp.width, imp.height) == (64, 48)
        assert imp.audio_rate == 48000
        b = imp.read_video_batch(8)
        assert b["y"].shape[0] == 4
        a = imp.read_audio_batch(40000)
        assert a is not None and a.shape[1] == 2 and len(a) > 20000
        imp.close()


class TestCdxa:
    """RIFF/CDXA (VideoCD rip) unwrapping -> normal PS import."""

    def _make_cdxa(self, tmp_path, n=6):
        from tcforge_tpu.io import cdxa
        from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
        from tcforge_tpu.io import psmux
        import io as _io
        venc = Mpeg2FullEncoder(64, 48, 25.0, gop_n=4)
        rng = np.random.default_rng(1)
        frames = [(rng.integers(0, 256, (48, 64), np.uint8),
                   rng.integers(0, 256, (24, 32), np.uint8))
                  for _ in range(n)]
        buf = _io.BytesIO()
        w = psmux.PsWriter(buf, fps=25.0)
        for y, u in frames:
            w.write_video(venc.push_frame(y, u, u))
        w.write_video(venc.flush())
        w.close()
        ps = buf.getvalue()
        p = tmp_path / "track.dat"
        p.write_bytes(cdxa.wrap_ps(ps))
        return p, ps, n

    def test_unwrap_roundtrip(self, tmp_path):
        from tcforge_tpu.io.cdxa import cdxa_to_ps
        p, ps, _ = self._make_cdxa(tmp_path)
        got = cdxa_to_ps(str(p))
        assert got[:len(ps)] == ps     # zero-padded final sector

    def test_imports_as_program_stream(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        p, _, n = self._make_cdxa(tmp_path)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "mpeg", Job())
        imp.open(str(p))
        assert (imp.width, imp.height) == (64, 48)
        b = imp.read_video_batch(16)
        imp.close()
        assert b["y"].shape[0] == n

    def test_engine_auto_route(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        p, _, n = self._make_cdxa(tmp_path)
        out = tmp_path / "o.y4m"
        job = Job(video_in_file=str(p), video_out_file=str(out),
                  im_v_module="auto", ex_m_module="y4m", batch_size=4)
        c = Pipeline(job).run(progress=False)
        assert c.encoded == n

    def test_tcextract_video_from_cdxa(self, tmp_path):
        from tcforge_tpu.tools import tcextract
        p, _, _ = self._make_cdxa(tmp_path)
        o = tmp_path / "o.m2v"
        rc = tcextract.main(["-i", str(p), "-x", "video",
                             "-o", str(o)])
        assert rc == 0
        data = o.read_bytes()
        assert data.startswith(b"\x00\x00\x01\xb3")   # sequence hdr
