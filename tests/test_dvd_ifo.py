"""DVD IFO title navigation (decrypted VIDEO_TS rips) — io/ifo.py +
the dvd importer's native path."""

import os
import struct

import numpy as np
import pytest

from tcforge_tpu.io import ifo


def make_vmg(titles):
    """Synthesize a minimal VIDEO_TS.IFO: VMGI_MAT with a TT_SRPT
    pointer + the title table ([(vts, vts_ttn, chapters, angles)])."""
    blob = bytearray(4 * ifo.SECTOR)
    blob[0:12] = b"DVDVIDEO-VMG"
    struct.pack_into(">I", blob, 0xC4, 1)       # TT_SRPT at sector 1
    base = ifo.SECTOR
    struct.pack_into(">H", blob, base, len(titles))
    struct.pack_into(">I", blob, base + 4,
                     8 + 12 * len(titles) - 1)
    pos = base + 8
    for vts, ttn, chapters, angles in titles:
        blob[pos] = 0x38                        # playback type
        blob[pos + 1] = angles
        struct.pack_into(">H", blob, pos + 2, chapters)
        blob[pos + 6] = vts
        blob[pos + 7] = ttn
        struct.pack_into(">I", blob, pos + 8, 100)
        pos += 12
    return bytes(blob)


def _vob_bytes(n=6, w=64, h=48, qscale=4):
    from tcforge_tpu.io.mpeg2enc import Mpeg2FullEncoder
    from tcforge_tpu.io.psmux import PsWriter
    import io as _io
    rng = np.random.default_rng(1)
    enc = Mpeg2FullEncoder(w, h, 25.0, qscale=qscale, gop_n=3,
                           gop_m=1, search_range=2)
    buf = _io.BytesIO()
    ps = PsWriter(buf, fps=25.0)
    for _ in range(n):
        ps.write_video(enc.push_frame(
            rng.integers(0, 256, (h, w), np.uint8),
            np.full((h // 2, w // 2), 100, np.uint8),
            np.full((h // 2, w // 2), 150, np.uint8)))
    ps.write_video(enc.flush())
    ps.close()
    return buf.getvalue()


@pytest.fixture(scope="module")
def _native():
    from tcforge_tpu import native as n
    if not n.available():
        pytest.skip("native library not built")


class TestIfoTables:
    def test_tt_srpt_parse(self):
        vmg = make_vmg([(1, 1, 5, 1), (2, 1, 12, 3)])
        ts = ifo.parse_tt_srpt(vmg)
        assert len(ts) == 2
        assert ts[0].vts == 1 and ts[0].chapters == 5
        assert ts[1].vts == 2 and ts[1].chapters == 12
        assert ts[1].angles == 3

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="VMG"):
            ifo.parse_tt_srpt(b"JUNK" * 1024)

    def test_find_video_ts(self, tmp_path):
        d = tmp_path / "rip" / "VIDEO_TS"
        d.mkdir(parents=True)
        assert ifo.find_video_ts(str(tmp_path / "rip")) == str(d)
        assert ifo.find_video_ts(str(d)) == str(d)
        assert ifo.find_video_ts(str(tmp_path)) is None


class TestTitleNavigation:
    def _make_rip(self, tmp_path, vob):
        d = tmp_path / "VIDEO_TS"
        d.mkdir()
        (d / "VIDEO_TS.IFO").write_bytes(
            make_vmg([(1, 1, 3, 1), (2, 1, 1, 1)]))
        (d / "VTS_01_1.VOB").write_bytes(vob)
        (d / "VTS_01_2.VOB").write_bytes(vob)
        (d / "VTS_02_1.VOB").write_bytes(vob)
        return d

    def test_title_vobs(self, tmp_path, _native):
        d = self._make_rip(tmp_path, _vob_bytes())
        v1 = ifo.title_vobs(str(d), 1)
        assert [os.path.basename(p) for p in v1] == ["VTS_01_1.VOB",
                                                     "VTS_01_2.VOB"]
        v2 = ifo.title_vobs(str(d), 2)
        assert [os.path.basename(p) for p in v2] == ["VTS_02_1.VOB"]
        with pytest.raises(ValueError, match="no title 9"):
            ifo.title_vobs(str(d), 9)

    def test_dvd_importer_plays_title(self, tmp_path, _native):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        vob = _vob_bytes()
        d = self._make_rip(tmp_path, vob)
        job = Job()
        job.dvd_title = 1
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "dvd", job)
        imp.open(str(tmp_path))
        got = 0
        while True:
            b = imp.read_video_batch(4)
            if b is None:
                break
            got += b["y"].shape[0]
        assert got == 12          # two VOBs of 6 frames each
        imp.close()

    def test_no_vmg_fallback(self, tmp_path, _native):
        d = tmp_path / "VIDEO_TS"
        d.mkdir()
        (d / "VTS_01_1.VOB").write_bytes(_vob_bytes())
        ts = ifo.list_titles(str(d))
        assert len(ts) == 1 and ts[0].vts == 1
        assert ifo.title_vobs(str(d), 1)
