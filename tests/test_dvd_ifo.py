"""DVD IFO title navigation (decrypted VIDEO_TS rips) — io/ifo.py +
the dvd importer's native path."""

import io
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


def make_vts_ifo(pgc_cells, ptts):
    """Minimal VTS_nn_0.IFO: VTSI_MAT pointers, VTS_PTT_SRPT at
    sector 1, VTS_PGCIT at sector 2.

    pgc_cells: {pgcn: (program_map_cells, [(first, last)])}
    ptts: {ttn: [(pgcn, pgn)]}"""
    blob = bytearray(16 * ifo.SECTOR)
    blob[0:12] = b"DVDVIDEO-VTS"
    struct.pack_into(">I", blob, 0xC8, 1)
    struct.pack_into(">I", blob, 0xCC, 2)
    # PTT_SRPT
    base = ifo.SECTOR
    ttns = sorted(ptts)
    struct.pack_into(">H", blob, base, len(ttns))
    off = 8 + 4 * len(ttns)
    offsets = []
    body = bytearray()
    for ttn in ttns:
        offsets.append(off + len(body))
        for pgcn, pgn in ptts[ttn]:
            body += struct.pack(">HH", pgcn, pgn)
    struct.pack_into(">I", blob, base + 4, off + len(body) - 1)
    for i, o in enumerate(offsets):
        struct.pack_into(">I", blob, base + 8 + 4 * i, o)
    blob[base + off:base + off + len(body)] = body
    # PGCIT
    g = 2 * ifo.SECTOR
    pgcns = sorted(pgc_cells)
    struct.pack_into(">H", blob, g, len(pgcns))
    pgc_off = 8 + 8 * len(pgcns)
    for i, pgcn in enumerate(pgcns):
        program_map, cells = pgc_cells[pgcn]
        struct.pack_into(">I", blob, g + 8 + 8 * i + 4, pgc_off)
        p = g + pgc_off
        blob[p + 2] = len(program_map)
        blob[p + 3] = len(cells)
        pm_off = 0xEC
        cp_off = pm_off + len(program_map)
        struct.pack_into(">H", blob, p + 0xE6, pm_off)
        struct.pack_into(">H", blob, p + 0xE8, cp_off)
        for j, cell in enumerate(program_map):
            blob[p + pm_off + j] = cell
        for c, (first, last) in enumerate(cells):
            e = p + cp_off + 24 * c
            struct.pack_into(">I", blob, e + 8, first)
            struct.pack_into(">I", blob, e + 20, last)
        pgc_off += cp_off + 24 * len(cells)
    return bytes(blob)


class TestChapters:
    def test_vts_parse(self):
        vts = make_vts_ifo(
            {1: ([1, 3], [(0, 9), (10, 19), (20, 29)])},
            {1: [(1, 1), (1, 2)]})
        ch = ifo.parse_vts(vts)
        assert ch.count(1) == 2
        s1 = ch.spans(1, 1)
        assert [(c.first_sector, c.last_sector) for c in s1] == \
            [(0, 9), (10, 19)]
        s2 = ch.spans(1, 2)
        assert [(c.first_sector, c.last_sector) for c in s2] == \
            [(20, 29)]
        with pytest.raises(ValueError, match="no chapter 3"):
            ch.spans(1, 3)

    def test_sector_extraction_across_vobs(self, tmp_path):
        d = tmp_path / "VIDEO_TS"
        d.mkdir()
        (d / "VIDEO_TS.IFO").write_bytes(make_vmg([(1, 1, 2, 1)]))
        (d / "VTS_01_0.IFO").write_bytes(make_vts_ifo(
            {1: ([1, 2], [(0, 2), (3, 5)])}, {1: [(1, 1), (1, 2)]}))
        # two VOBs of 3 sectors each: sectors 0-2 in VOB1, 3-5 in VOB2
        sec = [bytes([i]) * ifo.SECTOR for i in range(6)]
        (d / "VTS_01_1.VOB").write_bytes(b"".join(sec[:3]))
        (d / "VTS_01_2.VOB").write_bytes(b"".join(sec[3:]))
        spans = ifo.chapter_sectors(str(d), 1, 2)
        buf = io.BytesIO()
        n = ifo.extract_sectors(str(d), 1, spans, buf)
        assert n == 3 * ifo.SECTOR
        assert buf.getvalue() == b"".join(sec[3:])
        spans1 = ifo.chapter_sectors(str(d), 1, 1)
        buf1 = io.BytesIO()
        ifo.extract_sectors(str(d), 1, spans1, buf1)
        assert buf1.getvalue() == b"".join(sec[:3])

    def test_importer_chapter_range(self, tmp_path, _native):
        """-T 1,2: only the second chapter's cells decode."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        vob = _vob_bytes(n=6)
        nsec = -(-len(vob) // ifo.SECTOR)
        vob_padded = vob.ljust(nsec * ifo.SECTOR, b"\0")
        d = tmp_path / "VIDEO_TS"
        d.mkdir()
        (d / "VIDEO_TS.IFO").write_bytes(make_vmg([(1, 1, 2, 1)]))
        # chapter 1 = first half sectors, chapter 2 = the whole VOB
        # (so chapter 2 decodes all 6 frames)
        (d / "VTS_01_0.IFO").write_bytes(make_vts_ifo(
            {1: ([1, 2], [(0, 0), (0, nsec - 1)])},
            {1: [(1, 1), (1, 2)]}))
        (d / "VTS_01_1.VOB").write_bytes(vob_padded)
        job = Job()
        job.dvd_title = 1
        job.dvd_chapter1 = 2
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "dvd", job)
        imp.open(str(tmp_path))
        got = 0
        while True:
            b = imp.read_video_batch(4)
            if b is None:
                break
            got += b["y"].shape[0]
        imp.close()
        assert got == 6

    def test_tccat_chapter_extract(self, tmp_path, _native, capsys):
        from tcforge_tpu.tools.tccat import main as tccat_main
        d = tmp_path / "VIDEO_TS"
        d.mkdir()
        (d / "VIDEO_TS.IFO").write_bytes(make_vmg([(1, 1, 2, 1)]))
        (d / "VTS_01_0.IFO").write_bytes(make_vts_ifo(
            {1: ([1, 2], [(0, 1), (2, 3)])}, {1: [(1, 1), (1, 2)]}))
        sec = [bytes([i]) * ifo.SECTOR for i in range(4)]
        (d / "VTS_01_1.VOB").write_bytes(b"".join(sec))
        out = tmp_path / "ch2.vob"
        rc = tccat_main(["-i", str(d), "-T", "1,2", "-o", str(out)])
        assert rc == 0
        assert out.read_bytes() == b"".join(sec[2:])
