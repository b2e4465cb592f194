"""SMIL edit lists: parser, xml importer, tcxmlcheck."""

import numpy as np
import pytest

from tcforge_tpu.io.smil import parse_smil, _parse_clock
import tcforge_tpu.modules  # noqa: F401


def write_clip(path, n, value, h=16, w=32):
    from tcforge_tpu.io import y4m
    hdr = y4m.Y4MHeader(width=w, height=h, fps_num=25, fps_den=1)
    c = np.full((h // 2, w // 2), 128, np.uint8)
    with y4m.Y4MWriter(str(path), hdr) as wr:
        for i in range(n):
            wr.write_frame(np.full((h, w), value + i, np.uint8), c, c)


class TestClock:
    def test_npt_seconds(self):
        assert _parse_clock("npt=2.5") == ("sec", 2.5)

    def test_npt_clock(self):
        assert _parse_clock("npt=0:01:30.5") == ("sec", 90.5)

    def test_smpte(self):
        kind, v = _parse_clock("smpte=00:00:02:05")
        assert kind == "sec"
        assert v == pytest.approx(2 + 5 / 25)

    def test_smpte_30(self):
        kind, v = _parse_clock("smpte-30=00:00:01:15")
        assert v == pytest.approx(1.5)

    def test_bare_frames(self):
        assert _parse_clock("42") == ("frame", 42)


class TestParse:
    def test_playlist(self, tmp_path):
        p = tmp_path / "e.smil"
        p.write_text("""<?xml version="1.0"?>
<smil><body><seq>
  <video src="a.y4m" clipBegin="npt=1.0" clipEnd="npt=2.0"/>
  <video src="b.y4m"/>
</seq></body></smil>""")
        clips = parse_smil(str(p))
        assert len(clips) == 2
        assert clips[0].begin_sec == 1.0
        assert clips[1].begin_sec is None

    def test_not_smil(self, tmp_path):
        p = tmp_path / "x.xml"
        p.write_text("<root/>")
        with pytest.raises(ValueError):
            parse_smil(str(p))


class TestXmlImporter:
    def test_edit_list_concatenates(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        write_clip(tmp_path / "a.y4m", 50, 0)
        write_clip(tmp_path / "b.y4m", 50, 100)
        smil = tmp_path / "cut.smil"
        smil.write_text("""<smil><body><seq>
  <video src="a.y4m" clipBegin="10" clipEnd="20"/>
  <video src="b.y4m" clipBegin="npt=0.2" clipEnd="npt=0.4"/>
</seq></body></smil>""")
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "xml", Job())
        imp.open(str(smil))
        assert imp.total_frames == 15          # 10 + 5
        batch = imp.read_video_batch(64)
        y = batch["y"]
        assert y.shape[0] == 15
        # first 10 frames: a.y4m frames 10..19 (values 10..19)
        assert [int(y[k, 0, 0]) for k in (0, 9)] == [10, 19]
        # next 5: b.y4m frames 5..9 (values 105..109)
        assert [int(y[k, 0, 0]) for k in (10, 14)] == [105, 109]
        assert imp.read_video_batch(4) is None
        imp.close()

    def test_pipeline_end_to_end(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        write_clip(tmp_path / "a.y4m", 20, 0)
        write_clip(tmp_path / "b.y4m", 20, 50)
        smil = tmp_path / "cut.smil"
        smil.write_text("""<smil><body><seq>
  <video src="a.y4m" clipEnd="5"/>
  <video src="b.y4m" clipBegin="15"/>
</seq></body></smil>""")
        job = Job(video_in_file=str(smil), im_v_module="xml",
                  video_out_file=str(tmp_path / "o.y4m"),
                  ex_m_module="y4m", batch_size=4)
        c = Pipeline(job).run(progress=False)
        assert c.encoded == 10                 # 5 + 5

    def test_geometry_mismatch(self, tmp_path):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        write_clip(tmp_path / "a.y4m", 5, 0)
        write_clip(tmp_path / "b.y4m", 5, 0, h=32, w=64)
        smil = tmp_path / "bad.smil"
        smil.write_text("""<smil><body><seq>
  <video src="a.y4m"/><video src="b.y4m"/>
</seq></body></smil>""")
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "xml", Job())
        with pytest.raises(ValueError):
            imp.open(str(smil))


class TestTool:
    def test_tcxmlcheck(self, tmp_path, capsys):
        from tcforge_tpu.tools import tcxmlcheck
        write_clip(tmp_path / "a.y4m", 30, 0)
        smil = tmp_path / "e.smil"
        smil.write_text("""<smil><body><seq>
  <video src="a.y4m" clipBegin="5" clipEnd="25"/>
</seq></body></smil>""")
        rc = tcxmlcheck.main(["-i", str(smil), "-S"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "frames [5, 25)" in out
        assert "total: 20 frames" in out

    def test_tcxmlcheck_missing_clip(self, tmp_path, capsys):
        from tcforge_tpu.tools import tcxmlcheck
        smil = tmp_path / "e.smil"
        smil.write_text('<smil><body><video src="nope.y4m"/>'
                        '</body></smil>')
        assert tcxmlcheck.main(["-i", str(smil)]) == 1
