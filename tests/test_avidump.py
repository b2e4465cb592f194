"""avidump tool (avilib/avidump.c analogue): RIFF tree walk +
structure field decode over AVIs written by our own avilib."""

import io

import numpy as np

from tcforge_tpu.io.avi import AviAudioStream, AviVideoStream, AviWriter
from tcforge_tpu.tools.avidump import AviDumper, main


def make_avi(path, n=4, w=16, h=8, audio=True, comments=None):
    vs = AviVideoStream(fourcc="I420", width=w, height=h, fps=25.0)
    ats = [AviAudioStream()] if audio else []
    with AviWriter(str(path), vs, ats, comments=comments) as wr:
        for i in range(n):
            wr.write_video_frame(bytes([i]) * (w * h * 3 // 2))
            if audio:
                wr.write_audio(b"\x01\x02" * 960)


def dump_text(path, **kw):
    buf = io.StringIO()
    AviDumper(out=buf, **kw).dump(str(path))
    return buf.getvalue()


class TestAviDump:
    def test_tree_and_headers(self, tmp_path):
        p = tmp_path / "a.avi"
        make_avi(p, n=5, w=32, h=16)
        text = dump_text(p)
        assert "ID:<RIFF>" in text
        assert "Form Type = <AVI " in text
        assert "ID:<avih>" in text
        # decoded MainAVIHeader fields
        assert "width        = 32" in text
        assert "height       = 16" in text
        assert "streams      = 2" in text
        assert "HASINDEX" in text
        # stream headers: vids then auds with the right strf decode
        assert "fcc_type     = vids" in text
        assert "fcc_type     = auds" in text
        assert "bi_width     = 32" in text
        assert "n_channels   = 2" in text

    def test_idx1_entries(self, tmp_path):
        p = tmp_path / "a.avi"
        make_avi(p, n=3, audio=False)
        text = dump_text(p)
        assert "ID:<idx1>" in text
        assert "3 idx1 entries" in text
        assert "tag=00db" in text
        assert "key=yes" in text

    def test_info_comments(self, tmp_path):
        p = tmp_path / "a.avi"
        make_avi(p, n=1, comments={"INAM": "My Clip",
                                   "ICMT": "hello"})
        text = dump_text(p)
        assert "INAM = 'My Clip'" in text
        assert "ICMT = 'hello'" in text

    def test_movi_frames_listed(self, tmp_path):
        p = tmp_path / "a.avi"
        make_avi(p, n=2, audio=True)
        text = dump_text(p)
        assert "List Type = <movi>" in text
        assert text.count("ID:<00db>") == 2
        assert text.count("ID:<01wb>") == 2

    def test_cli_entry(self, tmp_path, capsys):
        p = tmp_path / "a.avi"
        make_avi(p, n=1)
        assert main([str(p)]) == 0
        out = capsys.readouterr().out
        assert "ID:<RIFF>" in out

    def test_missing_file(self, tmp_path, capsys):
        assert main([str(tmp_path / "nope.avi")]) == 1

    def test_truncated_chunk_reported(self, tmp_path):
        p = tmp_path / "a.avi"
        make_avi(p, n=2, audio=False)
        data = p.read_bytes()
        # truncate mid-movi: the walker reports instead of crashing
        (tmp_path / "t.avi").write_bytes(data[:len(data) // 2])
        text = dump_text(tmp_path / "t.avi")
        assert "ID:<RIFF>" in text
