"""MP3 frame parsing + tcmp3cut."""

import numpy as np
import pytest

from tcforge_tpu.io.mp3 import iter_frames, parse_header


def mp3_frame(bitrate_idx=9, srate_idx=0, pad=0):
    """Synthesize one MPEG-1 layer III frame (header + filler)."""
    h = 0xFFE00000
    h |= 0x3 << 19              # MPEG-1
    h |= 0x1 << 17              # layer III
    h |= 0x1 << 16              # no CRC
    h |= bitrate_idx << 12
    h |= srate_idx << 10
    h |= pad << 9
    hdr = h.to_bytes(4, "big")
    fr = parse_header(hdr)
    assert fr is not None
    return hdr + bytes(fr.size - 4), fr


class TestHeader:
    def test_parse(self):
        data, fr = mp3_frame(bitrate_idx=9, srate_idx=0)   # 128k 44.1k
        assert fr.bitrate == 128
        assert fr.rate == 44100
        assert fr.size == 144000 * 128 // 44100
        assert fr.duration_ms == pytest.approx(26.06, abs=0.1)

    def test_padding(self):
        _, a = mp3_frame(pad=0)
        _, b = mp3_frame(pad=1)
        assert b.size == a.size + 1

    def test_reject_garbage(self):
        assert parse_header(b"\x00\x00\x00\x00") is None
        assert parse_header(b"\xff\xe0\xfc\x00") is None

    def test_stream_walk_with_noise(self):
        f1, _ = mp3_frame()
        f2, _ = mp3_frame(bitrate_idx=11)
        stream = b"junk" + f1 + f2
        frames = list(iter_frames(stream))
        assert len(frames) == 2
        assert frames[0][0] == 4


class TestTool:
    def test_cut(self, tmp_path):
        from tcforge_tpu.tools import tcmp3cut
        frame, fr = mp3_frame()              # ~26.12 ms each
        n = 40
        src = tmp_path / "in.mp3"
        src.write_bytes(frame * n)
        # cut at ~0.26s and ~0.52s -> three files
        rc = tcmp3cut.main(["-i", str(src), "-o",
                            str(tmp_path / "song"),
                            "-t", "261,522"])
        assert rc == 0
        parts = sorted(tmp_path.glob("song-*.mp3"))
        assert len(parts) == 3
        sizes = [p.stat().st_size for p in parts]
        assert sum(sizes) == n * fr.size      # no bytes lost
        # cuts land on frame boundaries
        assert all(s % fr.size == 0 for s in sizes)
        # 10 frames = 260.6 ms < 261, so the 11th closes the part
        assert sizes[0] == 11 * fr.size

    def test_corrupt(self, tmp_path):
        from tcforge_tpu.tools import tcmp3cut
        src = tmp_path / "bad.mp3"
        src.write_bytes(b"\x00" * 100)
        assert tcmp3cut.main(["-i", str(src), "-o",
                              str(tmp_path / "x"), "-t", "100"]) == 1
