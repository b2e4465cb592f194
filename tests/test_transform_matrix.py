"""newtest.pl-style CLI transform matrix (testsuite/newtest.pl:43-213):
every internal-transform flag (-j -I -X -B -Z -Y -r -z -l -k -K -G -C)
driven end-to-end through the real CLI on a procedural source, output
compared against independently computed pixels.

The per-op FORMULAS are golden-tested against the C ports in
tests/test_ops.py; this matrix verifies the option->engine->op WIRING
and the fixed transform order (video_trans.c:192-440 "jIXBZYrzlkKGC")."""

from __future__ import annotations

import numpy as np
import pytest

from tcforge_tpu.cli import main
from tcforge_tpu.io.y4m import Y4MReader, Y4MWriter, Y4MHeader

import tcforge_tpu.modules  # noqa: F401

W, H, N = 64, 48, 4


def _src(tmp_path):
    rng = np.random.default_rng(7)
    frames = [(rng.integers(16, 235, (H, W), np.uint8),
               rng.integers(16, 235, (H // 2, W // 2), np.uint8),
               rng.integers(16, 235, (H // 2, W // 2), np.uint8))
              for _ in range(N)]
    p = tmp_path / "in.y4m"
    hdr = Y4MHeader(width=W, height=H, fps_num=25, fps_den=1)
    with Y4MWriter(str(p), hdr) as w:
        for y, u, v in frames:
            w.write_frame(y, u, v)
    return p, frames


def _run(tmp_path, src, args):
    out = tmp_path / "out.y4m"
    rc = main(["-i", str(src), "-o", str(out), "--progress_off", "-q"]
              + args)
    assert rc == 0, args
    with Y4MReader(str(out)) as r:
        got = [fr for fr in r]
    assert len(got) == N
    return got


class TestTransformMatrix:
    def test_j_clip(self, tmp_path):
        src, frames = _src(tmp_path)
        got = _run(tmp_path, src, ["-j", "8,4,8,4"])
        assert got[0][0].shape == (H - 16, W - 8)
        np.testing.assert_array_equal(got[2][0],
                                      frames[2][0][8:H - 8, 4:W - 4])

    def test_Y_export_clip(self, tmp_path):
        src, frames = _src(tmp_path)
        got = _run(tmp_path, src, ["-Y", "4,2,4,2"])
        assert got[0][0].shape == (H - 8, W - 4)
        np.testing.assert_array_equal(got[1][0],
                                      frames[1][0][4:H - 4, 2:W - 2])

    def test_Z_zoom(self, tmp_path):
        src, _ = _src(tmp_path)
        got = _run(tmp_path, src, ["-Z", "32x24"])
        assert got[0][0].shape == (24, 32)

    def test_X_resize_up(self, tmp_path):
        src, _ = _src(tmp_path)
        # -X n[,m[,M]]: n rows, m cols of M px (default 32)
        got = _run(tmp_path, src, ["-X", "1,1"])
        assert got[0][0].shape == (H + 32, W + 32)
        got = _run(tmp_path, src, ["-X", "1,1,8"])
        assert got[0][0].shape == (H + 8, W + 8)

    def test_B_resize_down(self, tmp_path):
        src, _ = _src(tmp_path)
        got = _run(tmp_path, src, ["-B", "1,1,16"])
        assert got[0][0].shape == (H - 16, W - 16)

    def test_r_reduce(self, tmp_path):
        src, _ = _src(tmp_path)
        got = _run(tmp_path, src, ["-r", "2,2"])
        assert got[0][0].shape == (H // 2, W // 2)

    def test_z_flip(self, tmp_path):
        src, frames = _src(tmp_path)
        got = _run(tmp_path, src, ["-z"])
        np.testing.assert_array_equal(got[0][0], frames[0][0][::-1])

    def test_l_mirror(self, tmp_path):
        src, frames = _src(tmp_path)
        got = _run(tmp_path, src, ["-l"])
        np.testing.assert_array_equal(got[0][0], frames[0][0][:, ::-1])

    def test_K_grayscale(self, tmp_path):
        src, frames = _src(tmp_path)
        got = _run(tmp_path, src, ["-K"])
        np.testing.assert_array_equal(got[0][0], frames[0][0])
        assert np.all(got[0][1] == 128) and np.all(got[0][2] == 128)

    def test_G_gamma(self, tmp_path):
        src, frames = _src(tmp_path)
        got = _run(tmp_path, src, ["-G", "1.4"])
        from tcforge_tpu.ops import video as vops
        import jax.numpy as jnp
        want = np.asarray(vops.gamma_correct(
            jnp.asarray(frames[0][0][None]), 1.4))[0]
        np.testing.assert_array_equal(got[0][0], want)

    def test_I_deinterlace(self, tmp_path):
        src, frames = _src(tmp_path)
        got = _run(tmp_path, src, ["-I", "3"])   # drop field + zoom
        assert got[0][0].shape == (H, W)

    def test_C_antialias(self, tmp_path):
        src, frames = _src(tmp_path)
        got = _run(tmp_path, src, ["-C", "3"])
        assert got[0][0].shape == (H, W)
        # interior must be the antialias blend, not the source
        assert not np.array_equal(got[0][0], frames[0][0])

    def test_k_rgbswap(self, tmp_path):
        src, frames = _src(tmp_path)
        # -k swaps R<->B; YUV in -> forced through RGB internally
        got = _run(tmp_path, src, ["-k", "-V", "rgb24"])
        assert got[0][0].shape == (H, W)

    def test_order_j_before_Z(self, tmp_path):
        """Clip runs before zoom (the fixed jIXBZYrzlkKGC order):
        -j then -Z sees the clipped geometry."""
        src, _ = _src(tmp_path)
        got = _run(tmp_path, src, ["-j", "8,0,8,0", "-Z", "32x16"])
        assert got[0][0].shape == (16, 32)
