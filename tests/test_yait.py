"""yait two-pass inverse telecine + tcyait analyzer + 32drop tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tcforge_tpu.core.formats import ImageFormat as F
from tcforge_tpu.core.frame import ATTR_SKIPPED, FrameBatch
from tcforge_tpu.core.job import Job
import tcforge_tpu.modules  # noqa: F401
from tcforge_tpu.modules.filters.yait import ops_to_arrays, parse_ops_file
from tcforge_tpu.modules.registry import ModuleKind, new_module
from tcforge_tpu.tools.tcyait import Yait, calc_ratio, read_log

RNG = np.random.default_rng(21)


def yuv_batch(ys, first_id=0):
    y = np.stack(ys)
    n, h, w = y.shape
    c = np.full((n, h // 2, w // 2), 128, np.uint8)
    fb = FrameBatch.from_numpy(y=y, u=c, v=c, fmt=F.YUV420P)
    return FrameBatch(format=fb.format, y=fb.y, u=fb.u, v=fb.v,
                      attrs=fb.attrs,
                      frame_ids=jnp.arange(first_id, first_id + n,
                                           dtype=jnp.int32), fps=29.97)


def telecine(film, h, w):
    """2:3 pulldown: film frames a,b,c,d -> video frames
    a/a, a/b, b/c, c/c, d/d (tcyait.c:348-372 'odd pattern')."""
    video = []
    for g in range(len(film) // 4):
        a, b, c, d = film[g * 4:g * 4 + 4]
        for ev, od in ((a, a), (a, b), (b, c), (c, c), (d, d)):
            f = np.empty((h, w), np.uint8)
            f[0::2] = ev[0::2]
            f[1::2] = od[1::2]
            video.append(f)
    return video


def film_frames(n, h, w):
    """Distinct flat-ish frames with strong per-frame texture."""
    frames = []
    for i in range(n):
        base = RNG.integers(0, 200, (h // 8, w // 8), dtype=np.uint8)
        frames.append(np.kron(base, np.ones((8, 8), np.uint8)))
    return frames


class TestRatio:
    def test_signs(self):
        assert calc_ratio(0, 0) == 0
        assert calc_ratio(5, 0) == 100
        assert calc_ratio(0, 5) == -100
        assert calc_ratio(10, 5) == pytest.approx(2.0)
        assert calc_ratio(5, 10) == pytest.approx(-2.0)

    def test_ops_parse(self, tmp_path):
        p = tmp_path / "x.ops"
        p.write_text("0: \n1: osd\n2: oc\n3: d\n4: 3\n")
        ops = parse_ops_file(str(p))
        arr = ops_to_arrays(ops)
        assert arr["save"][1] == 1 and arr["drop"][1] == 1
        assert arr["copy"][2] == 1 and arr["even"][2] == 0
        assert arr["drop"][3] == 1
        assert arr["deint"][4] == 3

    def test_ops_bad_frame_number(self, tmp_path):
        p = tmp_path / "x.ops"
        p.write_text("0: \n2: d\n")
        with pytest.raises(ValueError):
            parse_ops_file(str(p))


class TestLogPass:
    def test_row_deltas(self, tmp_path):
        h, w = 32, 48
        a = np.full((h, w), 50, np.uint8)
        b = a.copy()
        b[1::2] = 90                    # odd rows change
        filt = new_module(ModuleKind.FILTER, "yait", Job(fps=29.97),
                          f"log={tmp_path}/y.log")
        st = filt.init_state(w, h, F.YUV420P)
        _, st = filt.apply(yuv_batch([a, b]), st)
        filt.collect(st)
        filt.finalize(st)
        recs = read_log(f"{tmp_path}/y.log")
        assert recs[0] == (0, 0, 0)     # first frame: self-compare
        fn, ed, od = recs[1]
        assert ed == 0                  # even rows identical
        assert od == 40 * (h // 2) * w  # |90-50| over odd luma rows

    def test_batch_invariance(self, tmp_path):
        frames = film_frames(8, 32, 48)
        opts = f"log={tmp_path}/a.log"
        f1 = new_module(ModuleKind.FILTER, "yait", Job(fps=29.97), opts)
        st = f1.init_state(48, 32, F.YUV420P)
        _, st = f1.apply(yuv_batch(frames), st)
        f1.collect(st)
        f1.finalize(st)

        opts2 = f"log={tmp_path}/b.log"
        f2 = new_module(ModuleKind.FILTER, "yait", Job(fps=29.97), opts2)
        st = f2.init_state(48, 32, F.YUV420P)
        _, st = f2.apply(yuv_batch(frames[:3]), st)
        f2.collect(st)
        _, st = f2.apply(yuv_batch(frames[3:], first_id=3), st)
        f2.collect(st)
        f2.finalize(st)
        assert read_log(f"{tmp_path}/a.log") == read_log(f"{tmp_path}/b.log")

    def test_requires_one_mode(self):
        with pytest.raises(ValueError):
            new_module(ModuleKind.FILTER, "yait", Job(), "")


class TestAnalyzer:
    def test_telecine_pattern_detected(self):
        """A clean 2:3 log must yield exactly one drop per 5 frames with
        save/copy pairs on the interlaced frames."""
        h, w = 64, 96
        film = film_frames(16, h, w)
        video = telecine(film, h, w)
        # synthesize the log the filter would write
        recs = []
        prev = video[0]
        for i, f in enumerate(video):
            ed = int(np.abs(f[0::2].astype(int)
                            - prev[0::2].astype(int)).sum())
            od = int(np.abs(f[1::2].astype(int)
                            - prev[1::2].astype(int)).sum())
            recs.append((i, ed, od))
            prev = f
        y = Yait(recs)
        lines = y.run()
        assert len(lines) == len(video)
        drops = sum(1 for ln in lines if "d" in ln.split(":")[1])
        assert drops == len(video) // 5      # one drop per group
        joined = "\n".join(lines)
        assert "osd" in joined               # save-odd-drop
        assert "oc" in joined                # copy-odd


class TestTwoPass:
    def test_reconstruction(self, tmp_path):
        """log pass -> tcyait -> ops pass restores progressive frames."""
        from tcforge_tpu.tools import tcyait as tool
        h, w = 64, 96
        film = film_frames(16, h, w)
        video = telecine(film, h, w)

        logf = tmp_path / "y.log"
        opsf = tmp_path / "y.ops"
        filt = new_module(ModuleKind.FILTER, "yait", Job(fps=29.97),
                          f"log={logf}")
        st = filt.init_state(w, h, F.YUV420P)
        _, st = filt.apply(yuv_batch(video), st)
        filt.collect(st)
        filt.finalize(st)

        assert tool.main(["-l", str(logf), "-o", str(opsf)]) == 0

        f2 = new_module(ModuleKind.FILTER, "yait", Job(fps=29.97),
                        f"ops={opsf}")
        st = f2.init_state(w, h, F.YUV420P)
        out, st = f2.apply(yuv_batch(video), st)
        oy = np.asarray(out.y)
        kept = ~np.asarray(out.has_attr(ATTR_SKIPPED))
        assert out.fps == pytest.approx(24000 / 1001)
        # exactly 4 of every 5 frames survive
        assert int(kept.sum()) == len(video) * 4 // 5
        # every kept frame must be one of the progressive film frames
        film_set = {f.tobytes() for f in film}
        matched = sum(1 for k in range(len(video))
                      if kept[k] and oy[k].tobytes() in film_set)
        assert matched == int(kept.sum())


class TestDrop32:
    def test_drops_interlaced(self):
        h, w = 64, 96
        film = film_frames(8, h, w)
        video = telecine(film, h, w)
        filt = new_module(ModuleKind.FILTER, "32drop", Job(), "")
        st = filt.init_state(w, h, F.YUV420P)
        out, st = filt.apply(yuv_batch(video), st)
        skipped = np.asarray(out.has_attr(ATTR_SKIPPED))
        # the interlaced duplicates (a/b at positions 1 mod 5, b/c at
        # 2 mod 5) trigger drops; cadence keeps roughly 1-in-5 dropping
        assert skipped.sum() >= len(video) // 5
        assert skipped.sum() <= 2 * len(video) // 5

    def test_progressive_passthrough_with_sync_drop(self):
        """Pure progressive input: the sync counter forces one drop per
        five frames (filter_32drop.c:207-213)."""
        h, w = 32, 48
        frames = film_frames(12, h, w)
        filt = new_module(ModuleKind.FILTER, "32drop", Job(), "")
        st = filt.init_state(w, h, F.YUV420P)
        out, _ = filt.apply(yuv_batch(frames), st)
        skipped = np.asarray(out.has_attr(ATTR_SKIPPED))
        # dcnt reaches -5 at frames 5 and 10 (one sync drop per five)
        assert list(np.nonzero(skipped)[0]) == [5, 10]
        oy = np.asarray(out.y)
        for k in range(12):
            if not skipped[k]:
                np.testing.assert_array_equal(oy[k], frames[k])
