"""pp postprocess filter: option grammar (filter_pp.c do_optstr/
pp_get_mode semantics), kernel golden tests vs scalar numpy ports of
the documented formulas, temporal-state batch invariance, and e2e."""

import numpy as np
import pytest

from tcforge_tpu.core.formats import ImageFormat as F
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.job import Job
from tcforge_tpu.modules.filters import pp as ppmod
from tcforge_tpu.modules.filters.pp import parse_pp_options
from tcforge_tpu.modules.registry import FilterSlot, ModuleKind, new_module

RNG = np.random.default_rng(77)


def rand_u8(*shape):
    return RNG.integers(0, 256, size=shape, dtype=np.uint8)


def blocky(n, h, w):
    """Frames with hard 8x8 block steps (deblock/dering stimulus)."""
    base = RNG.integers(0, 32, size=(n, h // 8, w // 8), dtype=np.uint8)
    img = np.repeat(np.repeat(base * 8, 8, axis=1), 8, axis=2)
    noise = RNG.integers(0, 5, size=(n, h, w), dtype=np.uint8)
    return (img + noise).astype(np.uint8)


# ------------------------------------------------------------------ #
# grammar

class TestGrammar:
    def test_pp_syntax(self):
        a = parse_pp_options("hb:64:40/vb")
        assert a["hb"]["args"] == [64, 40]
        assert "vb" in a and a["vb"]["args"] == []

    def test_transcode_optstr_translation(self):
        # do_optstr: "hb=64:vb=40" == "hb:64/vb:40"
        assert parse_pp_options("hb=64:vb=40") == \
            parse_pp_options("hb:64/vb:40")

    def test_colon_options_without_slash(self):
        # numeric tokens stay options of the preceding filter
        a = parse_pp_options("tn:8:16:32")
        assert a["tn"]["args"] == [8, 16, 32]

    def test_long_names_and_separators(self):
        a = parse_pp_options("hdeblock,vdeblock|dering")
        assert set(a) >= {"hb", "vb", "dr"}

    def test_preset_expansion(self):
        a = parse_pp_options("de")
        assert set(a) >= {"hb", "vb", "dr", "al"}
        b = parse_pp_options("fa")
        assert set(b) >= {"h1", "v1", "dr", "al"}

    def test_preset_member_removal(self):
        a = parse_pp_options("de/-al")
        assert "al" not in a and "hb" in a

    def test_unknown_filter_raises(self):
        with pytest.raises(ValueError):
            parse_pp_options("nosuchpp")

    def test_chroma_flags(self):
        assert parse_pp_options("hb:y")["hb"]["chroma"] is False
        assert parse_pp_options("hb:c")["hb"]["chroma"] is True
        assert parse_pp_options("hb")["hb"]["chroma"] is None

    def test_forcequant(self):
        a = parse_pp_options("fq:7/hb")
        assert a["__fq__"]["args"] == [7]

    def test_fullyrange(self):
        assert parse_pp_options("al:f")["al"]["args"] == [1]

    def test_pre_flag(self):
        assert parse_pp_options("pre/hb")["__pre__"]["args"] == [1]


# ------------------------------------------------------------------ #
# kernel goldens (scalar numpy ports of the documented formulas)

def _shift_rows(p, k):
    """Edge-replicated row shift (positive k reads downward)."""
    n, h, w = p.shape
    idx = np.clip(np.arange(h) + k, 0, h - 1)
    return p[:, idx, :]


class TestDeintGoldens:
    def test_linblend(self):
        x = rand_u8(3, 16, 24)
        p = x.astype(np.int64)
        want = ((_shift_rows(p, -1) + 2 * p + _shift_rows(p, 1) + 2)
                >> 2).astype(np.uint8)
        got = np.asarray(ppmod.linblend_deint(x))
        assert np.array_equal(got, want)

    def test_linipol(self):
        x = rand_u8(2, 16, 24)
        p = x.astype(np.int64)
        interp = (_shift_rows(p, -1) + _shift_rows(p, 1) + 1) >> 1
        want = p.copy()
        want[:, 1::2, :] = interp[:, 1::2, :]
        got = np.asarray(ppmod.linipol_deint(x))
        assert np.array_equal(got, want.astype(np.uint8))

    def test_cubicipol(self):
        x = rand_u8(2, 16, 24)
        p = x.astype(np.int64)
        interp = np.clip((-_shift_rows(p, -3) + 9 * _shift_rows(p, -1)
                          + 9 * _shift_rows(p, 1) - _shift_rows(p, 3)
                          + 8) >> 4, 0, 255)
        want = p.copy()
        want[:, 1::2, :] = interp[:, 1::2, :]
        got = np.asarray(ppmod.cubicipol_deint(x))
        assert np.array_equal(got, want.astype(np.uint8))

    def test_median(self):
        x = rand_u8(2, 16, 24)
        p = x.astype(np.int64)
        med = np.median(np.stack([_shift_rows(p, -1), p,
                                  _shift_rows(p, 1)]), axis=0)
        want = p.copy()
        want[:, 1::2, :] = med[:, 1::2, :]
        got = np.asarray(ppmod.median_deint(x))
        assert np.array_equal(got, want.astype(np.uint8))

    def test_ffmpeg_deint(self):
        x = rand_u8(2, 16, 24)
        p = x.astype(np.int64)
        lp = np.clip((-_shift_rows(p, -2) + 4 * _shift_rows(p, -1)
                      + 2 * p + 4 * _shift_rows(p, 1)
                      - _shift_rows(p, 2) + 4) >> 3, 0, 255)
        want = p.copy()
        want[:, 1::2, :] = lp[:, 1::2, :]
        got = np.asarray(ppmod.ffmpeg_deint(x))
        assert np.array_equal(got, want.astype(np.uint8))


class TestTmpNoise:
    def test_formula(self):
        c = rand_u8(1, 8, 8)[0].astype(np.int64)
        p = rand_u8(1, 8, 8)[0].astype(np.int64)
        t1, t2, t3 = 8, 16, 32
        d = np.abs(c - p)
        want = np.where(d < t1, (7 * p + c + 4) >> 3,
                        np.where(d < t2, (p + c + 1) >> 1,
                                 np.where(d < t3, (p + 3 * c + 2) >> 2,
                                          c))).astype(np.uint8)
        got = np.asarray(ppmod.tmpnoise(c.astype(np.uint8),
                                        p.astype(np.uint8), t1, t2, t3))
        assert np.array_equal(got, want)


class TestX1Deblock:
    def test_golden(self):
        x = blocky(2, 32, 24)
        qp = 1
        p = x.astype(np.int64)
        want = p.copy()
        for r in range(8, 32, 8):
            a, b, c, d = p[:, r - 2], p[:, r - 1], p[:, r], p[:, r + 1]
            nv = (a + 3 * b + 3 * c + d + 4) >> 3
            on = np.abs(b - c) > qp
            want[:, r - 1] = np.where(on, nv, b)
            want[:, r] = np.where(on, nv, c)
        got = np.asarray(ppmod.x1_deblock_v(x, qp))
        assert np.array_equal(got, want.astype(np.uint8))

    def test_h_is_transpose(self):
        x = blocky(1, 24, 32)
        got = np.asarray(ppmod.x1_deblock_h(x, 2))
        want = np.asarray(ppmod.x1_deblock_v(
            x.transpose(0, 2, 1), 2)).transpose(0, 2, 1)
        assert np.array_equal(got, want)


def np_deblock_v(plane, qp, diff, flat):
    """Scalar port of the documented default-filter deblock step."""
    p = plane.astype(np.int64)
    n, h, w = p.shape
    out = p.copy()
    dc_off = ((qp * flat) >> 8) + 1
    wc = w // 8
    for fi in range(n):
        for b in range(h // 8 - 1):
            r0 = b * 8 + 4
            l = [p[fi, r0 + k] for k in range(8)]  # l1..l8
            me = 5 * (l[4] - l[3]) + 2 * (l[2] - l[5])
            le = 5 * (l[2] - l[1]) + 2 * (l[0] - l[3])
            re = 5 * (l[6] - l[5]) + 2 * (l[4] - l[7])
            d = np.maximum(np.abs(me)
                           - np.minimum(np.abs(le), np.abs(re)), 0)
            d = (5 * d + 32) >> 6
            d = d * np.where(me > 0, -1, 1)
            q = np.sign(l[3] - l[4]) * (np.abs(l[3] - l[4]) // 2)
            d = np.where(q > 0, np.clip(d, 0, q), np.clip(d, q, 0))
            d = np.where(np.abs(me) < (diff * qp) >> 3, d, 0)
            # flatness per 8-col segment
            flat_cols = np.zeros(w, bool)
            for s in range(wc):
                seg = np.stack(l)[:, s * 8:(s + 1) * 8]
                diffs = np.abs(np.diff(seg, axis=0)) <= dc_off
                frac = diffs.mean()
                rng = seg.max() - seg.min()
                if frac > flat / 64.0 and rng < 2 * qp + dc_off:
                    flat_cols[s * 8:(s + 1) * 8] = True
            ctx = [l[0]] + l + [l[7]]
            lp = [(ctx[k] + 2 * ctx[k + 1] + ctx[k + 2] + 2) >> 2
                  for k in range(1, 7)]
            new4 = np.clip(l[3] - d, 0, 255)
            new5 = np.clip(l[4] + d, 0, 255)
            for k, v in ((3, np.where(flat_cols, lp[2], new4)),
                         (4, np.where(flat_cols, lp[3], new5)),
                         (1, np.where(flat_cols, lp[0], l[1])),
                         (2, np.where(flat_cols, lp[1], l[2])),
                         (5, np.where(flat_cols, lp[4], l[5])),
                         (6, np.where(flat_cols, lp[5], l[6]))):
                out[fi, r0 + k] = v
    return out.astype(np.uint8)


class TestDeblock:
    def test_golden(self):
        x = blocky(2, 32, 32)
        got = np.asarray(ppmod.deblock_v(x, 2, 64, 40))
        want = np_deblock_v(x, 2, 64, 40)
        assert np.array_equal(got, want)

    def test_golden_noisy(self):
        x = rand_u8(2, 24, 24)
        got = np.asarray(ppmod.deblock_v(x, 4, 64, 40))
        want = np_deblock_v(x, 4, 64, 40)
        assert np.array_equal(got, want)

    def test_h_is_transpose(self):
        x = blocky(1, 32, 32)
        got = np.asarray(ppmod.deblock_h(x, 2, 64, 40))
        want = np.asarray(ppmod.deblock_v(
            x.transpose(0, 2, 1), 2, 64, 40)).transpose(0, 2, 1)
        assert np.array_equal(got, want)


def np_dering(plane, qp):
    p = plane.astype(np.int64)
    n, h, w = p.shape
    out = p.copy()
    for fi in range(n):
        for by in range(h // 8):
            for bx in range(w // 8):
                blk = p[fi, by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                lo, hi = blk.min(), blk.max()
                if hi - lo <= 2 * qp + 16:
                    continue
                mid = (lo + hi + 1) >> 1
                for yy in range(8):
                    for xx in range(8):
                        gy, gx = by * 8 + yy, bx * 8 + xx
                        side = p[fi, gy, gx] > mid
                        acc = 0
                        same = True
                        k = [1, 2, 1]
                        for dy in (-1, 0, 1):
                            for dx in (-1, 0, 1):
                                sy = min(max(gy + dy, 0), h - 1)
                                sx = min(max(gx + dx, 0), w - 1)
                                acc += (k[dy + 1] * k[dx + 1]
                                        * p[fi, sy, sx])
                                if (p[fi, sy, sx] > mid) != side:
                                    same = False
                        if same:
                            out[fi, gy, gx] = (acc + 8) >> 4
    return out.astype(np.uint8)


class TestDering:
    def test_golden(self):
        x = blocky(1, 16, 16)
        got = np.asarray(ppmod.dering(x, 1))
        want = np_dering(x, 1)
        assert np.array_equal(got, want)

    def test_flat_block_untouched(self):
        x = np.full((1, 16, 16), 100, np.uint8)
        assert np.array_equal(np.asarray(ppmod.dering(x, 1)), x)


def np_autolevels(y, fullyrange):
    n, h, w = y.shape
    out = np.empty_like(y)
    for fi in range(n):
        flat = y[fi].astype(np.int64).ravel()
        total = flat.size
        hist = np.bincount(flat, minlength=256)
        cdf = np.cumsum(hist)
        tail = total // 256
        lo = int(np.argmax(cdf > tail))
        hi = 255 - int(np.argmax((cdf < total - tail)[::-1]))
        hi = max(hi, lo + 1)
        out_lo, out_hi = (0, 255) if fullyrange else (16, 235)
        scale = (out_hi - out_lo) / float(hi - lo)
        v = (flat - lo).astype(np.float32) * np.float32(scale) + out_lo
        out[fi] = np.clip(v + 0.5, 0, 255).astype(
            np.uint8).reshape(h, w)
    return out


class TestAutoLevels:
    @pytest.mark.parametrize("fullyrange", [False, True])
    def test_golden(self, fullyrange):
        y = (rand_u8(2, 16, 16) // 2 + 60).astype(np.uint8)
        got = np.asarray(ppmod.autolevels(y, fullyrange))
        want = np_autolevels(y, fullyrange)
        assert np.array_equal(got, want)

    def test_stretches_range(self):
        y = (rand_u8(1, 32, 32) // 4 + 96).astype(np.uint8)  # 96..159
        out = np.asarray(ppmod.autolevels(y, True))
        assert out.min() < 16 and out.max() > 230


# ------------------------------------------------------------------ #
# filter module behavior

def make_batch(frames_y, u=None, v=None):
    n, h, w = frames_y.shape
    if u is None:
        u = rand_u8(n, h // 2, w // 2)
    if v is None:
        v = rand_u8(n, h // 2, w // 2)
    return FrameBatch.from_numpy(y=frames_y, u=u, v=v,
                                 fmt=F.YUV420P)


class TestPPFilter:
    def test_registry_and_default_preset(self):
        f = new_module(ModuleKind.FILTER, "pp", Job())
        assert set(f.active) >= {"hb", "vb", "dr", "al"}

    def test_apply_shapes(self):
        f = new_module(ModuleKind.FILTER, "pp", Job(), options="de")
        fb = make_batch(blocky(3, 32, 32))
        st = f.init_state(32, 32, F.YUV420P)
        out, st = f.apply(fb, st)
        assert np.asarray(out.y).shape == (3, 32, 32)
        assert np.asarray(out.u).shape == (3, 16, 16)

    def test_nochrom_leaves_chroma(self):
        f = new_module(ModuleKind.FILTER, "pp", Job(),
                       options="hb:y/vb:y")
        fb = make_batch(blocky(2, 32, 32))
        out, _ = f.apply(fb, None)
        assert np.array_equal(np.asarray(out.u), np.asarray(fb.u))
        assert np.array_equal(np.asarray(out.v), np.asarray(fb.v))

    def test_pre_flag_moves_slot(self):
        f = new_module(ModuleKind.FILTER, "pp", Job(),
                       options="pre/hb")
        assert f.slots == FilterSlot.PRE_M

    def test_rgb_passthrough(self):
        f = new_module(ModuleKind.FILTER, "pp", Job(), options="hb")
        rgb = rand_u8(2, 16, 16, 3)
        fb = FrameBatch.from_numpy(rgb=rgb, fmt=F.RGB24)
        out, _ = f.apply(fb, None)
        assert np.array_equal(np.asarray(out.rgb), rgb)

    def test_tn_batch_size_invariance(self):
        frames = rand_u8(8, 16, 16)
        u = rand_u8(8, 8, 8)
        v = rand_u8(8, 8, 8)

        def run(bs):
            f = new_module(ModuleKind.FILTER, "pp", Job(),
                           options="tn:8:16:32")
            st = f.init_state(16, 16, F.YUV420P)
            outs = []
            for i in range(0, 8, bs):
                fb = make_batch(frames[i:i + bs], u[i:i + bs],
                                v[i:i + bs])
                out, st = f.apply(fb, st)
                outs.append(np.asarray(out.y))
            return np.concatenate(outs)

        assert np.array_equal(run(1), run(8))
        assert np.array_equal(run(2), run(4))

    def test_bad_options_raise(self):
        with pytest.raises(ValueError):
            new_module(ModuleKind.FILTER, "pp", Job(),
                       options="bogusname")


class TestEndToEnd:
    def test_cli_pp(self, tmp_path):
        from tcforge_tpu.cli import main
        from tcforge_tpu.io.y4m import Y4MReader
        out = tmp_path / "out.y4m"
        rc = main(["-i", "test://", "-g", "64x32", "--max_frames", "6",
                   "-J", "pp=de", "-o", str(out), "--progress_off",
                   "-q"])
        assert rc == 0
        with Y4MReader(str(out)) as r:
            frames = list(r)
        assert len(frames) == 6
