"""yuvdenoise — motion-compensated temporal denoiser.

Rebuild of ``filter/yuvdenoise/`` (mjpegtools' denoiser), full
pipeline per frame (denoise.c:denoise_frame):

  chroma pre-increment (filter_yuvdenoise.c:307-329, including its
  dead-store clamp bug: only the LOW clamp survives, then &0xff)
  -> contrast_frame (always applied, clamps to studio range even at
  contrast=100) -> optional deinterlace -> per-8x8-block motion
  search against the running average with low-contrast and border
  gating (low_contrast_block: Y 8x8 at 2T/3, Cr 4x4 at 2T/3, Cb 4x4
  at T/2, low iff count<=8) -> scene-change detection
  (bad SAD00 blocks > w*h*scene_thres/(64*100) arms a do_reset
  counter that re-seeds the averages on the NEXT frames)
  -> average_frame ``tmp=(avg_mc*delay+ref)/(delay+1)``
  -> correct_frame2 (luma simple blend; chroma vertical 3-tap with
  the C's in-place sequential row dependency and the flat-index
  ``c>W2`` quirk that exempts row 1 col 0)
  -> denoise_frame_pass2 (second average ``avg2=(avg2*2+tmp)/3``
  blended back toward tmp: luma f1=255*d/pp, chroma
  f1=255*(d-pp)/pp) -> sharpen_frame (in place on avg2 — feeds back
  into the next frame) -> black_border (also on avg2) ->
  output = avg2, avg = tmp.

mode=2 is PASS-II-only (tmp=ref, avg untouched, denoise.c:731-747);
mode=1 (interlaced) runs the same per-frame path on each field
separately (the C reinterprets the frame as w*2 x h/2 — a memory
trick over the same field data; we split fields explicitly).

Differences from the C (documented redesign): the hierarchical
4:4->2:2->1:1->half-pel search (mb_search_44/22/11/00) is replaced by
an exhaustive vectorized FULL-PEL search over the same +/-radius
window; chroma blocks are compensated with the truncated half-vector
exactly like move_block's (x+qx)/2 arithmetic, but without the
half-pel second tap.  Defaults mirror the reference: radius 8
(clamped up to 8 like filter_yuvdenoise.c:219), threshold 5,
pp_threshold 4, delay 3, sharpen 125, increment_cb/cr 2, do_reset 2,
scene_thres 50%%, block_thres 1024.  `postprocess` is parsed but
(like the reference, which never reads denoiser.postprocess) has no
effect — pass 2 always runs.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)

Y_LO, Y_HI = 16, 235
C_LO, C_HI = 16, 240


def _block_view(p: jnp.ndarray, b: int = 8) -> jnp.ndarray:
    """(H, W) -> (H//b, W//b, b, b)."""
    h, w = p.shape
    return p.reshape(h // b, b, w // b, b).transpose(0, 2, 1, 3)


def _unblock(blocks: jnp.ndarray) -> jnp.ndarray:
    bh, bw, b, _ = blocks.shape
    return blocks.transpose(0, 2, 1, 3).reshape(bh * b, bw * b)


def _trunc_div(v: jnp.ndarray, d: int) -> jnp.ndarray:
    """C integer division (truncation toward zero) for signed values."""
    return jnp.sign(v) * (jnp.abs(v) // d)


def contrast_plane(p: jnp.ndarray, contrast: int, lo: int,
                   hi: int) -> jnp.ndarray:
    """contrast_frame (denoise.c:68-125): (v-128)*c/100+128, clamped
    to the studio range (applied even at c=100 — the clamp always
    runs in the reference)."""
    v = p.astype(jnp.int32) - 128
    v = _trunc_div(v * contrast, 100) + 128
    return jnp.clip(v, lo, hi).astype(jnp.uint8)


def sharpen_plane(p: jnp.ndarray, sharpen: int) -> jnp.ndarray:
    """sharpen_frame (denoise.c:560-583): m = 2x2 forward average,
    out = clamp(m + (p-m)*s/100).  2D edge-clamped neighborhood (the
    C walks the flat array into its frame margin at borders — an
    artifact, not intent)."""
    pi = p.astype(jnp.int32)
    r = jnp.pad(pi, ((0, 1), (0, 1)), mode="edge")
    m = (r[:-1, :-1] + r[:-1, 1:] + r[1:, :-1] + r[1:, 1:]) // 4
    d = _trunc_div((pi - m) * sharpen, 100)
    return jnp.clip(m + d, Y_LO, Y_HI).astype(jnp.uint8)


def low_contrast_blocks(ref_y, avg_y, ref_u, avg_u, ref_v, avg_v,
                        threshold: int) -> jnp.ndarray:
    """low_contrast_block (denoise.c:128-199) per 8x8 block: count Y
    pixels with |d| > 2T/3, Cr 4x4 with |d| > 2T/3, Cb 4x4 with
    |d| > T/2; low-contrast iff count <= 8."""
    dy = jnp.abs(avg_y - ref_y)
    du = jnp.abs(avg_u - ref_u)
    dv = jnp.abs(avg_v - ref_v)
    n = jnp.sum((_block_view(dy) > (2 * threshold // 3)), axis=(-2, -1))
    n = n + jnp.sum((_block_view(du, 4) > (2 * threshold // 3)),
                    axis=(-2, -1))
    n = n + jnp.sum((_block_view(dv, 4) > (threshold // 2)),
                    axis=(-2, -1))
    return n <= 8


def mc_search(ref: jnp.ndarray, avg: jnp.ndarray, radius: int,
              searched: jnp.ndarray):
    """Exhaustive full-pel block search of `avg` around each 8x8 block
    of `ref`.  Returns (best_sad, best_dy, best_dx); blocks outside
    `searched` keep the zero vector (their SAD is still the zero-
    vector SAD, matching the reference where unsearched blocks never
    contribute bad vectors)."""
    h, w = ref.shape
    refi = ref.astype(jnp.int32)
    avgi = avg.astype(jnp.int32)
    ref_blocks = _block_view(refi)
    pad = radius
    avg_pad = jnp.pad(avgi, pad, mode="edge")

    best_sad = jnp.sum(jnp.abs(_block_view(avgi) - ref_blocks),
                       axis=(-2, -1))
    zero_sad = best_sad
    bh, bw = best_sad.shape
    best_dy = jnp.zeros((bh, bw), jnp.int32)
    best_dx = jnp.zeros((bh, bw), jnp.int32)
    bx0 = jnp.arange(bw)[None, :] * 8
    by0 = jnp.arange(bh)[:, None] * 8
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            shifted = avg_pad[pad + dy:pad + dy + h,
                              pad + dx:pad + dx + w]
            sad = jnp.sum(jnp.abs(_block_view(shifted) - ref_blocks),
                          axis=(-2, -1))
            # vector validity (denoise.c:631-645): the moved block must
            # stay inside the plane (our edge-pad has no real margins)
            valid = ((bx0 + dx >= 0) & (bx0 + 8 + dx <= w)
                     & (by0 + dy >= 0) & (by0 + 8 + dy <= h))
            better = (sad < best_sad) & valid
            best_dy = jnp.where(better, dy, best_dy)
            best_dx = jnp.where(better, dx, best_dx)
            best_sad = jnp.where(better, sad, best_sad)
    best_dy = jnp.where(searched, best_dy, 0)
    best_dx = jnp.where(searched, best_dx, 0)
    best_sad = jnp.where(searched, best_sad, zero_sad)
    return best_sad, best_dy, best_dx


def _gather_blocks(plane: jnp.ndarray, vy: jnp.ndarray, vx: jnp.ndarray,
                   b: int) -> jnp.ndarray:
    """Move each bxb block of `plane` by its (vy,vx) vector (clamped
    gather — vectors are pre-validated to stay inside)."""
    h, w = plane.shape
    bh, bw = vy.shape
    by = jnp.arange(bh)[:, None, None, None] * b
    bx = jnp.arange(bw)[None, :, None, None] * b
    yy = jnp.clip(by + jnp.arange(b)[None, None, :, None]
                  + vy[:, :, None, None], 0, h - 1)
    xx = jnp.clip(bx + jnp.arange(b)[None, None, None, :]
                  + vx[:, :, None, None], 0, w - 1)
    return _unblock(plane[yy, xx])


def correct_luma(ref: jnp.ndarray, tmp: jnp.ndarray,
                 threshold: int) -> jnp.ndarray:
    """correct_frame2, Y part (denoise.c:385-412)."""
    q = jnp.abs(ref - tmp)
    f1 = jnp.clip(255 * (q - threshold) // max(1, threshold), 0, 255)
    blended = (tmp * (255 - f1) + ref * f1) // 255
    return jnp.where(q > threshold, blended, tmp)


def correct_chroma(ref: jnp.ndarray, tmp: jnp.ndarray,
                   threshold: int) -> jnp.ndarray:
    """correct_frame2, chroma part (denoise.c:414-478): vertical 3-tap
    blend for interior flat indices (W2 < c < W2*H2-W2 — note row 1
    col 0 is exempt), sequential in place: the row above is already
    corrected when a row is processed."""
    h2, w2 = ref.shape
    thr = max(1, threshold)
    q = jnp.abs(ref - tmp)
    f1 = jnp.clip(255 * (q - threshold) // thr, 0, 255)
    f2 = 255 - f1
    app = q > threshold
    simple = (tmp * f2 + ref * f1) // 255

    src_above = jnp.roll(ref, 1, axis=0)
    src_below = jnp.roll(ref, -1, axis=0)
    tmp_below = jnp.roll(tmp, -1, axis=0)

    cols = jnp.arange(w2)
    rows = jnp.arange(h2)
    flat0 = rows[:, None] * w2 + cols[None, :]
    three = (flat0 > w2) & (flat0 < w2 * h2 - w2)

    def row_step(prev_corrected, xs):
        (ref_r, tmp_r, sa, sb, tb, f1r, f2r, appr, simpler,
         threer) = xs
        tt = ((ref_r + sb + sa) * f1r // 3
              + (tmp_r + tb + prev_corrected) * f2r // 3) // 255
        out = jnp.where(appr, jnp.where(threer, tt, simpler), tmp_r)
        return out, out

    _, out = jax.lax.scan(
        row_step, tmp[0] * 0,
        (ref, tmp, src_above, src_below, tmp_below, f1, f2, app,
         simple, three))
    return out


def pass2_plane(tmp: jnp.ndarray, avg2: jnp.ndarray, pp: int,
                luma: bool) -> jnp.ndarray:
    """denoise_frame_pass2 (denoise.c:486-553)."""
    pp = max(1, pp)
    a = (avg2 * 2 + tmp) // 3
    d = jnp.abs(a - tmp)
    f1 = jnp.clip((255 * d) // pp if luma
                  else (255 * (d - pp)) // pp, 0, 255)
    return (tmp * f1 + a * (255 - f1)) // 255


def denoise_plane(ref: jnp.ndarray, avg: jnp.ndarray, delay: int,
                  threshold: int, radius: int,
                  luma: bool) -> jnp.ndarray:
    """Back-compat single-plane step (MC average + temporal blend +
    luma correction) used by unit tests."""
    refi = ref.astype(jnp.int32)
    if radius > 0:
        searched = jnp.ones([s // 8 for s in ref.shape], bool)
        _, vy, vx = mc_search(ref, avg, radius, searched)
        mc = _gather_blocks(avg.astype(jnp.int32), vy, vx, 8)
    else:
        mc = avg.astype(jnp.int32)
    tmp = (mc * delay + refi) // (delay + 1)
    return correct_luma(refi, tmp, threshold)


@register
class YuvDenoiseFilter(VideoFilter):
    """filter_yuvdenoise.c: full mjpegtools denoiser pipeline (see
    module docstring)."""

    info = ModuleInfo(name="yuvdenoise", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="yuvdenoise", comment="motion-compensated denoiser "
        "(mjpegtools)", capabilities="VY",
        params=[ParamSpec("threshold", "denoiser threshold", "d", 5, 0,
                          255),
                ParamSpec("pp_threshold", "pass II threshold", "d", 4,
                          0, 255),
                ParamSpec("delay", "average delay (strength)", "d", 3, 1,
                          255),
                ParamSpec("radius", "block search radius", "d", 8, 0,
                          24),
                ParamSpec("postprocess", "internal postprocessing "
                          "(parsed, unused — as in the reference)",
                          "d", 1, 0, 1),
                ParamSpec("luma_contrast", "luma contrast %", "d",
                          100, 0, 255),
                ParamSpec("chroma_contrast", "chroma contrast %", "d",
                          100, 0, 255),
                ParamSpec("sharpen", "sharpness %", "d", 125, 0, 255),
                ParamSpec("increment_cb", "Cb constant add", "d", 2,
                          -128, 127),
                ParamSpec("increment_cr", "Cr constant add", "d", 2,
                          -128, 127),
                ParamSpec("deinterlace", "deinterlace first", "b", 0),
                ParamSpec("mode", "0 progressive|1 interlaced|2 pass "
                          "II only", "d", 0, 0, 2),
                ParamSpec("scene_thres", "% bad blocks for scene "
                          "change", "d", 50, 0, 100),
                ParamSpec("block_thres", "SAD above this is a bad "
                          "block", "d", 1024, 0, 1 << 30),
                ParamSpec("do_reset", "reset for n frames after scene "
                          "change", "d", 2, 0, 1 << 30),
                ParamSpec("border", "active area XxY-WxH", "s", ""),
                ParamSpec("pre", "run as pre filter", "d", 0, 0, 1)])
    slots = FilterSlot.PRE_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        if not self.options["pre"]:
            # reference default is post (`pre` defaults 0,
            # filter_yuvdenoise.c:145)
            self.slots = FilterSlot.POST_M
        else:
            self.slots = FilterSlot.PRE_M
        if self.options["radius"] < 8:
            self.options["radius"] = 8     # filter_yuvdenoise.c:219
        if self.options["delay"] < 1:
            self.options["delay"] = 1

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        if fmt != ImageFormat.YUV420P:
            raise ValueError(
                "yuvdenoise: filter is not capable for RGB-Mode !")
        if width % 16 or height % 16:
            raise ValueError("yuvdenoise needs multiple-of-16 geometry")
        z = lambda h, w: jnp.zeros((h, w), jnp.int32)
        return {"init": jnp.zeros((), jnp.bool_),
                "reset": jnp.zeros((), jnp.int32),
                "y": z(height, width), "u": z(height // 2, width // 2),
                "v": z(height // 2, width // 2),
                "y2": z(height, width),
                "u2": z(height // 2, width // 2),
                "v2": z(height // 2, width // 2)}

    def _parse_border(self, w: int, h: int):
        s = str(self.options["border"]).strip()
        if not s:
            return None
        parts = [int(t) for t in s.replace("x", ",").replace("-", ",")
                 .replace("+", ",").split(",") if t != ""]
        if len(parts) != 4:
            raise ValueError("yuvdenoise: border wants XxY-WxH")
        x, y, bw, bh = parts
        if bw == 0:       # filter_yuvdenoise.c:245 full-frame fixup
            return None
        return x, y, bw, bh

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        o = self.options
        thr = int(o["threshold"])
        pp = int(o["pp_threshold"])
        delay = int(o["delay"])
        radius = int(o["radius"])
        mode = int(o["mode"])
        lc, cc = int(o["luma_contrast"]), int(o["chroma_contrast"])
        sharpen = int(o["sharpen"])
        inc_cb, inc_cr = int(o["increment_cb"]), int(o["increment_cr"])
        deint = bool(int(o["deinterlace"]))
        border = self._parse_border(fb.width, fb.height)
        do_reset = int(o["do_reset"])
        scene_thres = int(o["scene_thres"])
        block_thres = int(o["block_thres"])
        h, w = fb.height, fb.width
        scene_limit = w * h * scene_thres // (64 * 100)
        interlaced = mode == 1 and (h // 4) % 8 == 0

        def pre_inc(c, inc):
            # the reference's buggy pre-fixup: hi clamp dead-stored,
            # result = max(v+inc, C_LO) & 0xff
            if not inc:
                return c
            v = jnp.maximum(c.astype(jnp.int32) + inc, C_LO) & 0xff
            return v.astype(jnp.uint8)

        def split_fields(p):
            return p[0::2], p[1::2]

        def join_fields(top, bot):
            return jnp.stack([top, bot], axis=1).reshape(
                top.shape[0] * 2, top.shape[1])

        def denoise_one(ry, ru, rv, ay, au, av):
            """mode 0 core on int32 ref/avg planes -> tmp planes."""
            searched = ~low_contrast_blocks(ry, ay, ru, au, rv, av, thr)
            if border is not None:
                bx, by, bw_, bh_ = border
                hh, ww = ry.shape
                colx = jnp.arange(ww // 8) * 8
                rowy = jnp.arange(hh // 8) * 8
                inside = ((colx[None, :] > bx) & (colx[None, :] < bx + bw_)
                          & (rowy[:, None] > by)
                          & (rowy[:, None] < by + bh_))
                searched = searched & inside
            sad, vy, vx = mc_search(ry, ay, radius, searched)
            bad = jnp.sum((searched & (sad > block_thres))
                          .astype(jnp.int32))
            mc_y = _gather_blocks(ay, vy, vx, 8)
            cvy = _trunc_div(vy, 2)
            cvx = _trunc_div(vx, 2)
            mc_u = _gather_blocks(au, cvy, cvx, 4)
            mc_v = _gather_blocks(av, cvy, cvx, 4)
            ty = (mc_y * delay + ry) // (delay + 1)
            tu = (mc_u * delay + ru) // (delay + 1)
            tv = (mc_v * delay + rv) // (delay + 1)
            ty = correct_luma(ry, ty, thr)
            tu = correct_chroma(ru, tu, thr)
            tv = correct_chroma(rv, tv, thr)
            return ty, tu, tv, bad

        def step(st, inputs):
            raw_y, raw_u, raw_v = inputs
            raw_u = pre_inc(raw_u, inc_cb)
            raw_v = pre_inc(raw_v, inc_cr)
            seeded = (~st["init"]) | (st["reset"] > 0)
            seed = lambda raw, a: jnp.where(seeded,
                                            raw.astype(jnp.int32), a)
            ay, au, av = (seed(raw_y, st["y"]), seed(raw_u, st["u"]),
                          seed(raw_v, st["v"]))
            a2y, a2u, a2v = (seed(raw_y, st["y2"]),
                             seed(raw_u, st["u2"]),
                             seed(raw_v, st["v2"]))
            reset = jnp.maximum(st["reset"] - 1, 0)

            y = raw_y
            if deint:
                from tcforge_tpu.ops import video
                y = video.deint_interpolate(y)
            ry = contrast_plane(y, lc, Y_LO, Y_HI).astype(jnp.int32)
            ru = contrast_plane(raw_u, cc, C_LO, C_HI).astype(jnp.int32)
            rv = contrast_plane(raw_v, cc, C_LO, C_HI).astype(jnp.int32)

            bad = jnp.zeros((), jnp.int32)
            if mode == 2:
                ty, tu, tv = ry, ru, rv
                new_avg = (ay, au, av)       # avg untouched in mode 2
            elif interlaced:
                parts = []
                bads = []
                for f in (0, 1):
                    sel = lambda p: p[f::2]
                    selc = lambda p: p[f::2]
                    fy, fu, fv, b_ = denoise_one(
                        sel(ry), selc(ru), selc(rv),
                        sel(ay), selc(au), selc(av))
                    parts.append((fy, fu, fv))
                    bads.append(b_)
                ty = join_fields(parts[0][0], parts[1][0])
                tu = join_fields(parts[0][1], parts[1][1])
                tv = join_fields(parts[0][2], parts[1][2])
                bad = bads[0] + bads[1]
                new_avg = (ty, tu, tv)
            else:
                ty, tu, tv, bad = denoise_one(ry, ru, rv, ay, au, av)
                new_avg = (ty, tu, tv)

            oy = pass2_plane(ty, a2y, pp, True)
            ou = pass2_plane(tu, a2u, pp, False)
            ov = pass2_plane(tv, a2v, pp, False)
            if sharpen:
                oy = sharpen_plane(oy.astype(jnp.uint8),
                                   sharpen).astype(jnp.int32)
            if border is not None:
                bx, by, bw_, bh_ = border
                hh, ww = oy.shape
                yy, xx = jnp.mgrid[0:hh, 0:ww]
                inside = ((xx >= bx) & (xx < bx + bw_)
                          & (yy >= by) & (yy < by + bh_))
                oy = jnp.where(inside, oy, 16)
                ci = inside[::2, ::2]
                ou = jnp.where(ci, ou, 128)
                ov = jnp.where(ci, ov, 128)

            scene = (do_reset > 0) & (bad > scene_limit)
            new_reset = jnp.where(scene, do_reset, reset)
            new = {"init": jnp.ones((), jnp.bool_), "reset": new_reset,
                   "y": new_avg[0], "u": new_avg[1], "v": new_avg[2],
                   "y2": oy, "u2": ou, "v2": ov}
            return new, (oy.astype(jnp.uint8), ou.astype(jnp.uint8),
                         ov.astype(jnp.uint8))

        new_state, (ys, us, vs) = jax.lax.scan(step, state,
                                               (fb.y, fb.u, fb.v))
        return fb.with_planes(y=ys, u=us, v=vs), new_state
