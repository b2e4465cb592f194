"""yuvdenoise — motion-compensated temporal denoiser.

Rebuild of ``filter/yuvdenoise/`` (mjpegtools' denoiser): each 8x8 block
of the incoming frame finds its best match in the *running average*
frame by block search, the average is motion-compensated accordingly,
then updated as ``avg' = (avg_mc * delay + ref) / (delay + 1)``
(average_frame, denoise.c:272-315) and corrected back toward the input
where it deviates more than `threshold` with the reference's soft ramp
``f1 = clamp(255*(q - T)/T)`` (correct_frame2, denoise.c).

Differences from the C: the hierarchical 4:4->2:2->1:1 search
(mb_search_44/22/11/00) is replaced by an exhaustive vectorized search
over the same +/-radius window (identical minima for radius<=4, no
early-out approximations), and low-contrast blocks keep the zero vector
exactly like low_contrast_block().
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


def _block_view(p: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (H//8, W//8, 8, 8)."""
    h, w = p.shape
    return p.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def mc_average(ref: jnp.ndarray, avg: jnp.ndarray, radius: int,
               threshold: int) -> jnp.ndarray:
    """Return the motion-compensated average plane: for every 8x8 block
    of `ref`, the best-matching 8x8 region of `avg` within +/-radius."""
    h, w = ref.shape
    bh, bw = h // 8, w // 8
    refi = ref.astype(jnp.int32)
    avgi = avg.astype(jnp.int32)
    ref_blocks = _block_view(refi)                       # (bh,bw,8,8)

    pad = radius
    avg_pad = jnp.pad(avgi, pad, mode="edge")

    # seed with the zero vector so it wins all ties (no-motion bias)
    avg_blocks0 = _block_view(avgi)
    best_sad = jnp.sum(jnp.abs(avg_blocks0 - ref_blocks), axis=(-2, -1))
    best_dy = jnp.zeros((bh, bw), jnp.int32)
    best_dx = jnp.zeros((bh, bw), jnp.int32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            shifted = avg_pad[pad + dy:pad + dy + h,
                              pad + dx:pad + dx + w]
            cand = _block_view(shifted)
            sad = jnp.sum(jnp.abs(cand - ref_blocks), axis=(-2, -1))
            better = sad < best_sad
            best_dy = jnp.where(better, dy, best_dy)
            best_dx = jnp.where(better, dx, best_dx)
            best_sad = jnp.where(better, sad, best_sad)

    # low-contrast blocks keep the zero vector (low_contrast_block():
    # fewer than 8 pixels differing by > 2T/3 from the average)
    avg_blocks = _block_view(avgi)
    d = jnp.abs(avg_blocks - ref_blocks)
    contrast = jnp.sum((d > (2 * threshold // 3)).astype(jnp.int32),
                       axis=(-2, -1))
    low = contrast < 8
    best_dy = jnp.where(low, 0, best_dy)
    best_dx = jnp.where(low, 0, best_dx)

    # gather the chosen blocks
    by = jnp.arange(bh)[:, None, None, None] * 8
    bx = jnp.arange(bw)[None, :, None, None] * 8
    yy = by + jnp.arange(8)[None, None, :, None] \
        + best_dy[:, :, None, None] + pad
    xx = bx + jnp.arange(8)[None, None, None, :] \
        + best_dx[:, :, None, None] + pad
    mc_blocks = avg_pad[yy, xx]
    return mc_blocks.transpose(0, 2, 1, 3).reshape(h, w)


def denoise_plane(ref: jnp.ndarray, avg: jnp.ndarray, delay: int,
                  threshold: int, radius: int,
                  luma: bool) -> jnp.ndarray:
    """One yuvdenoise step for a plane: MC average, temporal blend,
    threshold correction.  Returns the new average (== output)."""
    refi = ref.astype(jnp.int32)
    mc = mc_average(ref, avg, radius, threshold) if radius > 0 \
        else avg.astype(jnp.int32)
    tmp = (mc * delay + refi) // (delay + 1)
    q = jnp.abs(refi - tmp)
    f1 = jnp.clip(255 * (q - threshold) // max(1, threshold), 0, 255)
    corrected = (tmp * (255 - f1) + refi * f1) // 255
    out = jnp.where(q > threshold, corrected, tmp)
    return out


def _trunc_div(v: jnp.ndarray, d: int) -> jnp.ndarray:
    """C integer division (truncation toward zero) for signed jnp
    int32 — the reference's `value /= 100` on negative values."""
    return jnp.sign(v) * (jnp.abs(v) // d)


def contrast_plane(p: jnp.ndarray, contrast: int, lo: int,
                   hi: int) -> jnp.ndarray:
    """contrast_frame (denoise.c:68-125): (v-128)*c/100+128, clamped
    to the studio range."""
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
    return jnp.clip(m + d, 16, 235).astype(jnp.uint8)


@register
class YuvDenoiseFilter(VideoFilter):
    """Full option surface of filter_yuvdenoise.c: threshold/delay/
    radius denoise core + luma/chroma contrast pre-pass, optional
    pre-deinterlace, sharpen post-pass, constant Cb/Cr increments
    (both clamps applied — the reference's second assignment at
    filter_yuvdenoise.c:317-318 dead-stores the high clamp), and the
    black active-image border (y=16 / chroma=128 outside, denoise.c
    black_border).  mode=2 (fast) skips the motion search."""

    info = ModuleInfo(name="yuvdenoise", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="yuvdenoise", comment="motion-compensated denoiser "
        "(mjpegtools)", capabilities="VY",
        params=[ParamSpec("threshold", "denoiser threshold", "d", 5, 0,
                          255),
                ParamSpec("delay", "average delay (strength)", "d", 3, 1,
                          8),
                ParamSpec("radius", "block search radius", "d", 4, 0, 8),
                ParamSpec("luma_contrast", "luma contrast %", "d",
                          100, 0, 255),
                ParamSpec("chroma_contrast", "chroma contrast %", "d",
                          100, 0, 255),
                ParamSpec("sharpen", "sharpness %", "d", 0, 0, 255),
                ParamSpec("increment_cb", "Cb constant add", "d", 0,
                          -128, 127),
                ParamSpec("increment_cr", "Cr constant add", "d", 0,
                          -128, 127),
                ParamSpec("deinterlace", "deinterlace first", "b", 0),
                ParamSpec("mode", "0 progressive|1 interlaced|2 fast",
                          "d", 0, 0, 2),
                ParamSpec("border", "active area x,y,w,h", "s", "")])
    slots = FilterSlot.PRE_M

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        if fmt != ImageFormat.YUV420P:
            raise ValueError("yuvdenoise needs YUV420P")
        if width % 8 or height % 8:
            raise ValueError("yuvdenoise needs multiple-of-8 geometry")
        return {"init": jnp.zeros((), jnp.bool_),
                "y": jnp.zeros((height, width), jnp.int32),
                "u": jnp.zeros((height // 2, width // 2), jnp.int32),
                "v": jnp.zeros((height // 2, width // 2), jnp.int32)}

    def _parse_border(self, w: int, h: int):
        s = str(self.options["border"]).strip()
        if not s:
            return None
        parts = [int(t) for t in s.replace("x", ",").replace("+", ",")
                 .split(",") if t != ""]
        if len(parts) != 4:
            raise ValueError("yuvdenoise: border wants x,y,w,h")
        x, y, bw, bh = parts
        if x == 0 and y == 0 and bw >= w and bh >= h:
            return None
        return x, y, bw, bh

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        thr = self.options["threshold"]
        delay = self.options["delay"]
        radius = (0 if int(self.options["mode"]) == 2
                  else self.options["radius"])
        lc = int(self.options["luma_contrast"])
        cc = int(self.options["chroma_contrast"])
        sharpen = int(self.options["sharpen"])
        inc_cb = int(self.options["increment_cb"])
        inc_cr = int(self.options["increment_cr"])
        deint = bool(int(self.options["deinterlace"])) \
            or int(self.options["mode"]) == 1
        border = self._parse_border(fb.width, fb.height)

        def pre_y(y):
            if deint:
                from tcforge_tpu.ops import video
                y = video.deint_interpolate(y)
            if lc != 100:
                y = contrast_plane(y, lc, 16, 235)
            return y

        def pre_c(c):
            return contrast_plane(c, cc, 16, 240) if cc != 100 else c

        def post_y(y):
            return sharpen_plane(y, sharpen) if sharpen else y

        def post_c(c, inc):
            if not inc:
                return c
            return jnp.clip(c.astype(jnp.int32) + inc, 16,
                            240).astype(jnp.uint8)

        def step(st, inputs):
            y, u, v = pre_y(inputs[0]), pre_c(inputs[1]), \
                pre_c(inputs[2])
            seed = lambda p, a: jnp.where(st["init"], a,
                                          p.astype(jnp.int32))
            ay = denoise_plane(y, seed(y, st["y"]), delay, thr, radius,
                               True)
            au = denoise_plane(u, seed(u, st["u"]), delay, thr, 0, False)
            av = denoise_plane(v, seed(v, st["v"]), delay, thr, 0, False)
            new = {"init": jnp.ones((), jnp.bool_), "y": ay, "u": au,
                   "v": av}
            oy = post_y(ay.astype(jnp.uint8))
            ou = post_c(au.astype(jnp.uint8), inc_cb)
            ov = post_c(av.astype(jnp.uint8), inc_cr)
            if border is not None:
                # black_border (denoise.c:23-66): outside the active
                # area the output is studio black
                bx, by, bw, bh = border
                hh, ww = oy.shape
                yy, xx = jnp.mgrid[0:hh, 0:ww]
                inside = ((xx >= bx) & (xx < bx + bw)
                          & (yy >= by) & (yy < by + bh))
                oy = jnp.where(inside, oy, 16).astype(jnp.uint8)
                ci = inside[::2, ::2]
                ou = jnp.where(ci, ou, 128).astype(jnp.uint8)
                ov = jnp.where(ci, ov, 128).astype(jnp.uint8)
            return new, (oy, ou, ov)

        new_state, (ys, us, vs) = jax.lax.scan(step, state,
                                               (fb.y, fb.u, fb.v))
        return fb.with_planes(y=ys, u=us, v=vs), new_state
