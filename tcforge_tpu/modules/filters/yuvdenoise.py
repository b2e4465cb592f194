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


@register
class YuvDenoiseFilter(VideoFilter):
    info = ModuleInfo(name="yuvdenoise", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="yuvdenoise", comment="motion-compensated denoiser "
        "(mjpegtools)", capabilities="VY",
        params=[ParamSpec("threshold", "denoiser threshold", "d", 5, 0,
                          255),
                ParamSpec("delay", "average delay (strength)", "d", 3, 1,
                          8),
                ParamSpec("radius", "block search radius", "d", 4, 0, 8)])
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

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        thr = self.options["threshold"]
        delay = self.options["delay"]
        radius = self.options["radius"]

        def step(st, inputs):
            y, u, v = inputs
            seed = lambda p, a: jnp.where(st["init"], a,
                                          p.astype(jnp.int32))
            ay = denoise_plane(y, seed(y, st["y"]), delay, thr, radius,
                               True)
            au = denoise_plane(u, seed(u, st["u"]), delay, thr, 0, False)
            av = denoise_plane(v, seed(v, st["v"]), delay, thr, 0, False)
            new = {"init": jnp.ones((), jnp.bool_), "y": ay, "u": au,
                   "v": av}
            return new, (ay.astype(jnp.uint8), au.astype(jnp.uint8),
                         av.astype(jnp.uint8))

        new_state, (ys, us, vs) = jax.lax.scan(step, state,
                                               (fb.y, fb.u, fb.v))
        return fb.with_planes(y=ys, u=us, v=vs), new_state
