"""xsharpen — 3x3 rank-order sharpening.

Rebuild of ``filter/filter_xsharpen.c`` (VirtualDub's xsharpen): for each
pixel find the brightest and dimmest pixel of its 3x3 window; if the
pixel is closer to one extreme and the gap to that extreme is under
`threshold`, blend it toward that extreme:
``out = (strength*extreme + (255-strength)*src) / 255``
(defaults strength=200, threshold=255, filter_xsharpen.c:158-160).
Borders pass through.

YUV mode operates on the luma plane; RGB mode ranks by the luma proxy
``(55r + 182g + 19b) >> 8`` and blends whole pixels.

Deviation noted: the reference's YUV loop reads a stale ``lumac``
(assigned only after the previous blend, filter_xsharpen.c:438-520), an
upstream bug producing order-dependent output; we use the current
pixel's luma for the decision — the intended semantics and what the RGB
path does.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)


def _window_minmax(luma: jnp.ndarray):
    """3x3 min/max over the interior of (..., H, W)."""
    h, w = luma.shape[-2], luma.shape[-1]
    vals = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            vals.append(luma[..., 1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx])
    stack = jnp.stack(vals)
    return stack.min(axis=0), stack.max(axis=0)


def xsharpen_luma(y: jnp.ndarray, strength: int,
                  threshold: int) -> jnp.ndarray:
    """YUV path: rank-order mapping on the luma plane."""
    src = y.astype(jnp.int32)
    h, w = src.shape[-2], src.shape[-1]
    c = src[..., 1:h - 1, 1:w - 1]
    lo, hi = _window_minmax(src)
    mindiff = c - lo
    maxdiff = hi - c
    to_max = (mindiff > maxdiff) & (maxdiff < threshold)
    to_min = (mindiff <= maxdiff) & (mindiff < threshold)
    target = jnp.where(to_max, hi, jnp.where(to_min, lo, c))
    mapped = (strength * target + (255 - strength) * c) // 255
    out = jnp.where(to_max | to_min, mapped, c)
    return y.at[..., 1:h - 1, 1:w - 1].set(out.astype(y.dtype))


def xsharpen_rgb(rgb: jnp.ndarray, strength: int,
                 threshold: int) -> jnp.ndarray:
    """RGB path: rank by luma proxy, blend whole pixels toward the
    extreme pixel (filter_xsharpen.c RGB loop)."""
    src = rgb.astype(jnp.int32)
    h, w = src.shape[-3], src.shape[-2]
    r, g, b = src[..., 0], src[..., 1], src[..., 2]
    luma = (55 * r + 182 * g + 19 * b) >> 8

    vals, pix = [], []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            vals.append(luma[..., 1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx])
            pix.append(src[..., 1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx, :])
    lstack = jnp.stack(vals)             # (9, ..., H-2, W-2)
    pstack = jnp.stack(pix)              # (9, ..., H-2, W-2, 3)
    imin = jnp.argmin(lstack, axis=0)
    imax = jnp.argmax(lstack, axis=0)
    lo = jnp.min(lstack, axis=0)
    hi = jnp.max(lstack, axis=0)
    pmin = jnp.take_along_axis(pstack, imin[None, ..., None], axis=0)[0]
    pmax = jnp.take_along_axis(pstack, imax[None, ..., None], axis=0)[0]

    c = lstack[4]
    csrc = pstack[4]
    mindiff = c - lo
    maxdiff = hi - c
    to_max = (mindiff > maxdiff) & (maxdiff < threshold)
    to_min = (mindiff <= maxdiff) & (mindiff < threshold)
    target = jnp.where(to_max[..., None], pmax,
                       jnp.where(to_min[..., None], pmin, csrc))
    mapped = (strength * target + (255 - strength) * csrc) // 255
    out = jnp.where((to_max | to_min)[..., None], mapped, csrc)
    return rgb.at[..., 1:h - 1, 1:w - 1, :].set(out.astype(rgb.dtype))


@register
class XsharpenFilter(VideoFilter):
    info = ModuleInfo(name="xsharpen", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="xsharpen", comment="VirtualDub's XSharpen filter",
        capabilities="VRY",
        params=[ParamSpec("strength", "mapping strength", "d", 200, 0, 255),
                ParamSpec("threshold", "mapping threshold", "d", 255, 0,
                          255)])
    slots = FilterSlot.POST_M

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        s = self.options["strength"]
        t = self.options["threshold"]
        if s == 0:
            return fb, state
        if fb.rgb is not None:
            return fb.with_planes(rgb=xsharpen_rgb(fb.rgb, s, t)), state
        return fb.with_planes(y=xsharpen_luma(fb.y, s, t)), state
