"""msharpen — edge-masked spatial sharpening (anime-oriented).

Rebuild of ``filter/filter_msharpen.c`` (Donald Graft's MSharpen):
1. 3x3 separable box blur (truncating integer /3 per pass) of the
   RGB-space frame, borders copied from source;
2. edge mask from diagonal + (highq) vertical/horizontal blur
   differences against `threshold` — including the reference's quirk of
   testing g2-g3 twice (instead of r2-r3) on the anti-diagonal
   (filter_msharpen.c diagonal loop);
3. on masked pixels: v = clamp0(4*src - 3*blur), channel-jointly
   rescaled to 255 if any channel overflows, then blended
   ``(strength*v + (255-strength)*src) >> 8``.

The reference converts any input to BGRA32 first (tcv_convert); here YUV
input converts through the exact imgconvert math to canonical RGB and
back.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)
from tcforge_tpu.ops import colorspace


def msharpen_rgb(rgb: jnp.ndarray, strength: int, threshold: int,
                 mask_only: bool = False,
                 highq: bool = True) -> jnp.ndarray:
    """Apply msharpen to (..., H, W, 3) uint8 RGB."""
    src = rgb.astype(jnp.int32)
    h, w = rgb.shape[-3], rgb.shape[-2]

    # --- separable 3x3 box blur, truncating /3 each pass ------------- #
    work = (src[..., 0:h - 2, :, :] + src[..., 1:h - 1, :, :]
            + src[..., 2:h, :, :]) // 3                   # rows 1..h-2
    workf = jnp.pad(work, [(0, 0)] * (rgb.ndim - 3)
                    + [(1, 1), (0, 0), (0, 0)])
    blur = (workf[..., :, 0:w - 2, :] + workf[..., :, 1:w - 1, :]
            + workf[..., :, 2:w, :]) // 3                 # cols 1..w-2
    blur = jnp.pad(blur, [(0, 0)] * (rgb.ndim - 3)
                   + [(0, 0), (1, 1), (0, 0)])
    # border fixup: blur borders = src (filter_msharpen.c fixups)
    border = (jnp.zeros((h, w), bool).at[0, :].set(True)
              .at[h - 1, :].set(True).at[:, 0].set(True)
              .at[:, w - 1].set(True))
    blur = jnp.where(border[..., None], src, blur)

    # --- edge detection ---------------------------------------------- #
    bl = blur
    d_main = jnp.abs(bl[..., 0:h - 1, 0:w - 1, :]
                     - bl[..., 1:h, 1:w, :]) >= threshold        # b,g,r
    d_anti = jnp.abs(bl[..., 0:h - 1, 1:w, :]
                     - bl[..., 1:h, 0:w - 1, :]) >= threshold
    # reference quirk: anti-diagonal checks b and g (g twice), not r
    edge = (d_main.any(axis=-1)
            | d_anti[..., 0] | d_anti[..., 1])
    if highq:
        d_v = (jnp.abs(bl[..., 0:h - 1, :, :]
                       - bl[..., 1:h, :, :]) >= threshold).any(-1)
        d_h = (jnp.abs(bl[..., :, 0:w - 1, :]
                       - bl[..., :, 1:w, :]) >= threshold).any(-1)
        edge = edge | d_v[..., :, 0:w - 1] | d_h[..., 0:h - 1, :]
    mask = jnp.pad(edge, [(0, 0)] * (rgb.ndim - 3) + [(0, 1), (0, 1)])
    # mask borders zeroed (last row/col)
    mask = mask.at[..., h - 1, :].set(False).at[..., :, w - 1].set(False)

    if mask_only:
        return jnp.where(mask[..., None], 255, 0).astype(jnp.uint8)

    # --- sharpen ------------------------------------------------------ #
    v = jnp.maximum(0, 4 * src - 3 * blur)
    vmax = jnp.max(v, axis=-1, keepdims=True)
    v = jnp.where(vmax > 255, v * 255 // jnp.maximum(1, vmax), v)
    sharp = (strength * v + (255 - strength) * src) >> 8
    inner = ~border
    out = jnp.where((mask & inner)[..., None], sharp, src)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


@register
class MsharpenFilter(VideoFilter):
    info = ModuleInfo(name="msharpen", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="msharpen", comment="neural-anime sharpening (MSharpen)",
        version="1.0", capabilities="VRY",
        params=[ParamSpec("strength", "sharpening strength", "d", 100, 0,
                          255),
                ParamSpec("threshold", "edge detail threshold", "d", 10,
                          0, 255),
                ParamSpec("mask", "show detail mask", "d", 0, 0, 1),
                ParamSpec("highq", "high quality detection", "d", 1, 0, 1)])
    slots = FilterSlot.POST_M

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        was_yuv = fb.rgb is None
        work = colorspace.convert(fb, ImageFormat.RGB24) if was_yuv else fb
        out_rgb = msharpen_rgb(work.rgb, self.options["strength"],
                               self.options["threshold"],
                               bool(self.options["mask"]),
                               bool(self.options["highq"]))
        out = work.with_planes(rgb=out_rgb)
        if was_yuv:
            out = colorspace.convert(out, fb.format)
        return out, state
