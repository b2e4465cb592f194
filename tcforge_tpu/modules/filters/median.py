"""yuvmedian — thresholded pseudo-median (2dclean-style) denoiser.

Rebuild of ``filter/yuvdenoise/filter_yuvmedian.c`` (Mike Bernson's
mjpegtools median, itself derived from Jim Cassburi's 2dclean): for
every interior pixel, average the window values whose difference from
the centre stays strictly inside ``threshold``
(filter_yuvmedian.c:275-321).  If too few samples qualify
(``count <= ((2r+1)^2 + 2)/3``) a fixed 3x3 smoothing kernel
``(sum of 8 neighbours + 8*centre + 8) >> 4`` replaces the pseudo-median.
Borders of ``radius`` pixels are left untouched; luma and chroma run
with independent radii/thresholds, and ``interlace=1`` filters each
field separately (stride-doubled walk, filter_yuvmedian.c:212-232).
YUV-only like the reference (RGB rejected, line 118-121).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from jax import lax

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)


def median_plane(plane: jnp.ndarray, radius: int,
                 threshold: int) -> jnp.ndarray:
    """filter_yuvmedian.c:filter_buffer on a (..., H, W) uint8 plane.

    The window walk becomes a fori_loop over the (2r+1)^2 offsets with
    rolled views — wrap-around never matters because only interior
    pixels (>= radius from every edge) take the computed value.
    """
    p = plane.astype(jnp.int32)
    r = int(radius)
    rc = 2 * r + 1
    min_count = (rc * rc + 2) // 3

    def body(i, carry):
        total, count = carry
        dy = i // rc - r
        dx = i % rc - r
        q = jnp.roll(p, (-dy, -dx), axis=(-2, -1))
        diff = p - q
        ok = (diff < threshold) & (diff > -threshold)
        return (total + jnp.where(ok, q, 0),
                count + ok.astype(jnp.int32))

    total, count = lax.fori_loop(
        0, rc * rc, body, (jnp.zeros_like(p), jnp.zeros_like(p)))
    mean = total // jnp.maximum(count, 1)

    def sh(dy, dx):
        return jnp.roll(p, (-dy, -dx), axis=(-2, -1))

    fallback = ((sh(-1, -1) + sh(-1, 0) + sh(-1, 1) + sh(0, -1)
                 + (p << 3) + 8 + sh(0, 1)
                 + sh(1, -1) + sh(1, 0) + sh(1, 1)) >> 4)

    out = jnp.where(count <= min_count, fallback, mean)
    h, w = plane.shape[-2], plane.shape[-1]
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= r) & (yy < h - r) & (xx >= r) & (xx < w - r)
    return jnp.where(interior, out, p).astype(jnp.uint8)


def _median_fields(plane: jnp.ndarray, radius: int,
                   threshold: int) -> jnp.ndarray:
    top = median_plane(plane[..., 0::2, :], radius, threshold)
    bot = median_plane(plane[..., 1::2, :], radius, threshold)
    out = jnp.stack([top, bot], axis=-2)          # (..., H/2, 2, W)
    return out.reshape(plane.shape)


@register
class YuvMedianFilter(VideoFilter):
    """filter_yuvmedian.c: thresholded window average, per plane."""

    info = ModuleInfo(name="yuvmedian", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="yuvmedian", comment="mjpegs YUV median filter",
        capabilities="VYOE",
        params=[
            ParamSpec("radius_luma", "Radius for median (luma)", "d",
                      2, 1, 24),
            ParamSpec("radius_chroma", "Radius for median (chroma)", "d",
                      2, 1, 24),
            ParamSpec("threshold_luma", "Trigger threshold (luma)", "d",
                      2, 1, 32),
            ParamSpec("threshold_chroma", "Trigger threshold (chroma)",
                      "d", 2, 1, 32),
            ParamSpec("interlace", "Treat input as interlaced", "d",
                      0, 0, 1),
            ParamSpec("pre", "Run as a PRE filter", "d", 1, 0, 1)])
    slots = FilterSlot.PRE_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        if not self.options["pre"]:
            self.slots = FilterSlot.POST_M

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        if fmt == ImageFormat.RGB24:
            raise ValueError(
                "yuvmedian: filter is not capable for RGB-Mode !")
        if self.options["interlace"] and height % 2:
            raise ValueError(
                "yuvmedian: input images have odd number of lines - "
                "can't treats as interlaced!")
        return None

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        o = self.options
        run = _median_fields if o["interlace"] else median_plane
        y = run(fb.y, o["radius_luma"], o["threshold_luma"])
        u = v = None
        if fb.u is not None:
            u = run(fb.u, o["radius_chroma"], o["threshold_chroma"])
            v = run(fb.v, o["radius_chroma"], o["threshold_chroma"])
        return fb.with_planes(y=y, u=u, v=v), state
