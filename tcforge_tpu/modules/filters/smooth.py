"""smooth — single-frame chroma-guided luma smoothing.

Rebuild of ``filter/filter_smooth.c`` (smoothing with a chroma/luma
similarity gate): two passes (horizontal then vertical); each pixel
folds in neighbors at distance 1..range sequentially, blending
``nval = nval*(1-ratio) + neighbor*ratio`` with ``ratio =
strength/distance`` whenever the chroma difference (|dCr|+|dCb|) stays
under `cdiff` and the luma difference under `ldiff`
(filter_smooth.c:37-115).  Defaults: strength 0.25, cdiff 6, ldiff 8,
range 4 (filter_smooth.c:171-174).

Deviation noted: the reference indexes the chroma planes with
``(y*width)/2 + x/2`` — an out-of-plane read for the lower half of the
frame (a long-standing upstream bug).  We use the intended 4:2:0
indexing ``(y/2)*(width/2) + x/2``; results differ from the buggy C
exactly where the C reads out of bounds.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)


def _smooth_pass(y: jnp.ndarray, cr_full: jnp.ndarray,
                 cb_full: jnp.ndarray, axis: int, strength: float,
                 cdiff: int, ldiff: int, rng: int) -> jnp.ndarray:
    """One directional pass over (..., H, W) luma; `cr_full`/`cb_full`
    are chroma upsampled to luma resolution (the per-pixel chroma the C
    looks up)."""
    orig = y.astype(jnp.float32)          # 'ltbuf' snapshot + 'oval'
    nval = orig

    def shifted(arr, off):
        return jnp.roll(arr, -off, axis=axis)

    size = y.shape[axis]
    idx = jnp.arange(size)
    shape = [1] * y.ndim
    shape[axis] = size
    idx = idx.reshape(shape)

    for off in [o for o in range(-rng, rng + 1) if o != 0]:
        neighbor = shifted(orig, off)
        n_cr = shifted(cr_full, off)
        n_cb = shifted(cb_full, off)
        valid = (idx + off >= 0) & (idx + off < size)
        cd = (jnp.abs(cr_full - n_cr) + jnp.abs(cb_full - n_cb)) < cdiff
        ld = jnp.abs(neighbor - orig) < ldiff
        ratio = strength / abs(off)
        cond = valid & cd & ld
        nval = jnp.where(cond, nval * (1 - ratio) + neighbor * ratio, nval)
    return jnp.floor(nval + 0.5).astype(jnp.uint8)


@register
class SmoothFilter(VideoFilter):
    info = ModuleInfo(name="smooth", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="smooth", comment="single-frame denoise/smooth",
        version="0.2.3", capabilities="VY",
        params=[ParamSpec("strength", "blending factor", "f", 0.25, 0.0,
                          0.9),
                ParamSpec("cdiff", "max UV difference", "d", 6, 0, 255),
                ParamSpec("ldiff", "max Y difference", "d", 8, 0, 255),
                ParamSpec("range", "search range", "d", 4, 1, 16)])
    slots = FilterSlot.POST_M

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        if fb.rgb is not None:
            raise ValueError("smooth is YUV-only (filter_smooth.c:190)")
        s = min(0.9, self.options["strength"])
        cd, ld, rng = (self.options["cdiff"], self.options["ldiff"],
                       self.options["range"])
        sx, sy = fb.format.subsampling
        cb = jnp.repeat(jnp.repeat(fb.u.astype(jnp.float32), sy, axis=-2),
                        sx, axis=-1)
        cr = jnp.repeat(jnp.repeat(fb.v.astype(jnp.float32), sy, axis=-2),
                        sx, axis=-1)
        y = _smooth_pass(fb.y, cr, cb, -1, s, cd, ld, rng)
        y = _smooth_pass(y, cr, cb, -2, s, cd, ld, rng)
        return fb.with_planes(y=y), state
