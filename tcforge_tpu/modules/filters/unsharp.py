"""unsharp — unsharp mask / gaussian blur.

Rebuild of ``filter/filter_unsharp.c`` (Remi Guyomarch), which implements
the Waltz-Miller running-sum FSM: 2*steps cascaded [1,1] accumulator
stages per axis, i.e. a separable *binomial* blur of width msize|1 with
edge replication, followed by

    res = src + (((src - round(blur)) * amount) >> 16)

with ``amount`` in 16.16 fixed point, ``round(blur) = (acc + halfscale)
>> scalebits``, ``scalebits = (stepsX + stepsY) * 2``
(filter_unsharp.c:62-117).  Positive amount sharpens, negative blurs.

TPU-native form: the FSM's delay lines become 2*steps vectorized
shift-add passes per axis over the whole batch, in uint32 (matching the
C accumulators' wraparound semantics).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)

MIN_MATRIX_SIZE = 3
MAX_MATRIX_SIZE = 63


def _binomial_blur_acc(img: jnp.ndarray, steps_x: int,
                       steps_y: int) -> jnp.ndarray:
    """Un-normalized binomial blur accumulator in uint32 over (..., H, W):
    pad by edge replication, then 2*steps shift-add passes per axis."""
    a = img.astype(jnp.uint32)
    if steps_x:
        pad = [(0, 0)] * (a.ndim - 1) + [(steps_x, steps_x)]
        a = jnp.pad(a, pad, mode="edge")
        for _ in range(2 * steps_x):
            a = a[..., 1:] + a[..., :-1]
    if steps_y:
        pad = [(0, 0)] * (a.ndim - 2) + [(steps_y, steps_y), (0, 0)]
        a = jnp.pad(a, pad, mode="edge")
        for _ in range(2 * steps_y):
            a = a[..., 1:, :] + a[..., :-1, :]
    return a


def unsharp_plane(img: jnp.ndarray, msize_x: int, msize_y: int,
                  amount: float) -> jnp.ndarray:
    """Apply the unsharp FSM math to a (..., H, W) uint8 plane.

    On TPU backends the whole cascade + sharpen runs inside one Pallas
    kernel (ops/kernels.py:unsharp_plane_pallas — one HBM read/write
    instead of ten materialized passes); bit-identical because u32
    addition commutes mod 2^32, so even the wraparound semantics
    survive the reordered cascade."""
    if amount == 0.0:
        return img
    import jax
    steps_x, steps_y = msize_x // 2, msize_y // 2
    if jax.default_backend() == "tpu" and steps_y <= 8 \
            and img.ndim == 3:
        from tcforge_tpu.ops.kernels import unsharp_plane_pallas
        return unsharp_plane_pallas(img, steps_x, steps_y, amount)
    scalebits = (steps_x + steps_y) * 2
    halfscale = jnp.uint32(1 << (scalebits - 1))
    amount_fx = jnp.int32(int(amount * 65536.0))
    acc = _binomial_blur_acc(img, steps_x, steps_y)
    blur = ((acc + halfscale) >> scalebits).astype(jnp.int32)
    src = img.astype(jnp.int32)
    res = src + (((src - blur) * amount_fx) >> 16)
    return jnp.clip(res, 0, 255).astype(jnp.uint8)


def _clamp_odd(v: int) -> int:
    return 1 | max(MIN_MATRIX_SIZE, min(MAX_MATRIX_SIZE, v))


@register
class UnsharpFilter(VideoFilter):
    info = ModuleInfo(name="unsharp", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="unsharp", comment="unsharp mask & gaussian blur",
        version="1.0.1", capabilities="VYO",
        params=[
            ParamSpec("amount", "luma+chroma (un)sharpness", "f", 0.0,
                      -2.0, 2.0),
            ParamSpec("matrix", "luma+chroma matrix size", "dxd", (0, 0)),
            ParamSpec("luma", "luma (un)sharpness", "f", 0.0, -2.0, 2.0),
            ParamSpec("luma_matrix", "luma matrix size", "dxd", (0, 0)),
            ParamSpec("chroma", "chroma (un)sharpness", "f", 0.0, -2.0, 2.0),
            ParamSpec("chroma_matrix", "chroma matrix size", "dxd", (0, 0)),
            ParamSpec("pre", "run as a pre filter", "d", 0, 0, 1)])
    slots = FilterSlot.POST_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        amount = self.options["amount"]
        mx, my = self.options["matrix"]
        if amount != 0.0 and mx and my:
            mx, my = _clamp_odd(mx), _clamp_odd(my)
            self.luma = (mx, my, amount)
            self.chroma = (mx, my, amount)
        else:
            lmx, lmy = self.options["luma_matrix"]
            cmx, cmy = self.options["chroma_matrix"]
            self.luma = (_clamp_odd(lmx), _clamp_odd(lmy),
                         self.options["luma"])
            self.chroma = (_clamp_odd(cmx), _clamp_odd(cmy),
                           self.options["chroma"])
        if self.options["pre"]:
            self.slots = FilterSlot.PRE_M

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        if fb.format != ImageFormat.YUV420P:
            raise ValueError("unsharp only supports YUV420P "
                             "(filter_unsharp.c:208)")
        lmx, lmy, lam = self.luma
        cmx, cmy, cam = self.chroma
        y = unsharp_plane(fb.y, lmx, lmy, lam)
        u = unsharp_plane(fb.u, cmx, cmy, cam)
        v = unsharp_plane(fb.v, cmx, cmy, cam)
        return fb.with_planes(y=y, u=u, v=v), state
