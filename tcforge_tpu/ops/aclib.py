"""Byte-wise blend primitives: the ac_average / ac_rescale arithmetic.

Re-implementation of ``aclib/average.c`` and ``aclib/rescale.c`` semantics
as vectorized jnp ops.  Where the reference runtime-dispatches
MMX/SSE2/AMD64 variants behind function pointers (``aclib/accore.c:29-40``),
here XLA fuses these expressions into surrounding computations, and the
Pallas kernels in :mod:`tcforge_tpu.ops.kernels` provide the
hand-optimized path for the standalone hot loops.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def average(src1: Array, src2: Array) -> Array:
    """Rounded byte-wise average: ``(a + b + 1) / 2``.

    Exact re-expression of aclib/average.c:33-39.  Inputs may be any
    integer dtype; output matches input dtype.
    """
    a = src1.astype(jnp.int32)
    b = src2.astype(jnp.int32)
    return ((a + b + 1) >> 1).astype(src1.dtype)


def rescale(src1: Array, src2: Array, weight1: int, weight2: int) -> Array:
    """16.16 fixed-point weighted blend of two byte buffers.

    ``dest = (a*w1 + b*w2 + 32768) >> 16`` with the reference's saturation
    shortcut: weight >= 0x10000 returns that input unchanged
    (aclib/rescale.c:23-46).  `weight1`/`weight2` are Python ints
    (0..65536); callers with traced weights should inline the formula.
    """
    if weight1 >= 0x10000:
        return src1
    if weight2 >= 0x10000:
        return src2
    a = src1.astype(jnp.int32)
    b = src2.astype(jnp.int32)
    out = (a * int(weight1) + b * int(weight2) + 32768) >> 16
    return out.astype(src1.dtype)


def rescale_arrays(src1: Array, src2: Array,
                   weight1: Array, weight2: Array) -> Array:
    """rescale() with per-element (broadcastable) int32 weight arrays.

    Used by the fast block resize (tcv_resize), where each output pixel
    has its own 2-tap weights.  Keeps the exact integer semantics of
    rescale_pixel (libtcvideo/tcvideo.c:525-540): weight1 >= 0x10000
    selects src1 verbatim.
    """
    a = src1.astype(jnp.int32)
    b = src2.astype(jnp.int32)
    w1 = weight1.astype(jnp.int32)
    w2 = weight2.astype(jnp.int32)
    blended = (a * w1 + b * w2 + 32768) >> 16
    out = jnp.where(w1 >= 0x10000, a, blended)
    return out.astype(src1.dtype)
