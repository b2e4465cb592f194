"""Pallas TPU kernels for the sequential-scan hot paths.

The hqdn3d cascade is three nonlinear IIR scans (along W, along H,
along time).  XLA's `lax.scan` pays per-iteration dispatch overhead and
cannot keep the carry in vector registers across iterations; these
kernels run the whole scan inside one Mosaic kernel with the carry
resident in VMEM/registers.

Data layout: the scanned axis becomes the leading axis and the
vectorized remainder is folded to (G, 8, 128) native VPU tiles, so each
scan step is exactly one vector-register row of work per tile
(see /opt/skills/guides/pallas_guide.md: tiling constraints).

Coefficients are evaluated in closed form (the PrecalcCoefs curve,
filter_hqdn3d.c:120-133) — a transcendental per element beats an 8192-
entry LUT gather by a wide margin on the VPU.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES          # 1024 elements per (8, 128) tile


def _gamma_of(dist25: float) -> float:
    return math.log(0.25) / math.log(1.0 - dist25 / 255.0 - 0.00001)


def _lpm_compute(prev: jnp.ndarray, curr: jnp.ndarray,
                 gamma: float) -> jnp.ndarray:
    """LowPassMul with closed-form coefficient (int32 in/out)."""
    d = (prev - curr + 0x10007FF) >> 12
    i = (d - 4096).astype(jnp.float32)
    simil = jnp.maximum(0.0, 1.0 - jnp.abs(i) * (1.0 / 4080.0))
    c = jnp.power(simil, jnp.float32(gamma)) * (65536.0 / 16.0) * i
    coef = jnp.where(c < 0, c - 0.5, c + 0.5).astype(jnp.int32)
    return curr + coef


def _pad_fold(x2d: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """(S, R) -> (S, G, 8, 128) with zero padding; returns (folded, R)."""
    s, r = x2d.shape
    rp = -(-r // TILE) * TILE
    if rp != r:
        x2d = jnp.pad(x2d, ((0, 0), (0, rp - r)))
    return x2d.reshape(s, rp // TILE, SUBLANES, LANES), r


def _unfold(x4d: jnp.ndarray, r: int) -> jnp.ndarray:
    s = x4d.shape[0]
    return x4d.reshape(s, -1)[:, :r]


# --------------------------------------------------------------------- #
# Spatial IIR scan kernel: out[0] = x[0]; out[s] = lpm(out[s-1], x[s])
#
# The scan axis S is chunked into the minor grid dimension so only
# S_CHUNK steps live in VMEM at a time; the carry persists across grid
# iterations in a VMEM scratch (TPU grids execute sequentially).

S_CHUNK = 256


def _spatial_kernel(x_ref, out_ref, carry_ref, *, gamma: float,
                    chunk: int):
    c = pl.program_id(1)

    # lpm(x, x) == x identically (d lands on the zero coefficient), so
    # seeding the carry with x[0] makes a uniform 0..chunk loop emit
    # out[0] = x[0] exactly like the reference's unfiltered first pixel.
    @pl.when(c == 0)
    def _():
        carry_ref[...] = x_ref[0, 0]

    def body(s, carry):
        nxt = _lpm_compute(carry, x_ref[s, 0], gamma)
        out_ref[s, 0] = nxt
        return nxt

    carry_ref[...] = jax.lax.fori_loop(0, chunk, body, carry_ref[...])


@partial(jax.jit, static_argnames=("gamma", "interpret"))
def spatial_scan(x2d: jnp.ndarray, gamma: float,
                 interpret: bool = False) -> jnp.ndarray:
    """IIR scan along axis 0 of an (S, R) int32 array (hqdn3d horizontal
    or vertical pass, vectorized over R)."""
    folded, r = _pad_fold(x2d)
    s, g = folded.shape[0], folded.shape[1]
    sp = -(-s // S_CHUNK) * S_CHUNK
    if sp != s:
        folded = jnp.pad(folded, ((0, sp - s), (0, 0), (0, 0), (0, 0)))
    out = pl.pallas_call(
        partial(_spatial_kernel, gamma=gamma, chunk=S_CHUNK),
        grid=(g, sp // S_CHUNK),
        in_specs=[pl.BlockSpec((S_CHUNK, 1, SUBLANES, LANES),
                               lambda j, c: (c, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((S_CHUNK, 1, SUBLANES, LANES),
                               lambda j, c: (c, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sp,) + folded.shape[1:],
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((SUBLANES, LANES), jnp.int32)],
        interpret=interpret,
    )(folded)
    return _unfold(out[:s], r)


# --------------------------------------------------------------------- #
# Temporal kernel: carries FrameAnt across frames, emits uint8 dest

def _temporal_kernel(x_ref, ant_ref, dest_ref, ant_out_ref, *,
                     gamma: float, steps: int):
    def body(s, ant):
        dst = _lpm_compute(ant << 8, x_ref[s, 0], gamma)
        new_ant = ((dst + 0x1000007F) >> 8) & 0xFFFF
        dest_ref[s, 0] = ((dst + 0x10007FFF) >> 16) & 0xFF
        return new_ant

    ant = jax.lax.fori_loop(0, steps, body, ant_ref[0])
    ant_out_ref[0] = ant


@partial(jax.jit, static_argnames=("gamma", "interpret"))
def temporal_scan(x2d: jnp.ndarray, ant1d: jnp.ndarray, gamma: float,
                  interpret: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Temporal low-pass over (N, P) int32 with (P,) int32 carry."""
    folded, r = _pad_fold(x2d)
    antf, _ = _pad_fold(ant1d[None])
    antf = antf[0]                      # (G, 8, 128)
    n, g = folded.shape[0], folded.shape[1]
    dest, ant_out = pl.pallas_call(
        partial(_temporal_kernel, gamma=gamma, steps=n),
        grid=(g,),
        in_specs=[pl.BlockSpec((n, 1, SUBLANES, LANES),
                               lambda j: (0, j, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, SUBLANES, LANES), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((n, 1, SUBLANES, LANES),
                                lambda j: (0, j, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, SUBLANES, LANES), lambda j: (j, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(folded.shape, jnp.int32),
                   jax.ShapeDtypeStruct(antf.shape, jnp.int32)),
        interpret=interpret,
    )(folded, antf)
    return _unfold(dest, r), _unfold(ant_out[None], r)[0]


# --------------------------------------------------------------------- #

def denoise_plane_pallas(frames: jnp.ndarray, frame_ant: jnp.ndarray,
                         spatial_dist25: float,
                         temporal_dist25: float
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full hqdn3d cascade via the Pallas kernels.

    Semantics identical to modules.filters.hqdn3d.denoise_plane with
    computed coefficients: (N, H, W) uint8 + (H, W) int32 carry ->
    (uint8 batch, new carry).
    """
    n, h, w = frames.shape
    gs = _gamma_of(spatial_dist25)
    gt = _gamma_of(temporal_dist25)
    interp = jax.default_backend() != "tpu"

    f = frames.astype(jnp.int32) << 16
    # horizontal: scan over W, vectorize over N*H
    hp = spatial_scan(f.transpose(2, 0, 1).reshape(w, n * h), gs, interp)
    hp = hp.reshape(w, n, h).transpose(1, 2, 0)
    # vertical: scan over H, vectorize over N*W
    vp = spatial_scan(hp.transpose(1, 0, 2).reshape(h, n * w), gs, interp)
    vp = vp.reshape(h, n, w).transpose(1, 0, 2)
    # temporal: scan over N, vectorize over H*W
    dest, new_ant = temporal_scan(vp.reshape(n, h * w),
                                  frame_ant.reshape(h * w), gt, interp)
    return (dest.reshape(n, h, w).astype(jnp.uint8),
            new_ant.reshape(h, w))
