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


# bitmap path engages when it needs fewer vector ops than per-pair
# compares: ~3 ops per 32-index word + ~6 fixed vs ~3 per pair.
_BITMAP_MIN_GAIN = 4


def _apply_corr(coef: jnp.ndarray, idx: jnp.ndarray,
                corr: tuple, center: int = 0) -> jnp.ndarray:
    """Snap the closed-form f32 coefficient to the f64 LUT at the
    (statically baked) indices where this backend's pow lands on the
    wrong side of a rounding boundary.  ``corr`` is a tuple of
    (index, ±1) pairs measured by ``lut_correction`` against the
    kernel's OWN uncorrected curve, so the sum below makes the fast
    path bit-exact.

    The coefficient curve is an odd function of i = idx - center
    (simil depends on |i| only), so mismatches come in (center+j, δ),
    (center-j, -δ) pairs — every TPU tuple measured pairs fully.
    Paired entries are folded onto |i| and tested ONCE, then signed,
    halving the compare count (the correction sum is on the scan's
    carry critical path, measured ~37% of the cfg2 chain unfolded).

    When the folded ±1 indices cluster (measured TPU tuples cover
    17-43 indices with only 5-12 nonzero 32-index windows), the
    per-pair compares are replaced by two static bitmaps (+1 / -1
    deltas) over 32-index words: K word-selects on j>>5 followed by
    one lane-variable shift — ~3K+6 vector ops instead of ~3·npairs."""
    if not corr:
        return coef
    cd = dict(corr)
    pairs = {}                       # |i| -> delta on the i>0 side
    rest = []
    for k, dv in corr:
        j = k - center
        if j > 0 and cd.get(center - j) == -dv:
            pairs[j] = dv
        elif j < 0 and cd.get(center - j) == -dv:
            pass                     # folded into its positive twin
        else:
            rest.append((k, dv))
    adj = None
    bm = {j: dv for j, dv in pairs.items() if abs(dv) == 1}
    nwords = 0
    words = []
    if bm:
        pw = {}
        mw = {}
        for j, dv in bm.items():
            d = pw if dv == 1 else mw
            d[j >> 5] = d.get(j >> 5, 0) | (1 << (j & 31))
        wset = sorted(set(pw) | set(mw))
        words = [(w, pw.get(w, 0), mw.get(w, 0)) for w in wset]
        nwords = len(words)
    if bm and nwords + _BITMAP_MIN_GAIN < len(bm):
        i = idx - center
        j = jnp.abs(i)
        jw = j >> 5
        wp = wm = None
        for w, p, m in words:
            t = jw == w
            if p:
                pv = jnp.where(t, jnp.uint32(p), jnp.uint32(0))
                wp = pv if wp is None else wp | pv
            if m:
                mv = jnp.where(t, jnp.uint32(m), jnp.uint32(0))
                wm = mv if wm is None else wm | mv
        sh = (j & 31).astype(jnp.uint32)
        mag = jnp.zeros_like(coef)
        if wp is not None:
            mag = mag + ((wp >> sh) & 1).astype(jnp.int32)
        if wm is not None:
            mag = mag - ((wm >> sh) & 1).astype(jnp.int32)
        adj = jnp.where(i < 0, -mag, mag)
        pairs = {j: dv for j, dv in pairs.items() if j not in bm}
    if pairs:
        i = idx - center
        j = jnp.abs(i)
        mag = None
        for jk, dv in pairs.items():
            t = (j == jk).astype(jnp.int32)
            term = t if dv == 1 else t * jnp.int32(dv)
            mag = term if mag is None else mag + term
        signed = jnp.where(i < 0, -mag, mag)
        adj = signed if adj is None else adj + signed
    for k, dv in rest:
        t = (idx == k).astype(jnp.int32)
        term = t if dv == 1 else t * jnp.int32(dv)
        adj = term if adj is None else adj + term
    return coef + adj


def _lpm_compute(prev: jnp.ndarray, curr: jnp.ndarray,
                 gamma: float, corr: tuple = ()) -> jnp.ndarray:
    """LowPassMul with closed-form coefficient (int32 in/out).

    jnp.power is the right primitive here: Mosaic's pow lowering is
    ~10x closer to the f64 LUT than any exp/log composition writable
    at the jnp level (measured: 34 vs 634 mismatches of 8192 at
    dist25=4, and exp(g*log s), exp2, and log1p variants all lower to
    the same 634/max-10 result) — see the round-4 notes."""
    d = (prev - curr + 0x10007FF) >> 12
    i = (d - 4096).astype(jnp.float32)
    simil = jnp.maximum(0.0, 1.0 - jnp.abs(i) * (1.0 / 4080.0))
    c = jnp.power(simil, jnp.float32(gamma)) * (65536.0 / 16.0) * i
    coef = jnp.where(c < 0, c - 0.5, c + 0.5).astype(jnp.int32)
    return curr + _apply_corr(coef, d, corr, center=4096)


def _d3_lowpass(prev: jnp.ndarray, curr: jnp.ndarray,
                gamma: float, corr: tuple = ()) -> jnp.ndarray:
    """denoise3d LowPass with the closed-form coefficient curve
    (filter_denoise3d.c:187-199, uint8-domain int32): curr +
    round(simil^gamma * (prev-curr)).  lowpass(x, x) == x, so the
    chunk-0 seeding trick works here too."""
    di = prev - curr
    i = di.astype(jnp.float32)
    simil = jnp.maximum(0.0, 1.0 - jnp.abs(i) * (1.0 / 255.0))
    c = jnp.power(simil, jnp.float32(gamma)) * i
    coef = jnp.where(c < 0, c - 0.5, c + 0.5).astype(jnp.int32)
    return curr + _apply_corr(coef, di, corr, center=0)


_STEP_FNS = {"hq": _lpm_compute, "d3": _d3_lowpass}


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

S_CHUNK = 32
_VMEM_BUDGET = 14 << 20          # bytes for in+out double buffers


def _temporal_gmax(n: int) -> int:
    """Fold-width cap for the temporal scans.  The naive in+out model
    (4*n buffers) undercounts: the real scoped set is double-buffered
    in+out+carry-in+carry-out (4n+4 G-columns) plus ~6 G-wide live
    temporaries from the bitmap corrections in _apply_corr.  At n=4
    the old model picked gblk=169 -> 16.96M scoped (984K over the 16M
    limit, cfg7 caught it); this model picks 137 -> comfortably in."""
    return max(1, _VMEM_BUDGET // ((4 * n + 10) * TILE * 4))


def _spatial_kernel(x_ref, out_ref, carry_ref, *, gamma: float,
                    chunk: int, mode: str = "hq", corr: tuple = ()):
    c = pl.program_id(1)
    step = partial(_STEP_FNS[mode], corr=corr)

    # lpm(x, x) == x identically (d lands on the zero coefficient), so
    # seeding the carry with x[0] makes a uniform 0..chunk loop emit
    # out[0] = x[0] exactly like the reference's unfiltered first pixel.
    @pl.when(c == 0)
    def _():
        carry_ref[...] = x_ref[0]

    def body(s, carry):
        nxt = step(carry, x_ref[s], gamma)
        out_ref[s] = nxt
        return nxt

    carry_ref[...] = jax.lax.fori_loop(0, chunk, body, carry_ref[...])


@partial(jax.jit, static_argnames=("gamma", "interpret", "mode",
                                   "corr"))
def spatial_scan(x2d: jnp.ndarray, gamma: float,
                 interpret: bool = False, mode: str = "hq",
                 corr: tuple = ()) -> jnp.ndarray:
    """IIR scan along axis 0 of an (S, R) int32 array (hqdn3d horizontal
    or vertical pass, vectorized over R).

    Each sequential step processes as many (8, 128) tiles as fit in
    VMEM (ideally the whole vector width): the scan-step loop is
    latency-bound, so widening the per-step block amortizes loop
    overhead — measured 1.7x over one-tile steps at 1080p."""
    folded, r = _pad_fold(x2d)
    s, g = folded.shape[0], folded.shape[1]
    # widest G block whose in+out double buffers fit the VMEM budget
    gmax = max(1, _VMEM_BUDGET // (4 * 4 * S_CHUNK * TILE))
    nblk = -(-g // gmax)
    gblk = -(-g // nblk)                 # even split, minimal padding
    gp = nblk * gblk
    if gp != g:
        folded = jnp.pad(folded, ((0, 0), (0, gp - g), (0, 0), (0, 0)))
    sp = -(-s // S_CHUNK) * S_CHUNK
    if sp != s:
        folded = jnp.pad(folded, ((0, sp - s), (0, 0), (0, 0), (0, 0)))
    out = pl.pallas_call(
        partial(_spatial_kernel, gamma=gamma, chunk=S_CHUNK,
                mode=mode, corr=corr),
        grid=(nblk, sp // S_CHUNK),
        in_specs=[pl.BlockSpec((S_CHUNK, gblk, SUBLANES, LANES),
                               lambda j, c: (c, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((S_CHUNK, gblk, SUBLANES, LANES),
                               lambda j, c: (c, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sp, gp, SUBLANES, LANES),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((gblk, SUBLANES, LANES), jnp.int32)],
        interpret=interpret,
    )(folded)
    return _unfold(out[:s, :g], r)


# --------------------------------------------------------------------- #
# Temporal kernel: carries FrameAnt across frames, emits uint8 dest

def _temporal_kernel(x_ref, ant_ref, dest_ref, ant_out_ref, *,
                     gamma: float, steps: int, corr: tuple = ()):
    def body(s, ant):
        dst = _lpm_compute(ant << 8, x_ref[s], gamma, corr)
        new_ant = ((dst + 0x1000007F) >> 8) & 0xFFFF
        dest_ref[s] = ((dst + 0x10007FFF) >> 16) & 0xFF
        return new_ant

    ant = jax.lax.fori_loop(0, steps, body, ant_ref[...])
    ant_out_ref[...] = ant


@partial(jax.jit, static_argnames=("gamma", "interpret", "corr"))
def temporal_scan(x2d: jnp.ndarray, ant1d: jnp.ndarray, gamma: float,
                  interpret: bool = False, corr: tuple = ()
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Temporal low-pass over (N, P) int32 with (P,) int32 carry.

    Wide G blocks like spatial_scan: the batch-axis loop is short, so
    per-step width is what keeps the VPU busy."""
    folded, r = _pad_fold(x2d)
    antf, _ = _pad_fold(ant1d[None])
    antf = antf[0]                      # (G, 8, 128)
    n, g = folded.shape[0], folded.shape[1]
    gmax = _temporal_gmax(n)
    nblk = -(-g // gmax)
    gblk = -(-g // nblk)
    gp = nblk * gblk
    if gp != g:
        folded = jnp.pad(folded, ((0, 0), (0, gp - g), (0, 0), (0, 0)))
        antf = jnp.pad(antf, ((0, gp - g), (0, 0), (0, 0)))
    dest, ant_out = pl.pallas_call(
        partial(_temporal_kernel, gamma=gamma, steps=n, corr=corr),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((n, gblk, SUBLANES, LANES),
                               lambda j: (0, j, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gblk, SUBLANES, LANES),
                               lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((n, gblk, SUBLANES, LANES),
                                lambda j: (0, j, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((gblk, SUBLANES, LANES),
                                lambda j: (j, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, gp, SUBLANES, LANES),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((gp, SUBLANES, LANES),
                                        jnp.int32)),
        interpret=interpret,
    )(folded, antf)
    return (_unfold(dest[:, :g], r),
            _unfold(ant_out[None, :g], r)[0])


# --------------------------------------------------------------------- #
# denoise3d temporal kernel: the carry IS the previous output frame
# (filter_denoise3d.c:123-185 — frameprev overwritten per pixel)


def _temporal3d_kernel(x_ref, prev_ref, dest_ref, prev_out_ref, *,
                       gamma: float, steps: int, corr: tuple = ()):
    def body(s, prev):
        out = _d3_lowpass(prev, x_ref[s], gamma, corr)
        dest_ref[s] = out
        return out

    prev_out_ref[...] = jax.lax.fori_loop(0, steps, body,
                                          prev_ref[...])


@partial(jax.jit, static_argnames=("gamma", "interpret", "corr"))
def temporal3d_scan(x2d: jnp.ndarray, prev1d: jnp.ndarray,
                    gamma: float, interpret: bool = False,
                    corr: tuple = ()
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """denoise3d temporal IIR over (N, P) int32 with (P,) carry."""
    folded, r = _pad_fold(x2d)
    pf, _ = _pad_fold(prev1d[None])
    pf = pf[0]
    n, g = folded.shape[0], folded.shape[1]
    gmax = _temporal_gmax(n)
    nblk = -(-g // gmax)
    gblk = -(-g // nblk)
    gp = nblk * gblk
    if gp != g:
        folded = jnp.pad(folded, ((0, 0), (0, gp - g), (0, 0), (0, 0)))
        pf = jnp.pad(pf, ((0, gp - g), (0, 0), (0, 0)))
    dest, prev_out = pl.pallas_call(
        partial(_temporal3d_kernel, gamma=gamma, steps=n, corr=corr),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((n, gblk, SUBLANES, LANES),
                               lambda j: (0, j, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((gblk, SUBLANES, LANES),
                               lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((n, gblk, SUBLANES, LANES),
                                lambda j: (0, j, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((gblk, SUBLANES, LANES),
                                lambda j: (j, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, gp, SUBLANES, LANES),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((gp, SUBLANES, LANES),
                                        jnp.int32)),
        interpret=interpret,
    )(folded, pf)
    return (_unfold(dest[:, :g], r),
            _unfold(prev_out[None, :g], r)[0])


def denoise3d_plane_pallas(frames: jnp.ndarray, prev: jnp.ndarray,
                           spatial_dist25: float,
                           temporal_dist25: float,
                           corr_s: tuple = (), corr_t: tuple = ()
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full denoise3d cascade via the Pallas scan kernels (closed-form
    coefficient curve; with ``corr_s``/``corr_t`` from
    ``lut_correction(mode='d3')`` it is bit-exact to the f64 LUT).
    (N, H, W) uint8 + (H, W) int32 carry in -> (uint8 batch,
    new carry)."""
    n, h, w = frames.shape
    gs = math.log(0.25) / math.log(1.0 - spatial_dist25 / 255.0)
    gt = math.log(0.25) / math.log(1.0 - temporal_dist25 / 255.0)
    interp = jax.default_backend() != "tpu"

    f = frames.astype(jnp.int32)
    hp = spatial_scan(f.transpose(2, 0, 1).reshape(w, n * h), gs,
                      interp, mode="d3", corr=corr_s)
    hp = hp.reshape(w, n, h).transpose(1, 2, 0)
    vp = spatial_scan(hp.transpose(1, 0, 2).reshape(h, n * w), gs,
                      interp, mode="d3", corr=corr_s)
    vp = vp.reshape(h, n, w).transpose(1, 0, 2)
    dest, new_prev = temporal3d_scan(vp.reshape(n, h * w),
                                     prev.reshape(h * w), gt, interp,
                                     corr=corr_t)
    return (dest.reshape(n, h, w).astype(jnp.uint8),
            new_prev.reshape(h, w))


# --------------------------------------------------------------------- #
# Bit-exactness corrections for the closed-form coefficient curves.
#
# The f32 pow differs from the f64 LUT at a handful of indices
# (measured 34-86 of 8192 on TPU, all ±1).  lut_correction probes the
# kernel's OWN curve (same lowering the scans use) over the whole
# coefficient domain and diffs against the f64 table; the resulting
# static (index, delta) tuple is baked into the kernels, making the
# Pallas fast path bit-exact to the reference LUT semantics.

_CORR_CAP = 512          # fall back to the LUT path beyond this


def _corr_from(measured: np.ndarray, exact: np.ndarray,
               indices: np.ndarray) -> tuple:
    diff = exact.astype(np.int64) - measured.astype(np.int64)
    nz = np.nonzero(diff)[0]
    if len(nz) > _CORR_CAP or (len(nz) and np.abs(diff[nz]).max() > 2):
        raise ValueError(
            f"closed-form curve too far from the f64 LUT "
            f"({len(nz)} mismatches, max {np.abs(diff).max()}) — "
            "use the exact LUT path")
    return tuple((int(indices[k]), int(diff[k])) for k in nz)


def lut_correction(dist25: float, mode: str = "hq") -> tuple:
    """Static correction tuple for ``spatial_scan``/``temporal_scan``
    (mode 'hq': the 8192-entry hqdn3d LUT, PrecalcCoefs
    filter_hqdn3d.c:120-133) or the denoise3d kernels (mode 'd3':
    512-entry table, filter_denoise3d.c:187-199).  Probes THIS
    backend's kernel curve, so the tuple is valid for whatever pow
    lowering actually runs."""
    import os
    if os.environ.get("TCFORGE_FAST_CURVE"):
        return ()        # uncorrected ±1 curve (A/B benchmarking)
    key = (round(dist25, 6), mode, jax.default_backend())
    hit = _corr_cache.get(key)
    if hit is not None:
        return hit
    interp = jax.default_backend() != "tpu"
    # NB: must be called OUTSIDE any trace (filter __init__, bench
    # setup) — the probe is an eager device computation.  Inside a
    # trace the jitted probe would inline and return tracers.
    if mode == "hq":
        from tcforge_tpu.modules.filters.hqdn3d import precalc_coefs
        exact = precalc_coefs(dist25)
        d = np.arange(8192, dtype=np.int64)
        # 2-step scan: row0 seeds the carry (lpm(x,x)==x), row1=0
        # so out[1] = coef(d)  ((prev-curr+0x10007FF)>>12 == d)
        x = np.zeros((2, 8192), np.int32)
        x[0] = (d << 12) - 0x10007FF
        out = np.asarray(spatial_scan(jnp.asarray(x),
                                      _gamma_of(dist25), interp))
        corr = _corr_from(out[1], exact, d)
    elif mode == "d3":
        from tcforge_tpu.modules.filters.denoise3d import \
            precalc_coefs
        exact = precalc_coefs(dist25)
        i = np.arange(-256, 256, dtype=np.int64)
        x = np.zeros((2, 512), np.int32)
        x[0] = i                   # out[1] = lowpass(i, 0) = coef
        gamma = math.log(0.25) / math.log(1.0 - dist25 / 255.0)
        out = np.asarray(spatial_scan(jnp.asarray(x), gamma,
                                      interp, mode="d3"))
        corr = _corr_from(out[1], exact, i)
    else:
        raise ValueError(mode)
    _corr_cache[key] = corr
    return corr


_corr_cache: dict = {}


def denoise_plane_pallas(frames: jnp.ndarray, frame_ant: jnp.ndarray,
                         spatial_dist25: float,
                         temporal_dist25: float,
                         corr_s: tuple = (), corr_t: tuple = ()
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full hqdn3d cascade via the Pallas kernels.

    Semantics identical to modules.filters.hqdn3d.denoise_plane with
    computed coefficients: (N, H, W) uint8 + (H, W) int32 carry ->
    (uint8 batch, new carry).  With ``corr_s``/``corr_t`` from
    ``lut_correction`` the output is bit-exact to the LUT path.
    """
    n, h, w = frames.shape
    gs = _gamma_of(spatial_dist25)
    gt = _gamma_of(temporal_dist25)
    interp = jax.default_backend() != "tpu"

    f = frames.astype(jnp.int32) << 16
    # horizontal: scan over W, vectorize over N*H
    hp = spatial_scan(f.transpose(2, 0, 1).reshape(w, n * h), gs,
                      interp, corr=corr_s)
    hp = hp.reshape(w, n, h).transpose(1, 2, 0)
    # vertical: scan over H, vectorize over N*W
    vp = spatial_scan(hp.transpose(1, 0, 2).reshape(h, n * w), gs,
                      interp, corr=corr_s)
    vp = vp.reshape(h, n, w).transpose(1, 0, 2)
    # temporal: scan over N, vectorize over H*W
    dest, new_ant = temporal_scan(vp.reshape(n, h * w),
                                  frame_ant.reshape(h * w), gt,
                                  interp, corr=corr_t)
    return (dest.reshape(n, h, w).astype(jnp.uint8),
            new_ant.reshape(h, w))


# --------------------------------------------------------------------- #
# TomsMoComp search kernel.
#
# The XLA path (modules/filters/tomsmocomp.py) evaluates each motion
# candidate as roll + abs-diff + avg + compare over the full plane; the
# rolls (slice+concat) break elementwise fusion, so every candidate
# round-trips (N, H, W) i32 intermediates through HBM.  This kernel
# streams a row chunk (+2-row halo) of curr/prev/next into VMEM once
# and runs the whole candidate tournament in registers — the same
# hand-kernel treatment the reference gave this filter
# (filter/tomsmocomp/tomsmocompfilter_sse.c).

TMC_CHUNK = 64
TMC_MAX_MOV = 4


def _tmc_offsets(effort: int):
    offs = [(0, 0)]
    if effort >= 1:
        offs += [(0, 1), (0, -1)]
    if effort >= 3:
        offs += [(1, 0), (-1, 0)]
    if effort >= 5:
        offs += [(0, 2), (0, -2)]
    if effort >= 9:
        offs += [(1, 1), (-1, -1), (1, -1), (-1, 1)]
    if effort >= 11:
        offs += [(0, 3), (0, -3)]
    if effort >= 13:
        offs += [(1, 2), (-1, -2), (1, -2), (-1, 2)]
    if effort >= 15:
        offs += [(0, 4), (0, -4)]
    return offs


def _tmc_kernel(curr_hbm, prev_hbm, nxt_hbm, out_ref, cs, ps, ns, sems,
                *, chunk: int, height: int, width: int, parity: int,
                effort: int):
    n = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * chunk            # into the 4-row-padded inputs

    dmas = []
    for k, (src, dst) in enumerate(((curr_hbm, cs), (prev_hbm, ps),
                                    (nxt_hbm, ns))):
        # Mosaic wants 8-aligned row slices: 4-row halo each side
        dma = pltpu.make_async_copy(
            src.at[n, pl.ds(row0, chunk + 8)], dst, sems.at[k])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()

    c = cs[...].astype(jnp.int32)          # (chunk+8, Wp)
    p = ps[...].astype(jnp.int32)
    x = ns[...].astype(jnp.int32)
    curr = c[4:4 + chunk]
    above = c[3:3 + chunk]
    below = c[5:5 + chunk]

    def pair(a, b):
        return (a + b + 1) >> 1, jnp.abs(a - b)

    best_v, best_w = pair(above, below)    # bob candidate
    v0, w0 = pair(p[4:4 + chunk], x[4:4 + chunk])
    take = w0 <= best_w
    best_v = jnp.where(take, v0, best_v)
    best_w = jnp.where(take, w0, best_w)
    best_w = jnp.minimum(best_w + 1, 255)  # bias toward no motion

    wp = curr.shape[1]
    rows_g = row0 + jax.lax.broadcasted_iota(jnp.int32, (chunk, wp), 0)
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (chunk, wp), 1)
    for (dy, dx) in _tmc_offsets(effort)[1:]:
        a = p[4 + 2 * dy:4 + 2 * dy + chunk]
        b = x[4 - 2 * dy:4 - 2 * dy + chunk]
        if dx:
            # pltpu.roll wants non-negative shifts; rolling by -k is
            # rolling by (wp - k)
            a = pltpu.roll(a, (-dx) % wp, axis=1)
            b = pltpu.roll(b, dx % wp, axis=1)
        v, wgt = pair(a, b)
        ady, adx = abs(dy) * 2, abs(dx)
        valid = ((rows_g >= ady) & (rows_g < height - ady)
                 & (cols_g >= adx) & (cols_g < width - adx))
        take = (wgt <= best_w) & valid
        best_v = jnp.where(take, v, best_v)
        best_w = jnp.where(take, wgt, best_w)

    lo = jnp.maximum(0, jnp.minimum(above, below) - TMC_MAX_MOV)
    hi = jnp.minimum(255, jnp.maximum(above, below) + TMC_MAX_MOV)
    synth = jnp.clip(best_v, lo, hi)

    keep = ((rows_g % 2 == parity) | (rows_g == 0)
            | (rows_g == height - 1))
    out = jnp.where(keep, curr, synth)
    out_ref[0] = jnp.clip(out, 0, 255).astype(jnp.uint8)


def _tmc_body(c, p, x, row0, *, chunk: int, height: int, width: int,
              parity: int, effort: int, off: int):
    """The candidate tournament on assembled (chunk+2*off, Wp) int32
    windows; returns the output (chunk, Wp) uint8 rows."""
    curr = c[off:off + chunk]
    above = c[off - 1:off - 1 + chunk]
    below = c[off + 1:off + 1 + chunk]

    def pair(a, b):
        return (a + b + 1) >> 1, jnp.abs(a - b)

    best_v, best_w = pair(above, below)    # bob candidate
    v0, w0 = pair(p[off:off + chunk], x[off:off + chunk])
    take = w0 <= best_w
    best_v = jnp.where(take, v0, best_v)
    best_w = jnp.where(take, w0, best_w)
    best_w = jnp.minimum(best_w + 1, 255)  # bias toward no motion

    wp = curr.shape[1]
    rows_g = row0 + jax.lax.broadcasted_iota(jnp.int32, (chunk, wp), 0)
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (chunk, wp), 1)
    for (dy, dx) in _tmc_offsets(effort)[1:]:
        a = p[off + 2 * dy:off + 2 * dy + chunk]
        b = x[off - 2 * dy:off - 2 * dy + chunk]
        if dx:
            # pltpu.roll wants non-negative shifts; rolling by -k is
            # rolling by (wp - k)
            a = pltpu.roll(a, (-dx) % wp, axis=1)
            b = pltpu.roll(b, dx % wp, axis=1)
        v, wgt = pair(a, b)
        ady, adx = abs(dy) * 2, abs(dx)
        valid = ((rows_g >= ady) & (rows_g < height - ady)
                 & (cols_g >= adx) & (cols_g < width - adx))
        take = (wgt <= best_w) & valid
        best_v = jnp.where(take, v, best_v)
        best_w = jnp.where(take, wgt, best_w)

    lo = jnp.maximum(0, jnp.minimum(above, below) - TMC_MAX_MOV)
    hi = jnp.minimum(255, jnp.maximum(above, below) + TMC_MAX_MOV)
    synth = jnp.clip(best_v, lo, hi)

    keep = ((rows_g % 2 == parity) | (rows_g == 0)
            | (rows_g == height - 1))
    out = jnp.where(keep, curr, synth)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


UNS_CHUNK = 64
UNS_HALO = 8                      # covers steps_y <= 8 (msize_y <= 17)


def _unsharp_kernel(top, center, bot, out_ref, *, chunk: int, sx: int,
                    sy: int, scalebits: int, amount_fx: int):
    g = UNS_HALO
    x = jnp.concatenate([top[0, 0], center[0], bot[0, 0]],
                        axis=0).astype(jnp.uint32)   # (chunk+2g, wp)
    # y cascade: 2*sy [1,1] stages (u32 addition commutes mod 2^32,
    # so running y before x is bit-identical to the C x-then-y order
    # even under wraparound)
    for _ in range(2 * sy):
        x = x[:-1] + x[1:]
    a = x[g - sy:g - sy + chunk]
    # x cascade: left-rolls on the sx-edge-padded width; wrapped-in
    # values only ever land in columns >= W + 2*sx, which the caller
    # never reads
    wp = a.shape[1]
    for _ in range(2 * sx):
        a = a + pltpu.roll(a, wp - 1, axis=1)
    if sx:
        a = pltpu.roll(a, sx, axis=1)    # re-center on the src layout
    halfscale = jnp.uint32(1 << (scalebits - 1)) if scalebits else 0
    blur = ((a + halfscale) >> scalebits).astype(jnp.int32)
    src = center[0].astype(jnp.int32)
    res = src + (((src - blur) * jnp.int32(amount_fx)) >> 16)
    out_ref[0] = jnp.clip(res, 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("sx", "sy", "amount", "interpret"))
def unsharp_plane_pallas(img: jnp.ndarray, sx: int, sy: int,
                         amount: float,
                         interpret: bool = False) -> jnp.ndarray:
    """(N, H, W) uint8 -> unsharp FSM output, bit-identical to the
    jnp cascade path (modules/filters/unsharp.py) including the u32
    wraparound semantics, in one HBM read+write instead of ten
    materialized shift-add passes."""
    n, h, w = img.shape
    chunk, g = UNS_CHUNK, UNS_HALO
    hp = -(-h // chunk) * chunk
    wpad = -(-(w + 2 * sx) // LANES) * LANES
    nch = hp // chunk
    scalebits = (sx + sy) * 2
    amount_fx = int(amount * 65536.0)
    ap = jnp.pad(img, ((0, 0), (g, hp - h + g), (sx, wpad - w - sx)),
                 mode="edge")
    center = ap[:, g:hp + g]
    top = ap[:, 0:hp].reshape(n, nch, chunk, wpad)[:, :, :g]
    bot = ap[:, 2 * g:hp + 2 * g].reshape(
        n, nch, chunk, wpad)[:, :, chunk - g:]
    out = pl.pallas_call(
        partial(_unsharp_kernel, chunk=chunk, sx=sx, sy=sy,
                scalebits=scalebits, amount_fx=amount_fx),
        out_shape=jax.ShapeDtypeStruct((n, hp, wpad), jnp.uint8),
        grid=(n, nch),
        in_specs=[pl.BlockSpec((1, 1, g, wpad),
                               lambda ni, ii: (ni, ii, 0, 0)),
                  pl.BlockSpec((1, chunk, wpad),
                               lambda ni, ii: (ni, ii, 0)),
                  pl.BlockSpec((1, 1, g, wpad),
                               lambda ni, ii: (ni, ii, 0, 0))],
        out_specs=pl.BlockSpec((1, chunk, wpad),
                               lambda ni, ii: (ni, ii, 0)),
        interpret=interpret,
    )(top, center, bot)
    return out[:, :h, sx:sx + w]


TMC_HALO = 8                      # sublane-aligned halo rows per side


def _tmc_kernel2(ct, c0, cb, pt, p0, pb, xt, x0, xb, out_ref, *,
                 chunk: int, height: int, width: int, parity: int,
                 effort: int):
    i = pl.program_id(1)
    c = jnp.concatenate([ct[0, 0], c0[0], cb[0, 0]],
                        axis=0).astype(jnp.int32)
    p = jnp.concatenate([pt[0, 0], p0[0], pb[0, 0]],
                        axis=0).astype(jnp.int32)
    x = jnp.concatenate([xt[0, 0], x0[0], xb[0, 0]],
                        axis=0).astype(jnp.int32)
    out_ref[0] = _tmc_body(c, p, x, i * chunk, chunk=chunk,
                           height=height, width=width, parity=parity,
                           effort=effort, off=TMC_HALO)


@partial(jax.jit,
         static_argnames=("parity", "effort", "interpret"))
def tomsmocomp_plane_pallas2(curr: jnp.ndarray, prev: jnp.ndarray,
                             nxt: jnp.ndarray, parity: int,
                             effort: int,
                             interpret: bool = False) -> jnp.ndarray:
    """Pipelined variant: the ±4-row halo rides small side tensors cut
    by XLA, so every input is a plain BlockSpec and Mosaic
    double-buffers the DMAs behind the tournament compute (the manual
    make_async_copy version stalls on its own copies each grid step)."""
    n, h, w = curr.shape
    chunk = TMC_CHUNK
    hp = -(-h // chunk) * chunk
    wpad = -(-w // LANES) * LANES
    nch = hp // chunk
    g = TMC_HALO

    def prep(a):
        ap = jnp.pad(a, ((0, 0), (g, hp - h + 2 * g), (0, wpad - w)),
                     mode="edge")
        center = ap[:, g:hp + g]
        top = ap[:, 0:hp].reshape(n, nch, chunk, wpad)[:, :, :g]
        bot = ap[:, 2 * g:hp + 2 * g].reshape(
            n, nch, chunk, wpad)[:, :, chunk - g:]
        return center, top, bot

    cc, ct, cb = prep(curr)
    pc, pt, pb = prep(prev)
    xc, xt, xb = prep(nxt)
    center_spec = pl.BlockSpec((1, chunk, wpad),
                               lambda ni, ii: (ni, ii, 0))
    halo_spec = pl.BlockSpec((1, 1, g, wpad),
                             lambda ni, ii: (ni, ii, 0, 0))
    out = pl.pallas_call(
        partial(_tmc_kernel2, chunk=chunk, height=h, width=w,
                parity=parity, effort=effort),
        out_shape=jax.ShapeDtypeStruct((n, hp, wpad), jnp.uint8),
        grid=(n, nch),
        in_specs=[halo_spec, center_spec, halo_spec] * 3,
        out_specs=pl.BlockSpec((1, chunk, wpad),
                               lambda ni, ii: (ni, ii, 0)),
        interpret=interpret,
    )(ct, cc, cb, pt, pc, pb, xt, xc, xb)
    return out[:, :h, :w]


@partial(jax.jit,
         static_argnames=("parity", "effort", "interpret"))
def tomsmocomp_plane_pallas(curr: jnp.ndarray, prev: jnp.ndarray,
                            nxt: jnp.ndarray, parity: int, effort: int,
                            interpret: bool = False) -> jnp.ndarray:
    """(N, H, W) uint8 planes -> deinterlaced uint8, bit-identical to
    tomsmocomp_plane (the jnp reference) on the kept geometry."""
    n, h, w = curr.shape
    hp = -(-h // TMC_CHUNK) * TMC_CHUNK
    wpad = -(-w // LANES) * LANES
    def prep(a):
        a = jnp.pad(a, ((0, 0), (4, hp - h + 4), (0, wpad - w)),
                    mode="edge")
        return a
    cp, pp, xp = prep(curr), prep(prev), prep(nxt)
    grid = (n, hp // TMC_CHUNK)
    out = pl.pallas_call(
        partial(_tmc_kernel, chunk=TMC_CHUNK, height=h, width=w,
                parity=parity, effort=effort),
        out_shape=jax.ShapeDtypeStruct((n, hp, wpad), jnp.uint8),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec((1, TMC_CHUNK, wpad),
                               lambda ni, ii: (ni, ii, 0)),
        scratch_shapes=[
            pltpu.VMEM((TMC_CHUNK + 8, wpad), jnp.uint8),
            pltpu.VMEM((TMC_CHUNK + 8, wpad), jnp.uint8),
            pltpu.VMEM((TMC_CHUNK + 8, wpad), jnp.uint8),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(cp, pp, xp)
    return out[:, :h, :w]


# --------------------------------------------------------------------- #
# Fused bit-exact zoom pass (ops/zoom.py byte-split matmuls).
#
# The XLA formulation runs three bf16 matmuls whose f32 outputs (plus
# the int32 recombine) round-trip HBM; at 1080p that's ~25% of the
# north-star chain.  This kernel keeps the three accumulators in VMEM
# and emits the final uint8 tile directly: one pass over the inputs,
# one uint8 output write.  Exactness argument identical to
# _apply_pass_exact_mxu (operands <= 255 are bf16-exact, every
# integer partial sum < 2^24 is exact in the MXU's f32 accumulator).

_ZT = 256                       # output tile edge


def _zoom_mm_kernel(src_ref, hi_ref, mid_ref, lo_ref, out_ref):
    s = src_ref[...]
    acc_hi = jnp.dot(s, hi_ref[...],
                     preferred_element_type=jnp.float32)
    acc_mid = jnp.dot(s, mid_ref[...],
                      preferred_element_type=jnp.float32)
    acc_lo = jnp.dot(s, lo_ref[...],
                     preferred_element_type=jnp.float32)
    acc = ((acc_hi.astype(jnp.int32) << 16)
           + (acc_mid.astype(jnp.int32) << 8)
           + acc_lo.astype(jnp.int32))
    acc = (acc + 32768) >> 16
    out_ref[...] = jnp.clip(acc, 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("interpret",))
def zoom_pass_pallas(src2d: jnp.ndarray, hi: jnp.ndarray,
                     mid: jnp.ndarray, lo: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """(M, K) uint8 x three (K, N) bf16 byte planes -> (M, N) uint8,
    bit-exact to the reference's int32 accumulator."""
    m, k = src2d.shape
    n = hi.shape[1]
    mp = -(-m // _ZT) * _ZT
    np_ = -(-n // _ZT) * _ZT
    src = src2d.astype(jnp.bfloat16)
    if mp != m:
        src = jnp.pad(src, ((0, mp - m), (0, 0)))
    wpads = []
    for wq in (hi, mid, lo):
        if np_ != n:
            wq = jnp.pad(wq, ((0, 0), (0, np_ - n)))
        wpads.append(wq)
    hi, mid, lo = wpads
    # grid (n, m): the LAST dim iterates innermost, so the three
    # weight blocks (indexed by n only) stay VMEM-resident across the
    # whole m sweep instead of being re-fetched per output tile
    out = pl.pallas_call(
        _zoom_mm_kernel,
        grid=(np_ // _ZT, mp // _ZT),
        in_specs=[pl.BlockSpec((_ZT, k), lambda n, m: (m, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, _ZT), lambda n, m: (0, n),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, _ZT), lambda n, m: (0, n),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, _ZT), lambda n, m: (0, n),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_ZT, _ZT), lambda n, m: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.uint8),
        interpret=interpret,
    )(src, *wpads)
    return out[:m, :n]
