"""Microbench: cfg4 (1080i tomsmocomp) decomposition on TPU.

Times the full chain vs the raw Pallas kernel per plane, checksum
method.  Usage: python benches/micro_cfg4.py
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import json
import time

import numpy as np

from benches.micro_cfg2 import time_job


def time_kernel(w=1920, h=1080, batch=8, iters=8, effort=5):
    import jax
    import jax.numpy as jnp
    from tcforge_tpu.ops.kernels import tomsmocomp_plane_pallas

    rng = np.random.default_rng(0)

    def mk(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.integers(0, 255, (batch, h, w),
                                      dtype=np.uint8))

    xs = [mk(i) for i in range(iters + 2)]

    @jax.jit
    def step(c, p, x, acc):
        out = tomsmocomp_plane_pallas(c, p, x, 0, effort)
        return acc + jnp.sum(out, dtype=jnp.int32)

    acc = step(xs[1], xs[0], xs[2], jnp.zeros((), jnp.int32))
    _ = int(acc)
    best = 0.0
    for _rep in range(2):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.int32)
        for i in range(iters):
            acc = step(xs[i + 1], xs[i], xs[i + 2], acc)
        _ = int(acc)
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)
    print(json.dumps({"label": f"tmc_kernel_y_only_e{effort}",
                      "fps": round(best, 1)}), flush=True)


if __name__ == "__main__":
    time_job([], w=1920, h=1080, batch=8, label="identity_1080")
    time_job([("tomsmocomp", "searcheffort=5")], w=1920, h=1080,
             batch=8, label="cfg4_chain")
    time_kernel()
