"""TPU check: unsharp Pallas kernel + tomsmocomp v2 — exactness on
the compiled path and speed A/B vs the previous implementations."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tcforge_tpu.modules.filters import unsharp as U
    from tcforge_tpu.ops.kernels import (tomsmocomp_plane_pallas,
                                         tomsmocomp_plane_pallas2,
                                         unsharp_plane_pallas)

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 256, (4, 720, 1280),
                                   dtype=np.uint8))

    # exactness: compiled kernel vs the u32 cascade formula
    for (mx, my, am) in ((7, 5, 0.8), (3, 3, -1.5), (9, 9, 0.5)):
        sx, sy = mx // 2, my // 2
        sb = (sx + sy) * 2
        acc = U._binomial_blur_acc(img, sx, sy)
        blur = ((acc + jnp.uint32(1 << (sb - 1))) >> sb).astype(jnp.int32)
        src = img.astype(jnp.int32)
        ref = jnp.clip(src + (((src - blur)
                               * jnp.int32(int(am * 65536.0))) >> 16),
                       0, 255).astype(jnp.uint8)
        got = unsharp_plane_pallas(img, sx, sy, am)
        same = bool(jnp.all(ref == got))
        print(f"unsharp {mx}x{my}: exact={same}", flush=True)
        assert same

    c = jnp.asarray(rng.integers(0, 256, (4, 1080, 1920),
                                 dtype=np.uint8))
    p = jnp.asarray(rng.integers(0, 256, (4, 1080, 1920),
                                 dtype=np.uint8))
    x = jnp.asarray(rng.integers(0, 256, (4, 1080, 1920),
                                 dtype=np.uint8))
    a = tomsmocomp_plane_pallas(c, p, x, 0, 5)
    b = tomsmocomp_plane_pallas2(c, p, x, 0, 5)
    same = bool(jnp.all(a == b))
    print(f"tmc v1==v2 on TPU: {same}", flush=True)
    assert same

    # speed A/B, checksum-chained
    def timeit(fn, label, iters=10):
        @jax.jit
        def step(c, p, x, acc):
            return acc + jnp.sum(fn(c, p, x), dtype=jnp.int32)
        xs = [jnp.asarray(np.random.default_rng(i).integers(
            0, 256, (8, 1080, 1920), dtype=np.uint8))
            for i in range(12)]
        acc = step(xs[1], xs[0], xs[2], jnp.zeros((), jnp.int32))
        _ = int(acc)
        best = 0.0
        for _rep in range(2):
            t0 = time.perf_counter()
            acc = jnp.zeros((), jnp.int32)
            for i in range(iters):
                acc = step(xs[i + 1], xs[i], xs[i + 2], acc)
            _ = int(acc)
            best = max(best, 8 * iters / (time.perf_counter() - t0))
        print(json.dumps({"label": label, "fps": round(best, 1)}),
              flush=True)

    timeit(lambda c, p, x: tomsmocomp_plane_pallas(c, p, x, 0, 5),
           "tmc_v1_y1080_b8")
    timeit(lambda c, p, x: tomsmocomp_plane_pallas2(c, p, x, 0, 5),
           "tmc_v2_y1080_b8")
    timeit(lambda c, p, x: unsharp_plane_pallas(c, 3, 2, 0.8),
           "unsharp_pallas_1080_b8")
    from benches.micro_cfg2 import time_job
    time_job([("unsharp", "luma=0.8:luma_matrix=7x5")],
             label="unsharp_chain_720p")
    time_job([("hqdn3d", "luma=4.0"),
              ("unsharp", "luma=0.8:luma_matrix=7x5")], label="cfg2")


if __name__ == "__main__":
    main()
