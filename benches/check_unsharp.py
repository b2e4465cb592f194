"""TPU bit-exactness check + speed: unsharp conv path vs u32 cascade."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tcforge_tpu.modules.filters import unsharp as U

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.integers(0, 256, (4, 720, 1280),
                                   dtype=np.uint8))
    # every size inside the scalebits<=15 gate that unsharp_plane
    # applies (sx+sy <= 7); larger matrices keep the u32 cascade
    for (mx, my) in ((7, 5), (3, 3), (5, 9), (15, 1), (1, 15),
                     (7, 7), (9, 5)):
        sx, sy = mx // 2, my // 2
        assert (sx + sy) * 2 <= 15
        a = jax.jit(U._binomial_blur_conv,
                    static_argnums=(1, 2))(img, sx, sy)
        b = jax.jit(U._binomial_blur_acc,
                    static_argnums=(1, 2))(img, sx, sy)
        same = bool(jnp.all(a == b))
        print(f"{mx}x{my}: exact={same}", flush=True)
        assert same, (mx, my)
    from benches.micro_cfg2 import time_job
    time_job([("unsharp", "luma=0.8:luma_matrix=7x5")],
             label="unsharp_conv")
    time_job([("hqdn3d", "luma=4.0"),
              ("unsharp", "luma=0.8:luma_matrix=7x5")], label="cfg2")


if __name__ == "__main__":
    main()
