#!/usr/bin/env python
"""Benchmark: 1080p frames/sec/chip through denoise+deinterlace+rescale.

The BASELINE.json headline config: 1080i input -> hqdn3d denoise ->
linear-blend deinterlace -> Lanczos3 rescale to 1280x720, measured as
steady-state device throughput of the jitted chain (batch resident in
HBM, carry state threaded across batches exactly like the engine does).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Target (driver-supplied, BASELINE.md): >= 200 fps/chip on TPU v5e-1.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    import tcforge_tpu.modules  # register built-ins
    from tcforge_tpu.core.formats import ImageFormat
    from tcforge_tpu.core.frame import FrameBatch
    from tcforge_tpu.core.job import FilterSpec, Job
    from tcforge_tpu.pipeline.chain import VideoChain

    batch = 16
    w, h = 1920, 1080
    job = Job(im_v_width=w, im_v_height=h,
              deinterlace=5,                       # linear blend
              zoom_width=1280, zoom_height=720,    # rescale
              filters=[FilterSpec("hqdn3d", "luma=4.0")],
              batch_size=batch)
    chain = VideoChain(job, ImageFormat.YUV420P, w, h)
    states = chain.initial_states()

    # distinct input batches per iteration: repeated identical inputs
    # would let the integer temporal IIR reach a fixed point and the
    # runtime deduplicate dispatches, faking impossible throughput
    rng = np.random.default_rng(0)

    def mk_batch(seed):
        r = np.random.default_rng(seed)
        return FrameBatch(
            format=ImageFormat.YUV420P,
            y=jnp.asarray(r.integers(0, 255, (batch, h, w),
                                     dtype=np.uint8)),
            u=jnp.asarray(r.integers(0, 255, (batch, h // 2, w // 2),
                                     dtype=np.uint8)),
            v=jnp.asarray(r.integers(0, 255, (batch, h // 2, w // 2),
                                     dtype=np.uint8)),
            attrs=jnp.zeros((batch,), jnp.int32),
            frame_ids=jnp.arange(batch, dtype=jnp.int32), fps=25.0)

    iters = 10
    batches = [mk_batch(i + 1) for i in range(iters)]

    # Timing methodology: this environment runs the TPU behind an async
    # tunnel where block_until_ready can return before execution and D2H
    # of full frames measures tunnel bandwidth instead of compute.  We
    # therefore thread a scalar checksum through the whole dependency
    # chain and fetch only that (8 bytes) — the fetch cannot complete
    # until every chained batch has actually executed.
    @jax.jit
    def step(fb, st, acc):
        out, st = chain.trace_step(fb, st)
        acc = (acc + jnp.sum(out.y, dtype=jnp.int32)
               + jnp.sum(out.u, dtype=jnp.int32)
               + jnp.sum(out.v, dtype=jnp.int32))
        return st, acc

    # warmup / compile
    st, acc = step(batches[0], states, jnp.zeros((), jnp.int32))
    _ = int(acc)

    t0 = time.perf_counter()
    st = states
    acc = jnp.zeros((), jnp.int32)
    for i in range(iters):
        st, acc = step(batches[i], st, acc)
    _ = int(acc)                      # forces the full chain
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    target = 200.0
    print(json.dumps({
        "metric": "1080p_denoise_deint_rescale_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / target, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
