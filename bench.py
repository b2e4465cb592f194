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
    iters = 24

    # Timing methodology: this environment runs the TPU behind an async
    # tunnel where block_until_ready can return before execution and D2H
    # of full frames measures tunnel bandwidth instead of compute.  We
    # therefore run the WHOLE iteration loop on-chip (lax.scan over
    # pre-staged distinct input batches, carry threaded exactly like the
    # engine threads it) and fetch one scalar checksum (8 bytes) — the
    # fetch cannot complete until every scanned batch has executed, and
    # a single dispatch keeps the relay's ~3.5 ms per-call RTT (a tunnel
    # property, not a chip property) out of the measurement.  Warmup and
    # the timed calls use disjoint input stacks so the relay cannot
    # dedup repeated executions.
    def mk_stack(seed0):
        r = np.random.default_rng(seed0)
        return (jnp.asarray(r.integers(0, 255, (iters, batch, h, w),
                                       dtype=np.uint8)),
                jnp.asarray(r.integers(
                    0, 255, (iters, batch, h // 2, w // 2),
                    dtype=np.uint8)),
                jnp.asarray(r.integers(
                    0, 255, (iters, batch, h // 2, w // 2),
                    dtype=np.uint8)))

    @jax.jit
    def run_all(ys, us, vs, st):
        def body(carry, inp):
            st, acc = carry
            y, u, v = inp
            fb = FrameBatch(
                format=ImageFormat.YUV420P, y=y, u=u, v=v,
                attrs=jnp.zeros((batch,), jnp.int32),
                frame_ids=jnp.arange(batch, dtype=jnp.int32),
                fps=25.0)
            out, st = chain.trace_step(fb, st)
            acc = (acc + jnp.sum(out.y, dtype=jnp.int32)
                   + jnp.sum(out.u, dtype=jnp.int32)
                   + jnp.sum(out.v, dtype=jnp.int32))
            return (st, acc), 0
        (st, acc), _ = jax.lax.scan(
            body, (st, jnp.zeros((), jnp.int32)), (ys, us, vs))
        return acc

    stacks = [mk_stack(s) for s in (1, 2, 3)]
    _ = int(run_all(*stacks[0], states))       # compile + warm
    fps = 0.0
    for s in stacks[1:]:
        t0 = time.perf_counter()
        _ = int(run_all(*s, states))
        dt = time.perf_counter() - t0
        fps = max(fps, batch * iters / dt)
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
