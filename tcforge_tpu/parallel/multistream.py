"""Multi-stream batched transcode: N independent chains per chip.

A serving deployment rarely transcodes ONE stream per accelerator —
it packs many.  The engine's batch dimension is *temporal* (frames of
one stream: the temporal filters scan across it), so independent
streams cannot simply be concatenated into the batch.  Instead the
whole traceable chain step is ``jax.vmap``-ed over a leading STREAM
axis: one XLA program advances every stream one batch, with each
stream's filter state (hqdn3d accumulators, cadence counters, ...)
carried independently.  Output is bit-identical to running each
stream alone (tests/test_parallel.py::TestMultiStream).

The reference's nearest analogue is running N transcode processes;
this shares one device, one compiled program, and one dispatch.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch


class MultiStreamChain:
    """vmap wrapper over ``VideoChain.trace_step`` for a fleet of
    identically-configured streams (same geometry and filter chain —
    the common serving shape; heterogeneous fleets compile one
    program per configuration)."""

    def __init__(self, chain, n_streams: int, fps: float = 25.0):
        self.chain = chain
        self.n = n_streams
        self.fps = fps

        def one(y, u, v, states):
            fb = FrameBatch(
                format=ImageFormat.YUV420P, y=y, u=u, v=v,
                attrs=jnp.zeros((y.shape[0],), jnp.int32),
                frame_ids=jnp.arange(y.shape[0], dtype=jnp.int32),
                fps=fps)
            out, states = chain.trace_step(fb, states)
            return out.y, out.u, out.v, states

        self._step = jax.jit(jax.vmap(one))

    def initial_states(self) -> List[Any]:
        """Per-stream filter states stacked on the stream axis."""
        one = self.chain.initial_states()
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                jnp.asarray(x), (self.n,) + jnp.asarray(x).shape),
            one)

    def step(self, y, u, v, states) -> Tuple[Any, Any, Any, Any]:
        """(S, N, H, W) planes + stacked states -> outputs + new
        states; one dispatch advances every stream one batch."""
        return self._step(y, u, v, states)
