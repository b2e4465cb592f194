"""Audio filters: normalize, astat, lowpass, detectsilence.

Rebuilds of ``filter/filter_normalize.c`` (AGC volume normalizer),
``filter_astat.c`` (peak statistics + suggested rescale),
``filter_lowpass.c`` (simple IIR low-pass) and
``filter_detectsilence.c`` (silent-frame reporter).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from tcforge_tpu.core.frame import AudioBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (AudioFilter, FilterSlot,
                                          ModuleInfo, ModuleKind, register)

MUL_MIN, MUL_MAX = 0.1, 5.0
MAX_S16 = 32767.0
MID_S16 = MAX_S16 * 0.25     # target RMS (filter_normalize.c:64)
SIL_S16 = MAX_S16 * 0.01     # silence gate (filter_normalize.c:68)


from functools import lru_cache


@lru_cache(maxsize=None)
def _norm_step(smooth: float):
    """Scan body hoisted to a cached factory: a closure defined
    inside apply() is a NEW function object per call, which defeats
    lax.scan's eager compile cache and recompiles every batch."""

    def step(mul, frame):
        x = frame.astype(jnp.float32)
        curavg = jnp.sqrt(jnp.mean(x * x))
        needed = MID_S16 / jnp.maximum(1e-9, curavg * mul)
        new_mul = (1.0 - smooth) * mul + smooth * needed
        new_mul = jnp.clip(new_mul, MUL_MIN, MUL_MAX)
        mul = jnp.where(curavg > SIL_S16, new_mul, mul)
        out = jnp.clip(mul * x, -32768, 32767).astype(jnp.int16)
        return mul, out

    return step


@register
class NormalizeFilter(AudioFilter):
    """filter_normalize.c AVG=1 mode: per-frame RMS drives a smoothed
    gain toward MID/rms, clamped to [0.1, 5.0]; samples are scaled and
    clamped.  The gain is the carry state, frames chain via lax.scan."""

    info = ModuleInfo(name="normalize", kind=ModuleKind.FILTER,
                      media="audio")
    desc = ModuleDesc(
        name="normalize", comment="volume normalizer (AGC)",
        version="0.1.1", capabilities="AE",
        params=[ParamSpec("smooth", "gain smoothing factor", "f", 0.06,
                          0.0, 1.0)])
    slots = FilterSlot.PRE_M
    media = "audio"

    def init_state(self, rate: int, channels: int) -> Any:
        return jnp.ones((), jnp.float32)      # mul

    def apply(self, ab: AudioBatch, state: Any) -> Tuple[AudioBatch, Any]:
        new_mul, pcm = jax.lax.scan(
            _norm_step(float(self.options["smooth"])), state, ab.pcm)
        return ab.with_pcm(pcm), new_mul


@register
class AstatFilter(AudioFilter):
    """filter_astat.c: track the global sample min/max; the suggested
    volume rescale (32767/peak) accumulates in the carry and is logged
    by the session summary."""

    info = ModuleInfo(name="astat", kind=ModuleKind.FILTER, media="audio")
    desc = ModuleDesc(name="astat", comment="audio peak statistics",
                      capabilities="AE",
                      params=[ParamSpec("file", "write result to file",
                                        "s", "")])
    slots = FilterSlot.PRE_S
    media = "audio"

    def init_state(self, rate: int, channels: int) -> Any:
        return {"min": jnp.zeros((), jnp.int32),
                "max": jnp.zeros((), jnp.int32)}

    def apply(self, ab: AudioBatch, state: Any) -> Tuple[AudioBatch, Any]:
        lo = jnp.minimum(state["min"], ab.pcm.min().astype(jnp.int32))
        hi = jnp.maximum(state["max"], ab.pcm.max().astype(jnp.int32))
        return ab, {"min": lo, "max": hi}

    @staticmethod
    def suggested_rescale(state) -> float:
        import numpy as np
        peak = max(int(np.asarray(state["max"])),
                   -int(np.asarray(state["min"])))
        return 32767.0 / peak if peak else 1.0


@register
class LowpassFilter(AudioFilter):
    """filter_lowpass.c: single-pole IIR smoothing across samples."""

    info = ModuleInfo(name="lowpass", kind=ModuleKind.FILTER,
                      media="audio")
    desc = ModuleDesc(name="lowpass", comment="audio low-pass filter",
                      params=[ParamSpec("taps", "filter strength", "d",
                                        30, 1, 1000)])
    slots = FilterSlot.PRE_M
    media = "audio"

    def init_state(self, rate: int, channels: int) -> Any:
        return jnp.zeros((channels,), jnp.float32)

    def apply(self, ab: AudioBatch, state: Any) -> Tuple[AudioBatch, Any]:
        alpha = 1.0 / float(self.options["taps"])
        n, s, c = ab.pcm.shape
        flat = ab.pcm.reshape(n * s, c).astype(jnp.float32)

        # first-order LINEAR IIR: out[t] = (1-a)·out[t-1] + a·x[t].
        # A per-sample lax.scan is latency-bound (50k+ sequential
        # steps per second of audio); the affine recurrence composes
        # associatively — (g2,b2)∘(g1,b1) = (g2·g1, g2·b1+b2) — so
        # associative_scan solves it in O(log n) vectorized passes.
        g = jnp.full_like(flat, 1.0 - alpha)
        b = alpha * flat

        def compose(l, r):
            gl, bl = l
            gr, br = r
            return gl * gr, gr * bl + br

        gains, outs = jax.lax.associative_scan(compose, (g, b), axis=0)
        out = gains * state[None, :] + outs
        new_carry = out[-1]
        pcm = jnp.clip(out, -32768, 32767).astype(jnp.int16) \
            .reshape(n, s, c)
        return ab.with_pcm(pcm), new_carry


@register
class DetectSilenceFilter(AudioFilter):
    """filter_detectsilence.c: flag frames whose peak is under the
    silence threshold (reported via the carry for the session log)."""

    info = ModuleInfo(name="detectsilence", kind=ModuleKind.FILTER,
                      media="audio")
    desc = ModuleDesc(name="detectsilence", comment="detect silent frames",
                      params=[ParamSpec("threshold", "peak threshold", "d",
                                        328, 1, 32767)])
    slots = FilterSlot.PRE_S
    media = "audio"

    def init_state(self, rate: int, channels: int) -> Any:
        return jnp.zeros((), jnp.int32)   # silent-frame count

    def apply(self, ab: AudioBatch, state: Any) -> Tuple[AudioBatch, Any]:
        peaks = jnp.max(jnp.abs(ab.pcm.astype(jnp.int32)), axis=(1, 2))
        silent = peaks < self.options["threshold"]
        return ab, state + jnp.sum(silent.astype(jnp.int32))


@register
class ResampleFilter(AudioFilter):
    """filter_resample.c analogue: rate conversion inside the filter
    chain (the reference wrapped lavc's resampler; here the linear
    interpolator from ops.audio, which also backs -E).  The output
    keeps the same per-frame layout with a resized sample axis, so the
    batch shape stays static under jit."""

    info = ModuleInfo(name="resample", kind=ModuleKind.FILTER,
                      media="audio")
    desc = ModuleDesc(
        name="resample", comment="audio resampler",
        params=[ParamSpec("rate", "output sample rate", "d", 48000,
                          4000, 192000)])
    slots = FilterSlot.PRE_S
    media = "audio"

    def apply(self, ab: AudioBatch, state: Any) -> Tuple[AudioBatch, Any]:
        from tcforge_tpu.ops import audio as audio_ops
        rate = self.options["rate"]
        if rate == ab.rate:
            return ab, state
        pcm = audio_ops.resample_poly(ab.pcm, ab.rate, rate)
        return AudioBatch(pcm=pcm, rate=rate, channels=ab.channels,
                          attrs=ab.attrs, frame_ids=ab.frame_ids), state
