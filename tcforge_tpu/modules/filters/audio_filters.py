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


NSAMPLES = 128                # algo 2 history (filter_normalize.c:73)
MIN_SAMPLE_SIZE = 32000


@lru_cache(maxsize=None)
def _norm_step(smooth: float, smoothlast: float, algo: int):
    """Scan body hoisted to a cached factory: a closure defined
    inside apply() is a NEW function object per call, which defeats
    lax.scan's eager compile cache and recompiles every batch."""

    def step(carry, frame):
        mul, lastavg, mem, idx = carry
        x = frame.astype(jnp.float32)
        length = x.size
        curavg = jnp.sqrt(jnp.mean(x * x))
        if algo == 1:
            needed = MID_S16 / jnp.maximum(1e-9, curavg * mul)
            new_mul = (1.0 - smooth) * mul + smooth * needed
            new_mul = jnp.clip(new_mul, MUL_MIN, MUL_MAX)
            mul = jnp.where(curavg > SIL_S16, new_mul, mul)
        else:
            # algo 2: weighted mean of the last NSAMPLES frame RMSes
            # (filter_normalize.c:269-285)
            total = jnp.sum(mem[:, 1])
            avg = jnp.sum(mem[:, 0] * mem[:, 1]) \
                / jnp.maximum(1.0, total)
            new_mul = jnp.clip(MID_S16 / jnp.maximum(1e-9, avg),
                               MUL_MIN, MUL_MAX)
            mul = jnp.where((total > MIN_SAMPLE_SIZE) & (avg >= SIL_S16),
                            new_mul, mul)
        out = jnp.clip(mul * x, -32768, 32767).astype(jnp.int16)
        newavg = mul * curavg
        if algo == 1:
            lastavg = (1.0 - smoothlast) * lastavg + smoothlast * newavg
        else:
            mem = mem.at[idx].set(jnp.stack(
                [newavg, jnp.float32(length)]))
            idx = (idx + 1) % NSAMPLES
        return (mul, lastavg, mem, idx), out

    return step


@register
class NormalizeFilter(AudioFilter):
    """filter_normalize.c: per-frame RMS drives the gain toward
    MID/rms, clamped to [0.1, 5.0]; samples are scaled and clamped.
    `algo` 1 = one-value memory smoothing (new = a*old + b*needed),
    2 = weighted mean over the last 128 frame averages
    (filter_normalize.c:260-305).  The gain/history is the carry
    state, frames chain via lax.scan."""

    info = ModuleInfo(name="normalize", kind=ModuleKind.FILTER,
                      media="audio")
    desc = ModuleDesc(
        name="normalize", comment="volume normalizer (AGC)",
        version="0.1.1", capabilities="AE",
        params=[ParamSpec("smooth", "gain smoothing factor", "f", 0.06,
                          0.0, 1.0),
                ParamSpec("smoothlast", "smoothing for last sample "
                          "average", "f", 0.06, 0.0, 1.0),
                ParamSpec("algo", "1=memory smoothing 2=weighted mean",
                          "d", 1, 1, 2)])
    slots = FilterSlot.PRE_M
    media = "audio"

    def init_state(self, rate: int, channels: int) -> Any:
        return (jnp.ones((), jnp.float32),            # mul
                jnp.zeros((), jnp.float32),           # lastavg
                jnp.zeros((NSAMPLES, 2), jnp.float32),  # (avg, len) ring
                jnp.zeros((), jnp.int32))             # ring index

    def apply(self, ab: AudioBatch, state: Any) -> Tuple[AudioBatch, Any]:
        new_state, pcm = jax.lax.scan(
            _norm_step(float(self.options["smooth"]),
                       float(self.options["smoothlast"]),
                       int(self.options["algo"])), state, ab.pcm)
        return ab.with_pcm(pcm), new_state


@register
class AstatFilter(AudioFilter):
    """filter_astat.c: track the global sample min/max; the suggested
    volume rescale (32767/peak) accumulates in the carry and is logged
    by the session summary."""

    info = ModuleInfo(name="astat", kind=ModuleKind.FILTER, media="audio")
    desc = ModuleDesc(name="astat", comment="audio peak statistics",
                      capabilities="AE",
                      params=[ParamSpec("file", "write result to file",
                                        "s", ""),
                              ParamSpec("silence_limit", "maximum "
                                        "silence amplitude", "d", 0,
                                        0, 32767)])
    slots = FilterSlot.PRE_S
    media = "audio"

    def init_state(self, rate: int, channels: int) -> Any:
        return {"min": jnp.zeros((), jnp.int32),
                "max": jnp.zeros((), jnp.int32)}

    def apply(self, ab: AudioBatch, state: Any) -> Tuple[AudioBatch, Any]:
        lo = jnp.minimum(state["min"], ab.pcm.min().astype(jnp.int32))
        hi = jnp.maximum(state["max"], ab.pcm.max().astype(jnp.int32))
        return ab, {"min": lo, "max": hi}

    def finalize(self, state: Any) -> None:
        """astat_stop (filter_astat.c:160-205): silence check, the
        "-s" suggestion, optional scale-value file."""
        import numpy as np
        from tcforge_tpu.core import log
        mn = int(np.asarray(state["min"]))
        mx = int(np.asarray(state["max"]))
        lim = self.options["silence_limit"]
        if mn >= lim and mx <= lim:
            log.info("astat", "audio track seems only silence")
            return
        if mn == 0 or mx == 0:
            log.warn("astat", "bad minimum/maximum value, unable to "
                     "find scale value")
            return
        fmin = -mn / 32767.0
        fmax = mx / 32767.0
        vol = 1.0 / fmax if fmin < fmax else 1.0 / fmin
        path = self.options["file"]
        if path:
            with open(path, "w") as fh:
                fh.write(f"{vol:.3f}\n")
            log.info("astat", f"wrote audio scale value to '{path}'")
        else:
            log.info("astat", f"(min={-fmin:.3f}/max={fmax:.3f}), "
                     f"normalize volume with \"-s {vol:.3f}\"")

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
    """filter_detectsilence.c: detect silence intervals in the audio
    track and print them (scan_only) or build a tcmp3cut command line
    of song-start positions at close.

    Reference semantics (``detectsilence_filter_audio:264-308``): a
    frame is silence when int(sum |s|/32767) == 0; consecutive zeros
    accumulate (short gaps do NOT reset the counter — kept), and an
    interval [id-zeros, id-1] is reported at the first non-silent
    frame once zeros >= silence_frames.  Intervals surface through the
    carry's per-batch event rows and the collect() hook."""

    info = ModuleInfo(name="detectsilence", kind=ModuleKind.FILTER,
                      media="audio")
    desc = ModuleDesc(name="detectsilence",
                      comment="detect silence intervals",
                      params=[ParamSpec("scan_only", "only print "
                                        "intervals, no tcmp3cut line",
                                        "d", 0, 0, 1),
                              ParamSpec("silence_frames", "min silent "
                                        "frames for a song transition",
                                        "d", 4, 1, 1 << 30)])
    slots = FilterSlot.PRE_S
    media = "audio"

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        self.intervals: list = []

    def init_state(self, rate: int, channels: int) -> Any:
        return {"zeros": jnp.zeros((), jnp.int32),
                "fid": jnp.zeros((), jnp.int32),
                "events": jnp.full((1, 2), -1, jnp.int32)}

    def apply(self, ab: AudioBatch, state: Any) -> Tuple[AudioBatch, Any]:
        sf = self.options["silence_frames"]
        tot = jnp.sum(jnp.abs(ab.pcm.astype(jnp.int32))
                      .astype(jnp.float32), axis=(1, 2))
        silent = tot < 32767.0            # int(sum |s|/32767) == 0
        fids = state["fid"] + jnp.arange(ab.pcm.shape[0])

        def step(zeros, x):
            sil, fid = x
            ended = ~sil & (zeros >= sf)
            ev = jnp.where(ended,
                           jnp.stack([fid - zeros, fid - 1]),
                           jnp.full((2,), -1, jnp.int32))
            zeros = jnp.where(sil, zeros + 1,
                              jnp.where(ended, 0, zeros))
            return zeros, ev

        zeros, events = jax.lax.scan(step, state["zeros"],
                                     (silent, fids))
        return ab, {"zeros": zeros, "fid": fids[-1] + 1,
                    "events": events}

    def collect(self, state: Any) -> None:
        import numpy as np
        ev = np.asarray(state["events"])
        for s, e in ev:
            if s >= 0:
                self.intervals.append((int(s), int(e)))

    def finalize(self, state: Any) -> None:
        from tcforge_tpu.core import log
        if self.options["scan_only"]:
            for s, e in self.intervals:
                log.info("detectsilence",
                         f"silence interval in frames [{s}-{e}]")
        elif self.intervals:
            songs = ",".join(str(s) for s, _ in self.intervals)
            log.info("detectsilence", "********** Songs ***********")
            log.info("detectsilence", f",{songs}")
            log.info("detectsilence",
                     f"Execute: tcmp3cut -i in.mp3 -o base -t ,{songs}")


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
