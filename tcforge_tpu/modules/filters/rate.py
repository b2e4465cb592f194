"""Frame-rate filters: fps, skip, slowmo.

- fps (``filter/filter_fps.c``): convert frame rate by dropping
  (in > out) or cloning (in < out) frames with a Bresenham-style
  accumulator.  The reference's recurrence
  ``framesin/infps > framesout/outfps`` has the closed form
  ``fo(k) = strict_floor(k*out/in) + 1`` for cloning and
  ``fo(k) = ceil(k*out/in)`` for dropping; both are evaluated per frame
  id, so batches stay static: dropped frames carry SKIPPED, cloned
  frames are emitted as dup-factor copies with the extras SKIPPED.
- skip (``filter_skip.c``): drop explicit frame ranges.
- slowmo (``filter_slowmo.c``): slow motion by cloning every frame a
  fixed number of times.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import ATTR_SKIPPED, ATTR_WAS_CLONED, FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)


def _dup_batch(fb: FrameBatch, dup: int, keep_counts: jnp.ndarray,
               fps: float) -> FrameBatch:
    """Repeat every frame `dup` times; copy j of frame i survives when
    j < keep_counts[i] (extras SKIPPED).  Copies > 0 carry WAS_CLONED."""
    n = fb.batch

    def rep(plane):
        if plane is None:
            return None
        return jnp.repeat(plane, dup, axis=0)

    ids = (jnp.repeat(fb.frame_ids, dup) if fb.frame_ids is not None
           else None)
    attrs = (jnp.repeat(fb.attrs, dup) if fb.attrs is not None
             else jnp.zeros((n * dup,), jnp.int32))
    j = jnp.tile(jnp.arange(dup), n)
    keep = j < jnp.repeat(keep_counts, dup)
    attrs = jnp.where(keep, attrs, attrs | ATTR_SKIPPED)
    attrs = jnp.where(j > 0, attrs | ATTR_WAS_CLONED, attrs)
    if fb.rgb is not None:
        return FrameBatch(format=fb.format, rgb=rep(fb.rgb), attrs=attrs,
                          frame_ids=ids, fps=fps)
    return FrameBatch(format=fb.format, y=rep(fb.y), u=rep(fb.u),
                      v=rep(fb.v), attrs=attrs, frame_ids=ids, fps=fps)


@register
class FpsFilter(VideoFilter):
    info = ModuleInfo(name="fps", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="fps", comment="convert frame rate by cloning/skipping",
        capabilities="VRYEO",
        params=[ParamSpec("infps", "input fps (0 = probe)", "f", 0.0, 0.0,
                          1000.0),
                ParamSpec("outfps", "output fps (0 = export fps)", "f",
                          0.0, 0.0, 1000.0),
                ParamSpec("pre", "run pre (default: auto)", "d", -1, -1,
                          1)])
    slots = FilterSlot.PRE_S

    def __init__(self, job, options: str = ""):
        # allow legacy "25:29.97" positional syntax
        if options and "=" not in options and ":" in options:
            a, b = options.split(":")[:2]
            options = f"infps={a}:outfps={b}"
        super().__init__(job, options)
        self.infps = self.options["infps"] or job.fps
        self.outfps = self.options["outfps"] or job.out_fps
        if job.ex_fps <= 0 and self.outfps != self.infps:
            job.ex_fps = self.outfps
        # pre for decreasing rates, post for increasing (filter_fps.c)
        pre = self.options["pre"]
        if pre == -1:
            pre = 1 if self.infps > self.outfps else 0
        self.slots = FilterSlot.PRE_S if pre else FilterSlot.POST_S
        r = self.outfps / self.infps if self.infps else 1.0
        self._ratio = r
        self._dup = max(1, math.ceil(r)) if r > 1 else 1

    def output_size(self, width: int, height: int) -> Tuple[int, int]:
        return width, height

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        r = self._ratio
        if r == 1.0:
            return fb, state
        # float32 accumulator: exact vs the C double recurrence for streams
        # up to ~10^5 frames; beyond that an occasional clone/skip may
        # land one frame off (the average rate stays exact)
        k = fb.frame_ids.astype(jnp.float32) + 1    # 1-based framesin
        if r < 1.0:
            # drop: kept iff ceil(k*r) > ceil((k-1)*r)
            fo = jnp.ceil(k * r)
            fo_prev = jnp.ceil((k - 1) * r)
            kept = fo > fo_prev
            attrs = fb.attrs if fb.attrs is not None else jnp.zeros(
                (fb.batch,), jnp.int32)
            attrs = jnp.where(kept, attrs, attrs | ATTR_SKIPPED)
            return fb.with_attrs(attrs), state
        # clone: copies(k) = fo(k) - fo(k-1), fo(k) = strict_floor(k*r)+1
        def fo(kk):
            x = kk * r
            sf = jnp.ceil(x) - 1          # largest integer < x
            return jnp.where(kk <= 0, 0.0, sf + 1)

        copies = (fo(k) - fo(k - 1)).astype(jnp.int32)
        out = _dup_batch(fb, self._dup, copies, self.outfps)
        return out, state


@register
class SkipFilter(VideoFilter):
    """filter_skip.c: drop framecode ranges (``start-end[/step]``,
    time syntax ``[[H:]M:]S[.F]`` allowed, space- or comma-separated —
    the reference uses ``parse_fc_time_string`` with separator " ",
    filter_skip.c:81,114)."""

    info = ModuleInfo(name="skip", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="skip", comment="skip frame ranges",
        params=[ParamSpec("start-end/step [...]", "Skip frames", "s", ""),
                ParamSpec("ranges", "ranges a-b[/s],c-d (frame ids)",
                          "s", "")])
    slots = FilterSlot.PRE_S

    def __init__(self, job, options: str = ""):
        # legacy syntax: skip=10-20,50-60 (bare value, the reference's
        # whole-optstring form)
        if options and "=" not in options:
            options = f"ranges={options}"
        super().__init__(job, options)
        from tcforge_tpu.core.framecode import parse_ranges
        txt = (self.options["ranges"]
               or self.options["start-end/step [...]"] or "")
        fps = getattr(job, "fps", 25.0) or 25.0
        sep = "," if "," in txt else " "
        self._ranges = parse_ranges(txt, fps, sep).ranges if txt.strip() \
            else []

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        if not self._ranges:
            return fb, state
        ids = fb.frame_ids
        skip = jnp.zeros((fb.batch,), bool)
        for r in self._ranges:
            skip = skip | ((ids >= r.stf) & (ids < r.etf)
                           & ((ids - r.stf) % r.stepf == 0))
        attrs = fb.attrs if fb.attrs is not None else jnp.zeros(
            (fb.batch,), jnp.int32)
        attrs = jnp.where(skip, attrs | ATTR_SKIPPED, attrs)
        return fb.with_attrs(attrs), state


@register
class SlowMoFilter(VideoFilter):
    """filter_slowmo.c: slow motion by emitting each frame N times."""

    info = ModuleInfo(name="slowmo", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="slowmo", comment="slow motion by frame cloning",
        params=[ParamSpec("factor", "clone factor", "d", 2, 1, 10)])
    slots = FilterSlot.PRE_S

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        f = self.options["factor"]
        if f <= 1:
            return fb, state
        counts = jnp.full((fb.batch,), f, jnp.int32)
        return _dup_batch(fb, f, counts, fb.fps), state
