"""modfps — buffered frame-rate conversion with content-aware
clone/skip placement.

Rebuild of ``filter/filter_modfps.c``: unlike the plain fps filter
(which clones/skips on the rate schedule alone), buffered mode keeps a
ring of ``examine``+1 frames with per-slot motion scores (SAD between
ring neighbors, subsampled) and places each mandated skip on the
*lowest*-scoring buffered frame (the near-duplicate) and each mandated
clone on the *highest*-scoring one (filter_modfps.c:580-740).

mode=0 is the unbuffered rate recurrence — identical math to the fps
filter.  Clones are emitted as duplicate batch rows with WAS_CLONED set
(clonetype fancy merging is a later item; clonetype=0 copy semantics).

Performance note: the emitted frame is always the input from ``examine``
steps earlier (frame_out trails frame_in by exactly the buffer depth
once warm), so the frame ring never enters the ``lax.scan`` — the delay
line is a small carry of the last ``examine`` frames concatenated with
the batch outside the scan, and the scan itself carries only the
per-slot ok/score vectors and scalars (same shape rewrite that made
decimate 8.7x faster).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import ATTR_SKIPPED, ATTR_WAS_CLONED, FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)


@register
class ModFpsFilter(VideoFilter):
    info = ModuleInfo(name="modfps", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="modfps", comment="buffered fps converter", version="0.10",
        capabilities="VYRE",
        params=[ParamSpec("mode", "0=unbuffered 1=buffered", "d", 1, 0, 1),
                ParamSpec("infps", "original fps (0=probe)", "f", 0.0,
                          0.0, 200.0),
                ParamSpec("examine", "frames to buffer", "d", 5, 2, 25),
                ParamSpec("subsample", "pixel subsampling step", "d", 32,
                          1, 256)])
    slots = FilterSlot.POST_S

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        self.infps = self.options["infps"] or job.fps
        self.outfps = job.out_fps if job.ex_fps > 0 else job.fps
        self.num_sample = self.options["examine"]
        self.sub = self.options["subsample"]
        if self.options["mode"] == 0:
            from tcforge_tpu.modules.filters.rate import FpsFilter
            self._plain = FpsFilter(
                job, f"infps={self.infps}:outfps={self.outfps}")
        else:
            self._plain = None

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        if self._plain is not None:
            return None
        if fmt != ImageFormat.YUV420P:
            raise ValueError("modfps buffered mode needs YUV420P")
        nb = self.num_sample + 1
        ns = self.num_sample
        z = lambda h, w: jnp.zeros((ns, h, w), jnp.uint8)
        npix = (height * width + self.sub - 1) // self.sub
        return {"y": z(height, width), "u": z(height // 2, width // 2),
                "v": z(height // 2, width // 2),
                "mlast": jnp.zeros((npix,), jnp.int32),
                "ok": jnp.ones((nb,), jnp.int32),
                "score": jnp.zeros((nb,), jnp.int32),
                "frame_in": jnp.zeros((), jnp.int32),
                "frame_out": jnp.zeros((), jnp.int32),
                "framesin": jnp.zeros((), jnp.int32),
                "outframes": jnp.zeros((), jnp.float32)}

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        if self._plain is not None:
            return self._plain.apply(fb, state)

        nb = self.num_sample + 1
        ns = self.num_sample
        infps, outfps = self.infps, self.outfps
        up = infps < outfps
        sub = self.sub
        n = fb.batch

        # delay line assembled outside the scan: the frame emitted at
        # step t is always the input from ns steps earlier once warm
        # (frame_out trails frame_in by the full buffer depth)
        win_y = jnp.concatenate([state["y"], fb.y], axis=0)
        win_u = jnp.concatenate([state["u"], fb.u], axis=0)
        win_v = jnp.concatenate([state["v"], fb.v], axis=0)
        ys, us, vs = win_y[:n], win_u[:n], win_v[:n]
        carry_y, carry_u, carry_v = win_y[n:], win_u[n:], win_v[n:]

        # subsampled SAD between consecutive arrivals, batched
        mv = fb.y.reshape(n, -1)[:, ::sub].astype(jnp.int32)
        mall = jnp.concatenate([state["mlast"][None], mv], axis=0)
        sads = jnp.sum(jnp.abs(mall[1:] - mall[:-1]), axis=1)

        def step(st, sad):
            fi = st["frame_in"]
            ok = st["ok"].at[fi].set(1)
            # score the previous slot vs this arrival
            prev_slot = (fi + ns) % nb
            score = st["score"].at[prev_slot].set(sad)

            framesin = st["framesin"] + 1
            warming = framesin < nb
            fo = st["frame_out"]

            # rate decision on the delayed stream position
            tpos = (framesin - 1 - ns).astype(jnp.float32)
            outframes = st["outframes"]
            order = (fi + 1 + jnp.arange(nb - 1)) % nb   # window walk
            win_ok = ok[order] == 1
            win_score = score[order]
            if up:
                need_clone = tpos / infps > outframes / outfps
                pick = jnp.where(win_ok, win_score, -1)
                mod = order[jnp.argmax(pick)]
                ok = jnp.where(need_clone & ~warming, ok.at[mod].set(0),
                               ok)
                outframes = jnp.where(
                    warming, outframes,
                    outframes + jnp.where(need_clone, 2.0, 1.0))
            else:
                need_skip = tpos / infps < outframes / outfps
                pick = jnp.where(win_ok, win_score, jnp.int32(2 ** 30))
                mod = order[jnp.argmin(pick)]
                ok = jnp.where(need_skip & ~warming, ok.at[mod].set(0),
                               ok)
                outframes = jnp.where(
                    warming | need_skip, outframes, outframes + 1.0)

            out_ok = ok[fo] == 1
            if up:
                # not-OK slot = emit twice (clone); OK = once
                copies = jnp.where(warming, 0,
                                   jnp.where(out_ok, 1, 2))
            else:
                # not-OK slot = dropped
                copies = jnp.where(warming, 0,
                                   jnp.where(out_ok, 1, 0))
            fo = jnp.where(warming, fo, (fo + 1) % nb)
            new_st = {"ok": ok, "score": score,
                      "frame_in": (fi + 1) % nb,
                      "frame_out": fo, "framesin": framesin,
                      "outframes": outframes}
            return new_st, copies

        small = {k: state[k] for k in
                 ("ok", "score", "frame_in", "frame_out", "framesin",
                  "outframes")}
        new_small, copies = jax.lax.scan(step, small, sads)
        new_state = dict(new_small, y=carry_y, u=carry_u, v=carry_v,
                         mlast=mv[-1])

        dup = 2 if up else 1

        def rep(p):
            return jnp.repeat(p, dup, axis=0) if dup > 1 else p

        j = jnp.tile(jnp.arange(dup), n)
        keep = j < jnp.repeat(copies, dup)
        attrs = (jnp.repeat(fb.attrs, dup) if fb.attrs is not None
                 else jnp.zeros((n * dup,), jnp.int32))
        attrs = jnp.where(keep, attrs, attrs | ATTR_SKIPPED)
        attrs = jnp.where(j > 0, attrs | ATTR_WAS_CLONED, attrs)
        ids = (jnp.repeat(fb.frame_ids, dup)
               if fb.frame_ids is not None else None)
        out = FrameBatch(format=fb.format, y=rep(ys), u=rep(us),
                         v=rep(vs), attrs=attrs, frame_ids=ids,
                         fps=self.outfps)
        return out, new_state
