"""Cadence filters: ivtc, 32detect, decimate — the inverse-telecine chain.

Rebuilds of ``filter/filter_ivtc.c``, ``filter_32detect.c``,
``filter_decimate.c``.  The classic NTSC workflow is
``-J ivtc,decimate`` (29.97i telecined -> 23.976p): ivtc reassembles
progressive frames by choosing the best-matching field pairing from a
3-frame window, decimate drops the duplicate frame in each group of 5.

Variable output counts are expressed through the SKIPPED frame
attribute (the reference mechanism, tccore/frame.h:77): the engine drops
attribute-skipped frames at mux time, keeping every batch shape static
for XLA.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import (ATTR_INTERLACED, ATTR_SKIPPED,
                                    FrameBatch)
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)


# --------------------------------------------------------------------- #
# ivtc


def _merge_fields(top_src, bottom_src, field: int):
    """Assemble a frame taking field-`field` lines from top_src and the
    other parity from bottom_src (ivtc_copy_field pair semantics)."""
    out = bottom_src
    return out.at[..., field::2, :].set(top_src[..., field::2, :])


@register
class IvtcFilter(VideoFilter):
    """filter_ivtc.c: inverse telecine via best field match.

    State carries the previous two raw input frames; output frame j is
    assembled from the window (j-2, j-1, j) exactly like the reference's
    3-slot ring, with the first two stream frames marked SKIPPED.
    """

    info = ModuleInfo(name="ivtc", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="ivtc", comment="inverse telecine filter", version="0.4.1",
        capabilities="VYE",
        params=[ParamSpec("field", "which field to replace "
                          "(0=top 1=bottom)", "d", 0, 0, 1),
                ParamSpec("magic", "perform magic", "d", 0, 0, 1),
                ParamSpec("verbose", "print verbose information", "d", 0,
                          0, 1)])
    slots = FilterSlot.PRE_S

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        if fmt != ImageFormat.YUV420P:
            raise ValueError("ivtc requires YUV420P (filter_ivtc.c:102)")
        z = lambda h, w: jnp.zeros((2, h, w), jnp.uint8)
        return {"y": z(height, width), "u": z(height // 2, width // 2),
                "v": z(height // 2, width // 2)}

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        field = self.options["field"]
        magic = self.options["magic"]
        n = fb.batch

        # window arrays: W[j] = input j-2, W[j+1] = j-1, W[j+2] = j
        wy = jnp.concatenate([state["y"], fb.y], axis=0)
        wu = jnp.concatenate([state["u"], fb.u], axis=0)
        wv = jnp.concatenate([state["v"], fb.v], axis=0)
        prev_y, curr_y, next_y = wy[:-2], wy[1:-1], wy[2:]

        # metric grid: the combing test walks the opposite-parity field
        # around line base = (field ? 2 : 1), rows stepping 4, with an
        # x pattern of 4 samples on / 12 off (filter_ivtc.c:207-240).
        # Rows are clamped inside the plane (the C reads past the Y
        # plane into adjacent buffer bytes for the last row; we drop it).
        import numpy as np
        base = 2 if field else 1
        h = fb.height
        rows = np.arange(base, h - 2 + base, 4)
        rows = rows[(rows + 1) < h]
        xs_mask = jnp.asarray((np.arange(fb.width) % 16) < 4)

        def metric(plane, off_a, off_b):
            a = plane[..., rows + off_a, :]
            b = plane[..., rows + off_b, :]
            c = curr_y[..., rows, :]
            comb = ((a.astype(jnp.int32) - c.astype(jnp.int32))
                    * (b.astype(jnp.int32) - c.astype(jnp.int32)))
            hit = (comb > 100) & xs_mask[None, None, :]
            return jnp.sum(hit.astype(jnp.int32), axis=(-2, -1))

        p = metric(prev_y, -1, 1)
        c = metric(curr_y, -1, 1)
        nxt = metric(next_y, -1, 1)

        # chosen: argmin with the reference's tie order (c first)
        lowest = c
        chosen = jnp.ones((n,), jnp.int32)
        chosen = jnp.where(p < lowest, 0, chosen)
        lowest = jnp.minimum(lowest, p)
        chosen = jnp.where(nxt < lowest, 2, chosen)
        lowest = jnp.minimum(lowest, nxt)
        if magic:
            cond = (c < 50) & (jnp.abs(lowest - c) < 10) & (p + c + nxt > 1000)
            chosen = jnp.where(cond, 1, chosen)

        def assemble(wp):
            prev_p, curr_p, next_p = wp[:-2], wp[1:-1], wp[2:]
            sel = jnp.where((chosen == 0)[:, None, None], prev_p,
                            jnp.where((chosen == 2)[:, None, None], next_p,
                                      curr_p))
            return _merge_fields(sel, curr_p, field)

        out_y = assemble(wy)
        out_u = assemble(wu)
        out_v = assemble(wv)

        # first two stream frames are buffer-warmup -> SKIPPED
        attrs = fb.attrs if fb.attrs is not None else jnp.zeros((n,),
                                                                jnp.int32)
        warmup = fb.frame_ids < 2
        attrs = jnp.where(warmup, attrs | ATTR_SKIPPED, attrs)

        new_state = {"y": wy[-2:], "u": wu[-2:], "v": wv[-2:]}
        out = fb.with_planes(y=out_y, u=out_u, v=out_v).with_attrs(attrs)
        return out, new_state


# --------------------------------------------------------------------- #
# 32detect

COLOR_EQUAL = 10
COLOR_DIFF = 30
THRESHOLD = 9


def interlace_score(plane: jnp.ndarray, eq: int, diff: int,
                    counts: bool = False) -> Any:
    """interlace_test port (filter_32detect.c:88-135): per-frame combing
    score in 0.1% units over a (N, H, W) plane.  With counts=True also
    returns the raw cc_1/cc_2 comb counts (the reference's verbose
    line)."""
    s = plane.astype(jnp.int32)
    h = plane.shape[-2]
    w = plane.shape[-1]
    s1 = s[..., 0:h - 4:2, :]
    s2 = s[..., 1:h - 3:2, :]
    s3 = s[..., 2:h - 2:2, :]
    s4 = s[..., 3:h - 1:2, :]
    cc1 = jnp.sum(((jnp.abs(s1 - s3) < eq) & (jnp.abs(s1 - s2) > diff))
                  .astype(jnp.int32), axis=(-2, -1))
    cc2 = jnp.sum(((jnp.abs(s2 - s4) < eq) & (jnp.abs(s2 - s3) > diff))
                  .astype(jnp.int32), axis=(-2, -1))
    cc = ((cc1 + cc2) * 1000.0 / (w * h)).astype(jnp.int32)
    return (cc1, cc2, cc) if counts else cc


@register
class Detect32Filter(VideoFilter):
    """filter_32detect.c: flag interlaced frames (and optionally force a
    deinterlace mode on them via frame attributes)."""

    info = ModuleInfo(name="32detect", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="32detect", comment="3:2 pulldown / interlace detector",
        capabilities="VYR",
        params=[
            ParamSpec("threshold", "interlace detection threshold", "d",
                      THRESHOLD, 1, 1000),
            ParamSpec("chromathres", "chroma detection threshold", "d",
                      THRESHOLD // 2, 1, 1000),
            ParamSpec("equal", "threshold for equal colors", "d",
                      COLOR_EQUAL, 1, 255),
            ParamSpec("diff", "threshold for different colors", "d",
                      COLOR_DIFF, 1, 255),
            ParamSpec("chromaeq", "threshold for equal chroma", "d",
                      COLOR_EQUAL // 2, 1, 255),
            ParamSpec("chromadi", "threshold for different chroma",
                      "d", COLOR_DIFF // 2, 1, 255),
            ParamSpec("force_mode", "force deinterlace mode on detection",
                      "d", 0, 0, 5),
            ParamSpec("pre", "run as pre filter", "d", 1, 0, 1),
            ParamSpec("verbose", "show results", "d", 0, 0, 1)])
    slots = FilterSlot.PRE_M

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        eq = self.options["equal"]
        diff = self.options["diff"]
        thres = self.options["threshold"]
        cthres = self.options["chromathres"]
        ceq = max(1, self.options["chromaeq"])
        cdiff = max(1, self.options["chromadi"])
        if fb.rgb is not None:
            cc1, cc2, score = interlace_score(
                fb.rgb.reshape(fb.rgb.shape[:-2]
                               + (fb.rgb.shape[-2] * fb.rgb.shape[-1],))
                .reshape(fb.batch, fb.height, -1), eq, diff, counts=True)
            interlaced = score > thres
        else:
            cc1, cc2, sy = interlace_score(fb.y, eq, diff, counts=True)
            su = interlace_score(fb.u, ceq, cdiff)
            sv = interlace_score(fb.v, ceq, cdiff)
            score = sy
            interlaced = ((sy > thres).astype(jnp.int32)
                          + (su > cthres).astype(jnp.int32)
                          + (sv > cthres).astype(jnp.int32)) > 0
        attrs = fb.attrs if fb.attrs is not None else jnp.zeros(
            (fb.batch,), jnp.int32)
        if self.options["force_mode"]:
            attrs = jnp.where(interlaced, attrs | ATTR_INTERLACED, attrs)
        if self.options["verbose"]:
            ids = (fb.frame_ids if fb.frame_ids is not None
                   else jnp.arange(fb.batch, dtype=jnp.int32))
            state = {"ids": ids, "cc1": cc1, "cc2": cc2,
                     "cc": score, "flag": interlaced}
        return fb.with_attrs(attrs), state

    def collect(self, state: Any) -> None:
        if not (self.options["verbose"] and isinstance(state, dict)):
            return
        import numpy as _np
        from tcforge_tpu.core.log import info as _info
        ids = _np.asarray(state["ids"])
        cc1 = _np.asarray(state["cc1"])
        cc2 = _np.asarray(state["cc2"])
        cc = _np.asarray(state["cc"])
        flag = _np.asarray(state["flag"])
        for n in range(ids.size):
            if ids[n] < 0:
                continue
            _info("32detect",
                  "(0) frame [%06d]: (1) = %5d | (2) = %5d | (3) = %3d "
                  "| interlaced = %s"
                  % (ids[n], cc1[n], cc2[n], cc[n],
                     "yes" if flag[n] else "no"))


# --------------------------------------------------------------------- #
# decimate

FRBUFSIZ = 6


@register
class DecimateFilter(VideoFilter):
    """filter_decimate.c: drop the near-duplicate frame in each group of
    5 (the 3:2 pulldown residue after ivtc).

    Exact port of the 6-slot ring logic: frames are delayed by 4, every
    5th arrival picks the minimum |diff| neighbor pair (Y plane sampled
    every 16th byte) and invalidates that slot; invalid slots emit
    SKIPPED frames.
    """

    info = ModuleInfo(name="decimate", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="decimate", comment="NTSC decimation (4 of 5 frames)",
        capabilities="VYE",
        params=[ParamSpec("verbose", "print verbose information", "d", 0,
                          0, 1)])
    slots = FilterSlot.POST_S

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        if fmt != ImageFormat.YUV420P:
            raise ValueError("decimate requires YUV420P")
        ns = (height * width + 15) // 16     # subsampled metric length
        z = lambda h, w: jnp.zeros((4, h, w), jnp.uint8)
        return {"y": z(height, width), "u": z(height // 2, width // 2),
                "v": z(height // 2, width // 2),
                "metric": jnp.zeros((FRBUFSIZ, ns), jnp.uint8),
                "ok": jnp.ones((FRBUFSIZ,), jnp.int32),
                "frame_in": jnp.zeros((), jnp.int32),
                "frame_out": jnp.zeros((), jnp.int32),
                "count": jnp.zeros((), jnp.int32)}

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        n = fb.batch
        # The ring delays frames by exactly 4, so the frame path is a
        # fixed shift assembled OUTSIDE the scan; only the duplicate
        # decisions walk the ring, over 1/16-subsampled luma metrics
        # (the same bytes filter_decimate.c compares).
        metrics = fb.y.reshape(n, -1)[:, ::16]

        def step(st, metric):
            ring = st["metric"].at[st["frame_in"]].set(metric)
            ok = st["ok"].at[st["frame_in"]].set(1)
            count = st["count"] + 1
            frame_in = (st["frame_in"] + 1) % FRBUFSIZ

            def pick_dup(ok):
                idx = (st["frame_out"] + jnp.arange(FRBUFSIZ)) % FRBUFSIZ
                seq = ring[idx].astype(jnp.int32)
                diffs = jnp.sum(jnp.abs(seq[1:6] - seq[0:5]), axis=-1)
                jmin = jnp.argmin(diffs)
                return ok.at[(st["frame_out"] + jmin) % FRBUFSIZ].set(0)

            ok = jax.lax.cond((count > 4) & (count % 5 == 0), pick_dup,
                              lambda o: o, ok)
            buffering = count <= 4
            emit_ok = (ok[st["frame_out"]] == 1) & ~buffering
            frame_out = jnp.where(buffering, st["frame_out"],
                                  (st["frame_out"] + 1) % FRBUFSIZ)
            new_st = {"metric": ring, "ok": ok, "frame_in": frame_in,
                      "frame_out": frame_out, "count": count}
            return new_st, ~emit_ok

        core = {k: state[k] for k in ("metric", "ok", "frame_in",
                                      "frame_out", "count")}
        new_core, skipped = jax.lax.scan(step, core, metrics)

        # delayed frame path: window = [carry(4), batch][0:n]
        def delayed(carry, cur):
            return jnp.concatenate([carry, cur], axis=0)

        win_y = delayed(state["y"], fb.y)
        win_u = delayed(state["u"], fb.u)
        win_v = delayed(state["v"], fb.v)
        ys, us, vs = win_y[:n], win_u[:n], win_v[:n]
        new_state = dict(new_core)
        new_state["y"] = win_y[n:n + 4]
        new_state["u"] = win_u[n:n + 4]
        new_state["v"] = win_v[n:n + 4]

        attrs = fb.attrs if fb.attrs is not None else jnp.zeros(
            (fb.batch,), jnp.int32)
        attrs = jnp.where(skipped, attrs | ATTR_SKIPPED, attrs)
        out = fb.with_planes(y=ys, u=us, v=vs).with_attrs(attrs)
        return out, new_state


@register
class Drop32Filter(VideoFilter):
    """filter_32drop.c: 3:2 inverse telecine by dropping interlaced
    duplicates with a 5-frame sync counter.

    Per frame (filter_32drop.c:168-218): run the combing test
    (thresholds 50/100, critical ratio 5e-5); an interlaced frame is
    skipped while the drop budget allows (dcnt < 8, +5 per drop), a
    SECOND consecutive interlaced frame gets the previous interlaced
    frame's even rows + chroma merged in (merge_frames, :90-106), and
    when dropping would lose sync the last progressive frame is copied
    over.  dcnt <= -5 forces a skip to hold the 5-frame cadence on
    progressive material.
    """

    info = ModuleInfo(name="32drop", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="32drop", comment="3:2 telecine drop (filter_32drop)",
        version="0.4", capabilities="VRYE", params=[])
    slots = FilterSlot.PRE_M

    _EQ = 50
    _DIFF = 100
    _CRIT = 0.00005

    def init_state(self, width: int, height: int,
                   fmt: ImageFormat) -> Any:
        if fmt != ImageFormat.YUV420P:
            raise ValueError("32drop needs YUV420P input")
        z = lambda h, w: jnp.zeros((h, w), jnp.uint8)
        zf = lambda: {"y": z(height, width),
                      "u": z(height // 2, width // 2),
                      "v": z(height // 2, width // 2)}
        return {"last": zf(), "lasti": zf(),
                "fnum": jnp.zeros((), jnp.int32),
                "lfnum": jnp.full((), -1, jnp.int32),
                "dcnt": jnp.zeros((), jnp.int32)}

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        h, w = fb.height, fb.width

        def step(st, inp):
            y, u, v = inp
            s = y.astype(jnp.int32)
            s1 = s[0:h - 4:2]
            s2 = s[1:h - 3:2]
            s3 = s[2:h - 2:2]
            s4 = s[3:h - 1:2]
            cc1 = jnp.sum(((jnp.abs(s1 - s3) < self._EQ)
                           & (jnp.abs(s1 - s2) > self._DIFF))
                          .astype(jnp.int32))
            cc2 = jnp.sum(((jnp.abs(s2 - s4) < self._EQ)
                           & (jnp.abs(s2 - s3) > self._DIFF))
                          .astype(jnp.int32))
            isint = (cc1 + cc2) / (w * h) > self._CRIT

            fnum = st["fnum"]
            second = isint & (fnum - st["lfnum"] == 2)
            first_i = isint & ~second

            # second interlaced in a row: merge even rows + chroma from
            # the previous interlaced frame
            erow = (jnp.arange(h) % 2 == 0)[:, None]
            oy = jnp.where(second & erow, st["lasti"]["y"], y)
            ou = jnp.where(second, st["lasti"]["u"], u)
            ov = jnp.where(second, st["lasti"]["v"], v)

            can_drop = st["dcnt"] < 8
            skip = first_i & can_drop
            # can't drop: copy the last progressive frame over instead
            # (only when the previous frame was progressive, fnum > 0)
            copy_last = first_i & ~can_drop \
                & (fnum - st["lfnum"] < 3) & (fnum > 0)
            oy = jnp.where(copy_last, st["last"]["y"], oy)
            ou = jnp.where(copy_last, st["last"]["u"], ou)
            ov = jnp.where(copy_last, st["last"]["v"], ov)

            dcnt = st["dcnt"] + jnp.where(skip, 5, 0)
            # progressive-source sync drop
            force = dcnt <= -5
            skip = skip | force
            dcnt = dcnt + jnp.where(force, 5, 0)

            sel = lambda c, a, b: jnp.where(c, a, b)
            new = {
                "last": {"y": sel(~isint, y, st["last"]["y"]),
                         "u": sel(~isint, u, st["last"]["u"]),
                         "v": sel(~isint, v, st["last"]["v"])},
                "lasti": {"y": sel(first_i, y, st["lasti"]["y"]),
                          "u": sel(first_i, u, st["lasti"]["u"]),
                          "v": sel(first_i, v, st["lasti"]["v"])},
                "fnum": fnum + 1,
                "lfnum": jnp.where(~isint, fnum, st["lfnum"]),
                "dcnt": dcnt - 1,
            }
            return new, (oy, ou, ov, skip)

        new_state, (ys, us, vs, skips) = jax.lax.scan(
            step, state, (fb.y, fb.u, fb.v))
        attrs = fb.attrs if fb.attrs is not None else jnp.zeros(
            (fb.batch,), jnp.int32)
        attrs = jnp.where(skips, attrs | ATTR_SKIPPED, attrs)
        return fb.with_planes(y=ys, u=us, v=vs).with_attrs(attrs), \
            new_state
