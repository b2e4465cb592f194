"""doublefps + smartbob — the field-rate (bob) pipeline.

Rebuilds of ``filter/filter_doublefps.c`` and ``filter_smartbob.c``:

- doublefps splits each interlaced frame into its two fields as separate
  half-height frames at double rate (half-height mode; the reference
  clones the frame and emits the saved second field on the cloned copy,
  filter_doublefps.c:filter_video case 0/1).  In the batch model this is
  a static (N, H, W) -> (2N, H/2, W) reshape: no clone bookkeeping
  needed, frame ids duplicate, and the second-of-pair carries
  WAS_CLONED like the reference.
- smartbob reconstructs full-height frames from field frames: field
  lines pass through; missing lines use cubic/linear vertical
  interpolation where the motion test fires and are woven from the
  previous field where static (filter_smartbob.c:230-520).  Motion test:
  ``(lumap - luma)(luman - luma) >= threshold^2`` against the previous
  field, luma = (55r + 182g + 19b) >> 8.

The classic chain is ``-J doublefps,smartbob`` (29.97i -> 59.94p).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import ATTR_WAS_CLONED, FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)
from tcforge_tpu.ops import colorspace

DENOISE_DIAMETER = 5


@register
class DoubleFpsFilter(VideoFilter):
    info = ModuleInfo(name="doublefps", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="doublefps", comment="double fps by field splitting",
        capabilities="VYE",
        params=[ParamSpec("topfirst", "top field first (-1: 480-line "
                          "video 0, else 1)", "d", -1, -1, 1),
                ParamSpec("shiftEven", "obsolete alias of topfirst",
                          "d", -1, -1, 1),
                ParamSpec("fullheight", "keep full height: frames = "
                          "fields 0+1, 1+2, ...", "d", 0, 0, 1)])
    slots = FilterSlot.PRE_S

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        if job.ex_fps <= 0:
            job.ex_fps = job.fps * 2     # output runs at field rate

    def _topfirst(self, height: int) -> bool:
        """doublefps_configure:138-150: topfirst > shiftEven (obsolete,
        warns) > 480-line default."""
        if self.options["topfirst"] >= 0:
            return bool(self.options["topfirst"])
        if self.options["shiftEven"] >= 0:
            from tcforge_tpu.core import log
            log.warn("doublefps", 'The "shiftEven" option name is '
                     'obsolete; please use "topfirst" instead.')
            return bool(self.options["shiftEven"])
        return height != 480

    def init_state(self, width: int, height: int, fmt) -> Any:
        if not self.options["fullheight"]:
            return None
        return {"prev_y": jnp.zeros((height, width), jnp.int32),
                "first": jnp.ones((), bool)}

    def output_size(self, width: int, height: int) -> Tuple[int, int]:
        if self.options["fullheight"]:
            return width, height
        return width, height // 2

    def _apply_fullheight(self, fb: FrameBatch, state):
        """filter_doublefps.c case 2/3: frame pairs [merge(curr first
        field, prev second field), curr]; only Y is re-interlaced in
        YUV420 mode (chroma rides the current frame, lines 368-379)."""
        top_first = self._topfirst(fb.height)
        n = fb.batch
        y = fb.y.astype(jnp.int32)
        prev = jnp.concatenate([state["prev_y"][None], y[:-1]], 0)
        top, bottom = (y, prev) if top_first else (prev, y)
        merged = y.at[:, 0::2].set(top[:, 0::2]) \
            .at[:, 1::2].set(bottom[:, 1::2])
        first = state["first"] & (jnp.arange(n) == 0)
        merged = jnp.where(first[:, None, None], y, merged)
        pair_y = jnp.stack([merged, y], 1).reshape((2 * n,)
                                                   + y.shape[1:])
        ids = jnp.repeat(fb.frame_ids, 2) if fb.frame_ids is not None \
            else None
        attrs = (jnp.repeat(fb.attrs, 2) if fb.attrs is not None
                 else jnp.zeros((2 * n,), jnp.int32))
        attrs = jnp.where(jnp.arange(2 * n) % 2 == 1,
                          attrs | ATTR_WAS_CLONED, attrs)
        out = fb.with_planes(
            y=pair_y.astype(fb.y.dtype),
            u=jnp.repeat(fb.u, 2, axis=0),
            v=jnp.repeat(fb.v, 2, axis=0))
        import dataclasses
        out = dataclasses.replace(out, attrs=attrs, frame_ids=ids,
                                  fps=fb.fps * 2)
        new_state = dict(state, prev_y=y[-1],
                         first=jnp.zeros((), bool))
        return out, new_state

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        if self.options["fullheight"]:
            if fb.y is None:
                raise ValueError("doublefps fullheight: YUV only")
            return self._apply_fullheight(fb, state)
        top_first = self._topfirst(fb.height)
        n = fb.batch

        def split(plane):
            # (N, H, W) -> (2N, H/2, W): even rows then odd rows per frame
            h = plane.shape[-2]
            first = plane[..., 0::2, :] if top_first else plane[..., 1::2, :]
            second = plane[..., 1::2, :] if top_first else plane[..., 0::2, :]
            inter = jnp.stack([first, second], axis=1)   # (N, 2, H/2, W)
            return inter.reshape((2 * n,) + inter.shape[2:])

        ids = jnp.repeat(fb.frame_ids, 2) if fb.frame_ids is not None \
            else None
        attrs = (jnp.repeat(fb.attrs, 2) if fb.attrs is not None
                 else jnp.zeros((2 * n,), jnp.int32))
        cloned = (jnp.arange(2 * n) % 2 == 1)
        attrs = jnp.where(cloned, attrs | ATTR_WAS_CLONED, attrs)

        if fb.rgb is not None:
            rgbp = jnp.moveaxis(fb.rgb, -1, 1)
            out_rgb = jnp.moveaxis(split(rgbp), 1, -1)
            out = FrameBatch(format=fb.format, rgb=out_rgb, attrs=attrs,
                             frame_ids=ids, fps=fb.fps * 2)
        else:
            out = FrameBatch(format=fb.format, y=split(fb.y),
                             u=split(fb.u), v=split(fb.v), attrs=attrs,
                             frame_ids=ids, fps=fb.fps * 2)
        return out, state


def smartbob_fields(rgb_fields: jnp.ndarray, was_cloned: jnp.ndarray,
                    prev_field: jnp.ndarray, threshold: int,
                    shift_even: bool,
                    denoise: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(M, h, W, 3) field frames -> (M, 2h, W, 3) full frames.

    `was_cloned` is the per-frame WAS_CLONED flag (field parity);
    `prev_field` is the previous field's pixels (the reference's
    prevFrame buffer).  Frames chain via lax.scan.
    """
    from tcforge_tpu.modules.filters.smartdeinter import _box5_sum, _dilate5

    src_all = rgb_fields.astype(jnp.int32)
    h, w = rgb_fields.shape[-3], rgb_fields.shape[-2]
    t2 = threshold * threshold
    i_odd_even = 0 if shift_even else 1

    def luma(p):
        return (55 * p[..., 0] + 182 * p[..., 1] + 19 * p[..., 2]) >> 8

    def one(prev, inputs):
        src, cloned = inputs
        shift_up = (cloned.astype(jnp.int32) == i_odd_even)
        # motion map on lines 0..h-2
        prev_l = luma(prev)
        prev_cmp = jnp.where(shift_up, jnp.roll(prev_l, -1, axis=-2),
                             prev_l)
        cur_l = luma(src)
        next_l = jnp.roll(cur_l, -1, axis=-2)
        if threshold == 0:
            moving = jnp.ones((h, w), bool)
        else:
            moving = ((cur_l - prev_cmp) * (next_l - prev_cmp)) >= t2
            moving = moving.at[h - 1, :].set(False)
            if denoise:
                eroded = moving & (_box5_sum(moving.astype(jnp.int32)) > 9)
                moving = _dilate5(eroded)

        nxt = jnp.roll(src, -1, axis=-3)
        prv = jnp.roll(src, 1, axis=-3)
        nxtnxt = jnp.roll(src, -2, axis=-3)
        lin = (src + nxt) >> 1
        cub = jnp.clip((5 * (src + nxt) - (prv + nxtnxt)) >> 3, 0, 255)
        rows = jnp.arange(h)
        use_lin = ((rows == 0) | (rows == h - 2))[:, None, None]
        interp = jnp.where(use_lin, lin, cub)
        prev_shift = jnp.where(shift_up, jnp.roll(prev, -1, axis=-3), prev)
        synth = jnp.where(moving[..., None], interp, prev_shift)

        # interleave: even lines = field lines, odd = synthesized
        # (shift_up swaps which parity the field lands on)
        woven_a = jnp.stack([src, synth], axis=1)    # field first
        woven_b = jnp.stack([synth, src], axis=1)    # synth first
        woven = jnp.where(shift_up, woven_b, woven_a)
        out = woven.reshape(2 * h, w, 3)
        return src, out.astype(jnp.uint8)

    new_prev, outs = jax.lax.scan(one, prev_field,
                                  (src_all, was_cloned))
    return outs, new_prev


@register
class SmartBobFilter(VideoFilter):
    info = ModuleInfo(name="smartbob", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="smartbob", comment="motion-adaptive bob doubler",
        version="1.1", capabilities="VRY",
        params=[ParamSpec("threshold", "motion threshold", "d", 12, 0, 255),
                ParamSpec("denoise", "motion map denoising", "d", 0, 0, 1),
                ParamSpec("shiftEven", "shift even field frames", "d", 0,
                          0, 1),
                ParamSpec("motionOnly", "show motion areas", "d", 0, 0, 1)])
    slots = FilterSlot.POST_S

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        # height here is the field height (after doublefps)
        return jnp.zeros((height, width, 3), jnp.int32)

    def output_size(self, width: int, height: int) -> Tuple[int, int]:
        return width, height * 2

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        was_yuv = fb.rgb is None
        work = colorspace.convert(fb, ImageFormat.RGB24) if was_yuv else fb
        cloned = ((fb.attrs & ATTR_WAS_CLONED) != 0
                  if fb.attrs is not None
                  else jnp.zeros((fb.batch,), bool))
        out_rgb, new_state = smartbob_fields(
            work.rgb[..., :3], cloned, state,
            self.options["threshold"], bool(self.options["shiftEven"]),
            bool(self.options["denoise"]))
        out = FrameBatch(format=ImageFormat.RGB24, rgb=out_rgb,
                         attrs=fb.attrs, frame_ids=fb.frame_ids,
                         fps=fb.fps)
        if was_yuv:
            out = colorspace.convert(out, fb.format)
        return out, new_state
