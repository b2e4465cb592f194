"""smartdeinter — motion-adaptive deinterlacing.

Rebuild of ``filter/filter_smartdeinter.c`` (Donald Graft's smart
deinterlacer): per-pixel motion map against the previous frame
(luma or per-channel difference, frame/field/both modes,
filter_smartdeinter.c:550-800), scene-change override, optional 5x5
erode+dilate denoising of the map (``highq``), then odd scan lines in
moving areas are replaced by linear ``(above + below)/2`` or cubic
``(5(p+n) - (pp+nn)) >> 3`` vertical interpolation — or every line is
field-blended ``p/2 + above/4 + below/4`` in Blend mode
(filter_smartdeinter.c:880-1010).  Even lines always pass through.

The reference operates in packed RGB32 converted from the input
colorspace; we do the same through the exact imgconvert math.  The
luma proxy is the reference's ``(76r + 150g + 30b) >> 8``.

The previous-frame luma/pixel store is the carry state.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)
from tcforge_tpu.ops import colorspace

FRAME_ONLY, FIELD_ONLY, FRAME_AND_FIELD = 0, 1, 2


def _luma(rgb_i32: jnp.ndarray) -> jnp.ndarray:
    """(76r + 30b + 150g) >> 8 (filter_smartdeinter.c:573)."""
    return (76 * rgb_i32[..., 0] + 150 * rgb_i32[..., 1]
            + 30 * rgb_i32[..., 2]) >> 8


def _box5_sum(m: jnp.ndarray) -> jnp.ndarray:
    """Clamped 5x5 box sum over (..., H, W) int32 (erode window)."""
    pad = [(0, 0)] * (m.ndim - 2) + [(2, 2), (2, 2)]
    p = jnp.pad(m, pad)
    h, w = m.shape[-2], m.shape[-1]
    acc = jnp.zeros_like(m)
    for dy in range(5):
        for dx in range(5):
            acc = acc + p[..., dy:dy + h, dx:dx + w]
    return acc


def _dilate5(m: jnp.ndarray) -> jnp.ndarray:
    pad = [(0, 0)] * (m.ndim - 2) + [(2, 2), (2, 2)]
    p = jnp.pad(m, pad)
    h, w = m.shape[-2], m.shape[-1]
    acc = jnp.zeros_like(m)
    for dy in range(5):
        for dx in range(5):
            acc = acc | p[..., dy:dy + h, dx:dx + w]
    return acc


def _phase_shift(src, saved, first, field_shift, inswap, outswap):
    """Advanced processing (filter_smartdeinter.c:365-515): optional
    field swap and/or one-field phase shift with a carried field
    (PAL captures digitized with the field phase off by one)."""
    even = src[0::2]
    odd = src[1::2]
    if not field_shift:
        if inswap != outswap:               # single swap: swap fields
            even, odd = odd, even
        # inswap & outswap (or neither): null operation
        new_saved = saved
    else:
        case = (1 if inswap else 0) | ((2 if outswap else 0))
        if case == 0:
            out_odd, keep, fallback = even, odd, even
            out_even = jnp.where(first, fallback, saved)
            even, odd = out_even, out_odd
        elif case == 1:
            out_odd, keep, fallback = odd, even, odd
            out_even = jnp.where(first, fallback, saved)
            even, odd = out_even, out_odd
        elif case == 2:
            out_even, keep, fallback = even, odd, even
            out_odd = jnp.where(first, fallback, saved)
            even, odd = out_even, out_odd
        else:
            out_even, keep, fallback = odd, even, odd
            out_odd = jnp.where(first, fallback, saved)
            even, odd = out_even, out_odd
        new_saved = keep
    h2, w = even.shape[0], even.shape[1]
    out = jnp.stack([even, odd], axis=1).reshape(h2 * 2, w,
                                                 src.shape[-1])
    return out, new_saved


def smartdeinter_rgb(rgb: jnp.ndarray, state,
                     threshold: int, scenethreshold: int,
                     diffmode: int, highq: bool, blend: bool,
                     cubic: bool, motion_only: bool,
                     colordiff: bool = False,
                     field_shift: bool = False, inswap: bool = False,
                     outswap: bool = False, no_motion: bool = False):
    """(N, H, W, 3) uint8 + carry -> (output, new carry).

    Frames chain sequentially over the batch via lax.scan (the motion
    reference is always the previous *input* frame).  `colordiff`
    compares each channel against the threshold (the reference's
    default) instead of the luma proxy."""
    import jax

    src_all = rgb.astype(jnp.int32)
    h, w = rgb.shape[-3], rgb.shape[-2]
    advanced = field_shift or inswap or outswap

    def one_frame(carry, src):
        prev, saved, first = carry
        if advanced:
            src, saved = _phase_shift(src, saved, first, field_shift,
                                      inswap, outswap)
        if no_motion and advanced:
            new_prev = src if colordiff else _luma(src)
            return ((new_prev, saved, jnp.zeros((), bool)),
                    src.astype(jnp.uint8))
        luma = _luma(src) if src.shape[-1] == 3 else src[..., 0]
        # frame motion on lines 1..h-2 (borders get a free ride)
        if colordiff:
            fr = jnp.any(jnp.abs(src - prev) > threshold, axis=-1)
        else:
            fr = jnp.abs(luma - prev) > threshold
        if diffmode == FRAME_AND_FIELD:
            if colordiff:
                above = jnp.roll(src, 1, axis=-3)
                prev_below = jnp.roll(prev, -1, axis=-3)
                odd_rows = (jnp.arange(h) & 1).astype(bool)[:, None,
                                                            None]
                ref = jnp.where(odd_rows, above, prev_below)
                fi = jnp.any(jnp.abs(src - ref) > threshold, axis=-1)
            else:
                above = jnp.roll(luma, 1, axis=-2)
                prev_below = jnp.roll(prev, -1, axis=-2)
                odd_rows = (jnp.arange(h) & 1).astype(bool)[:, None]
                field_ref = jnp.where(odd_rows, above, prev_below)
                fi = jnp.abs(luma - field_ref) > threshold
            moving = fr & fi
        elif diffmode == FIELD_ONLY:
            t2 = threshold * threshold
            if colordiff:
                above = jnp.roll(src, 1, axis=-3)
                below = jnp.roll(src, -1, axis=-3)
                moving = jnp.any(
                    (above - src) * (below - src) > t2, axis=-1)
            else:
                above = jnp.roll(luma, 1, axis=-2)
                below = jnp.roll(luma, -1, axis=-2)
                moving = ((above - luma) * (below - luma)) > t2
        else:
            moving = fr
        border = jnp.zeros((h, w), bool).at[0, :].set(True) \
            .at[h - 1, :].set(True)
        moving = jnp.where(border, False, moving)

        count = jnp.sum(moving.astype(jnp.int32))
        scenechange = (100 * count) // (h * w) >= scenethreshold

        if highq:
            eroded = moving & (_box5_sum(moving.astype(jnp.int32)) > 9)
            dilated = _dilate5(eroded)
            moving = jnp.where(scenechange, moving, dilated)

        above_m = jnp.roll(moving, 1, axis=-2)
        below_m = jnp.roll(moving, -1, axis=-2)
        any_m = (moving | above_m | below_m) | scenechange

        srcm = jnp.roll(src, 1, axis=-3)       # line above
        srcp = jnp.roll(src, -1, axis=-3)      # line below
        if cubic:
            srcmm = jnp.roll(src, 3, axis=-3)
            srcpp = jnp.roll(src, -3, axis=-3)
            cub = jnp.clip((5 * (srcm + srcp) - (srcmm + srcpp)) >> 3,
                           0, 255)
        lin = srcm // 2 + srcp // 2
        blend_v = src // 2 + srcm // 4 + srcp // 4

        rows = jnp.arange(h)
        odd = (rows & 1).astype(bool)[:, None]
        interior = ((rows > 0) & (rows < h - 1))[:, None]
        cubic_ok = ((rows > 2) & (rows < h - 3))[:, None] if cubic else None

        if blend:
            still = jnp.where(motion_only,
                              jnp.full_like(src, 0x7F), src)
            out = jnp.where((any_m & interior)[..., None], blend_v,
                            jnp.where(interior[..., None], still, src))
        else:
            interp = lin
            if cubic:
                interp = jnp.where(cubic_ok[..., None], cub, lin)
            still = jnp.where(motion_only, jnp.full_like(src, 0x7F), src)
            moving_val = jnp.where(odd[..., None], interp, src)
            out = jnp.where((any_m & interior)[..., None], moving_val,
                            jnp.where(interior[..., None], still, src))
        new_prev = src if colordiff else luma
        return ((new_prev, saved, jnp.zeros((), bool)),
                out.astype(jnp.uint8))

    new_state, outs = jax.lax.scan(one_frame, state, src_all)
    return outs, new_state


@register
class SmartDeinterFilter(VideoFilter):
    info = ModuleInfo(name="smartdeinter", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="smartdeinter", comment="motion-adaptive deinterlacing",
        version="2.7", capabilities="VRY",
        params=[
            ParamSpec("threshold", "motion threshold", "d", 15, 0, 255),
            ParamSpec("scenethreshold", "scene change threshold %", "d",
                      100, 0, 255),
            ParamSpec("diffmode", "0=frame 1=field 2=both", "d", 0, 0, 2),
            ParamSpec("highq", "motion map denoising", "d", 1, 0, 1),
            ParamSpec("Blend", "blend instead of interpolate", "d", 0, 0,
                      1),
            ParamSpec("cubic", "cubic interpolation", "d", 0, 0, 1),
            ParamSpec("motionOnly", "show motion areas only", "d", 0, 0,
                      1),
            ParamSpec("colordiff", "compare color channels instead of "
                      "luma", "d", 1, 0, 1),
            ParamSpec("fieldShift", "phase shift by one field", "d", 0,
                      0, 1),
            ParamSpec("inswap", "field swap before phase shift", "d",
                      0, 0, 1),
            ParamSpec("outswap", "field swap after phase shift", "d",
                      0, 0, 1),
            ParamSpec("noMotion", "disable motion processing", "d", 0,
                      0, 1)])
    slots = FilterSlot.PRE_M

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        prev = (jnp.zeros((height, width, 3), jnp.int32)
                if self.options["colordiff"]
                else jnp.zeros((height, width), jnp.int32))
        saved = jnp.zeros((height // 2, width, 3), jnp.int32)
        return (prev, saved, jnp.ones((), bool))

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        was_yuv = fb.rgb is None
        work = colorspace.convert(fb, ImageFormat.RGB24) if was_yuv else fb
        out_rgb, new_state = smartdeinter_rgb(
            work.rgb[..., :3], state,
            self.options["threshold"], self.options["scenethreshold"],
            self.options["diffmode"], bool(self.options["highq"]),
            bool(self.options["Blend"]), bool(self.options["cubic"]),
            bool(self.options["motionOnly"]),
            colordiff=bool(self.options["colordiff"]),
            field_shift=bool(self.options["fieldShift"]),
            inswap=bool(self.options["inswap"]),
            outswap=bool(self.options["outswap"]),
            no_motion=bool(self.options["noMotion"]))
        out = work.with_planes(rgb=out_rgb)
        if was_yuv:
            out = colorspace.convert(out, fb.format)
        return out, new_state
