"""Small parity filters: smartyuv, aclip, barrel.

- smartyuv (``filter_smartyuv.c``): the YUV-native variant of the smart
  deinterlacer; same motion-adaptive algorithm, so it shares the
  smartdeinter implementation (which already round-trips through the
  exact imgconvert math for YUV input).
- aclip (``filter_aclip.c``): report audio ranges that hit the clip
  ceiling (carry counts clipped samples / frames).
- barrel (``filter_barrel.c``): barrel/pincushion lens-distortion
  correction by radial remap.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import AudioBatch, FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (AudioFilter, FilterSlot,
                                          ModuleInfo, ModuleKind,
                                          VideoFilter, register)
from tcforge_tpu.modules.filters.smartdeinter import SmartDeinterFilter


@register
class SmartYuvFilter(VideoFilter):
    """filter_smartyuv.c: YUV-native smart deinterlacer.

    Same motion-adaptive core as smartdeinter (shared plane kernel),
    run natively per plane: luma with `threshold`, and — when
    `doChroma` — U/V at their own resolution with `chromathres`
    (filter_smartyuv.c:1256-1265; defaults 14/7/31 with highq, cubic,
    Blend and doChroma all on, lines 71-73/1235-1245).  YUV420P only,
    like the reference."""

    info = ModuleInfo(name="smartyuv", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="smartyuv", comment="motion-adaptive deinterlace (YUV)",
        capabilities="VY",
        params=[
            ParamSpec("motionOnly", "show motion areas only", "d", 0,
                      0, 1),
            ParamSpec("diffmode", "0=frame 1=field 2=both", "d", 0,
                      0, 2),
            ParamSpec("threshold", "motion threshold (luma)", "d", 14,
                      0, 255),
            ParamSpec("chromathres", "motion threshold (chroma)", "d",
                      7, 0, 255),
            ParamSpec("scenethres", "scene change threshold %", "d",
                      31, 0, 255),
            ParamSpec("highq", "motion map denoising", "d", 1, 0, 1),
            ParamSpec("cubic", "cubic interpolation", "d", 1, 0, 1),
            ParamSpec("Blend", "blend instead of interpolate", "d", 1,
                      0, 1),
            ParamSpec("doChroma", "enable chroma processing", "d", 1,
                      0, 1),
            ParamSpec("verbose", "verbose mode", "d", 0, 0, 1)])
    slots = FilterSlot.PRE_M

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        if fmt != ImageFormat.YUV420P:
            raise ValueError("smartyuv: this filter is only capable of "
                             "YUV mode")

        def plane_state(h, w):
            return (jnp.zeros((h, w, 1), jnp.int32),
                    jnp.zeros((h // 2, w, 1), jnp.int32),
                    jnp.ones((), bool))

        st = {"y": plane_state(height, width)}
        if self.options["doChroma"]:
            st["u"] = plane_state(height // 2, width // 2)
            st["v"] = plane_state(height // 2, width // 2)
        return st

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        from tcforge_tpu.modules.filters.smartdeinter import \
            smartdeinter_rgb
        o = self.options
        new_state = dict(state)

        def run(plane, key, thresh):
            out, new_state[key] = smartdeinter_rgb(
                plane[..., None], state[key],
                thresh, o["scenethres"], o["diffmode"],
                bool(o["highq"]), bool(o["Blend"]), bool(o["cubic"]),
                bool(o["motionOnly"]), colordiff=True)
            return out[..., 0]

        y = run(fb.y, "y", o["threshold"])
        if o["doChroma"]:
            u = run(fb.u, "u", o["chromathres"])
            v = run(fb.v, "v", o["chromathres"])
            return fb.with_planes(y=y, u=u, v=v), new_state
        return fb.with_planes(y=y), new_state


@register
class AclipFilter(AudioFilter):
    """filter_aclip.c: generate audio clips — skip audio frames whose
    RMS metric sqrt(sum s^2)/nsamples*1000 stays under `level`, with a
    `range`-frame hysteresis before skipping resumes, and mark the
    first loud frame after a skipped run as a keyframe
    (filter_aclip.c:125-158)."""

    info = ModuleInfo(name="aclip", kind=ModuleKind.FILTER, media="audio")
    desc = ModuleDesc(
        name="aclip", comment="skip quiet audio, keyframe loud edges",
        params=[ParamSpec("level", "audio must be under this level to "
                          "be skipped", "d", 10, 0, 255),
                ParamSpec("range", "frames over level before skipping "
                          "resumes", "d", 25, 0, 255)])
    slots = FilterSlot.PRE_S
    media = "audio"

    def init_state(self, rate: int, channels: int) -> Any:
        # range_ctr starts at `range` (filter_aclip.c:94): the very
        # first quiet frame is skipped immediately
        return {"range_ctr": jnp.full((), self.options["range"],
                                      jnp.int32),
                "skip_mode": jnp.zeros((), jnp.int32)}

    def apply(self, ab: AudioBatch, state: Any) -> Tuple[AudioBatch, Any]:
        import jax
        from tcforge_tpu.core.frame import ATTR_KEYFRAME, ATTR_SKIPPED
        level = self.options["level"]
        rng = self.options["range"]
        x = ab.pcm.astype(jnp.float32)
        nsamp = x.shape[1] * x.shape[2]
        s = jnp.sqrt(jnp.sum(x * x, axis=(1, 2))) / nsamp * 1000.0

        def step(carry, sv):
            ctr, skipm = carry
            quiet = sv < level
            do_skip = quiet & (ctr == rng)
            ctr = jnp.where(quiet, jnp.where(do_skip, ctr, ctr + 1),
                            jnp.zeros((), jnp.int32))
            key = ~quiet & (skipm == 1)
            skipm = jnp.where(quiet,
                              jnp.where(do_skip, 1, skipm),
                              jnp.zeros((), jnp.int32))
            return (ctr, skipm), (do_skip, key)

        (ctr, skipm), (skip, key) = jax.lax.scan(
            step, (state["range_ctr"], state["skip_mode"]), s)
        attrs = (ab.attrs if ab.attrs is not None
                 else jnp.zeros((ab.pcm.shape[0],), jnp.int32))
        attrs = jnp.where(skip, attrs | ATTR_SKIPPED, attrs)
        attrs = jnp.where(key, attrs | ATTR_KEYFRAME, attrs)
        import dataclasses
        return dataclasses.replace(ab, attrs=attrs), \
            {"range_ctr": ctr, "skip_mode": skipm}


def _barrel_map(width: int, height: int, cx: float, cy: float,
                order2: float, order4: float):
    """gen_distortion_map (filter_barrel.c:230-300), vectorized float64.

    Returns (srcy, srcx, weights[9]) with weights scaled to 0x8000 and
    the center tap absorbing the rounding error, exactly like the C."""
    r_scale_sq = 4.0 / (width * width + height * height)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    dx = (xx + 0.5) - cx
    dy = (yy + 0.5) - cy
    r_sq = (dx * dx + dy * dy) * r_scale_sq
    mult = 1 + order2 * r_sq + order4 * r_sq * r_sq
    srcx = cx + mult * dx
    srcy = cy + mult * dy
    mx = np.floor(srcx)
    my = np.floor(srcy)
    raw = np.empty((9, height, width))
    for t, (wy, wx) in enumerate((a, b) for a in (-1, 0, 1)
                                 for b in (-1, 0, 1)):
        ddy = (my + wy + 0.5) - srcy
        ddx = (mx + wx + 0.5) - srcx
        dist = np.sqrt(ddx * ddx + ddy * ddy)
        # the reference's "simple cubic" hack (line 276)
        raw[t] = np.where(dist >= 1, 0.0,
                          (3.0 + dist * dist * (-7.0 + dist * 4.0)) / 3.0)
    total = raw.sum(axis=0)
    w = np.floor(raw / total * 0x8000 + 0.5).astype(np.int64)
    w[4] += 0x8000 - w.sum(axis=0)          # center tweak (line 292)
    return (my.astype(np.int32), mx.astype(np.int32),
            w.astype(np.int32))


@register
class BarrelFilter(VideoFilter):
    """filter_barrel.c: apply/remove barrel (lens) distortion.

    Exact rebuild: the configure-time distortion map
    (``gen_distortion_map:230-300``, float64 host math incl. the cubic
    weight hack and the 0x8000 renormalization tweak) and the 9-tap
    fixed-point resample (``filter_plane:424-470``, out-of-frame taps
    read 16/128).  U/V use a half-resolution map centered at cx/2,cy/2
    (``barrel_configure:218-224``).  `range=start-end/step` gates frames
    by id like the reference's filter_video (lines 378-381)."""

    info = ModuleInfo(name="barrel", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="barrel", comment="apply or remove barrel distortion",
        capabilities="VY",
        params=[ParamSpec("order2", "strength of order-2 distortion",
                          "f", 0.0),
                ParamSpec("order4", "strength of order-4 distortion",
                          "f", 0.0),
                ParamSpec("center", "center of distortion x/y",
                          "d/d", None),
                ParamSpec("range", "apply only to given frames",
                          "d-d/d", (0, 1 << 30, 1))])
    slots = FilterSlot.POST_M

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        o2, o4 = self.options["order2"], self.options["order4"]
        c = self.options["center"]
        cx, cy = c if c else (width // 2, height // 2)
        my, mx, w = _barrel_map(width, height, cx, cy, o2, o4)
        self._map_y = (jnp.asarray(my), jnp.asarray(mx), jnp.asarray(w))
        my, mx, w = _barrel_map(width // 2, height // 2,
                                cx / 2.0, cy / 2.0, o2, o4)
        self._map_uv = (jnp.asarray(my), jnp.asarray(mx), jnp.asarray(w))
        return None

    @staticmethod
    def _plane(src, m, defval):
        """filter_plane: 9-tap weighted gather, >>15."""
        my, mx, w = m
        h, wd = src.shape[-2], src.shape[-1]
        src32 = src.astype(jnp.int32)
        acc = jnp.zeros(src.shape, jnp.int32)
        t = 0
        for wy in (-1, 0, 1):
            for wx in (-1, 0, 1):
                sy, sx = my + wy, mx + wx
                ok = (sy >= 0) & (sy < h) & (sx >= 0) & (sx < wd)
                px = src32[..., jnp.clip(sy, 0, h - 1),
                           jnp.clip(sx, 0, wd - 1)]
                px = jnp.where(ok, px, defval)
                acc = acc + px * w[t]
                t += 1
        return (acc >> 15).astype(src.dtype)

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        if fb.y is None:
            raise ValueError("barrel: YUV420P only (like the reference)")
        from tcforge_tpu.core.frame import ATTR_SKIPPED
        start, end, step = self.options["range"]
        ids = (fb.frame_ids if fb.frame_ids is not None
               else jnp.arange(fb.batch, dtype=jnp.int32))
        act = ((ids >= start) & (ids <= end)
               & ((ids - start) % step == 0)
               & ((fb.attrs & ATTR_SKIPPED) == 0))[:, None, None]
        y = jnp.where(act, self._plane(fb.y, self._map_y, 16), fb.y)
        u = jnp.where(act, self._plane(fb.u, self._map_uv, 128), fb.u)
        v = jnp.where(act, self._plane(fb.v, self._map_uv, 128), fb.v)
        return fb.with_planes(y=y, u=u, v=v), state
