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
class SmartYuvFilter(SmartDeinterFilter):
    """filter_smartyuv.c: YUV-native smart deinterlacer (shared
    implementation with smartdeinter)."""

    info = ModuleInfo(name="smartyuv", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="smartyuv", comment="motion-adaptive deinterlace (YUV)",
        capabilities="VY", params=SmartDeinterFilter.desc.params)


@register
class AclipFilter(AudioFilter):
    """filter_aclip.c: detect clipped audio (samples at the ceiling)."""

    info = ModuleInfo(name="aclip", kind=ModuleKind.FILTER, media="audio")
    desc = ModuleDesc(
        name="aclip", comment="detect clipped audio ranges",
        params=[ParamSpec("level", "clip level", "d", 32000, 1, 32767)])
    slots = FilterSlot.PRE_S
    media = "audio"

    def init_state(self, rate: int, channels: int) -> Any:
        return {"clipped_samples": jnp.zeros((), jnp.int32),
                "clipped_frames": jnp.zeros((), jnp.int32)}

    def apply(self, ab: AudioBatch, state: Any) -> Tuple[AudioBatch, Any]:
        level = self.options["level"]
        hit = jnp.abs(ab.pcm.astype(jnp.int32)) >= level
        per_frame = jnp.sum(hit.astype(jnp.int32), axis=(1, 2))
        return ab, {
            "clipped_samples": state["clipped_samples"]
            + jnp.sum(per_frame),
            "clipped_frames": state["clipped_frames"]
            + jnp.sum((per_frame > 0).astype(jnp.int32))}


@register
class BarrelFilter(VideoFilter):
    """filter_barrel.c: radial lens-distortion correction.

    out(r) samples in(r * (1 + k1*(r/R)^2 + k2*(r/R)^4)) around the
    frame center (nearest-neighbor like the reference's integer remap).
    """

    info = ModuleInfo(name="barrel", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="barrel", comment="barrel distortion correction",
        params=[ParamSpec("k1", "quadratic coefficient x1000", "d", 60,
                          -1000, 1000),
                ParamSpec("k2", "quartic coefficient x1000", "d", 0,
                          -1000, 1000)])
    slots = FilterSlot.POST_M

    def _remap_indices(self, h: int, w: int):
        k1 = self.options["k1"] / 1000.0
        k2 = self.options["k2"] / 1000.0
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        rmax = np.hypot(cy, cx)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        dy, dx = yy - cy, xx - cx
        r = np.hypot(dy, dx) / max(1e-9, rmax)
        scale = 1.0 + k1 * r ** 2 + k2 * r ** 4
        sy = np.clip(np.round(cy + dy * scale), 0, h - 1).astype(np.int32)
        sx = np.clip(np.round(cx + dx * scale), 0, w - 1).astype(np.int32)
        return jnp.asarray(sy), jnp.asarray(sx)

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        def remap(plane):
            sy, sx = self._remap_indices(plane.shape[-2], plane.shape[-1])
            return plane[..., sy, sx]

        if fb.rgb is not None:
            rgbp = jnp.moveaxis(fb.rgb, -1, 1)
            return fb.with_planes(rgb=jnp.moveaxis(remap(rgbp), 1, -1)), \
                state
        return fb.with_planes(y=remap(fb.y), u=remap(fb.u),
                              v=remap(fb.v)), state
