"""Overlay/region filters: logo, logoaway, fieldanalysis, 29to23,
cpaudio.

- logo (``filter/filter_logo.c``): render an image over the frame at a
  position with transparency.  The reference uses GraphicsMagick; here
  the image is a PPM/PGM file (tcforge_tpu.io.image).
- logoaway (``filter_logoaway.c``): remove a logo region by XY
  interpolation from the region borders.
- fieldanalysis (``filter_fieldanalysis.c``): report interlacing
  statistics per frame (top/bottom-first, progressive share).
- 29to23 (``filter_29to23.c``): alias preset of the fps filter.
- cpaudio (``filter_cpaudio.c``): copy one audio channel over the other.
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


@register
class LogoFilter(VideoFilter):
    info = ModuleInfo(name="logo", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="logo", comment="render an image over the video",
        capabilities="VRY",
        params=[ParamSpec("file", "PPM/PGM image to overlay", "s", ""),
                ParamSpec("posdef", "0=custom 1..5 presets", "d", 0, 0, 5),
                ParamSpec("pos", "position XxY", "dxd", (0, 0)),
                ParamSpec("ignore", "transparent gray level (-1 off)",
                          "d", -1, -1, 255)])
    slots = FilterSlot.PRE_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        from tcforge_tpu.io.image import read_image
        path = self.options["file"]
        if not path:
            raise ValueError("logo: 'file' option is required")
        self._img = read_image(path)          # (h, w, 3) or (h, w)
        if self._img.ndim == 2:
            self._img = np.repeat(self._img[..., None], 3, axis=-1)

    def _position(self, fw: int, fh: int) -> Tuple[int, int]:
        lh, lw = self._img.shape[:2]
        preset = self.options["posdef"]
        if preset == 1:
            return 0, 0
        if preset == 2:
            return fw - lw, 0
        if preset == 3:
            return 0, fh - lh
        if preset == 4:
            return fw - lw, fh - lh
        if preset == 5:
            return (fw - lw) // 2, (fh - lh) // 2
        return self.options["pos"]

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        from tcforge_tpu.ops import colorspace
        was_yuv = fb.rgb is None
        work = colorspace.convert(fb, ImageFormat.RGB24) if was_yuv else fb
        x, y = self._position(fb.width, fb.height)
        lh, lw = self._img.shape[:2]
        logo = jnp.asarray(self._img[:, :, :3])
        region = work.rgb[:, y:y + lh, x:x + lw, :]
        ignore = self.options["ignore"]
        if ignore >= 0:
            mask = jnp.any(logo != ignore, axis=-1, keepdims=True)
            patched = jnp.where(mask, logo[None], region)
        else:
            patched = jnp.broadcast_to(logo[None], region.shape)
        rgb = work.rgb.at[:, y:y + lh, x:x + lw, :].set(
            patched.astype(work.rgb.dtype))
        out = work.with_planes(rgb=rgb)
        if was_yuv:
            out = colorspace.convert(out, fb.format)
        return out, state


@register
class LogoAwayFilter(VideoFilter):
    """filter_logoaway.c XY mode: fill the logo region by blending the
    horizontal and vertical interpolations between the region borders."""

    info = ModuleInfo(name="logoaway", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="logoaway", comment="remove a logo region by interpolation",
        capabilities="VRY",
        params=[ParamSpec("pos", "region left-top XxY", "dxd", (0, 0)),
                ParamSpec("size", "region WxH", "dxd", (0, 0))])
    slots = FilterSlot.PRE_M

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        x, y = self.options["pos"]
        rw, rh = self.options["size"]
        if not rw or not rh:
            return fb, state

        def patch(plane, px, py, pw, ph):
            left = plane[..., py:py + ph, px - 1:px]
            right = plane[..., py:py + ph, px + pw:px + pw + 1]
            top = plane[..., py - 1:py, px:px + pw]
            bottom = plane[..., py + ph:py + ph + 1, px:px + pw]
            ax = (jnp.arange(1, pw + 1, dtype=jnp.float32)
                  / (pw + 1))[None, None, :]
            ay = (jnp.arange(1, ph + 1, dtype=jnp.float32)
                  / (ph + 1))[None, :, None]
            ih = (left.astype(jnp.float32) * (1 - ax)
                  + right.astype(jnp.float32) * ax)
            iv = (top.astype(jnp.float32) * (1 - ay)
                  + bottom.astype(jnp.float32) * ay)
            fill = ((ih + iv) / 2).astype(plane.dtype)
            return plane.at[..., py:py + ph, px:px + pw].set(fill)

        if fb.rgb is not None:
            rgbp = jnp.moveaxis(fb.rgb, -1, 1)
            rgbp = patch(rgbp, x, y, rw, rh)
            return fb.with_planes(rgb=jnp.moveaxis(rgbp, 1, -1)), state
        sx, sy = fb.format.subsampling
        out = fb.with_planes(
            y=patch(fb.y, x, y, rw, rh),
            u=patch(fb.u, x // sx, y // sy, rw // sx, rh // sy),
            v=patch(fb.v, x // sx, y // sy, rw // sx, rh // sy))
        return out, state


@register
class FieldAnalysisFilter(VideoFilter):
    """filter_fieldanalysis.c: accumulate interlacing statistics; the
    verdict (progressive / top-first / bottom-first share) lives in the
    carry for the session log."""

    info = ModuleInfo(name="fieldanalysis", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="fieldanalysis", comment="interlace analysis",
        params=[ParamSpec("threshold", "comb threshold", "d", 9, 1, 1000)])
    slots = FilterSlot.PRE_S

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        return {"frames": jnp.zeros((), jnp.int32),
                "interlaced": jnp.zeros((), jnp.int32)}

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        from tcforge_tpu.modules.filters.cadence import interlace_score
        plane = fb.y if fb.y is not None else fb.rgb[..., 0]
        score = interlace_score(plane, 10, 30)
        flagged = jnp.sum((score > self.options["threshold"])
                          .astype(jnp.int32))
        return fb, {"frames": state["frames"] + fb.batch,
                    "interlaced": state["interlaced"] + flagged}


@register
class F29to23Filter(VideoFilter):
    """filter_29to23.c: 29.97 -> 23.976 drop preset (fps filter alias)."""

    info = ModuleInfo(name="29to23", kind=ModuleKind.FILTER)
    desc = ModuleDesc(name="29to23", comment="29.97->23.976 fps preset")
    slots = FilterSlot.PRE_S

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        from tcforge_tpu.modules.filters.rate import FpsFilter
        self._fps = FpsFilter(job, "infps=29.97:outfps=23.976")

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        return self._fps.apply(fb, state)


@register
class CpAudioFilter(AudioFilter):
    """filter_cpaudio.c: copy one stereo channel over the other."""

    info = ModuleInfo(name="cpaudio", kind=ModuleKind.FILTER,
                      media="audio")
    desc = ModuleDesc(name="cpaudio", comment="copy audio channel",
                      params=[ParamSpec("source", "source channel "
                                        "(0=left 1=right)", "d", 0, 0, 1)])
    slots = FilterSlot.PRE_M
    media = "audio"

    def apply(self, ab: AudioBatch, state: Any) -> Tuple[AudioBatch, Any]:
        if ab.channels != 2:
            return ab, state
        src = self.options["source"]
        mono = ab.pcm[..., src:src + 1]
        return ab.with_pcm(jnp.concatenate([mono, mono], axis=-1)), state
