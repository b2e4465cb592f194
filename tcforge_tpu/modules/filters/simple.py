"""Simple stateless filters: invert, levels, mask, testframe, compare.

Analogues of ``filter/filter_invert.c``, ``filter_levels.c``,
``filter_mask.c``, ``filter_testframe.c``, ``filter_compare.c``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)


@register
class InvertFilter(VideoFilter):
    """filter_invert.c: 255 - value on every plane."""

    info = ModuleInfo(name="invert", kind=ModuleKind.FILTER)
    desc = ModuleDesc(name="invert", comment="invert the image",
                      params=[ParamSpec("range", "apply to frames start-end",
                                        "s", "")])
    slots = FilterSlot.PRE_M

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        if fb.rgb is not None:
            return fb.with_planes(rgb=255 - fb.rgb), state
        out = fb.with_planes(y=255 - fb.y,
                             u=(255 - fb.u) if fb.u is not None else None,
                             v=(255 - fb.v) if fb.v is not None else None)
        return out, state


@register
class LevelsFilter(VideoFilter):
    """filter_levels.c: map luma [in_lo, in_hi] + gamma to [out_lo, out_hi]
    via a 256-entry LUT."""

    info = ModuleInfo(name="levels", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="levels", comment="luma levels correction",
        params=[ParamSpec("input", "input range lo-hi", "s", "0-255"),
                ParamSpec("gamma", "gamma", "f", 1.0, 0.01, 10.0),
                ParamSpec("output", "output range lo-hi", "s", "0-255"),
                ParamSpec("pre", "run as pre-processing filter", "d",
                          0, 0, 1)])
    slots = FilterSlot.POST_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        if self.options["pre"]:
            self.slots = FilterSlot.PRE_M
        in_lo, in_hi = self._parse_range(self.options["input"], 0, 255)
        out_lo, out_hi = self._parse_range(self.options["output"], 0, 255)
        gamma = self.options["gamma"]
        i = np.arange(256, dtype=np.float64)
        t = np.clip((i - in_lo) / max(1e-9, in_hi - in_lo), 0.0, 1.0)
        lut = out_lo + np.power(t, 1.0 / gamma) * (out_hi - out_lo)
        self._lut = jnp.asarray(np.clip(lut + 0.5, 0, 255).astype(np.uint8))

    @staticmethod
    def _parse_range(s: str, lo: int, hi: int):
        if "-" in s:
            a, b = s.split("-", 1)
            return int(a), int(b)
        return lo, hi

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        return fb.with_planes(y=self._lut[fb.y.astype(jnp.int32)]), state


@register
class DeinterlaceFilter(VideoFilter):
    """Standalone `-J deinterlace` filter name wrapping the
    tcv_deinterlace modes (libtcvideo deinterlace.c / the -I internal;
    VERDICT r2 item 8).  Geometry-changing field dropping stays with
    -I 3/4; this filter offers the shape-preserving modes."""

    info = ModuleInfo(name="deinterlace", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="deinterlace", comment="deinterlace (interpolate or "
        "linear blend, tcv_deinterlace modes)",
        params=[ParamSpec("mode", "interpolate|linear_blend", "s",
                          "interpolate")])
    slots = FilterSlot.PRE_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        mode = str(self.options["mode"])
        if mode not in ("interpolate", "linear_blend"):
            raise ValueError(
                f"deinterlace: unknown mode {mode!r} (use "
                "interpolate|linear_blend; field dropping is -I 3/4)")
        self._mode = mode

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        from tcforge_tpu.ops import video
        fn = (video.deint_interpolate if self._mode == "interpolate"
              else video.deint_linear_blend)
        if fb.rgb is not None:
            rgbp = jnp.moveaxis(fb.rgb, -1, 1)
            return fb.with_planes(
                rgb=jnp.moveaxis(fn(rgbp), 1, -1)), state
        # luma-only like -I 1/5's Y-plane focus; chroma fields carry
        # far less combing energy
        return fb.with_planes(y=fn(fb.y)), state


@register
class MaskFilter(VideoFilter):
    """filter_mask.c: black out everything outside a rectangle."""

    info = ModuleInfo(name="mask", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="mask", comment="rectangular mask",
        params=[ParamSpec("lefttop", "left-top corner", "dxd", (0, 0)),
                ParamSpec("rightbot", "right-bottom corner", "dxd",
                          (0, 0))])
    slots = FilterSlot.POST_M

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        l, t = self.options["lefttop"]
        r, b = self.options["rightbot"]
        h, w = fb.height, fb.width
        if (r, b) == (0, 0):
            r, b = w, h
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        inside = ((yy >= t) & (yy < b) & (xx >= l) & (xx < r))
        y = jnp.where(inside[None], fb.y, jnp.uint8(16))
        if fb.u is not None:
            sh, sw = fb.u.shape[-2:]
            cyy = jnp.arange(sh)[:, None] * (h // sh)
            cxx = jnp.arange(sw)[None, :] * (w // sw)
            cin = ((cyy >= t) & (cyy < b) & (cxx >= l) & (cxx < r))
            u = jnp.where(cin[None], fb.u, jnp.uint8(128))
            v = jnp.where(cin[None], fb.v, jnp.uint8(128))
            return fb.with_planes(y=y, u=u, v=v), state
        return fb.with_planes(y=y), state


@register
class TestFrameFilter(VideoFilter):
    """filter_testframe.c: replace content with a test pattern."""

    info = ModuleInfo(name="testframe", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="testframe", comment="generate test pattern frames",
        params=[ParamSpec("mode", "0=ramp 1=checker 2=grid", "d", 0, 0, 2)])
    slots = FilterSlot.PRE_M

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        mode = self.options["mode"]
        h, w = fb.height, fb.width
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        if mode == 0:
            pat = ((xx * 255) // jnp.maximum(1, w - 1)).astype(jnp.uint8)
            pat = jnp.broadcast_to(pat, (h, w))
        elif mode == 1:
            pat = (((yy // 8 + xx // 8) % 2) * 219 + 16).astype(jnp.uint8)
        else:
            pat = jnp.where((yy % 16 == 0) | (xx % 16 == 0), 235,
                            16).astype(jnp.uint8)
        y = jnp.broadcast_to(pat[None], fb.y.shape)
        neutral = lambda p: jnp.full_like(p, 128)
        return fb.with_planes(
            y=y,
            u=neutral(fb.u) if fb.u is not None else None,
            v=neutral(fb.v) if fb.v is not None else None), state


@register
class CompareFilter(VideoFilter):
    """filter_compare.c: find a pattern image in the video.

    The pattern image is Gaussian-resized to the frame size
    (``compare_setup_pattern:180-195``); only its fully-opaque pixels
    (GM opacity==0, i.e. alpha 255) form the comparison mask.  Per
    frame, the mean absolute difference per RGB channel over the mask
    is compared against `delta` (default 45.0) and a '1' (match) or
    'n' is appended to the results file, after a "#fps:" header
    (``compare_filter_video:406-440``).  `flip` mirrors the pattern,
    `rgbswap` swaps R/B.  Luma-only comparison is used for YUV input
    (the reference is RGB24-only)."""

    info = ModuleInfo(name="compare", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="compare", comment="compare with other image to find "
        "a pattern",
        params=[ParamSpec("pattern", "pattern image file path", "s",
                          "compare.png"),
                ParamSpec("results", "results file path", "s",
                          "compare.log"),
                ParamSpec("delta", "delta error allowed", "f", 45.0,
                          0.0, 100.0),
                ParamSpec("rgbswap", "swap R/B in the pattern", "d",
                          0, 0, 1),
                ParamSpec("flip", "mirror the pattern", "d", 0, 0, 1)])
    slots = FilterSlot.POST_S

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        self._pattern = None
        self._results = None

    def _setup(self, width: int, height: int):
        from tcforge_tpu.io.image import read_image
        from tcforge_tpu.ops.zoom import zoom_plane
        img = read_image(self.options["pattern"], keep_alpha=True)
        if self.options["flip"]:
            img = np.flip(img, axis=0)
        if self.options["rgbswap"]:
            img = img[..., [2, 1, 0, 3]]
        planes = jnp.asarray(np.moveaxis(img, -1, 0))       # (4,h,w)
        rs = np.asarray(zoom_plane(planes, width, height, "gaussian"))
        mask = rs[3] == 255                 # GM opacity == 0
        if not mask.any():
            mask = np.ones((height, width), bool)
        self._pattern = (jnp.asarray(rs[:3].astype(np.int32)),
                         jnp.asarray(mask),
                         jnp.float32(max(1, int(mask.sum()))))

    def init_state(self, width, height, fmt):
        self._setup(width, height)
        return {"match": jnp.full((1,), -1, jnp.int32)}

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        pat, mask, count = self._pattern
        delta = jnp.float32(self.options["delta"])
        m = mask[None]
        if fb.rgb is not None:
            ok = None
            for c in range(3):
                d = jnp.abs(fb.rgb[..., c].astype(jnp.int32) - pat[c])
                avg = jnp.sum(jnp.where(m, d, 0).astype(jnp.float32),
                              axis=(1, 2)) / count
                good = avg < delta
                ok = good if ok is None else (ok & good)
        else:
            # luma-only proxy for YUV sessions
            from tcforge_tpu.ops.colorspace import rgb_to_yuv_pixels
            py, _, _ = rgb_to_yuv_pixels(jnp.moveaxis(pat, 0, -1))
            d = jnp.abs(fb.y.astype(jnp.int32) - py)
            avg = jnp.sum(jnp.where(m, d, 0).astype(jnp.float32),
                          axis=(1, 2)) / count
            ok = avg < delta
        return fb, {"match": ok.astype(jnp.int32)}

    def collect(self, state: Any) -> None:
        if self._results is None:
            self._results = open(self.options["results"], "w")
            self._results.write(f"#fps:{self.job.fps:f}\n")
        for v in np.asarray(state["match"]):
            if v >= 0:
                self._results.write("1" if v else "n")
        self._results.flush()

    def finalize(self, state: Any) -> None:
        if self._results is not None:
            self._results.close()
            self._results = None


@register
class NullFilter(VideoFilter):
    """filter_null.c: do nothing (chain/bench scaffolding)."""

    info = ModuleInfo(name="null", kind=ModuleKind.FILTER)
    desc = ModuleDesc(name="null", comment="no-op filter")
    slots = FilterSlot.POST_M

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        return fb, state
