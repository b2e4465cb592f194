"""text — burn text/timestamps/frame counters into frames.

Rebuild of ``filter/filter_text.c`` (freetype-based in the reference;
here PIL's bitmap/TrueType rendering provides the glyph masks):

- static strings render once to a luma mask (background 16, glyph
  levels mapped to 16..240 like the reference's yuv255to224 LUT,
  filter_text.c:168-170);
- ``frame``/``tstamp`` modes pre-render a fixed-width digit atlas and
  compose the changing digits INSIDE jit by gathering glyph masks with
  per-frame indices derived from ``frame_ids`` — the per-frame text
  stays shape-static and batched;
- blending follows the C: luma ``e = ((100-opaque)*d + opaque*c)/100``
  with transparency skipping mask<=16, chroma forced to the text color
  over covered pixels (filter_text.c:664-682), fade in/out advancing
  ``opaque`` by ``fade`` per frame from ``start`` and back down from
  ``end - 100/fade - 1`` (:630-640, 769-776).

Divergences: the default string renders the launch date once (the C
re-renders ctime() every wall-clock second); only the YUV420P path is
built (the chain converts on entry).
"""

from __future__ import annotations

import time as _time
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)

MAX_OPACITY = 100

# posdef 1-9 like the reference enum (filter_text.c TOP_LEFT..BOT_RIGHT):
# 1=top-left 2=top-center 3=top-right 4/5/6=center row 7/8/9=bottom
_POSDEF = {1: (0, 0), 2: (1, 0), 3: (2, 0),
           4: (0, 1), 5: (1, 1), 6: (2, 1),
           7: (0, 2), 8: (1, 2), 9: (2, 2)}


def _load_font(path: str, points: int, dpi: int = 72):
    """FT_Set_Char_Size semantics (filter_text.c:443-447): pixel size =
    points * dpi / 72; the reference default dpi is 96."""
    from PIL import ImageFont
    px = max(1, round(points * dpi / 72))
    if path:
        return ImageFont.truetype(path, px)
    try:
        return ImageFont.load_default(size=px)
    except TypeError:                      # older PIL: fixed-size bitmap
        return ImageFont.load_default()


def render_mask(text: str, font, antialias: bool = True) -> np.ndarray:
    """Rasterize text -> uint8 luma mask with 16 background and glyph
    levels in 16..240 (the reference's yuv255to224 mapping).  With
    antialias off, coverage is thresholded to the mono-render levels
    (filter_text.c antialias option)."""
    from PIL import Image, ImageDraw
    probe = Image.new("L", (8, 8))
    d = ImageDraw.Draw(probe)
    x0, y0, x1, y1 = d.textbbox((0, 0), text, font=font)
    w = max(1, x1)
    h = max(1, y1)
    img = Image.new("L", (w, h), 0)
    ImageDraw.Draw(img).text((0, 0), text, font=font, fill=255)
    a = np.asarray(img, np.uint16)
    if not antialias:
        a = np.where(a >= 128, 255, 0).astype(np.uint16)
    return (16 + a * 224 // 255).astype(np.uint8)


def rgb_to_yuv_color(r: int, g: int, b: int) -> Tuple[int, int, int]:
    """Text color in YUV (BT.601 studio swing, like the reference's
    converter macros)."""
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
    return (min(235, max(16, y)), min(240, max(16, u)),
            min(240, max(16, v)))


@register
class TextFilter(VideoFilter):
    info = ModuleInfo(name="text", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="text", comment="burn text into the video", version="0.1.4",
        capabilities="VRYO",
        params=[ParamSpec("string", "text to display", "s", ""),
                ParamSpec("font", "TrueType font path", "s", ""),
                ParamSpec("points", "font size", "d", 25, 1, 100),
                ParamSpec("range", "start-end frame range", "s", ""),
                ParamSpec("pos", "position XxY", "dxd", (0, 0)),
                ParamSpec("posdef", "keypad position 0-9", "d", 0, 0, 9),
                ParamSpec("fade", "fade speed 0=off", "d", 0, 0, 10),
                ParamSpec("color", "RRGGBB hex", "s", "FFFFFF"),
                ParamSpec("notransparent", "draw opaque box", "b", 0),
                ParamSpec("tstamp", "render timestamps", "b", 0),
                ParamSpec("frame", "render frame numbers", "b", 0),
                ParamSpec("dpi", "resolution of font (in dpi)", "d",
                          96, 1, 1000),
                ParamSpec("antialias", "Anti-Alias text (0=off 1=on)",
                          "d", 1, 0, 1)])
    slots = FilterSlot.POST_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        self.job = job
        opts = dict(p.split("=", 1) if "=" in p else (p, "")
                    for p in (options or "").split(":") if p)
        self.mode = ("frame" if "frame" in opts
                     else "tstamp" if "tstamp" in opts else "static")
        self.string = self.options["string"]
        if self.mode == "static" and not self.string:
            self.string = _time.ctime()
        self.transparent = "notransparent" not in opts
        self.fade = self.options["fade"]
        self.start, self.end, self.step = 0, 1 << 30, 1
        rng = self.options["range"]
        if rng:
            head, _, step = rng.partition("/")
            a, _, b = head.partition("-")
            self.start = int(a or 0)
            self.end = int(b or (1 << 30))
            self.step = max(1, int(step or 1))
        col = self.options["color"]
        r, g, b = (int(col[0:2], 16), int(col[2:4], 16),
                   int(col[4:6], 16))
        self.color = rgb_to_yuv_color(r, g, b)
        self._font = _load_font(self.options["font"],
                                self.options["points"],
                                self.options["dpi"])
        self._antialias = bool(self.options["antialias"])

    def init_state(self, width: int, height: int,
                   fmt: ImageFormat) -> Any:
        if fmt != ImageFormat.YUV420P:
            raise ValueError("text filter needs YUV420P (-V)")
        if self.mode == "static":
            self._static_mask = render_mask(self.string, self._font,
                                            self._antialias)
            self._atlas = None
            mh, mw = self._static_mask.shape
        else:
            # fixed-width digit atlas for in-jit composition
            glyphs = [render_mask(c, self._font, self._antialias)
                      for c in "0123456789:."]
            gh = max(g.shape[0] for g in glyphs)
            gw = max(g.shape[1] for g in glyphs)
            atlas = np.full((12, gh, gw), 16, np.uint8)
            for i, g in enumerate(glyphs):
                atlas[i, :g.shape[0], :g.shape[1]] = g
            self._atlas = atlas
            if self.mode == "frame":
                self._prefix = render_mask("Frame: ", self._font,
                                           self._antialias)
                self._pattern = "dddddd"              # %06d
            else:
                self._prefix = None
                self._pattern = "dd:dd:dd.dd"
            pw = (self._prefix.shape[1] if self._prefix is not None
                  else 0)
            mh = max(gh, self._prefix.shape[0]
                     if self._prefix is not None else 0)
            mw = pw + len(self._pattern) * gw
            self._gh, self._gw = gh, gw
        self._bound = (mh, mw)

        posdef = self.options["posdef"]
        px, py = self.options["pos"]
        if posdef in _POSDEF:
            hpos, vpos = _POSDEF[posdef]
            px = {0: 0, 1: (width - mw) // 2, 2: width - mw}[hpos]
            py = {0: 0, 1: (height - mh) // 2, 2: height - mh}[vpos]
            px = min(px + (px & 1), max(0, width - mw))
            py = min(py + (py & 1), max(0, height - mh))
        if px < 0 or py < 0 or px + mw > width or py + mh > height:
            raise ValueError("text: invalid position")
        self._pos = (px, py)
        return None

    # ------------------------------------------------------------------

    def _compose_masks(self, ids: jnp.ndarray) -> jnp.ndarray:
        """Per-frame (N, mh, mw) masks for frame/tstamp modes, built by
        gathering digit glyphs from the atlas."""
        mh, mw = self._bound
        gh, gw = self._gh, self._gw
        n = ids.shape[0]
        atlas = jnp.asarray(self._atlas)
        fps = self.job.fps or 25.0

        if self.mode == "frame":
            digits = [(ids // (10 ** (5 - k))) % 10 for k in range(6)]
        else:
            total = (ids.astype(jnp.float32) / fps).astype(jnp.int32)
            hh = total // 3600
            mm = (total % 3600) // 60
            ss = total % 60
            ff = ids - ((hh * 3600 + mm * 60 + ss)
                        * fps).astype(jnp.int32)
            colon = jnp.full_like(ids, 10)
            dot = jnp.full_like(ids, 11)
            digits = [hh // 10, hh % 10, colon, mm // 10, mm % 10,
                      colon, ss // 10, ss % 10, dot, ff // 10, ff % 10]

        mask = jnp.full((n, mh, mw), 16, jnp.uint8)
        x = 0
        if self.mode == "frame" and self._prefix is not None:
            pre = jnp.asarray(self._prefix)
            mask = mask.at[:, :pre.shape[0], :pre.shape[1]].set(
                jnp.broadcast_to(pre, (n,) + pre.shape))
            x = self._prefix.shape[1]
        for d in digits:
            glyph = atlas[jnp.clip(d, 0, 11)]      # (N, gh, gw)
            mask = mask.at[:, :gh, x:x + gw].set(glyph)
            x += gw
        return mask

    def _opacity(self, ids: jnp.ndarray) -> jnp.ndarray:
        if not self.fade:
            return jnp.full_like(ids, MAX_OPACITY)
        ramp_up = jnp.clip((ids - self.start) * self.fade, 0,
                           MAX_OPACITY)
        fade_start = self.end - MAX_OPACITY // self.fade - 1
        ramp_dn = jnp.clip(MAX_OPACITY
                           - (ids - fade_start) * self.fade, 0,
                           MAX_OPACITY)
        return jnp.minimum(ramp_up, ramp_dn)

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        n = fb.batch
        ids = fb.frame_ids if fb.frame_ids is not None else \
            jnp.arange(n, dtype=jnp.int32)
        px, py = self._pos
        mh, mw = self._bound

        if self.mode == "static":
            mask = jnp.broadcast_to(jnp.asarray(self._static_mask),
                                    (n, mh, mw))
        else:
            mask = self._compose_masks(ids)

        boolstep = 0 if self.start % self.step == 0 else 1
        active = (ids >= self.start) & (ids <= self.end) & \
            (ids % self.step == boolstep)
        opaque = jnp.where(active, self._opacity(ids), 0)

        c = mask.astype(jnp.int32)
        region = fb.y[:, py:py + mh, px:px + mw].astype(jnp.int32)
        blend = ((MAX_OPACITY - opaque[:, None, None]) * region
                 + opaque[:, None, None] * c) // MAX_OPACITY
        covered = (c > 16) if self.transparent else \
            jnp.ones_like(c, jnp.bool_)
        covered = covered & active[:, None, None]
        new_region = jnp.where(covered, blend, region).astype(jnp.uint8)
        y = fb.y.at[:, py:py + mh, px:px + mw].set(new_region)

        # chroma: text color over covered pixels (subsampled)
        cov_c = covered[:, ::2, ::2]
        cy, cu, cv = self.color
        cx, cyy = px // 2, py // 2
        chh, cww = cov_c.shape[1], cov_c.shape[2]
        u = fb.u.at[:, cyy:cyy + chh, cx:cx + cww].set(
            jnp.where(cov_c, jnp.uint8(cu),
                      fb.u[:, cyy:cyy + chh, cx:cx + cww]))
        v = fb.v.at[:, cyy:cyy + chh, cx:cx + cww].set(
            jnp.where(cov_c, jnp.uint8(cv),
                      fb.v[:, cyy:cyy + chh, cx:cx + cww]))
        return fb.with_planes(y=y, u=u, v=v), state
