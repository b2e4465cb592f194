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


def _blend8(src, dest, alpha):
    """filter_logoaway.c:125 alpha_blending: ((a*(src-dest))>>8)+dest,
    truncated to uint8 like the C unsigned-char assignment."""
    return (((alpha * (src - dest)) >> 8) + dest) & 0xFF


@register
class LogoAwayFilter(VideoFilter):
    """filter_logoaway.c: remove a logo region.

    Modes (``filter_logoaway.c:54-59``): 0=none, 1=solid fill, 2=xy
    interpolation from the region borders, 3=shape (alpha image guides
    which border pixel anchors the interpolation).

    The XY luma path is bit-exact to the reference's sequential walk
    (``process_frame_yuv_xy:458-505``): the reference writes the top
    row / left column first and then *reads them back* as interpolation
    anchors for the interior, so the vectorized version computes
    corner -> top row -> left column -> interior in four stages.  The
    chroma anchors (rows ``ypos/2`` / ``height/2``) lie outside the
    processed range and stay original, so chroma is a single gather.
    Mode 3 implements the intended nearest-opaque-anchor semantics
    (the reference's RGB shape walk at lines 330-400 overwrites the R
    channel three times — an upstream bug we do not reproduce).
    """

    info = ModuleInfo(name="logoaway", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="logoaway", comment="remove an image from the video",
        capabilities="VRY",
        params=[ParamSpec("range", "frame range", "d-d", (0, 1 << 30)),
                ParamSpec("pos", "position of logo XxY", "dxd", (0, 0)),
                ParamSpec("size", "size of logo WxH", "dxd", (10, 10)),
                ParamSpec("mode", "0=none 1=solid 2=xy 3=shape",
                          "d", 0, 0, 3),
                ParamSpec("border", "draw visible border", "b", False),
                ParamSpec("dump", "dump filter area to file", "b", False),
                ParamSpec("xweight", "x-y weight (0%-100%)",
                          "d", 50, 0, 100),
                ParamSpec("fill", "solid fill color RRGGBB", "s",
                          "000000"),
                ParamSpec("file", "image with alpha/shape info", "s", "")])
    slots = FilterSlot.PRE_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        fill = self.options["fill"]
        self._rgb_fill = tuple(int(fill[i:i + 2], 16) for i in (0, 2, 4))
        r, g, b = self._rgb_fill
        # configure-time BT.601 conversion, filter_logoaway.c:866-868
        self._yuv_fill = (int(0.257 * r + 0.504 * g + 0.098 * b + 16),
                          int(0.439 * r - 0.368 * g - 0.071 * b + 128),
                          int(-0.148 * r - 0.291 * g + 0.439 * b + 128))
        self._alpha = None
        if self.options["file"]:
            from tcforge_tpu.io.image import read_image
            img = read_image(self.options["file"])
            if img.ndim == 3:
                img = img[..., 0]           # red channel, like the ref
            self._alpha = np.asarray(img, np.int32)

    # ---- per-plane primitives (all int32 in/out, np or jnp) ---- #

    @staticmethod
    def _xy_luma(plane, x0, y0, x1, y1, xw):
        """Four-stage vectorized reference XY walk on one full-res
        plane (batch, H, W) int32; x1/y1 are absolute end coords."""
        yw = 100 - xw
        w, h = x1 - x0, y1 - y0
        xd, yd = 256 // w, 256 // h
        ah = (xd * (x1 - jnp.arange(x0, x1)))[None, :]        # (1, w)
        av = (yd * (y1 - jnp.arange(y0, y1)))[:, None]        # (h, 1)
        right = plane[:, y0:y1, x1][:, :, None]               # (N,h,1)
        bottom = plane[:, y1, x0:x1][:, None, :]              # (N,1,w)
        orig = plane[:, y0:y1, x0:x1]                         # (N,h,w)
        # stage A: corner (y0,x0)
        ch = _blend8(orig[:, :1, :1], right[:, :1], ah[None, :, :1])
        cv = _blend8(orig[:, :1, :1], bottom[:, :, :1], av[None, :1])
        corner = (ch * xw + cv * yw) // 100
        # stage B: top row (y0, col>x0): left anchor = new corner,
        # vertical anchor = self (original)
        th = _blend8(corner, right[:, :1], ah[None, :, :])
        tv = _blend8(orig[:, :1, :], bottom, av[None, :1])
        top = (th * xw + tv * yw) // 100                      # (N,1,w)
        top = top.at[:, :, :1].set(corner)
        # stage C: left column (row>y0, x0): h anchor = self original,
        # v anchor = new corner
        lh = _blend8(orig[:, :, :1], right, ah[None, :, :1])
        lv = _blend8(corner, bottom[:, :, :1], av[None, :, :])
        left = (lh * xw + lv * yw) // 100                     # (N,h,1)
        # stage D: interior
        ih = _blend8(left, right, ah[None, :, :])
        iv = _blend8(top, bottom, av[None, :, :])
        fill = (ih * xw + iv * yw) // 100
        fill = jnp.concatenate(
            [top,
             jnp.concatenate([left[:, 1:, :], fill[:, 1:, 1:]], axis=2)],
            axis=1)
        return plane.at[:, y0:y1, x0:x1].set(fill.astype(plane.dtype))

    @staticmethod
    def _xy_chroma(plane, x0, y0, x1, y1, xw):
        """Reference chroma XY walk (process_frame_yuv_xy:507-545):
        rows [y0/2+1, y1/2), cols [x0/2+1, x1/2); anchors at row y0/2 /
        col x0/2 (unprocessed => original) and row y1/2 / col x1/2."""
        yw = 100 - xw
        xd, yd = 512 // (x1 - x0), 512 // (y1 - y0)
        cx0, cx1, cy0, cy1 = x0 // 2 + 1, x1 // 2, y0 // 2 + 1, y1 // 2
        if cx1 <= cx0 or cy1 <= cy0:
            return plane
        ah = (xd * (x1 // 2 - jnp.arange(cx0, cx1)))[None, :]
        av = (yd * (y1 // 2 - jnp.arange(cy0, cy1)))[:, None]
        lft = plane[:, cy0:cy1, x0 // 2][:, :, None]
        rgt = plane[:, cy0:cy1, x1 // 2][:, :, None]
        top = plane[:, y0 // 2, cx0:cx1][:, None, :]
        bot = plane[:, y1 // 2, cx0:cx1][:, None, :]
        hcalc = _blend8(lft, rgt, ah[None])
        vcalc = _blend8(top, bot, av[None])
        fill = (hcalc * xw + vcalc * yw) // 100
        return plane.at[:, cy0:cy1, cx0:cx1].set(fill.astype(plane.dtype))

    @staticmethod
    def _border(plane, x0, y0, x1, y1):
        """draw_border_yuv (filter_logoaway.c:193-208): dashed 255."""
        cols = jnp.arange(x0, x1)
        rows = jnp.arange(y0, y1)
        plane = plane.at[:, y0, x0:x1].set(
            jnp.where(cols & 1, 255, plane[:, y0, x0:x1]))
        plane = plane.at[:, y1 - 1, x0:x1].set(
            jnp.where(cols & 1, 255, plane[:, y1 - 1, x0:x1]))
        odd = (rows & 1).astype(bool)
        plane = plane.at[:, y0:y1, x0].set(
            jnp.where(odd, 255, plane[:, y0:y1, x0]))
        plane = plane.at[:, y0:y1, x1].set(
            jnp.where(odd, 255, plane[:, y0:y1, x1]))
        return plane

    def _shape_anchors(self, w, h):
        """Nearest-opaque (alpha==255) anchor index per pixel in each
        of the four directions, from the static alpha mask."""
        mask = self._alpha[:h, :w] == 255
        idx = np.arange(w)[None, :].repeat(h, 0)
        left = np.where(mask, idx, 0)
        np.maximum.accumulate(left, axis=1, out=left)
        right = np.where(mask, idx, w - 1)
        right = np.flip(np.minimum.accumulate(np.flip(right, 1), 1), 1)
        idy = np.arange(h)[:, None].repeat(w, 1)
        up = np.where(mask, idy, 0)
        np.maximum.accumulate(up, axis=0, out=up)
        down = np.where(mask, idy, h - 1)
        down = np.flip(np.minimum.accumulate(np.flip(down, 0), 0), 0)
        return left, right, up, down

    def _region(self, fw: int, fh: int):
        x0, y0 = self.options["pos"]
        w, h = self.options["size"]
        return x0, y0, min(x0 + w, fw - 1), min(y0 + h, fh - 1)

    def _full_res(self, plane, fill_val, x0, y0, x1, y1):
        """Solid/xy/shape + border on one full-res plane (N,H,W)."""
        mode = self.options["mode"]
        xw = self.options["xweight"]
        plane = plane.astype(jnp.int32)
        if mode == 1:
            if self._alpha is not None:
                a = jnp.asarray(self._alpha[:y1 - y0, :x1 - x0])[None]
                plane = plane.at[:, y0:y1, x0:x1].set(
                    _blend8(plane[:, y0:y1, x0:x1], fill_val, a))
            else:
                plane = plane.at[:, y0:y1, x0:x1].set(fill_val)
        elif mode == 2:
            plane = self._xy_luma(plane, x0, y0, x1, y1, xw)
        elif mode == 3 and self._alpha is not None:
            w_, h_ = x1 - x0, y1 - y0
            li, ri, ui, di = self._shape_anchors(w_, h_)
            xd, yd = 256 // w_, 256 // h_
            ah = (xd * (x1 - jnp.arange(x0, x1)))[None, None, :]
            av = (yd * (y1 - jnp.arange(y0, y1)))[None, :, None]
            reg = plane[:, y0:y1, x0:x1]
            lval = jnp.take_along_axis(reg, jnp.asarray(li)[None], 2)
            rval = jnp.take_along_axis(reg, jnp.asarray(ri)[None], 2)
            uval = jnp.take_along_axis(reg, jnp.asarray(ui)[None], 1)
            dval = jnp.take_along_axis(reg, jnp.asarray(di)[None], 1)
            hcalc = _blend8(lval, rval, ah)
            vcalc = _blend8(uval, dval, av)
            npx = (hcalc * xw + vcalc * (100 - xw)) // 100
            a = jnp.asarray(self._alpha[:h_, :w_])[None]
            plane = plane.at[:, y0:y1, x0:x1].set(_blend8(reg, npx, a))
        if self.options["border"]:
            plane = self._border(plane, x0, y0, x1, y1)
        return plane

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        if self.options["mode"] == 0:
            return fb, state
        x0, y0, x1, y1 = self._region(fb.width, fb.height)
        if x1 - x0 < 2 or y1 - y0 < 2:
            return fb, state
        start, end = self.options["range"]
        ids = (fb.frame_ids if fb.frame_ids is not None
               else jnp.arange(fb.batch, dtype=jnp.int32))
        active = ((ids >= start) & (ids <= end))[:, None, None]
        if self.options["dump"]:
            self._dump(fb)
        mode = self.options["mode"]
        xw = self.options["xweight"]
        if fb.rgb is not None:
            # the reference's RGB frames are stored bottom-up
            # (buf_off=(height-row)*width, filter_logoaway.c:240); the
            # same math is applied here on top-down planes.
            planes = [self._full_res(fb.rgb[..., c], self._rgb_fill[c],
                                     x0, y0, x1, y1)
                      for c in range(3)]
            rgb = jnp.stack(planes, axis=-1).astype(fb.rgb.dtype)
            rgb = jnp.where(active[..., None], rgb, fb.rgb)
            return fb.with_planes(rgb=rgb), state
        yc, uc, vc = self._yuv_fill
        y = self._full_res(fb.y, yc, x0, y0, x1, y1)
        u = fb.u.astype(jnp.int32)
        v = fb.v.astype(jnp.int32)
        cy0, cy1 = y0 // 2 + 1, y1 // 2
        cx0, cx1 = x0 // 2 + 1, x1 // 2
        if mode == 1 and cy1 > cy0 and cx1 > cx0:
            u = u.at[:, cy0:cy1, cx0:cx1].set(uc)
            v = v.at[:, cy0:cy1, cx0:cx1].set(vc)
        elif mode in (2, 3):
            u = self._xy_chroma(u, x0, y0, x1, y1, xw)
            v = self._xy_chroma(v, x0, y0, x1, y1, xw)
        out = fb.with_planes(
            y=jnp.where(active, y, fb.y).astype(fb.y.dtype),
            u=jnp.where(active, u, fb.u).astype(fb.u.dtype),
            v=jnp.where(active, v, fb.v).astype(fb.v.dtype))
        return out, state

    def _dump(self, fb: FrameBatch) -> None:
        from tcforge_tpu.io.image import write_image
        x0, y0 = self.options["pos"]
        w, h = self.options["size"]
        if fb.rgb is not None:
            reg = np.asarray(fb.rgb[0, y0:y0 + h, x0:x0 + w])
        else:
            reg = np.asarray(fb.y[0, y0:y0 + h, x0:x0 + w])
        write_image("dump[0].ppm", reg.astype(np.uint8))


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
