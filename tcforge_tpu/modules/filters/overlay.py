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
    """filter_logo.c: render an image (or animated sequence) over the
    video with per-pixel alpha blending.

    Reference semantics kept exactly (``filter_logo.c``):

    - alpha: GraphicsMagick "opacity" (0 = visible).  opacity==0 copies
      the logo pixel, opacity==MaxRGB keeps the video, anything between
      blends with per-term uint8 truncation
      (``render_logo_yuv:652-664``).  Q16 quantum math is reproduced in
      integers (opacity_q = 257*byte, ScaleQuantumToChar = round(q/257)).
    - fade=in-out (``set_fade:378-393``): opacity_q +=
      trunc((MaxRGB-opacity_q)*coeff), coeff ramping over the first
      `fadein` / last `fadeout` frames of `range`.
    - YUV logos are pre-converted at configure time
      (``setup_logo_yuv:480-545``): RGB->YUV420P, or with `hqconv`
      RGB->YUV444P + Lanczos3 chroma zoom.  U/V are blended only at even
      rows/cols using that pixel's opacity; `grayout` skips chroma.
    - animation (``set_delay:395-409``): image i shows for
      delay_i*fps/100 frames (+1 after the first cycle); `ignoredelay`
      advances every frame.  The schedule is closed-form per frame id,
      so it stays jittable.
    - The reference renders RGB frames bottom-up
      (``setup_logo_rgb:469-477``), which mirrors the logo content
      vertically; here RGB is top-down like every other filter, so
      `pos` means the same visual spot and `flip` is a plain mirror.
    """

    info = ModuleInfo(name="logo", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="logo", comment="render image in videostream",
        capabilities="VRY",
        params=[ParamSpec("file", "image to overlay", "s", ""),
                ParamSpec("posdef", "0=None 1=TopL 2=TopR 3=BotL "
                          "4=BotR 5=Center", "d", 0, 0, 5),
                ParamSpec("pos", "position XxY", "dxd", (0, 0)),
                ParamSpec("range", "restrict to framerange",
                          "d-d", (0, 0x7FFFFFFF)),
                ParamSpec("fade", "fade in/out (# of frames)",
                          "d-d", (0, 0)),
                ParamSpec("flip", "mirror image", "b", False),
                ParamSpec("rgbswap", "swap red/blue", "b", False),
                ParamSpec("grayout", "YUV only: don't write Cb/Cr",
                          "b", False),
                ParamSpec("hqconv", "YUV only: high quality rgb->yuv",
                          "b", False),
                ParamSpec("ignoredelay", "ignore animation delays",
                          "b", False)])
    slots = FilterSlot.PRE_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        path = self.options["file"]
        if not path:
            raise ValueError("logo: 'file' option is required")
        frames, delays_cs = _load_logo_frames(path)
        if self.options["flip"]:
            frames = [np.flip(f, axis=0) for f in frames]
        if self.options["rgbswap"]:
            frames = [f[..., [2, 1, 0, 3]] for f in frames]
        self._rgba = np.stack(frames)                 # (S, h, w, 4)
        fps = job.fps if job.fps > 0 else 25.0
        # filter_logo.c:407/748: frames per image = delay*fps/100
        self._delays = [int(d * fps / 100.0) for d in delays_cs]
        # setup_logo_yuv runs at configure time in the reference too
        # (and must run OUTSIDE any jit trace here)
        h, w = self._rgba.shape[1:3]
        self._yuv = None if (h | w) & 1 else self._make_yuv_planes()

    # ---- configure-time helpers ---- #

    def _position(self, fw: int, fh: int) -> Tuple[int, int]:
        """flogo_compute_position (filter_logo.c:318-357), top-down."""
        lh, lw = self._rgba.shape[1:3]
        if lw > fw or lh > fh:
            raise ValueError("logo: image is larger than the frame")
        preset = self.options["posdef"]
        x, y = self.options["pos"]
        if preset == 1:
            x, y = 0, 0
        elif preset == 2:
            x = fw - lw
        elif preset == 3:
            y = fh - lh
        elif preset == 4:
            x, y = fw - lw, fh - lh
        elif preset == 5:
            x, y = (fw - lw) // 2, (fh - lh) // 2
            x += x & 1                # align to even, logo.c:344-347
            y += y & 1
        if x < 0 or y < 0 or x + lw > fw or y + lh > fh:
            raise ValueError("logo: invalid position")
        return x, y

    def _make_yuv_planes(self):
        """setup_logo_yuv: per-sequence-frame YUV420P logo planes."""
        from tcforge_tpu.ops.colorspace import (rgb_to_yuv_pixels,
                                                _subsample_chroma)
        from tcforge_tpu.ops.zoom import zoom_plane
        h, w = self._rgba.shape[1:3]
        rgb = jnp.asarray(self._rgba[..., :3])
        y, u, v = rgb_to_yuv_pixels(rgb)
        if self.options["hqconv"]:
            u = zoom_plane(u.astype(jnp.uint8), w // 2, h // 2,
                           "lanczos3").astype(jnp.int32)
            v = zoom_plane(v.astype(jnp.uint8), w // 2, h // 2,
                           "lanczos3").astype(jnp.int32)
        else:
            u, v = _subsample_chroma(u, v, ImageFormat.YUV420P)
        return (jnp.asarray(np.asarray(y)), jnp.asarray(np.asarray(u)),
                jnp.asarray(np.asarray(v)))

    # ---- per-frame schedule (vectorized over frame ids) ---- #

    def _seq_index(self, k):
        """set_delay closed form: sequence index for the k-th in-range
        frame.  Image 0 shows d0 frames, then the cycle
        [1]*(d1+1) ... [n-1]*(dn-1+1) [0]*(d0+1) repeats."""
        n = len(self._delays)
        if n == 1:
            return jnp.zeros_like(k)
        if self.options["ignoredelay"]:
            return (k + 1) % n
        d = self._delays
        lengths = np.array([d[i % n] + 1 for i in range(1, n + 1)])
        cum = np.cumsum(lengths)
        j = jnp.maximum(k - d[0], 0) % int(cum[-1])
        idx = jnp.searchsorted(jnp.asarray(cum), j, side="right")
        return jnp.where(k < d[0], 0, (1 + idx) % n)

    def _fade_coeff(self, ids):
        """set_fade (filter_logo.c:378-393)."""
        start, end = self.options["range"]
        fin, fout = self.options["fade"]
        fc = jnp.zeros(ids.shape, jnp.float32)
        if fout > 0:
            fc = jnp.where(end - ids < fout,
                           (ids - end + fout).astype(jnp.float32) / fout,
                           fc)
        if fin > 0:
            fc = jnp.where(ids - start < fin,
                           (start - ids + fin).astype(jnp.float32) / fin,
                           fc)
        return fc

    def _opacity(self, alpha, seq, fc):
        """Per-pixel effective opacity: quantum int, byte, masks.

        alpha: (S,h,w) uint8; seq: (N,); fc: (N,) float32.
        Returns (copy, skip, img_coeff, vid_coeff) each (N,h,w)."""
        ob = 255 - alpha.astype(np.int32)             # opacity byte
        oq = jnp.asarray(ob * 257)[seq]               # (N,h,w) quantum
        fcb = fc[:, None, None]
        oq = oq + ((65535 - oq).astype(jnp.float32)
                   * fcb).astype(jnp.int32)           # C truncation
        copy = oq == 0
        skip = oq >= 65535
        byte = (oq + 128) // 257                      # ScaleQuantumToChar
        # flogo_calc_coeff:360-376: img = 1 - ScaleCharToQuantum(b)/MaxRGB
        # in float32, vid = 1 - img
        img_c = 1.0 - (byte * 257).astype(jnp.float32) / jnp.float32(65535)
        vid_c = 1.0 - img_c
        return copy, skip, img_c, vid_c

    @staticmethod
    def _blend(vid, img, copy, skip, img_c, vid_c):
        """render_logo_yuv:652-664: per-term uint8 truncation."""
        mixed = (jnp.floor(vid.astype(jnp.float32) * vid_c)
                 + jnp.floor(img.astype(jnp.float32) * img_c))
        out = jnp.where(copy, img, mixed.astype(jnp.int32))
        return jnp.where(skip, vid, out)

    # ---- main ---- #

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        x, y = self._position(fb.width, fb.height)
        lh, lw = self._rgba.shape[1:3]
        start, end = self.options["range"]
        ids = (fb.frame_ids if fb.frame_ids is not None
               else jnp.arange(fb.batch, dtype=jnp.int32))
        active = (ids >= start) & (ids <= end)
        k = jnp.maximum(ids - start, 0)
        seq = self._seq_index(k)
        fc = self._fade_coeff(ids)
        alpha = self._rgba[..., 3]

        if fb.rgb is not None:
            copy, skip, ic, vc = self._opacity(alpha, seq, fc)
            logo = jnp.asarray(self._rgba[..., :3].astype(np.int32))[seq]
            reg = fb.rgb[:, y:y + lh, x:x + lw, :].astype(jnp.int32)
            out = self._blend(reg, logo, copy[..., None], skip[..., None],
                              ic[..., None], vc[..., None])
            out = jnp.where(active[:, None, None, None], out, reg)
            rgb = fb.rgb.at[:, y:y + lh, x:x + lw, :].set(
                out.astype(fb.rgb.dtype))
            return fb.with_planes(rgb=rgb), state

        if self._yuv is None:
            raise ValueError("logo: image has odd sizes (YUV420)")
        ly, lu, lv = self._yuv
        copy, skip, ic, vc = self._opacity(alpha, seq, fc)
        reg = fb.y[:, y:y + lh, x:x + lw].astype(jnp.int32)
        oy = self._blend(reg, ly[seq], copy, skip, ic, vc)
        oy = jnp.where(active[:, None, None], oy, reg)
        out = fb.with_planes(
            y=fb.y.at[:, y:y + lh, x:x + lw].set(oy.astype(fb.y.dtype)))
        if not self.options["grayout"]:
            # chroma at even rows/cols, that pixel's opacity
            # (render_logo_yuv:640-668); video chroma row = y//2 + r2.
            ch, cw = lh // 2, lw // 2
            cy, cx = y // 2, x // 2
            c_copy = copy[:, 0::2, 0::2]
            c_skip = skip[:, 0::2, 0::2]
            c_ic = ic[:, 0::2, 0::2]
            c_vc = vc[:, 0::2, 0::2]
            act = active[:, None, None]
            ru = fb.u[:, cy:cy + ch, cx:cx + cw].astype(jnp.int32)
            rv = fb.v[:, cy:cy + ch, cx:cx + cw].astype(jnp.int32)
            ou = jnp.where(act, self._blend(ru, lu[seq], c_copy, c_skip,
                                            c_ic, c_vc), ru)
            ov = jnp.where(act, self._blend(rv, lv[seq], c_copy, c_skip,
                                            c_ic, c_vc), rv)
            out = out.with_planes(
                u=fb.u.at[:, cy:cy + ch, cx:cx + cw].set(
                    ou.astype(fb.u.dtype)),
                v=fb.v.at[:, cy:cy + ch, cx:cx + cw].set(
                    ov.astype(fb.v.dtype)))
        return out, state


def _load_logo_frames(path: str):
    """Load an image file as a list of RGBA frames + delays (1/100 s).

    Animated GIF/PNG sequences come through Pillow (all frames, per-frame
    delay like GraphicsMagick's image->delay); everything else is a
    single frame via tcforge_tpu.io.image."""
    frames, delays = [], []
    try:
        from PIL import Image, ImageSequence
        img = Image.open(path)
        if getattr(img, "n_frames", 1) > 1:
            for fr in ImageSequence.Iterator(img):
                frames.append(np.asarray(fr.convert("RGBA")))
                # Pillow duration is ms; GM delay is 1/100 s
                delays.append(int(fr.info.get("duration", 0)) // 10)
            return frames, delays
    except Exception:
        pass
    from tcforge_tpu.io.image import read_image
    return [read_image(path, keep_alpha=True)], [0]


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


def _fa_bob_fields(lum):
    """filter_fieldanalysis.c:97-107 bob_field, both fields, (N,H,W).

    T rows [0, H-3]: even = avg(adjacent top-field lines), odd = next
    top line.  B row 0 = source row 1, then the same walk one row down.
    Rows >= H-2 stay zero (the reference leaves them calloc'd)."""
    h = lum.shape[1]
    lum = lum.astype(jnp.int32)
    t = jnp.zeros_like(lum)
    t = t.at[:, 0:h - 2:2].set((lum[:, 0:h - 2:2] + lum[:, 2:h:2]) >> 1)
    t = t.at[:, 1:h - 1:2].set(lum[:, 2:h:2])
    b = jnp.zeros_like(lum)
    b = b.at[:, 0].set(lum[:, 1])
    b = b.at[:, 1:h - 2:2].set((lum[:, 1:h - 2:2] + lum[:, 3:h:2]) >> 1)
    b = b.at[:, 2:h - 1:2].set(lum[:, 3:h:2])
    return t, b


def _fa_compare(p1, p2, rows, denom_h):
    """pic_compare (filter_fieldanalysis.c:111-125): mean squared
    difference over `rows` leading rows, divided by width*denom_h.
    Row sums in int32 (exact), then float32 accumulation."""
    d = p1[:, :rows].astype(jnp.int32) - p2[:, :rows].astype(jnp.int32)
    row = jnp.sum(d * d, axis=2)                    # (N, rows) int32
    tot = jnp.sum(row.astype(jnp.float32), axis=1)  # (N,)
    return tot / jnp.float32(p1.shape[2] * denom_h)


@register
class FieldAnalysisFilter(VideoFilter):
    """filter_fieldanalysis.c: detect progressive / interlaced /
    field-shifted / telecined video from the luminance field.

    Exact port of check_interlace (``filter_fieldanalysis.c:140-378``):
    bobbed top/bottom fields, the five pic_compare metrics, the
    prog/top/shift decision rules (including the reference's reuse of
    pixShiftChangedT in the bottom-field shift test), the telecine
    counter state machine (NTSC-gated unless `forcetelecinedetect`),
    the inconsistency fixes, and the frame-type counters.  Metrics are
    float32 (the reference uses double) and per-frame `verbose` logging
    is summarized at close instead (batched jit cannot log per frame);
    everything else matches.  The previous frame's planes ride the
    carry; the sequential telecine machine is a lax.scan over the
    per-frame metric scalars.  `outdiff` debug modes 1-11 overwrite the
    luma plane exactly like the reference (pic_diff scale 4)."""

    info = ModuleInfo(name="fieldanalysis", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="fieldanalysis",
        comment="Field analysis for detecting interlace and telecine",
        capabilities="VRY4E",
        params=[
            ParamSpec("interlacediff", "min temporal inter-field diff "
                      "for interlaced", "f", 1.1),
            ParamSpec("unknowndiff", "max change vs detail for "
                      "neglecting interlaced", "f", 1.5),
            ParamSpec("progressivediff", "min change vs detail for "
                      "progressive", "f", 8.0),
            ParamSpec("progressivechange", "min temporal change for "
                      "progressive", "f", 0.2),
            ParamSpec("changedifmore", "min temporal change for truly "
                      "changed frames", "f", 10.0),
            ParamSpec("forcetelecinedetect", "detect telecine on "
                      "non-NTSC too", "b", False),
            ParamSpec("verbose", "output analysis for every frame",
                      "d", 0, 0, 2),
            ParamSpec("outdiff", "output internal debug frames",
                      "d", 0, 0, 11)])
    slots = FilterSlot.PRE_S

    _UNKNOWN, _FALSE, _TRUE = -1, 0, 1

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        z = jnp.zeros((height, width), jnp.int32)
        return {"prev": z, "prev_t": z, "prev_b": z,
                "started": jnp.zeros((), jnp.int32),
                "telecine": jnp.zeros((), jnp.int32),
                # num, unknown, top, bottom, interlaced, progressive,
                # fieldshift, telecine
                "counts": jnp.zeros((8,), jnp.int32)}

    def _luma(self, fb: FrameBatch):
        if fb.y is not None:
            return fb.y.astype(jnp.int32)
        from tcforge_tpu.ops.colorspace import rgb_to_gray_pixels
        return rgb_to_gray_pixels(fb.rgb).astype(jnp.int32)

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        import jax
        from tcforge_tpu.core.frame import ATTR_SKIPPED
        o = self.options
        h = fb.height
        lum = self._luma(fb)
        lum_t, lum_b = _fa_bob_fields(lum)
        prev = jnp.concatenate([state["prev"][None], lum[:-1]], 0)
        prev_t = jnp.concatenate([state["prev_t"][None], lum_t[:-1]], 0)
        prev_b = jnp.concatenate([state["prev_b"][None], lum_b[:-1]], 0)

        pix_diff = _fa_compare(lum_t, lum_b, h - 2, h - 2)
        shift_t = _fa_compare(lum_t, prev_b, h - 2, h - 2)
        shift_b = _fa_compare(lum_b, prev_t, h - 2, h - 2)
        last_t = _fa_compare(lum[:, 0::2], prev[:, 0::2], h // 2, h // 2)
        last_b = _fa_compare(lum[:, 1::2], prev[:, 1::2], h // 2, h // 2)
        pix_last = (last_t + last_b) / 2

        f32 = jnp.float32
        changed_t = last_t > f32(o["changedifmore"])
        changed_b = last_b > f32(o["changedifmore"])
        ild, und = f32(o["interlacediff"]), f32(o["unknowndiff"])
        prd, prc = f32(o["progressivediff"]), f32(o["progressivechange"])
        U, F, T = self._UNKNOWN, self._FALSE, self._TRUE
        is_top = jnp.full(fb.batch, U, jnp.int32)
        is_top = jnp.where(shift_t * ild < shift_b, T, is_top)
        is_top = jnp.where(shift_b * ild < shift_t, F, is_top)
        is_prog = jnp.full(fb.batch, U, jnp.int32)
        is_prog = jnp.where((pix_diff * und > shift_t)
                            | (pix_diff * und > shift_b), F, is_prog)
        is_prog = jnp.where((pix_diff * prd < shift_t)
                            & (pix_diff * prd < shift_b)
                            & (pix_diff < pix_last * prc), T, is_prog)
        # NB: the reference tests pixShiftChangedT (not B) against
        # pixLast in the bottom branch too (lines 193-196) — kept.
        is_shift = jnp.where(
            ((shift_t * prd < pix_diff) & (shift_t * prd < shift_b)
             & (shift_t < prc * pix_last))
            | ((shift_b * prd < pix_diff) & (shift_b * prd < shift_t)
               & (shift_t < prc * pix_last)),
            T, jnp.full(fb.batch, U, jnp.int32))

        fps = fb.fps if fb.fps > 0 else self.job.fps
        do_telecine = ((29.9 < fps < 30.1)
                       or bool(o["forcetelecinedetect"]))
        skipped = (fb.attrs & ATTR_SKIPPED) != 0
        # first frame of the stream: buffers rotate, no check
        first = (state["started"] == 0) & (jnp.arange(fb.batch) == 0)
        check = ~skipped & ~first

        def step(carry, x):
            tstate, counts = carry
            (chk, frst, ctp, cbp, prog, top, shift) = x
            ct, cb = ctp == 1, cbp == 1
            if do_telecine:
                gate = (ct | cb) & ((prog != U) | (top != U)
                                    | (tstate > 10))
                phase = tstate % 5
                dec = jnp.zeros((), jnp.int32)
                dec += jnp.where((phase == 0)
                                 & (((top == T) & cb) | ((top == F) & ct)),
                                 20, 0)
                dec += jnp.where(((phase == 1) | (phase == 2))
                                 & (prog == F), 20, 0)
                dec += jnp.where((phase == 3) & (prog == T), 20, 0)
                dec += jnp.where((phase == 3)
                                 & (((top == T) & ct) | ((top == F) & cb)),
                                 20, 0)
                dec += jnp.where((phase == 4) & (prog == T), 20, 0)
                ts = jnp.maximum(tstate - dec, 0)
                # second chance to be phase 0 (lines 260-272)
                ts = jnp.where((ts == 0)
                               & (((top == T) & cb) | ((top == F) & ct)),
                               -1, ts)
                ts = ts + 1
                ts = jnp.where(gate, ts,
                               jnp.where(tstate > 10, tstate + 1,
                                         jnp.zeros((), jnp.int32)))
                ts = jnp.where(ts > 100, ts - 10, ts)
                tstate = jnp.where(chk, ts, tstate)
            # inconsistency fixes (lines 289-300)
            prog = jnp.where((prog == F) & (top == U), U, prog)
            both_known = (prog != F) & (top != U)
            prog = jnp.where(both_known, U, prog)
            top = jnp.where(both_known, U, top)
            low = ~ct | ~cb
            prog = jnp.where(low, U, prog)
            top = jnp.where(low, U, top)
            shift = jnp.where(low, U, shift)
            # counters (lines 355-375)
            sel = jnp.where(prog == F, 4, jnp.where(prog == T, 5, 1))
            sel = jnp.where(~ct & ~cb, 1, sel)
            sel = jnp.where(shift == T, 6, sel)
            sel = jnp.where(tstate > 10, 7, sel)
            inc = jnp.zeros((8,), jnp.int32)
            inc = inc.at[sel].add(1)
            inc = inc.at[2].add(jnp.where(top == T, 1, 0))
            inc = inc.at[3].add(jnp.where(top == F, 1, 0))
            inc = inc.at[0].add(1)
            # first frame: numFrames++ only
            inc = jnp.where(frst, jnp.zeros((8,), jnp.int32)
                            .at[0].set(1), inc)
            counts = counts + jnp.where(chk | frst, inc,
                                        jnp.zeros((8,), jnp.int32))
            return (tstate, counts), sel

        (tstate, counts), _ = jax.lax.scan(
            step, (state["telecine"], state["counts"]),
            (check, first, changed_t.astype(jnp.int32),
             changed_b.astype(jnp.int32), is_prog, is_top, is_shift))

        out = fb
        od = o["outdiff"]
        if od and fb.y is not None:
            def diff4(a, b):
                d = jnp.abs(4 * (a - b))
                return jnp.minimum(d, 255)
            planes = {1: lum, 3: lum_t, 4: lum_b, 5: prev_t, 6: prev_b,
                      7: diff4(lum_t, lum_b), 8: diff4(lum_t, prev_b),
                      9: diff4(lum_b, prev_t), 10: diff4(lum_t, prev_t),
                      11: diff4(lum_b, prev_b)}
            if od == 2:
                dbg = lum.at[:, 1:h - 2:2].set(prev[:, 1:h - 2:2])
            else:
                dbg = planes[od]
            out = fb.with_planes(y=dbg.astype(fb.y.dtype))
        new_state = {"prev": lum[-1], "prev_t": lum_t[-1],
                     "prev_b": lum_b[-1],
                     "started": jnp.ones((), jnp.int32),
                     "telecine": tstate, "counts": counts}
        return out, new_state

    def finalize(self, state: Any) -> None:
        """RESULTS + CONCLUSION block (filter_fieldanalysis.c:500-560)."""
        from tcforge_tpu.core import log
        c = np.asarray(state["counts"])
        (num, unknown, top, bottom, inter, prog, shift, tele) = [int(x)
                                                                 for x in c]
        if num == 0:
            return
        total = num - unknown
        fields = max(top + bottom, 1)
        log.info("fieldanalysis",
                 f"RESULTS: Frames: {num} (100%)  Unknown: {unknown} "
                 f"({100.0 * unknown / num:.3g}%)")
        log.info("fieldanalysis",
                 f"RESULTS: Progressive: {prog} "
                 f"({100.0 * prog / num:.3g}%)  Interlaced: {inter} "
                 f"({100.0 * inter / num:.3g}%)")
        log.info("fieldanalysis",
                 f"RESULTS: FieldShift: {shift} "
                 f"({100.0 * shift / num:.3g}%)  Telecined: {tele} "
                 f"({100.0 * tele / num:.3g}%)")
        log.info("fieldanalysis",
                 f"RESULTS: MajorField: TopFirst {top} "
                 f"({100.0 * top / fields:.3g}%)  BottomFirst {bottom} "
                 f"({100.0 * bottom / fields:.3g}%)")
        major = "top" if top > bottom else "bottom"
        if total < 50:
            verdict = "less than 50 frames analyzed correctly, no conclusion."
        elif unknown * 10 > num * 9:
            verdict = ("less than 10% frames analyzed correctly, "
                       "no conclusion.")
        elif prog * 8 > total * 7:
            verdict = "CONCLUSION: progressive video."
        elif top * 8 > bottom and bottom * 8 > top:
            verdict = ("major field unsure, no conclusion. "
                       "Use deinterlacer for processing.")
        elif tele * 4 > total * 3:
            verdict = f"CONCLUSION: telecined video, {major} field first."
        elif shift * 4 > total * 3:
            verdict = ("CONCLUSION: field shifted progressive video, "
                       f"{major} field first.")
        elif inter > shift and (inter + shift) * 8 > total * 7:
            verdict = f"CONCLUSION: interlaced video, {major} field first."
        else:
            verdict = ("mixed video, no conclusion. "
                       "Use deinterlacer for processing.")
        log.info("fieldanalysis", verdict)
        self.verdict = verdict


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
