"""Analysis / correction filters: whitebalance, detectclipping,
facemask, fields, divxkey.

Analogues of ``filter/filter_whitebalance.c``,
``filter_detectclipping.c``, ``filter_facemask.c``, ``filter_fields.c``
and ``filter/divxkey/filter_divxkey.c``.  All per-pixel math is batched
jax; converging detectors carry their state across batches.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np

from tcforge_tpu.core import log
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import ATTR_KEYFRAME, FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo,
                                          ModuleKind, VideoFilter,
                                          register)
from tcforge_tpu.ops import colorspace


@register
class WhitebalanceFilter(VideoFilter):
    """filter_whitebalance.c: blue-to-yellow white balance shift.

    Power-curve LUTs on the red and blue channels
    (``filter_whitebalance.c:120-124``): with factor = 1 + |level|/100
    (inverted for negative levels), red' = (r/255)^(1/factor)*255 and
    blue' = (b/255)^factor*255.  YUV input converts to RGB and back like
    the reference's tcv_convert round trip.  The ``limit`` option gates
    the correction to frame ranges via +N (on) / -N (off) toggles.
    """

    info = ModuleInfo(name="whitebalance", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="whitebalance",
        comment="white balance correction (blue<->yellow shift)",
        params=[ParamSpec("level", "blue-to-yellow shift level", "d", 40,
                          -1000, 1000),
                ParamSpec("limit", "frame ranges: +N on, -N off", "s",
                          "")])
    slots = FilterSlot.PRE_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        level = int(self.options["level"])
        factor = 1.0 + abs(level) / 100.0
        if level < 0:
            factor = 1.0 / factor
        i = np.arange(256, dtype=np.float64) / 255.0
        self._red_lut = jnp.asarray(
            (np.power(i, 1.0 / factor) * 255).astype(np.uint8))
        self._blue_lut = jnp.asarray(
            (np.power(i, factor) * 255).astype(np.uint8))
        # limit string "+12-34+56": alternating on/off switch frames;
        # initial state is ON (filter_whitebalance.c: state = 1)
        switches = []      # (frame, new_state)
        s = self.options["limit"]
        pos = 0
        state = 1
        while pos < len(s):
            ch = s[pos]
            if ch in "+-":
                num = ""
                pos += 1
                while pos < len(s) and s[pos].isdigit():
                    num += s[pos]
                    pos += 1
                if num:
                    switches.append((int(num), 1 if ch == "+" else 0))
            else:
                pos += 1
        ids = np.array([-1] + [f for f, _ in switches], np.int32)
        sts = np.array([state] + [st for _, st in switches], np.int32)
        self._switch_ids = jnp.asarray(ids)
        self._switch_states = jnp.asarray(sts)

    def _active(self, frame_ids: jnp.ndarray) -> jnp.ndarray:
        idx = jnp.searchsorted(self._switch_ids, frame_ids,
                               side="right") - 1
        return self._switch_states[idx] != 0

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        src_fmt = fb.format
        rgb_in = fb.rgb is not None
        work = fb if rgb_in else colorspace.convert(fb, ImageFormat.RGB24)
        rgb = work.rgb
        out = jnp.stack([self._red_lut[rgb[..., 0].astype(jnp.int32)],
                         rgb[..., 1],
                         self._blue_lut[rgb[..., 2].astype(jnp.int32)]],
                        axis=-1)
        ids = (fb.frame_ids if fb.frame_ids is not None
               else jnp.arange(fb.batch, dtype=jnp.int32))
        active = self._active(ids)
        work = work.with_planes(rgb=out)
        if not rgb_in:
            # select in the ORIGINAL domain so OFF frames stay
            # bit-identical to the input (the reference returns before
            # any conversion when the state is off)
            work = colorspace.convert(work, src_fmt)
            a3 = active[:, None, None]
            return fb.with_planes(
                y=jnp.where(a3, work.y, fb.y),
                u=(jnp.where(a3, work.u, fb.u)
                   if fb.u is not None else None),
                v=(jnp.where(a3, work.v, fb.v)
                   if fb.v is not None else None)), state
        return fb.with_planes(
            rgb=jnp.where(active[:, None, None, None], out,
                          rgb)), state


@register
class DetectClippingFilter(VideoFilter):
    """filter_detectclipping.c: converge on the black-border bounding
    box and suggest -j/-Y clip values.

    checkline() is the per-line mean; a line whose mean exceeds
    ``limit`` is content (``filter_detectclipping.c:85-105``).  The
    detector only shrinks: x1/y1 track the smallest first-content
    row/col, x2/y2 the largest last-content row/col.  The first 3
    frames are ignored (``:254``); final t/l/b/r round to even.
    """

    info = ModuleInfo(name="detectclipping", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="detectclipping", comment="detect black image borders",
        params=[ParamSpec("limit", "line-mean threshold for black", "d",
                          24, 0, 255),
                ParamSpec("post", "run as POST filter (-Y not -j)", "b",
                          0),
                ParamSpec("range", "apply filter to [start-end]/step "
                          "frames", "d-d/d", (0, 1 << 30, 1)),
                ParamSpec("log", "file for per-frame values", "s", "")])
    slots = FilterSlot.PRE_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        self.limit = int(self.options["limit"])
        if self.options["post"]:
            self.slots = FilterSlot.POST_M
        self._final = None

    def init_state(self, width: int, height: int, fmt) -> Any:
        self._size = (width, height)
        return {"x1": jnp.int32(width), "y1": jnp.int32(height),
                "x2": jnp.int32(0), "y2": jnp.int32(0)}

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        if fb.rgb is not None:
            img = fb.rgb.astype(jnp.int32).mean(axis=-1)
        else:
            img = fb.y.astype(jnp.int32)
        n, h, w = img.shape
        row_mean = img.mean(axis=2)          # (N, H)
        col_mean = img.mean(axis=1)          # (N, W)
        ids = (fb.frame_ids if fb.frame_ids is not None
               else jnp.arange(n, dtype=jnp.int32))
        start, end, step = self.options["range"]
        valid = ((ids >= 3)                   # skip warmup frames
                 & (ids >= start) & (ids <= end)
                 & ((ids - start) % step == 0))
        rb = row_mean > self.limit            # bright rows
        cb = col_mean > self.limit
        hh = jnp.arange(h, dtype=jnp.int32)
        ww = jnp.arange(w, dtype=jnp.int32)
        big = jnp.int32(1 << 30)
        first_row = jnp.min(jnp.where(rb, hh[None, :], big), axis=1)
        last_row = jnp.max(jnp.where(rb, hh[None, :], -1), axis=1)
        first_col = jnp.min(jnp.where(cb, ww[None, :], big), axis=1)
        last_col = jnp.max(jnp.where(cb, ww[None, :], -1), axis=1)
        y1 = jnp.min(jnp.where(valid, first_row, big))
        y2 = jnp.max(jnp.where(valid, last_row, -1))
        x1 = jnp.min(jnp.where(valid, first_col, big))
        x2 = jnp.max(jnp.where(valid, last_col, -1))
        state = {"x1": jnp.minimum(state["x1"], x1),
                 "y1": jnp.minimum(state["y1"], y1),
                 "x2": jnp.maximum(state["x2"], x2),
                 "y2": jnp.maximum(state["y2"], y2)}
        return fb, state

    def suggestion(self, state) -> Tuple[int, int, int, int]:
        """(t, l, b, r) clip values, rounded to even like the C."""
        w, h = self._size
        x1 = min(int(state["x1"]), w)
        y1 = min(int(state["y1"]), h)
        x2 = max(int(state["x2"]), 0)
        y2 = max(int(state["y2"]), 0)
        t = (y1 + 1) & ~1
        lft = (x1 + 1) & ~1
        b = h - ((y2 + 1) & ~1)
        r = w - ((x2 + 1) & ~1)
        return t, lft, b, r

    def collect(self, state: Any) -> None:
        self._final = {k: int(v) for k, v in state.items()}

    def finalize(self, state: Any) -> None:
        t, lft, b, r = self.suggestion(state)
        flag = "-Y" if self.options["post"] else "-j"
        log.info("detectclipping",
                 "valid area: X: %d..%d Y: %d..%d -> %s %d,%d,%d,%d",
                 int(state["x1"]), int(state["x2"]),
                 int(state["y1"]), int(state["y2"]), flag, t, lft, b, r)
        path = self.options["log"]
        if path:
            with open(path, "w") as f:
                f.write(f"{t} {lft} {b} {r}\n")


@register
class FacemaskFilter(VideoFilter):
    """filter_facemask.c: pixelate a rectangular zone.

    The zone at (xpos, ypos) sized (xdim, ydim) is tiled into
    xresolution x yresolution cells; each cell is replaced by its mean.
    (The C version averaged with off-by-one window bounds,
    ``filter_facemask.c:108-135``; this implements the intended clean
    cell mean.)
    """

    info = ModuleInfo(name="facemask", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="facemask", comment="pixelate (mask) a face zone",
        params=[ParamSpec("xpos", "left edge of the mask", "d", 0),
                ParamSpec("ypos", "top edge of the mask", "d", 0),
                ParamSpec("xresolution", "cell width", "d", 8),
                ParamSpec("yresolution", "cell height", "d", 8),
                ParamSpec("xdim", "mask width (multiple of xres)", "d",
                          0),
                ParamSpec("ydim", "mask height (multiple of yres)", "d",
                          0)])
    slots = FilterSlot.PRE_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        o = self.options
        self.x, self.y = int(o["xpos"]), int(o["ypos"])
        self.cw, self.ch = int(o["xresolution"]), int(o["yresolution"])
        self.w, self.h = int(o["xdim"]), int(o["ydim"])
        if self.w % self.cw or self.h % self.ch:
            raise ValueError("facemask: dimensions must be multiples of "
                             "the cell resolution")

    def _pixelate(self, plane: jnp.ndarray, x, y, w, h, cw, ch):
        if w <= 0 or h <= 0:
            return plane
        region = plane[:, y:y + h, x:x + w].astype(jnp.float32)
        n = region.shape[0]
        cells = region.reshape(n, h // ch, ch, w // cw, cw)
        means = cells.mean(axis=(2, 4), keepdims=True)
        filled = jnp.broadcast_to(means, cells.shape).reshape(n, h, w)
        filled = jnp.round(filled).astype(plane.dtype)
        return plane.at[:, y:y + h, x:x + w].set(filled)

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        x, y, w, h = self.x, self.y, self.w, self.h
        cw, ch = self.cw, self.ch
        if fb.rgb is not None:
            rgb = jnp.moveaxis(fb.rgb, -1, 1)
            out = jnp.stack([self._pixelate(rgb[:, c], x, y, w, h, cw, ch)
                             for c in range(rgb.shape[1])], axis=1)
            return fb.with_planes(rgb=jnp.moveaxis(out, 1, -1)), state
        planes = {"y": self._pixelate(fb.y, x, y, w, h, cw, ch)}
        if fb.u is not None:
            sx, sy = fb.format.subsampling
            # chroma cells shrink with the subsampling (even cell sizes)
            ccw, cch = max(1, cw // sx), max(1, ch // sy)
            cx, cy = x // sx, y // sy
            cwd, chd = w // sx // ccw * ccw, h // sy // cch * cch
            planes["u"] = self._pixelate(fb.u, cx, cy, cwd, chd, ccw, cch)
            planes["v"] = self._pixelate(fb.v, cx, cy, cwd, chd, ccw, cch)
        return fb.with_planes(**planes), state


@register
class FieldsFilter(VideoFilter):
    """filter_fields.c: shift / reorder interlaced fields.

    - flip: exchange top and bottom fields of each frame;
    - shift: move the video by one field — out_top(i) = bottom(i-1),
      out_bottom(i) = top(i) (``filter_fields.c:337-341``);
    - shift+flip: delay the bottom field one frame (``:343-347``);
    - flip_first (flip+shift): delay the top field one frame (``:349``).

    Like the C (which runs copy_field over the first w*h bytes only),
    YUV mode shifts luma only; RGB mode shifts whole pixels.  The
    previous frame's saved field is the carried state.
    """

    info = ModuleInfo(name="fields", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="fields", comment="field shift / reorder",
        params=[ParamSpec("flip", "swap top and bottom fields", "b", 0),
                ParamSpec("shift", "shift video by one field", "b", 0),
                ParamSpec("flip_first", "flip before shifting", "b", 0)])
    slots = FilterSlot.PRE_M

    OP_FLIP = 1
    OP_SHIFT = 2
    OP_REVERSE = 4

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        ops = 0
        if self.options["flip"]:
            ops |= self.OP_FLIP
        if self.options["shift"]:
            ops |= self.OP_SHIFT
        if self.options["flip_first"]:
            ops |= self.OP_REVERSE
        if ops & self.OP_REVERSE and \
                (ops & ~self.OP_REVERSE) != (self.OP_FLIP | self.OP_SHIFT):
            ops &= ~self.OP_REVERSE
        if not ops:
            raise ValueError("fields: no operations specified "
                             "(flip / shift / flip_first)")
        self.ops = ops

    def init_state(self, width: int, height: int, fmt) -> Any:
        # saved field from the previous frame (zeros before frame 0,
        # like the reference's zero-initialised buffer)
        if fmt.is_rgb:
            chans = 4 if fmt.name.startswith(("RGBA", "ARGB", "BGRA")) \
                else 3
            return jnp.zeros((height // 2, width, chans), jnp.uint8)
        return jnp.zeros((height // 2, width), jnp.uint8)

    def _run(self, img: jnp.ndarray, carry: jnp.ndarray):
        """img: (N, H, W[, C]); carry: (H//2, W[, C])."""
        top = img[:, 0::2]
        bottom = img[:, 1::2]
        op = self.ops
        if op == self.OP_FLIP:
            new_top, new_bottom = bottom, top
            new_carry = carry
        else:
            if op == self.OP_SHIFT:
                # out_top(i) = bottom(i-1); out_bottom(i) = top(i)
                prev_bottom = jnp.concatenate(
                    [carry[None], bottom[:-1]], axis=0)
                new_top, new_bottom = prev_bottom, top
                new_carry = bottom[-1]
            elif op == (self.OP_SHIFT | self.OP_FLIP):
                # delay the bottom field one frame
                prev_bottom = jnp.concatenate(
                    [carry[None], bottom[:-1]], axis=0)
                new_top, new_bottom = top, prev_bottom
                new_carry = bottom[-1]
            else:  # FLIPSHIFT: delay the top field one frame
                prev_top = jnp.concatenate(
                    [carry[None], top[:-1]], axis=0)
                new_top, new_bottom = prev_top, bottom
                new_carry = top[-1]
        n, hh = img.shape[0], img.shape[1]
        out = jnp.stack([new_top, new_bottom], axis=2)
        out = out.reshape((n, hh) + img.shape[2:])
        return out, new_carry

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        if fb.rgb is not None:
            out, state = self._run(fb.rgb, state)
            return fb.with_planes(rgb=out), state
        out, state = self._run(fb.y, state)
        return fb.with_planes(y=out), state


@register
class DivxKeyFilter(VideoFilter):
    """filter_divxkey.c: mark MPEG-4/DivX keyframes.

    The reference parses the compressed payload in pass-through mode and
    raises TC_FRAME_IS_KEYFRAME on intra VOPs.  The batch pipeline
    carries decoded planes, so the ES is scanned up front (``es=`` the
    elementary stream the frames came from) and the intra frame indices
    become a constant lookup that sets ATTR_KEYFRAME per frame id.
    """

    info = ModuleInfo(name="divxkey", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="divxkey", comment="mark MPEG-4 (DivX) keyframes",
        params=[ParamSpec("es", "MPEG-4 ES file to scan", "s", "")])
    slots = FilterSlot.PRE_S

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        path = self.options["es"] or getattr(job, "video_in_file", None)
        from tcforge_tpu.io.mpeg4 import scan_keyframes
        try:
            with open(path, "rb") as f:
                data = f.read()
        except (OSError, TypeError) as e:
            raise ValueError(f"divxkey: cannot read ES ({e})")
        keys = scan_keyframes(data)
        self.n_frames = keys.shape[0]
        self._is_key = jnp.asarray(
            np.concatenate([keys, [False]]))     # sentinel for overflow

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        ids = (fb.frame_ids if fb.frame_ids is not None
               else jnp.arange(fb.batch, dtype=jnp.int32))
        idx = jnp.clip(ids, 0, self.n_frames)
        key = self._is_key[idx]
        attrs = fb.attrs if fb.attrs is not None \
            else jnp.zeros(fb.batch, jnp.int32)
        attrs = jnp.where(key, attrs | ATTR_KEYFRAME, attrs)
        return fb.with_attrs(attrs), state
