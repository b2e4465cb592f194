"""ascii — colored ascii-art renderer (filter_ascii.c native-alt).

The reference filter is a thin wrapper that writes each frame to a PNM
temp file and pipes it through the external ``aart`` program
(filter_ascii.c:144-190: ``popen("aart raw-N.tmp --font .. --pallete ..
--inmod=pnm --outmod=pnm ..")``), reading the rendered PNM back into
the frame.  ``aart`` is not available in this build environment, so
this module is an in-tree renderer with the same contract and option
names: the frame is divided into glyph-sized cells, each cell is
replaced by the printable-ASCII glyph whose ink density best matches
the cell's luminance, drawn in the cell's own color ("colored ascii
art", MOD_CAP) on black.

Options (filter_ascii.c:60-76):
- ``font=FILE``    a PSF1/PSF2 console font (the format the ``aart``
  package ships); parsed natively here.  Default: PIL's built-in
  bitmap font.
- ``pallete=FILE`` accepted for compatibility; aart PAL palettes are
  not interpreted (a log line says so) — the built-in printable ramp
  is used.
- ``threads=N``    accepted; rendering is vectorized, so ignored.
- ``buffer=0/1``   accepted; no external process, so ignored.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np

from tcforge_tpu.core import log
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)

_RAMP = [chr(c) for c in range(32, 127)]      # printable ASCII


def parse_psf(data: bytes):
    """Parse a PSF1/PSF2 console font -> (glyphs[256+], height, width)
    as a uint8 0/1 bitmap array (nglyphs, h, w).

    PSF1: magic 0x36 0x04, mode, charsize; 8-wide glyphs, one byte per
    row, MSB left.  PSF2: magic 0x72 0xb5 0x4a 0x86 + 32-byte header
    with explicit glyph count/size.  Raises ValueError on neither.
    """
    if len(data) >= 4 and data[0] == 0x36 and data[1] == 0x04:
        mode, charsize = data[2], data[3]
        nglyphs = 512 if (mode & 0x01) else 256
        h, w = charsize, 8
        need = 4 + nglyphs * charsize
        if len(data) < need:
            raise ValueError("truncated PSF1 font")
        raw = np.frombuffer(data[4:need], dtype=np.uint8)
        rows = raw.reshape(nglyphs, charsize, 1)
        bits = np.unpackbits(rows, axis=2)[:, :, :8]
        return bits.astype(np.uint8), h, w
    if len(data) >= 32 and data[:4] == b"\x72\xb5\x4a\x86":
        hdr = np.frombuffer(data[4:32], dtype="<u4")
        _version, headersize, _flags, length, charsize, h, w = hdr
        bpr = (int(w) + 7) // 8
        if charsize != bpr * h:
            raise ValueError("inconsistent PSF2 header")
        need = int(headersize) + int(length) * int(charsize)
        if len(data) < need:
            raise ValueError("truncated PSF2 font")
        raw = np.frombuffer(data[int(headersize):need], dtype=np.uint8)
        rows = raw.reshape(int(length), int(h), bpr)
        bits = np.unpackbits(rows, axis=2)[:, :, :int(w)]
        return bits.astype(np.uint8), int(h), int(w)
    raise ValueError("not a PSF font")


def _default_glyphs():
    """Rasterize the printable ramp with PIL's built-in bitmap font."""
    from PIL import Image, ImageDraw, ImageFont
    font = ImageFont.load_default()
    l, t, r, b = font.getbbox("@")
    gw, gh = max(4, r), max(6, b)
    atlas = np.zeros((len(_RAMP), gh, gw), dtype=np.uint8)
    for i, ch in enumerate(_RAMP):
        img = Image.new("L", (gw, gh), 0)
        ImageDraw.Draw(img).text((0, 0), ch, fill=255, font=font)
        atlas[i] = (np.asarray(img) > 127).astype(np.uint8)
    return atlas, gh, gw


@register
class AsciiFilter(VideoFilter):
    """Colored ascii-art renderer (filter_ascii.c native-alt)."""

    info = ModuleInfo(name="ascii", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="ascii",
        comment="colored ascii-art renderer (in-tree aart analogue)",
        params=[ParamSpec("font", "PSF console font file", "s", ""),
                ParamSpec("pallete", "aart PAL file (accepted, unused)",
                          "s", ""),
                ParamSpec("threads", "aart compat (vectorized here)",
                          "d", 1, 0, 64),
                ParamSpec("buffer", "aart compat (no-op)", "d", 0, 0, 1)])
    slots = FilterSlot.POST_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        fontfile = self.options["font"]
        if fontfile:
            with open(fontfile, "rb") as fh:
                glyphs, gh, gw = parse_psf(fh.read())
            # PSF fonts index by codepoint: take the printable range
            atlas = np.zeros((len(_RAMP), gh, gw), dtype=np.uint8)
            for i, ch in enumerate(_RAMP):
                if ord(ch) < glyphs.shape[0]:
                    atlas[i] = glyphs[ord(ch)]
        else:
            atlas, gh, gw = _default_glyphs()
        if self.options["pallete"]:
            log.info("filter.ascii",
                     "pallete files are not interpreted; using the "
                     "built-in printable-ASCII ramp")
        # even cell dims so a 4:2:0 chroma cell is (gh//2, gw//2)
        if gh % 2:
            atlas = np.pad(atlas, ((0, 0), (0, 1), (0, 0)))
            gh += 1
        if gw % 2:
            atlas = np.pad(atlas, ((0, 0), (0, 0), (0, 1)))
            gw += 1
        self._gh, self._gw = gh, gw
        dens = atlas.mean(axis=(1, 2))
        # density -> 256-entry LUT: glyph whose (normalized) ink
        # density best matches the cell luminance; ties -> lower index
        scale = 255.0 / max(1e-6, dens.max())
        self._lut = jnp.asarray(
            np.argmin(np.abs(dens[None, :] * scale
                             - np.arange(256, dtype=np.float64)[:, None]),
                      axis=1).astype(np.int32))
        self._atlas = jnp.asarray(atlas.astype(np.float32))

    def _cells(self, plane, ch, cw):
        n, h, w = plane.shape
        hc, wc = h // ch, w // cw
        crop = plane[:, :hc * ch, :wc * cw].astype(jnp.float32)
        return crop.reshape(n, hc, ch, wc, cw).mean(axis=(2, 4)), hc, wc

    @staticmethod
    def _paint(cells, tiles, h, w, fill):
        """(n,hc,wc) cells rendered with per-cell (gh,gw) tiles, padded
        back to the source plane size."""
        n, hc, wc = cells.shape
        gh, gw = tiles.shape[-2:]
        img = (tiles * cells[..., None, None])
        img = img.transpose(0, 1, 3, 2, 4).reshape(n, hc * gh, wc * gw)
        out = jnp.full((n, h, w), fill, jnp.float32)
        out = out.at[:, :hc * gh, :wc * gw].set(img)
        return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        gh, gw = self._gh, self._gw
        if fb.rgb is not None:
            rgbf = fb.rgb[..., :3].astype(jnp.float32)
            luma = (0.299 * rgbf[..., 0] + 0.587 * rgbf[..., 1]
                    + 0.114 * rgbf[..., 2])
            lcells, hc, wc = self._cells(luma, gh, gw)
            idx = self._lut[jnp.round(lcells).astype(jnp.int32)]
            tiles = self._atlas[idx]                     # (n,hc,wc,gh,gw)
            n, h, w = luma.shape
            chans = []
            for c in range(fb.rgb.shape[-1]):
                ccells, _, _ = self._cells(
                    fb.rgb[..., c], gh, gw)
                chans.append(self._paint(ccells, tiles, h, w, 0.0))
            return fb.with_planes(rgb=jnp.stack(chans, axis=-1)), state

        ycells, hc, wc = self._cells(fb.y, gh, gw)
        idx = self._lut[jnp.round(ycells).astype(jnp.int32)]
        tiles = self._atlas[idx]
        n, h, w = fb.y.shape
        y_out = self._paint(ycells, tiles, h, w, 16.0)
        u_out, v_out = fb.u, fb.v
        if fb.u is not None:
            # chroma: one flat cell color per glyph cell (subsampled
            # grids divide because gh/gw are even)
            sy = h // fb.u.shape[1]
            sx = w // fb.u.shape[2]
            cch, ccw = max(1, gh // sy), max(1, gw // sx)
            uc, uhc, uwc = self._cells(fb.u, cch, ccw)
            vc, _, _ = self._cells(fb.v, cch, ccw)
            ones = jnp.ones((1, 1, 1, cch, ccw), jnp.float32)

            def flat(cells):
                t = jnp.broadcast_to(
                    ones, cells.shape + (cch, ccw))
                return self._paint(cells, t,
                                   fb.u.shape[1], fb.u.shape[2], 128.0)

            u_out, v_out = flat(uc[:, :hc, :wc]), flat(vc[:, :hc, :wc])
        return fb.with_planes(y=y_out, u=u_out, v=v_out), state
