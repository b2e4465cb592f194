"""Image-sequence multiplexor (encode_im analogue): writes each frame as
a numbered PPM/PGM still."""

from __future__ import annotations

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (ModuleInfo, ModuleKind, Muxer,
                                          register)


@register
class ImageMuxer(Muxer):
    info = ModuleInfo(name="im", kind=ModuleKind.MULTIPLEXOR,
                      media="video", codecs_in=(Codec.ANY,),
                      formats_out=(ContainerFormat.IMAGES,))
    desc = ModuleDesc(name="im", comment="numbered PPM/PGM still writer",
                      params=[ParamSpec("format", "ppm|pgm", "s", "ppm")])

    def open(self, path: str) -> None:
        self._base = path
        self._n = 0
        w, h = ((self.job.ex_v_width, self.job.ex_v_height)
                if self.job.ex_v_width else self.job.export_size())
        self._w, self._h = w, h
        self._fmt = self.job.im_colorspace

    def write_video(self, payload: bytes, keyframe: bool = True) -> int:
        from tcforge_tpu.io.image import write_image
        from tcforge_tpu.io.rawio import unpack_frame
        from tcforge_tpu.ops import colorspace
        from tcforge_tpu.core.frame import FrameBatch

        # pre-encoded stills from the 'im' ENCODER pass through as-is
        # (encode_im -> numbered files, the reference pairing)
        if payload[:8] == b"\x89PNG\r\n\x1a\n" \
                or payload[:3] == b"\xff\xd8\xff" \
                or payload[:2] in (b"P6", b"P5"):
            base, dot, ext = self._base.rpartition(".")
            if not dot:
                base = self._base
            ext = ("png" if payload[:1] == b"\x89" else
                   "jpg" if payload[:1] == b"\xff" else
                   "ppm" if payload[:2] == b"P6" else "pgm")
            path = f"{base}-{self._n:06d}.{ext}"
            with open(path, "wb") as f:
                f.write(payload)
            self._n += 1
            return len(payload)

        planes = unpack_frame(payload, self._fmt, self._w, self._h)
        if self._fmt.is_rgb:
            img = planes[0]
        else:
            fb = FrameBatch.from_numpy(
                y=planes[0][None] if planes[0].ndim == 2 else planes[0],
                u=planes[1][None] if len(planes) > 1 else None,
                v=planes[2][None] if len(planes) > 2 else None,
                fmt=self._fmt)
            img = np.asarray(
                colorspace.convert(fb, ImageFormat.RGB24).rgb[0])
        if self.options.get("format") == "pgm" and img.ndim == 3:
            from tcforge_tpu.ops.colorspace import rgb_to_gray_pixels
            import jax.numpy as jnp
            img = np.asarray(rgb_to_gray_pixels(jnp.asarray(img)))
        base, dot, ext = self._base.rpartition(".")
        if not dot:
            base, ext = self._base, "ppm"
        path = f"{base}-{self._n:06d}.{ext}"
        write_image(path, img)
        self._n += 1
        return len(payload)
