"""Still-image and Y4M-stream video encoders.

``im`` is the encode_im.c analogue: each frame encodes to a complete
still-image byte payload (PPM, PGM, or PNG via the stdlib-zlib codec
in :mod:`tcforge_tpu.io.image`) — the reference wrote stills through
GraphicsMagick; these are the formats needing no external codec.
Pair with the ``im`` multiplexor for numbered files.

``yuv4mpeg`` is the encode_yuv4mpeg.c analogue: frames encode as
YUV4MPEG2 stream chunks (the stream header rides the first payload),
so ``-y yuv4mpeg,...,raw`` produces a valid .y4m through the plain
byte multiplexor.
"""

from __future__ import annotations

from typing import List

import numpy as np

from tcforge_tpu.core.codecs import Codec
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (Encoder, ModuleInfo, ModuleKind,
                                          register)


def _batch_rgb(fb: FrameBatch) -> np.ndarray:
    """(N, H, W, 3) uint8 view of the batch (converting if planar)."""
    if fb.rgb is not None:
        return np.asarray(fb.rgb)
    from tcforge_tpu.ops import colorspace
    return np.asarray(colorspace.convert(fb, ImageFormat.RGB24).rgb)


@register
class ImageEncoder(Encoder):
    info = ModuleInfo(name="im", kind=ModuleKind.ENCODER, media="video",
                      codecs_in=(Codec.ANY,), codecs_out=(Codec.RAW,))
    desc = ModuleDesc(
        name="im", comment="still-image encoder (PPM/PGM/PNG payloads; "
        "encode_im analogue)",
        params=[ParamSpec("format", "ppm|pgm|png|jpg", "s", "png"),
                ParamSpec("quality", "JPEG quality", "d", 90, 10,
                          100)])

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        import io as _io
        import os
        import tempfile

        from tcforge_tpu.io.image import write_png
        fmt = str(self.options.get("format", "png")).lower()
        if fmt in ("jpg", "jpeg"):
            from PIL import Image
            rgb = _batch_rgb(fb)
            out = []
            for i in range(rgb.shape[0]):
                buf = _io.BytesIO()
                Image.fromarray(rgb[i]).save(
                    buf, "JPEG", quality=int(self.options["quality"]))
                out.append(buf.getvalue())
            return out
        if fmt not in ("ppm", "pgm", "png"):
            raise ValueError(f"im encoder: unknown format {fmt!r} "
                             "(ppm|pgm|png|jpg)")
        rgb = _batch_rgb(fb)
        out: List[bytes] = []
        for i in range(rgb.shape[0]):
            img = rgb[i]
            if fmt == "pgm":
                from tcforge_tpu.ops.colorspace import rgb_to_gray_pixels
                import jax.numpy as jnp
                img = np.asarray(rgb_to_gray_pixels(jnp.asarray(img)))
                out.append(b"P5\n%d %d\n255\n"
                           % (img.shape[1], img.shape[0])
                           + img.tobytes())
            elif fmt == "ppm":
                out.append(b"P6\n%d %d\n255\n"
                           % (img.shape[1], img.shape[0])
                           + img.tobytes())
            else:
                # write_png targets a path; stills are small — spool
                # through a temp file (zlib work dominates either way)
                fd, tmp = tempfile.mkstemp(suffix=".png")
                os.close(fd)
                try:
                    write_png(tmp, img)
                    with open(tmp, "rb") as f:
                        out.append(f.read())
                finally:
                    os.unlink(tmp)
        return out


@register
class Yuv4mpegEncoder(Encoder):
    info = ModuleInfo(name="yuv4mpeg", kind=ModuleKind.ENCODER,
                      media="video", codecs_in=(Codec.YUV420P,),
                      codecs_out=(Codec.RAW,))
    desc = ModuleDesc(name="yuv4mpeg",
                      comment="YUV4MPEG2 stream chunks "
                      "(encode_yuv4mpeg analogue; mux with 'raw')")

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        self._wrote_header = False

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        if fb.format != ImageFormat.YUV420P:
            raise ValueError("yuv4mpeg encoder needs YUV420P input")
        from fractions import Fraction
        y = np.asarray(fb.y)
        u = np.asarray(fb.u)
        v = np.asarray(fb.v)
        out: List[bytes] = []
        for i in range(y.shape[0]):
            chunk = b""
            if not self._wrote_header:
                fr = Fraction(self.job.out_fps).limit_denominator(1001)
                chunk += (b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n"
                          % (fb.width, fb.height, fr.numerator,
                             fr.denominator))
                self._wrote_header = True
            chunk += (b"FRAME\n" + y[i].tobytes() + u[i].tobytes()
                      + v[i].tobytes())
            out.append(chunk)
        return out
