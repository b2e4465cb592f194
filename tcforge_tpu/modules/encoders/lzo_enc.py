"""LZO video encoder module (encode_lzo.c analogue): raw planes packed
into transcode's LZO2 frames via the in-tree LZO1X compressor (store-
mode fallback for incompressible frames, like the reference)."""

from __future__ import annotations

from typing import List

import numpy as np

from tcforge_tpu.core.codecs import Codec
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.modules.registry import (Encoder, ModuleInfo, ModuleKind,
                                          register)


@register
class LzoEncoder(Encoder):
    info = ModuleInfo(name="lzo", kind=ModuleKind.ENCODER,
                      media="video", codecs_in=(Codec.YUV420P,),
                      codecs_out=(Codec.RAW,))
    desc = ModuleDesc(name="lzo", comment="LZO2-packed raw frames "
                      "(lossless; pair with the avi muxer, -F LZO2)")

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        from tcforge_tpu.io import tclzo
        from tcforge_tpu.io.rawio import pack_frame
        if fb.format != ImageFormat.YUV420P:
            from tcforge_tpu.ops.colorspace import convert
            fb = convert(fb, ImageFormat.YUV420P)
        y = np.asarray(fb.y)
        u = np.asarray(fb.u)
        v = np.asarray(fb.v)
        out = []
        for i in range(fb.batch):
            raw = pack_frame((y[i], u[i], v[i]), ImageFormat.YUV420P)
            out.append(tclzo.compress_frame(raw))
        return out
