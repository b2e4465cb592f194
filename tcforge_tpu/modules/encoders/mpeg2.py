"""MPEG-2 video encoder module (intra-only).

The encoder-module analogue of the reference's encode_lavc/mpeg paths
for TC_CODEC_MPEG2VIDEO: emits an ISO 13818-2 intra-coded elementary
stream (one sequence header up front, one coded picture per frame).
Write it through the raw muxer for a .m2v file, or into AVI as
compressed "mpg2" payloads.
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


@register
class Mpeg2VideoEncoder(Encoder):
    info = ModuleInfo(name="mpeg2", kind=ModuleKind.ENCODER, media="video",
                      codecs_in=(Codec.YUV420P,),
                      codecs_out=(Codec.MPEG2VIDEO,))
    desc = ModuleDesc(
        name="mpeg2", comment="MPEG-2 video encoder (intra-only)",
        params=[ParamSpec("qscale", "quantizer scale", "d", 8, 1, 31),
                ParamSpec("bitrate", "nominal bitrate kbps", "d", 8000,
                          100, 100000)])

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        self._enc = None

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        if fb.format != ImageFormat.YUV420P:
            raise ValueError("mpeg2 encoder needs YUV420P input")
        from tcforge_tpu.io.mpeg2codec import Mpeg2Encoder
        if self._enc is None:
            self._enc = Mpeg2Encoder(fb.width, fb.height,
                                     self.job.out_fps,
                                     qscale=self.options["qscale"],
                                     bitrate_kbps=self.options["bitrate"])
        y = np.asarray(fb.y)
        u = np.asarray(fb.u)
        v = np.asarray(fb.v)
        out = []
        for i in range(fb.batch):
            first = self._enc._temporal_ref == 0
            out.append(self._enc.encode_frame(y[i], u[i], v[i],
                                              with_seq=first))
        return out

    def flush(self) -> List[bytes]:
        if self._enc is not None:
            return [self._enc.sequence_end()]
        return []
