"""Raw / copy / null encoders (encode_{copy,null}.c + raw paths).

`raw` packs planar batches into the on-disk byte layout of the target
pixel format — the equivalent of the reference's raw export path
(encode video = identity + layout pack).  `null` discards everything
(encode_null.c); `copy` passes payloads through untouched
(encode_copy.c).
"""

from __future__ import annotations

from typing import List

import numpy as np

from tcforge_tpu.core.codecs import Codec
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import AudioBatch, FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.io.rawio import pack_frame
from tcforge_tpu.modules.registry import (Encoder, ModuleInfo, ModuleKind,
                                          register)


def frame_batch_to_payloads(fb: FrameBatch) -> List[bytes]:
    """Pack each frame of a batch into container bytes for fb.format."""
    out = []
    if fb.rgb is not None:
        rgb = np.asarray(fb.rgb)
        for i in range(rgb.shape[0]):
            out.append(pack_frame((rgb[i],), fb.format))
        return out
    planes = [np.asarray(p) for p in fb.planes]
    for i in range(planes[0].shape[0]):
        out.append(pack_frame(tuple(p[i] for p in planes), fb.format))
    return out


@register
class RawEncoder(Encoder):
    info = ModuleInfo(name="raw", kind=ModuleKind.ENCODER, media="both",
                      codecs_in=(Codec.ANY,),
                      codecs_out=(Codec.RAW,))
    desc = ModuleDesc(name="raw", comment="raw frame/PCM passthrough packer")

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        return frame_batch_to_payloads(fb)

    def encode_audio(self, ab: AudioBatch) -> List[bytes]:
        pcm = np.asarray(ab.pcm)
        return [pcm[i].astype("<i2", copy=False).tobytes()
                for i in range(pcm.shape[0])]


@register
class NullEncoder(Encoder):
    info = ModuleInfo(name="null", kind=ModuleKind.ENCODER, media="both",
                      codecs_in=(Codec.ANY,), codecs_out=())
    desc = ModuleDesc(name="null", comment="discard frames (encode_null)")

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        return [b""] * fb.batch

    def encode_audio(self, ab: AudioBatch) -> List[bytes]:
        return [b""] * ab.batch


@register
class CopyEncoder(Encoder):
    info = ModuleInfo(name="copy", kind=ModuleKind.ENCODER, media="both",
                      codecs_in=(Codec.ANY,), codecs_out=(Codec.ANY,))
    desc = ModuleDesc(name="copy", comment="pass-through (encode_copy)")

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        return frame_batch_to_payloads(fb)

    def encode_audio(self, ab: AudioBatch) -> List[bytes]:
        pcm = np.asarray(ab.pcm)
        return [pcm[i].tobytes() for i in range(pcm.shape[0])]
