"""External-library encoder modules — present but gated
(encode_x264.c, encode_xvid.c, encode_lame.c, encode_faac.c,
encode_vorbis.c, encode_theora.c, encode_lzo.c analogues).

The reference links these against x264/xvid/lame/faac/libvorbis/
libtheora/liblzo at configure time; none are in this build, so each
registers under its reference name and fails with a precise message
plus the nearest working alternative.  Working encoders in this build:
``mpeg2`` (native), ``movjpeg`` (photo-JPEG), ``nuvrtj`` (RTjpeg),
``raw``, ``copy``, ``null``.
"""

from __future__ import annotations

from typing import List

from tcforge_tpu.core.codecs import Codec
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.modules.registry import (Encoder, ModuleInfo, ModuleKind,
                                          register)


def _gated_encoder(name: str, comment: str, message: str,
                   media: str = "video"):
    class _Gated(Encoder):
        info = ModuleInfo(name=name, kind=ModuleKind.ENCODER,
                          media=media,
                          codecs_in=(Codec.YUV420P, Codec.RGB24)
                          if media == "video" else (Codec.PCM,))
        desc = ModuleDesc(name=name, comment=comment)

        def __init__(self, job, options: str = ""):
            super().__init__(job, options)
            raise NotImplementedError(f"{name}: {message}")

        def encode_video(self, fb: FrameBatch) -> List[bytes]:
            raise NotImplementedError

    _Gated.__name__ = f"Gated{name.capitalize()}Encoder"
    return register(_Gated)


# x264/xvid/theora/dv now have REAL modules (bridge_video.py) — the
# system libavcodec bundles libx264/libxvidcore/libtheora/dvvideo.
