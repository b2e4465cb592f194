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


_gated_encoder(
    "x264", "H.264 encoder (gated: needs libx264)",
    "no libx264 in this build; use the native 'mpeg2' encoder, "
    "'movjpeg', or 'raw'")
_gated_encoder(
    "xvid", "MPEG-4 ASP encoder (gated: needs libxvidcore)",
    "no libxvidcore encoder API in this build; MPEG-4 ASP encoding "
    "works via '-y raw,...,lavf -F XVID' (FFmpeg/OpenCV), or use "
    "'movjpeg', or 'raw'")
_gated_encoder(
    "theora", "Theora encoder (gated: needs libtheora)",
    "no libtheora in this build; use the native 'mpeg2' encoder or "
    "'movjpeg'")
_gated_encoder(
    "dv", "DV video encoder (gated: needs libdv)",
    "no libdv in this build and the SMPTE 314M VLC tables cannot be "
    "reproduced verifiably; use the native 'mpeg2' encoder or "
    "'movjpeg'")
