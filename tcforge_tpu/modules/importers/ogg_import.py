"""OGG import module (import_ogg.c analogue — gated).

The reference decodes vorbis audio (and OGM divx video via external
decoders); this build has no vorbis/theora codec implementation, so
the importer identifies every logical stream and reports exactly what
it found and why it cannot decode it, instead of a generic failure.
Container-level operations (probe, stream listing, extraction) are
fully supported through tcprobe/tcdemux and tcforge_tpu.io.ogg.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          register)


@register
class OggImporter(Importer):
    info = ModuleInfo(name="ogg", kind=ModuleKind.DEMULTIPLEXOR,
                      media="both", codecs_out=(),
                      formats_in=(ContainerFormat.OGG,))
    desc = ModuleDesc(name="ogg", comment="OGG container (demux only; "
                      "vorbis/theora decode not built)")

    def open(self, path: Optional[str]) -> None:
        from tcforge_tpu.io.ogg import identify_streams
        with open(path, "rb") as f:
            streams = identify_streams(f)
        found = ", ".join(f"{s.codec} ({s.kind})" for s in streams) \
            or "none"
        raise NotImplementedError(
            f"ogg: found streams: {found} — no vorbis/theora decoder "
            "in this build; use tcdemux to extract streams, or "
            "transcode the decoded output of an external decoder")

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        return None
