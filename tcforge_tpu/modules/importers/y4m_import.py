"""Y4M import module (import_yuv4mpeg.c analogue)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.io.y4m import Y4MReader
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          register)


@register
class Y4MImporter(Importer):
    info = ModuleInfo(name="y4m", kind=ModuleKind.DEMULTIPLEXOR,
                      media="video",
                      codecs_out=(Codec.YUV420P, Codec.YUV422P),
                      formats_in=(ContainerFormat.YUV4MPEG,))
    desc = ModuleDesc(name="y4m", comment="YUV4MPEG2 stream reader")

    def open(self, path: Optional[str]) -> None:
        self._r = Y4MReader(path)
        h = self._r.header
        self.width, self.height = h.width, h.height
        self.fps = h.fps
        self.format = h.format

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        batch = self._r.read_batch(n)
        if batch is None:
            return None
        if len(batch) == 1:
            return {"y": batch[0]}
        return {"y": batch[0], "u": batch[1], "v": batch[2]}

    def close(self) -> None:
        self._r.close()
