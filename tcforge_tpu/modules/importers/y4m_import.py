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
        from tcforge_tpu import native
        self._native = None
        if native.available():
            try:
                self._native = native.NativeY4MReader(path)
            except (IOError, KeyError):
                self._native = None
        if self._native is not None:
            self._r = None
            self.width = self._native.width
            self.height = self._native.height
            self.fps = self._native.fps
            chroma = self._native.chroma.decode()
            self.format = {"422": ImageFormat.YUV422P,
                           "444": ImageFormat.YUV444P,
                           "411": ImageFormat.YUV411P,
                           "mono": ImageFormat.Y8}.get(
                chroma, ImageFormat.YUV420P)
            return
        self._r = Y4MReader(path)
        h = self._r.header
        self.width, self.height = h.width, h.height
        self.fps = h.fps
        self.format = h.format

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        batch = (self._native.read_batch(n) if self._native is not None
                 else self._r.read_batch(n))
        if batch is None:
            return None
        if len(batch) == 1:
            return {"y": batch[0]}
        return {"y": batch[0], "u": batch[1], "v": batch[2]}

    def close(self) -> None:
        if self._native is not None:
            self._native.close()
        else:
            self._r.close()
