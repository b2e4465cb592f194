"""Raw stream import module (import_raw.c analogue)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.formats import ImageFormat, format_from_string
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.io.rawio import unpack_frame
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          register)


@register
class RawImporter(Importer):
    info = ModuleInfo(name="raw", kind=ModuleKind.DEMULTIPLEXOR,
                      media="video",
                      codecs_out=(Codec.RAW,),
                      formats_in=(ContainerFormat.RAW,))
    desc = ModuleDesc(name="raw", comment="headerless raw frame reader",
                      params=[ParamSpec("format", "pixel format", "s",
                                        "yuv420p")])

    def open(self, path: Optional[str]) -> None:
        self.width = self.job.im_v_width
        self.height = self.job.im_v_height
        if not self.width or not self.height:
            raise ValueError("raw import needs explicit geometry (-g)")
        self.fps = self.job.fps
        self.format = format_from_string(self.options.get("format",
                                                          "yuv420p"))
        self._frame_size = self.format.frame_bytes(self.width, self.height)
        self._f = open(path, "rb")

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        frames = []
        for _ in range(n):
            raw = self._f.read(self._frame_size)
            if len(raw) < self._frame_size:
                break
            frames.append(unpack_frame(raw, self.format, self.width,
                                       self.height))
        if not frames:
            return None
        if len(frames[0]) == 1:
            key = "rgb" if self.format.is_rgb else "y"
            return {key: np.stack([f[0] for f in frames])}
        return {"y": np.stack([f[0] for f in frames]),
                "u": np.stack([f[1] for f in frames]),
                "v": np.stack([f[2] for f in frames])}

    def close(self) -> None:
        self._f.close()
