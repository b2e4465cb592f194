"""Image-sequence import module (import_im / import_imlist analogue):
reads a directory, glob, or printf-pattern of PPM/PGM stills as video."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.io.image import list_sequence, read_image
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          register)


@register
class ImageImporter(Importer):
    info = ModuleInfo(name="im", kind=ModuleKind.DEMULTIPLEXOR,
                      media="video",
                      codecs_out=(Codec.RGB24,),
                      formats_in=(ContainerFormat.IMAGES,))
    desc = ModuleDesc(name="im", comment="PPM/PGM still-image sequence "
                      "reader")

    def open(self, path: Optional[str]) -> None:
        self._files = list_sequence(path)
        if not self._files:
            raise FileNotFoundError(f"no images match {path!r}")
        first = read_image(self._files[0])
        self.height, self.width = first.shape[:2]
        self._gray = first.ndim == 2
        self.format = (ImageFormat.GRAY8 if self._gray
                       else ImageFormat.RGB24)
        self.fps = self.job.fps
        self.total_frames = len(self._files)
        self._pos = 0

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        frames = []
        while len(frames) < n and self._pos < len(self._files):
            img = read_image(self._files[self._pos])
            self._pos += 1
            if img.shape[:2] != (self.height, self.width):
                raise ValueError(
                    f"{self._files[self._pos - 1]}: size mismatch")
            frames.append(img)
        if not frames:
            return None
        if self._gray:
            return {"y": np.stack(frames)}
        return {"rgb": np.stack(frames)}

    def close(self) -> None:
        pass


@register
class ImageListImporter(ImageImporter):
    """import_imlist analogue: the input file is a text list of image
    paths, one per line (blank lines and ``#`` comments skipped) —
    import_imlist.c:126-180 reads it line by line the same way."""

    info = ModuleInfo(name="imlist", kind=ModuleKind.DEMULTIPLEXOR,
                      media="video",
                      codecs_out=(Codec.RGB24,),
                      formats_in=(ContainerFormat.IMAGES,))
    desc = ModuleDesc(name="imlist",
                      comment="still-image list-file reader")

    def open(self, path: Optional[str]) -> None:
        with open(path, "r") as f:
            files = [ln.strip() for ln in f]
        self._files = [ln for ln in files
                       if ln and not ln.startswith("#")]
        if not self._files:
            raise FileNotFoundError(f"{path}: empty image list")
        first = read_image(self._files[0])
        self.height, self.width = first.shape[:2]
        self._gray = first.ndim == 2
        self.format = (ImageFormat.GRAY8 if self._gray
                       else ImageFormat.RGB24)
        self.fps = self.job.fps
        self.total_frames = len(self._files)
        self._pos = 0
