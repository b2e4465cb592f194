"""Sun/NeXT .au audio import module.

The reference's `sunau` module is a BSD capture DEVICE (gated here);
this module reads the .au FILE format that same magic identifies
(mu-law / 8-bit / 16-bit-BE linear -> canonical s16le)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.io.au import AuReader
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          register)


@register
class AuImporter(Importer):
    info = ModuleInfo(name="au", kind=ModuleKind.DEMULTIPLEXOR,
                      media="audio", codecs_out=(Codec.PCM,),
                      formats_in=(ContainerFormat.SUNAU,))
    desc = ModuleDesc(name="au", comment="Sun/NeXT .au audio reader "
                      "(mu-law + linear)")

    def open(self, path: Optional[str]) -> None:
        self._r = AuReader(path)
        self.audio_rate = self._r.rate
        self.audio_channels = self._r.channels

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        return None

    def read_audio_batch(self, n_samples: int) -> Optional[np.ndarray]:
        return self._r.read_samples(n_samples)

    def close(self) -> None:
        self._r.close()
