"""PlayStation VAG audio import module (import_vag.c analogue).

Decodes SPU ADPCM (VAGp mono files and SShd/SSbd stereo-blocked
files, plus SShd raw-PCM payloads) fully in-process via
:mod:`tcforge_tpu.io.vag`.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          register)


@register
class VagImporter(Importer):
    info = ModuleInfo(name="vag", kind=ModuleKind.DEMULTIPLEXOR,
                      media="audio", codecs_out=(Codec.PCM,),
                      formats_in=(ContainerFormat.VAG,))
    desc = ModuleDesc(
        name="vag", comment="PlayStation VAG ADPCM audio",
        params=[ParamSpec("blocksize", "stereo interleave override",
                          "d", 0, 0, 0x1000)])

    def open(self, path: Optional[str]) -> None:
        from tcforge_tpu.io.vag import VagReader
        self._r = VagReader(path)
        override = int(self.options.get("blocksize", 0) or 0)
        if override:
            self._r.info.block = override
        self.audio_rate = self._r.info.rate
        self.audio_channels = self._r.info.channels

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        return None

    def read_audio_batch(self, samples: int) -> Optional[np.ndarray]:
        return self._r.read(samples)

    def close(self) -> None:
        pass
