"""Multi-source / directory import (src/transcode.c:597 directory mode,
src/decoder.c:834-887,1017 multi-source continuation).

Chains several inputs into one continuous stream: each file is probed
and opened with its own format-matched import module; on EOS the next
file opens and is compatibility-checked against the first (geometry +
colorspace must match, like tc_next_video_in_file's re-probe).  A
directory input expands to its sorted file list.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from tcforge_tpu.core import log
from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          register)


def expand_sources(spec: Union[str, Sequence[str]]) -> List[str]:
    """-i argument(s) -> ordered file list (directories expand)."""
    paths = [spec] if isinstance(spec, str) else list(spec)
    out: List[str] = []
    for p in paths:
        if os.path.isdir(p):
            names = sorted(os.listdir(p))
            out.extend(os.path.join(p, n) for n in names
                       if os.path.isfile(os.path.join(p, n)))
        else:
            out.append(p)
    return out


@register
class MultiSourceImporter(Importer):
    info = ModuleInfo(name="multi", kind=ModuleKind.DEMULTIPLEXOR,
                      media="both", codecs_out=(Codec.ANY,),
                      formats_in=())
    desc = ModuleDesc(name="multi",
                      comment="multi-source / directory-mode importer")

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        self._cur: Optional[Importer] = None
        self._idx = 0
        self.paths: List[str] = []

    def open(self, path) -> None:
        self.paths = expand_sources(path)
        if not self.paths:
            raise FileNotFoundError(f"multi: no input files in {path!r}")
        self._idx = 0
        self._audio_tail: List[np.ndarray] = []
        self._open_one(0)
        # geometry/rate from the first source
        self.width = self._cur.width
        self.height = self._cur.height
        self.fps = self._cur.fps
        self.format = self._cur.format
        self.audio_rate = self._cur.audio_rate
        self.audio_channels = self._cur.audio_channels

    def _open_one(self, i: int) -> None:
        from tcforge_tpu.io.probe import sniff_magic
        from tcforge_tpu.modules.registry import (find_import_module,
                                                  new_module)
        path = self.paths[i]
        try:
            fmt = sniff_magic(path)
        except OSError:
            fmt = ContainerFormat.UNKNOWN
        name = find_import_module(fmt) or "y4m"
        imp = new_module(ModuleKind.DEMULTIPLEXOR, name, self.job)
        imp.open(path)
        if i > 0:
            # per-file re-probe + compat check (decoder.c:834-887)
            if (imp.width, imp.height) != (self.width, self.height):
                raise ValueError(
                    f"multi: {path} geometry {imp.width}x{imp.height} "
                    f"differs from {self.width}x{self.height}")
            if imp.format != self.format:
                raise ValueError(
                    f"multi: {path} colorspace {imp.format} differs "
                    f"from {self.format}")
            if imp.fps and self.fps and abs(imp.fps - self.fps) > 0.01:
                log.warn("multi", "%s: fps %.3f != %.3f (continuing)",
                         path, imp.fps, self.fps)
        if self._cur is not None:
            # drain the old source's unread audio (bounded to ~30 s)
            # so tracks stay contiguous across the file boundary
            if self._cur.audio_rate:
                have = sum(t.shape[0] for t in self._audio_tail)
                cap = self._cur.audio_rate * 30
                while have < cap:
                    got = self._cur.read_audio_batch(1 << 16)
                    if got is None or got.shape[0] == 0:
                        break
                    self._audio_tail.append(np.asarray(got))
                    have += got.shape[0]
            self._cur.close()
        self._cur = imp
        log.info("multi", "source %d/%d: %s", i + 1, len(self.paths),
                 path)

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        while True:
            batch = self._cur.read_video_batch(n)
            if batch is not None:
                return batch
            if self._idx + 1 >= len(self.paths):
                return None
            self._idx += 1
            self._open_one(self._idx)

    def read_audio_batch(self, n_samples: int) -> Optional[np.ndarray]:
        """Serve the drained previous-file tail first, then the current
        source, topping up short reads so tracks stay contiguous."""
        pieces: List[np.ndarray] = []
        need = n_samples
        while need > 0:
            if self._audio_tail:
                t = self._audio_tail[0]
                take = min(need, t.shape[0])
                pieces.append(t[:take])
                if take < t.shape[0]:
                    self._audio_tail[0] = t[take:]
                else:
                    self._audio_tail.pop(0)
                need -= take
                continue
            got = self._cur.read_audio_batch(need)
            if got is None or got.shape[0] == 0:
                break              # video side advances the files
            pieces.append(np.asarray(got))
            need -= got.shape[0]
        if not pieces:
            return None
        return (np.concatenate(pieces) if len(pieces) > 1
                else pieces[0])

    def close(self) -> None:
        if self._cur is not None:
            self._cur.close()
