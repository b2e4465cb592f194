"""XML (SMIL) edit-list importer — import_xml analogue.

Plays a SMIL playlist of clips as one continuous stream: each
``<video src clipBegin clipEnd>`` entry opens its source through the
probe-selected import module, seeks to the clip's frame range, and the
clips concatenate (import/import_xml.c + ioxml.c).  All sources must
share geometry (the reference errors likewise, ioxml.c:416).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from tcforge_tpu.core import log
from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.io.smil import SmilClip, parse_smil
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          find_import_module, new_module,
                                          register)


@register
class XmlImporter(Importer):
    info = ModuleInfo(name="xml", kind=ModuleKind.DEMULTIPLEXOR,
                      media="video", codecs_out=(Codec.YUV420P,),
                      formats_in=(ContainerFormat.XML,))
    desc = ModuleDesc(name="xml",
                      comment="SMIL edit-list player (import_xml)")

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        self.job = job

    def open(self, path: Optional[str]) -> None:
        from tcforge_tpu.io.probe import probe_file
        base = os.path.dirname(os.path.abspath(path))
        self.clips: List[SmilClip] = [
            c for c in parse_smil(path) if c.media == "video"]
        self._queue: List[tuple] = []      # (src_path, start, stop)
        geometry = None
        total = 0
        for clip in self.clips:
            src = clip.src if os.path.isabs(clip.src) else \
                os.path.join(base, clip.src)
            info = probe_file(src)
            if geometry is None:
                geometry = (info.width, info.height)
                self.width, self.height = geometry
                self.fps = info.fps or 25.0
            elif geometry != (info.width, info.height):
                raise ValueError(
                    "xml: all clips must share geometry "
                    f"({geometry} vs {(info.width, info.height)} in "
                    f"{clip.src})")
            start, stop = clip.frame_range(self.fps, info.num_frames
                                           or None)
            if info.num_frames:
                stop = min(stop, info.num_frames)
            if stop > start:
                self._queue.append((src, info.magic, start, stop))
                total += stop - start
        if not self._queue:
            raise ValueError("xml: playlist resolves to zero frames")
        self.total_frames = total
        self._cur: Optional[Importer] = None
        self._cur_left = 0
        log.info("xml", "playlist: %d clips, %d frames",
                 len(self._queue), total)

    def _next_clip(self) -> bool:
        if self._cur is not None:
            self._cur.close()
            self._cur = None
        if not self._queue:
            return False
        src, magic, start, stop = self._queue.pop(0)
        name = find_import_module(magic) or "y4m"
        imp = new_module(ModuleKind.DEMULTIPLEXOR, name, self.job)
        imp.open(src)
        # seek by reading (sequential sources); indexed sources could
        # seek directly, a later refinement
        skip = start
        while skip > 0:
            got = imp.read_video_batch(min(64, skip))
            if got is None:
                break
            skip -= next(iter(got.values())).shape[0]
        self._cur = imp
        self._cur_left = stop - start
        return True

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        out: List[Dict[str, np.ndarray]] = []
        want = n
        while want > 0:
            if self._cur is None or self._cur_left <= 0:
                if not self._next_clip():
                    break
            take = min(want, self._cur_left)
            planes = self._cur.read_video_batch(take)
            if planes is None:
                self._cur_left = 0
                continue
            got = next(iter(planes.values())).shape[0]
            self._cur_left -= got
            want -= got
            out.append(planes)
        if not out:
            return None
        keys = out[0].keys()
        return {k: np.concatenate([p[k] for p in out]) for k in keys}

    def close(self) -> None:
        if self._cur is not None:
            self._cur.close()
            self._cur = None
