"""PVN import/export modules (import_pvn.c / probe_pvn.c analogues).

Decodes all PVN flavours (PV4/5/6 × uint/int/float/double) to uint8
grey or RGB batches; the muxer writes 8-bit PV5a/PV6a streams, patching
the frame count into the header on close like a post-run rewrite.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.io import pvn
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          Muxer, register)


@register
class PvnImporter(Importer):
    info = ModuleInfo(name="pvn", kind=ModuleKind.DEMULTIPLEXOR,
                      media="video", codecs_out=(Codec.RGB24,),
                      formats_in=(ContainerFormat.PVN,))
    desc = ModuleDesc(name="pvn", comment="PVN portable video reader")

    def open(self, path: Optional[str]) -> None:
        self._f = open(path, "rb")
        hdr = pvn.read_header(self._f)
        self._hdr = hdr
        self.width, self.height = hdr.width, hdr.height
        self.fps = hdr.framerate
        self.format = (ImageFormat.RGB24 if hdr.channels == 3
                       else ImageFormat.GRAY8)
        if hdr.nframes:
            self.total_frames = hdr.nframes
        self._frames = pvn.iter_frames(self._f, hdr)

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        frames = []
        for img in self._frames:
            frames.append(img)
            if len(frames) >= n:
                break
        if not frames:
            return None
        stack = np.stack(frames)
        if self._hdr.channels == 3:
            return {"rgb": stack}
        return {"y": stack}

    def close(self) -> None:
        self._f.close()


@register
class PvnMuxer(Muxer):
    info = ModuleInfo(name="pvn", kind=ModuleKind.MULTIPLEXOR,
                      media="video", codecs_in=(Codec.RGB24, Codec.RAW),
                      formats_out=(ContainerFormat.PVN,))
    desc = ModuleDesc(name="pvn", comment="PVN writer (PV5a/PV6a)")

    def open(self, path: str) -> None:
        self._f = open(path, "w+b")
        self._hdr = None
        self._frames = 0

    def write_video(self, payload: bytes, keyframe: bool = True) -> int:
        if self._hdr is None:
            w = self.job.ex_v_width or self.job.im_v_width
            h = self.job.ex_v_height or self.job.im_v_height
            rgb = len(payload) == w * h * 3
            self._hdr = pvn.PvnHeader(
                imagetype=6 if rgb else 5, dtype="a", bits=8,
                width=w, height=h, nframes=0,
                framerate=self.job.out_fps or self.job.fps or 15.0)
            pvn.write_header(self._f, self._hdr)
        self._f.write(payload)
        self._frames += 1
        return len(payload)

    def close(self) -> None:
        if self._hdr is not None:
            # rewrite the header with the true frame count; the field
            # is text so pad the line to its original length
            end = self._f.tell()
            self._f.seek(0)
            old = self._f.readline()
            self._hdr.nframes = self._frames
            import io as _io
            buf = _io.BytesIO()
            pvn.write_header(buf, self._hdr)
            line = buf.getvalue()
            if len(line) <= len(old):
                self._f.seek(0)
                self._f.write(line[:-1] + b" " * (len(old) - len(line))
                              + b"\n")
            self._f.seek(end)
        self._f.close()
