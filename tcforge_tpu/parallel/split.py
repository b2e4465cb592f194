"""Frame-range sharding across hosts (cluster mode, -W).

Rebuild of ``src/split.c`` + ``docs/README.cluster``: a clip is split
into chunks of frames, each host/process transcodes its chunk, outputs
are joined (tools/avimerge analogue in tcforge_tpu.tools.avimerge).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from tcforge_tpu.core.framecode import FrameRangeList, from_frames, \
    split_chunks


@dataclass(frozen=True)
class ClusterChunk:
    """One -W chunk,nchunks assignment."""

    chunk: int
    nchunks: int
    start: int           # first frame (inclusive)
    end: int             # past-the-end frame
    overlap: int = 0     # temporal halo frames prepended for window filters

    @property
    def read_start(self) -> int:
        return max(0, self.start - self.overlap)

    @property
    def warmup_frames(self) -> int:
        """Frames read before `start` purely to warm temporal state."""
        return self.start - self.read_start

    def ranges(self, fps: float = 25.0) -> FrameRangeList:
        return from_frames(self.start, self.end, fps)


def plan_chunks(total_frames: int, nchunks: int,
                overlap: int = 0) -> List[ClusterChunk]:
    """split_stream analogue (src/split.c:146): contiguous chunks with an
    optional temporal-halo overlap so windowed filters (hqdn3d & co.)
    warm their carry state before their first owned frame — the exactness
    the reference's cluster mode silently gives up at chunk borders."""
    out = []
    for i, (s, e) in enumerate(split_chunks(total_frames, nchunks)):
        out.append(ClusterChunk(chunk=i, nchunks=nchunks, start=s, end=e,
                                overlap=overlap if i > 0 else 0))
    return out


def chunk_output_name(base: str, chunk: int) -> str:
    """Per-chunk output naming (%03d injection, multiplexor.c:207-215)."""
    import os
    root, ext = os.path.splitext(base)
    return f"{root}-{chunk:03d}{ext}"
