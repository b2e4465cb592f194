"""VobSub (.idx/.sub) subtitle file pairs.

The reference's extsub consumed subpictures demuxed from the VOB
itself; ripped subtitles usually live in VobSub pairs instead — a
text .idx (palette, geometry, per-language timestamp/filepos table)
plus a .sub that is a plain MPEG program stream of private-stream-1
subpicture packets.  This reader feeds the same SPU decode path
(io/spu.py), so the extsub filter renders either source.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class VobsubLang:
    lang: str
    index: int
    # (timestamp ms, filepos byte offset into the .sub)
    entries: List[Tuple[int, int]] = field(default_factory=list)


@dataclass
class VobsubInfo:
    size: Optional[Tuple[int, int]] = None
    palette: List[Tuple[int, int, int]] = field(default_factory=list)
    langs: List[VobsubLang] = field(default_factory=list)


_TS = re.compile(r"(\d+):(\d+):(\d+):(\d+)")


def parse_idx(path: str) -> VobsubInfo:
    info = VobsubInfo()
    cur: Optional[VobsubLang] = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "size":
                w, _, h = val.partition("x")
                try:
                    info.size = (int(w), int(h))
                except ValueError:
                    pass
            elif key == "palette":
                info.palette = []
                for item in val.split(","):
                    item = item.strip()
                    if len(item) == 6:
                        info.palette.append(
                            (int(item[0:2], 16), int(item[2:4], 16),
                             int(item[4:6], 16)))
            elif key == "id":
                # "id: en, index: 0"
                lang, _, rest = val.partition(",")
                m = re.search(r"index:\s*(\d+)", rest)
                cur = VobsubLang(lang=lang.strip(),
                                 index=int(m.group(1)) if m else
                                 len(info.langs))
                info.langs.append(cur)
            elif key == "timestamp":
                # "timestamp: 00:00:01:000, filepos: 000000000"
                m = _TS.match(val)
                fp = re.search(r"filepos:\s*([0-9a-fA-F]+)", val)
                if m and fp and cur is not None:
                    hh, mm, ss, ms = (int(g) for g in m.groups())
                    t = ((hh * 60 + mm) * 60 + ss) * 1000 + ms
                    cur.entries.append((t, int(fp.group(1), 16)))
    return info


def palette_luma(palette: List[Tuple[int, int, int]]) -> List[int]:
    """16 RGB entries -> BT.601 luma CLUT (what extsub renders
    with)."""
    out = []
    for r, g, b in palette:
        out.append(int(round(0.299 * r + 0.587 * g + 0.114 * b)))
    while len(out) < 16:
        out.append(0)
    return out[:16]


def read_vobsub(idx_path: str, track: int = 0):
    """(spus, info): decode every subpicture unit of language-index
    ``track`` from the .sub program stream; PTS comes from the .idx
    timestamp table (authoritative for ripped subs)."""
    from tcforge_tpu.io import spu as spuio
    info = parse_idx(idx_path)
    sub_path = os.path.splitext(idx_path)[0] + ".sub"
    lang = next((lg for lg in info.langs if lg.index == track),
                info.langs[0] if info.langs else None)
    stream_track = lang.index if lang is not None else track
    spus = spuio.collect_vob_spus(sub_path, stream_track)
    if lang is not None and lang.entries:
        # idx timestamps are ms; SPU pts ride 90 kHz ticks
        for s, (ms, _fp) in zip(spus, lang.entries):
            s.pts = ms * 90
    return spus, info
