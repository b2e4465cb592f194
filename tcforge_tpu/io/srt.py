"""SubRip (.srt) subtitle parser.

The reference's subtitler only consumed PPML playlists; SRT is the
de-facto ripped-subtitle text format, so the subtitler filter accepts
it directly (``srt=file.srt``) by converting cues onto the PPML
subtitle track (show at start frame, clear at end frame).
"""

from __future__ import annotations

import re
from typing import List, Tuple

_TIME = re.compile(
    r"(\d+):(\d+):(\d+)[,.](\d+)\s*-->\s*(\d+):(\d+):(\d+)[,.](\d+)")

_TAGS = re.compile(r"</?[biu]>|</?font[^>]*>", re.I)


def parse_srt(path: str) -> List[Tuple[int, int, str]]:
    """[(start_ms, end_ms, text)] in cue order.  Basic formatting
    tags (<b>/<i>/<u>/<font>) are stripped; multi-line cues join
    with a space (the renderer draws one line)."""
    cues: List[Tuple[int, int, str]] = []
    with open(path, encoding="utf-8-sig", errors="replace") as f:
        block: List[str] = []
        for raw in list(f) + [""]:
            line = raw.strip()
            if line:
                block.append(line)
                continue
            if block:
                cue = _parse_block(block)
                if cue:
                    cues.append(cue)
                block = []
    cues.sort(key=lambda c: c[0])
    return cues


def _parse_block(block: List[str]):
    # optional numeric counter line, then the timing line, then text
    i = 0
    if i < len(block) and block[i].isdigit():
        i += 1
    if i >= len(block):
        return None
    m = _TIME.match(block[i])
    if not m:
        return None
    g = [int(x) for x in m.groups()]
    start = ((g[0] * 60 + g[1]) * 60 + g[2]) * 1000 + g[3]
    end = ((g[4] * 60 + g[5]) * 60 + g[6]) * 1000 + g[7]
    text = " ".join(_TAGS.sub("", t) for t in block[i + 1:]).strip()
    if not text or end <= start:
        return None
    return start, end, text
