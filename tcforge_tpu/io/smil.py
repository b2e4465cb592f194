"""SMIL edit-list parsing (import/ioxml.c analogue).

transcode's XML input mode reads a SMIL playlist of clips:

    <smil><body><seq>
      <video src="a.y4m" clipBegin="npt=1.0" clipEnd="npt=2.5"/>
      <video src="b.avi" clipBegin="smpte=00:00:01:05"/>
    </seq></body></smil>

Times are ``npt=<seconds>`` or ``smpte[-25/-30-drop]=HH:MM:SS[:FF]``;
bare numbers are frames.  The importer turns each clip into a frame
range over its source file.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import List, Optional


@dataclass
class SmilClip:
    src: str
    begin_sec: Optional[float] = None   # None = stream start/end
    end_sec: Optional[float] = None
    begin_frame: Optional[int] = None   # set when given as frames
    end_frame: Optional[int] = None
    media: str = "video"

    def frame_range(self, fps: float, total: Optional[int]):
        """Resolve to a concrete [start, stop) frame range."""
        start = (self.begin_frame if self.begin_frame is not None
                 else int(round((self.begin_sec or 0.0) * fps)))
        if self.end_frame is not None:
            stop = self.end_frame
        elif self.end_sec is not None:
            stop = int(round(self.end_sec * fps))
        else:
            stop = total if total is not None else 1 << 30
        return start, max(start, stop)


def _parse_clock(value: str):
    """-> ('sec', float) or ('frame', int)."""
    value = value.strip()
    if "=" in value:
        scheme, _, rest = value.partition("=")
        scheme = scheme.strip().lower()
        rest = rest.strip()
        if scheme == "npt":
            if ":" in rest:                     # npt=HH:MM:SS.m
                parts = [float(p) for p in rest.split(":")]
                while len(parts) < 3:
                    parts.insert(0, 0.0)
                return "sec", parts[0] * 3600 + parts[1] * 60 + parts[2]
            return "sec", float(rest)
        if scheme.startswith("smpte"):
            fps = 25.0
            if "30" in scheme:
                fps = 30000 / 1001 if "drop" in scheme else 30.0
            parts = rest.split(":")
            if len(parts) == 4:
                hh, mm, ss, ff = (int(p) for p in parts)
            elif len(parts) == 3:
                hh, mm, ss, ff = int(parts[0]), int(parts[1]), \
                    int(parts[2]), 0
            else:
                raise ValueError(f"bad smpte time {value!r}")
            return "sec", hh * 3600 + mm * 60 + ss + ff / fps
        raise ValueError(f"unknown time scheme {value!r}")
    if "." in value or ":" in value:
        return _parse_clock("npt=" + value)
    return "frame", int(value)


def parse_smil(path: str) -> List[SmilClip]:
    tree = ET.parse(path)
    root = tree.getroot()
    tag = root.tag.split("}")[-1]
    if tag != "smil":
        raise ValueError(f"not a SMIL file (root <{tag}>)")
    clips: List[SmilClip] = []
    for node in root.iter():
        nodetag = node.tag.split("}")[-1]
        if nodetag not in ("video", "audio"):
            continue
        src = node.get("src")
        if not src:
            raise ValueError(f"<{nodetag}> without src attribute")
        clip = SmilClip(src=src, media=nodetag)
        for attr, skey, fkey in (("clipBegin", "begin_sec",
                                  "begin_frame"),
                                 ("clipEnd", "end_sec", "end_frame")):
            raw = node.get(attr) or node.get(attr.lower())
            if raw is None:
                continue
            kind, val = _parse_clock(raw)
            setattr(clip, skey if kind == "sec" else fkey, val)
        clips.append(clip)
    if not clips:
        raise ValueError("SMIL file contains no <video>/<audio> clips")
    return clips
