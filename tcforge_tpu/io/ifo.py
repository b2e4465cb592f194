"""DVD-Video IFO parsing (decrypted rips) — the navigation slice of
the reference's import_dvd.c/dvd_reader.c (which used libdvdread;
libdvdread's role here splits in two: CSS descrambling, which stays
gated, and IFO table parsing, which is a plain binary format).

Scope: VMG title table (TT_SRPT) and VTS part-of-title table
(VTS_PTT_SRPT) — enough to map ``-T title`` onto the right
``VTS_nn_k.VOB`` concatenation and report chapter counts.  Cell-level
(sector-exact chapter) navigation is out of scope; chapters map to
whole-title playback like the reference's fallback path.

Layout per the public DVD-Video spec (as mirrored in libdvdread's
ifo_types.h): VMGI_MAT carries a sector pointer to TT_SRPT at offset
0xC4; TT_SRPT entries are 12 bytes (playback type, angles, nr_ptts,
parental id, VTS number, VTS_TTN, title set sector).
"""

from __future__ import annotations

import os
import re
import struct
from dataclasses import dataclass
from typing import List, Optional

SECTOR = 2048


@dataclass
class DvdTitle:
    title: int                 # 1-based global title number
    vts: int                   # title set number (VTS_nn)
    vts_ttn: int               # title number inside the VTS
    chapters: int              # nr of PTTs
    angles: int


def _read(path: str, limit: int = 1 << 20) -> bytes:
    with open(path, "rb") as f:
        return f.read(limit)


def parse_tt_srpt(vmg: bytes) -> List[DvdTitle]:
    """Titles from a VIDEO_TS.IFO blob."""
    if vmg[:12] != b"DVDVIDEO-VMG":
        raise ValueError("not a VMG IFO (missing DVDVIDEO-VMG)")
    (tt_sector,) = struct.unpack(">I", vmg[0xC4:0xC8])
    base = tt_sector * SECTOR
    (n_titles,) = struct.unpack(">H", vmg[base:base + 2])
    out: List[DvdTitle] = []
    pos = base + 8
    for i in range(n_titles):
        ent = vmg[pos:pos + 12]
        if len(ent) < 12:
            break
        angles = ent[1]
        (nr_ptts,) = struct.unpack(">H", ent[2:4])
        vts_nr = ent[6]
        vts_ttn = ent[7]
        out.append(DvdTitle(title=i + 1, vts=vts_nr, vts_ttn=vts_ttn,
                            chapters=nr_ptts, angles=angles))
        pos += 12
    return out


def find_video_ts(path: str) -> Optional[str]:
    """Resolve a disc root or VIDEO_TS directory to the VIDEO_TS dir."""
    if os.path.isdir(path):
        base = os.path.basename(os.path.normpath(path)).upper()
        if base == "VIDEO_TS":
            return path
        sub = os.path.join(path, "VIDEO_TS")
        if os.path.isdir(sub):
            return sub
        # case-insensitive fallback
        for name in os.listdir(path):
            if name.upper() == "VIDEO_TS" and \
                    os.path.isdir(os.path.join(path, name)):
                return os.path.join(path, name)
        # a bare directory of VTS files counts too
        if any(re.match(r"(?i)vts_\d\d_\d\.vob$", n)
               for n in os.listdir(path)):
            return path
    return None


def _find_file(ts_dir: str, want: str) -> Optional[str]:
    for name in os.listdir(ts_dir):
        if name.upper() == want.upper():
            return os.path.join(ts_dir, name)
    return None


def list_titles(ts_dir: str) -> List[DvdTitle]:
    vmg = _find_file(ts_dir, "VIDEO_TS.IFO")
    if vmg is None:
        # no VMG: synthesize one title per VTS present
        vts_nrs = sorted({int(m.group(1)) for n in os.listdir(ts_dir)
                          for m in [re.match(r"(?i)vts_(\d\d)_\d\.vob$",
                                             n)] if m})
        return [DvdTitle(title=i + 1, vts=v, vts_ttn=1, chapters=1,
                         angles=1) for i, v in enumerate(vts_nrs)]
    return parse_tt_srpt(_read(vmg))


def title_vobs(ts_dir: str, title: int) -> List[str]:
    """Ordered VOB paths for 1-based title number `title`."""
    titles = list_titles(ts_dir)
    match = next((t for t in titles if t.title == title), None)
    if match is None:
        raise ValueError(
            f"dvd: no title {title} (disc has {len(titles)})")
    vobs = []
    for k in range(1, 10):        # VTS_nn_1.VOB .. VTS_nn_9.VOB
        p = _find_file(ts_dir, f"VTS_{match.vts:02d}_{k}.VOB")
        if p is None:
            break
        vobs.append(p)
    if not vobs:
        raise FileNotFoundError(
            f"dvd: no VOB files for title {title} (VTS_{match.vts:02d})"
            f" in {ts_dir} — encrypted discs need external ripping")
    return vobs
