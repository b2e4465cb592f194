"""tcxpm2rgb — convert an XPM image to raw RGB24
(import/tcxpm2rgb.c analogue).

Parses the XPM2/XPM3 string table (values line, color table with the
'c' visual key, pixel rows) and writes packed RGB bytes.  'None'
(transparent) maps to black like the reference's BackgroundColor.
"""

from __future__ import annotations

import argparse
import re
import sys
from typing import List, Optional, Tuple

import numpy as np

_NAMED = {
    "black": (0, 0, 0), "white": (255, 255, 255), "red": (255, 0, 0),
    "green": (0, 255, 0), "blue": (0, 0, 255), "yellow": (255, 255, 0),
    "cyan": (0, 255, 255), "magenta": (255, 0, 255),
    "gray": (190, 190, 190), "grey": (190, 190, 190),
    "none": (0, 0, 0),
}


def _parse_color(spec: str) -> Tuple[int, int, int]:
    spec = spec.strip()
    if spec.startswith("#"):
        hexs = spec[1:]
        if len(hexs) == 6:
            return tuple(int(hexs[i:i + 2], 16) for i in (0, 2, 4))
        if len(hexs) == 12:        # 16-bit-per-channel form
            return tuple(int(hexs[i:i + 4], 16) >> 8 for i in (0, 4, 8))
        if len(hexs) == 3:
            return tuple(int(c * 2, 16) for c in hexs)
    got = _NAMED.get(spec.lower())
    if got is None:
        raise ValueError(f"unsupported XPM color {spec!r}")
    return got


def parse_xpm(text: str) -> Tuple[int, int, np.ndarray]:
    """-> (width, height, (H, W, 3) uint8)."""
    strings: List[str] = re.findall(r'"((?:[^"\\]|\\.)*)"', text)
    if not strings:
        raise ValueError("no XPM string table found")
    vals = strings[0].split()
    if len(vals) < 4:
        raise ValueError(f"bad XPM values line {strings[0]!r}")
    w, h, ncolors, cpp = (int(v) for v in vals[:4])
    if len(strings) < 1 + ncolors + h:
        raise ValueError("truncated XPM string table")
    colors = {}
    for line in strings[1:1 + ncolors]:
        chars, rest = line[:cpp], line[cpp:].split()
        # find the 'c' (color) visual key; fall back to 'g'/'m'
        rgb = None
        for key in ("c", "g", "g4", "m", "b", "s"):
            if key in rest:
                i = rest.index(key)
                if i + 1 < len(rest):
                    try:
                        rgb = _parse_color(rest[i + 1])
                        break
                    except ValueError:
                        continue
        if rgb is None:
            raise ValueError(f"no usable color in XPM line {line!r}")
        colors[chars] = rgb
    img = np.zeros((h, w, 3), np.uint8)
    for y, row in enumerate(strings[1 + ncolors:1 + ncolors + h]):
        for x in range(w):
            img[y, x] = colors[row[x * cpp:(x + 1) * cpp]]
    return w, h, img


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tcxpm2rgb",
                                description="XPM image -> raw RGB24")
    p.add_argument("-i", dest="input", required=True, help="XPM file")
    p.add_argument("-o", dest="output", default=None,
                   help="output file [stdout]")
    args = p.parse_args(argv)
    with open(args.input) as f:
        try:
            w, h, img = parse_xpm(f.read())
        except ValueError as e:
            print(f"tcxpm2rgb: {e}", file=sys.stderr)
            return 1
    out = (open(args.output, "wb") if args.output
           else sys.stdout.buffer)
    out.write(img.tobytes())
    if args.output:
        out.close()
    print(f"tcxpm2rgb: {w}x{h} -> {w * h * 3} bytes", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
