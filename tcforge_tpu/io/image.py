"""Still-image I/O: PPM/PGM/PNM (binary variants).

Covers the image halves of the reference's import_im/import_imlist and
encode_im paths for the formats that need no external codec
(GraphicsMagick in the reference; PPM/PGM here, matching the tcxpm2rgb /
PPM-stream lineage).
"""

from __future__ import annotations

import os
import re
from typing import List, Tuple

import numpy as np

_HEADER_RE = re.compile(rb"^(P[456])\s+(?:#[^\n]*\n\s*)*"
                        rb"(\d+)\s+(\d+)\s+(\d+)\s")


def read_image(path: str) -> np.ndarray:
    """Read a binary PPM (P6) / PGM (P5) / PBM (P4) image.

    Returns (H, W, 3) uint8 for PPM, (H, W) uint8 for PGM/PBM.
    """
    with open(path, "rb") as f:
        data = f.read()
    m = _HEADER_RE.match(data)
    if not m:
        raise ValueError(f"not a binary PNM file: {path}")
    kind = m.group(1).decode()
    w, h = int(m.group(2)), int(m.group(3))
    maxval = int(m.group(4))
    off = m.end()
    if kind == "P6":
        arr = np.frombuffer(data, np.uint8, w * h * 3, off)
        out = arr.reshape(h, w, 3)
    elif kind == "P5":
        arr = np.frombuffer(data, np.uint8, w * h, off)
        out = arr.reshape(h, w)
    else:  # P4 bitmap
        rowbytes = (w + 7) // 8
        arr = np.frombuffer(data, np.uint8, rowbytes * h, off)
        bits = np.unpackbits(arr.reshape(h, rowbytes), axis=1)[:, :w]
        out = ((1 - bits) * 255).astype(np.uint8)
    if maxval != 255 and kind != "P4":
        out = (out.astype(np.uint32) * 255 // maxval).astype(np.uint8)
    return out


def write_image(path: str, img: np.ndarray) -> None:
    """Write (H, W, 3) as PPM or (H, W) as PGM."""
    img = np.asarray(img, np.uint8)
    with open(path, "wb") as f:
        if img.ndim == 3:
            f.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        else:
            f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())


def list_sequence(pattern_or_dir: str) -> List[str]:
    """Expand an image-sequence argument: a directory, a glob, or a
    printf-style pattern (imlist semantics)."""
    import glob
    if os.path.isdir(pattern_or_dir):
        exts = (".ppm", ".pgm", ".pnm", ".pbm")
        return sorted(os.path.join(pattern_or_dir, f)
                      for f in os.listdir(pattern_or_dir)
                      if f.lower().endswith(exts))
    if "%" in pattern_or_dir:
        out = []
        i = 0
        while True:
            p = pattern_or_dir % i
            if not os.path.exists(p):
                if i > 0:
                    break
                i += 1
                continue
            out.append(p)
            i += 1
        return out
    return sorted(glob.glob(pattern_or_dir))
