"""tcpsnr — PSNR/diff between two streams (filter_compare +
test-imgconvert -C role as a standalone tool).

Compares two Y4M files frame by frame and reports per-plane PSNR; the
measurement half of the BASELINE recipe ("PSNR vs reference output").
"""

from __future__ import annotations

import argparse
import math
import sys
from typing import List, Optional

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64))
                        ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * math.log10(255.0 ** 2 / mse)


def compare(path_a: str, path_b: str, max_frames: int = 0):
    from tcforge_tpu.io.y4m import Y4MReader
    with Y4MReader(path_a) as ra, Y4MReader(path_b) as rb:
        if (ra.header.width, ra.header.height) != \
                (rb.header.width, rb.header.height):
            raise ValueError(
                f"geometry mismatch: {ra.header.width}x{ra.header.height}"
                f" vs {rb.header.width}x{rb.header.height}")
        sums = None
        count = 0
        worst = float("inf")
        while True:
            fa = ra.read_frame()
            fb = rb.read_frame()
            if fa is None or fb is None:
                break
            if sums is None:
                sums = [0.0] * len(fa)
            for i, (pa, pb) in enumerate(zip(fa, fb)):
                d = pa.astype(np.float64) - pb.astype(np.float64)
                sums[i] += float(np.mean(d * d))
            fpsnr = psnr(np.concatenate([p.ravel() for p in fa]),
                         np.concatenate([p.ravel() for p in fb]))
            worst = min(worst, fpsnr)
            count += 1
            if max_frames and count >= max_frames:
                break
        if not count:
            raise ValueError("no overlapping frames")
        plane_psnr = [
            (float("inf") if s == 0
             else 10.0 * math.log10(255.0 ** 2 / (s / count)))
            for s in sums]
        return count, plane_psnr, worst


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tcpsnr",
                                description="PSNR between two Y4M files")
    p.add_argument("a")
    p.add_argument("b")
    p.add_argument("-n", dest="frames", type=int, default=0)
    p.add_argument("--min", dest="min_db", type=float,
                   help="exit nonzero if worst frame PSNR below this")
    args = p.parse_args(argv)
    count, planes, worst = compare(args.a, args.b, args.frames)
    names = ["Y", "U", "V"][:len(planes)]
    txt = " ".join(f"{n}={v:.2f}dB" for n, v in zip(names, planes))
    print(f"[tcpsnr] {count} frames: {txt}, worst frame {worst:.2f}dB")
    if args.min_db is not None and worst < args.min_db:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
