"""tcscan — stream statistics (import/tcscan.c analogue).

Reports per-stream statistics: frame count, duration, luma min/max/mean
for video; peak/RMS volume and suggested rescale for PCM audio.
"""

from __future__ import annotations

import argparse
import math
import sys
from typing import List, Optional

import numpy as np


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tcscan",
                                description="scan stream statistics")
    p.add_argument("-i", dest="input", required=True)
    args = p.parse_args(argv)

    from tcforge_tpu.core.codecs import ContainerFormat
    from tcforge_tpu.io.probe import probe_file, sniff_magic

    magic = sniff_magic(args.input)
    if magic == ContainerFormat.YUV4MPEG:
        from tcforge_tpu.io.y4m import Y4MReader
        with Y4MReader(args.input) as r:
            n = 0
            lo, hi, acc = 255, 0, 0.0
            for planes in r:
                y = planes[0]
                lo = min(lo, int(y.min()))
                hi = max(hi, int(y.max()))
                acc += float(y.mean())
                n += 1
        fps = r.header.fps or 25.0
        print(f"[tcscan] V: {n} frames, {n / fps:.2f} s @ {fps:.3f} fps, "
              f"luma range [{lo},{hi}] mean {acc / max(1, n):.1f}")
    elif magic == ContainerFormat.WAV:
        from tcforge_tpu.io.wav import WavReader
        with WavReader(args.input) as r:
            peak = 0
            sq = 0.0
            count = 0
            while True:
                s = r.read_samples(1 << 16)
                if s is None:
                    break
                a = s.astype(np.float64)
                peak = max(peak, float(np.abs(a).max()))
                sq += float((a ** 2).sum())
                count += a.size
            rms = math.sqrt(sq / max(1, count))
            secs = r.total_samples / r.info.rate
        rescale = 32767.0 / peak if peak else 1.0
        print(f"[tcscan] A: {secs:.2f} s @ {r.info.rate} Hz, "
              f"peak {peak / 32768:.3f}, RMS {rms / 32768:.4f}, "
              f"suggested volume rescale {rescale:.3f}")
    else:
        info = probe_file(args.input)
        print(info.describe())
    return 0


if __name__ == "__main__":
    sys.exit(main())
