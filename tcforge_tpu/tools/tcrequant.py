"""tcrequant — MPEG-2 transcoding-free shrink (import/tcrequant.c).

Requantizes the DCT coefficients of an MPEG-2 video elementary stream
in the bitstream domain: headers, motion vectors and DC terms are
copied bit-exactly, AC levels are divided toward the target size, with
a closed feedback loop steering the output to in_size/factor.  The
bit-level engine is native C++ (native/mpeg2requant.cpp).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        prog="tcrequant",
        description="requantize an MPEG-2 video ES (shrink without "
        "re-encoding)")
    p.add_argument("-i", dest="input", default=None,
                   help="input file [stdin]")
    p.add_argument("-o", dest="output", default=None,
                   help="output file [stdout]")
    p.add_argument("-f", dest="factor", type=float, default=1.5,
                   help="requantize factor [1.5]")
    p.add_argument("-d", dest="verbose", type=int, default=0,
                   help="verbosity mode")
    args = p.parse_args(argv)

    from tcforge_tpu import native
    if not native.available():
        print("tcrequant: native library not built "
              "(make -C native)", file=sys.stderr)
        return 1

    if args.input:
        with open(args.input, "rb") as f:
            data = f.read()
    else:
        data = sys.stdin.buffer.read()

    out = native.requant(data, args.factor)

    if args.output:
        with open(args.output, "wb") as f:
            f.write(out)
    else:
        sys.stdout.buffer.write(out)

    if args.verbose or args.output:
        print(f"tcrequant: {len(data)} -> {len(out)} bytes "
              f"(x{len(data) / max(1, len(out)):.2f}, wanted "
              f"x{args.factor:.2f})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
