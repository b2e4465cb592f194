"""aviindex — print/rebuild AVI index (tools/aviindex.c analogue)."""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="aviindex",
                                description="show AVI index")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-n", dest="limit", type=int, default=0,
                   help="limit printed entries")
    args = p.parse_args(argv)

    from tcforge_tpu.io.avi import AviReader
    with AviReader(args.input) as r:
        v = r.video
        print(f"# video: {v.fourcc} {v.width}x{v.height} @ {v.fps:.3f} "
              f"fps, {r.video_frames} frames")
        for t, a in enumerate(r.audio):
            print(f"# audio[{t}]: {a.rate} Hz {a.channels} ch {a.bits} bit,"
                  f" {len(r._audio_index[t])} chunks")
        print("# idx tag offset size keyframe")
        for i, (off, size, flags) in enumerate(r._video_index):
            if args.limit and i >= args.limit:
                print("...")
                break
            print(f"{i} 00db {off} {size} {1 if flags & 0x10 else 0}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
