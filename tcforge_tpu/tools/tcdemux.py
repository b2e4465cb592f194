"""tcdemux — MPEG program-stream demultiplexer (import/tcdemux.c
analogue).

Splits a PS into per-stream payload files and can emit a navigation
index (-W analogue) of pack offsets for frame-exact cluster seeking
(the nav-file role of demuxer.c:137).
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from typing import Dict, List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tcdemux",
                                description="demux MPEG program streams")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-o", dest="output_base",
                   help="write per-stream files <base>-<sid>.es")
    p.add_argument("-W", dest="navfile",
                   help="write navigation index (JSON) to file")
    p.add_argument("--list", action="store_true",
                   help="list streams only")
    args = p.parse_args(argv)

    from tcforge_tpu.io.mpeg import iter_pes_packets

    streams: Dict[int, int] = defaultdict(int)
    outputs: Dict[int, object] = {}
    nav: List[dict] = []
    npackets = 0
    for sid, payload in iter_pes_packets(args.input):
        streams[sid] += len(payload)
        npackets += 1
        if args.navfile is not None and 0xE0 <= sid <= 0xEF:
            nav.append({"packet": npackets, "sid": sid,
                        "bytes": len(payload)})
        if args.output_base and not args.list:
            if sid not in outputs:
                outputs[sid] = open(f"{args.output_base}-{sid:02x}.es",
                                    "wb")
            outputs[sid].write(payload)
    for f in outputs.values():
        f.close()
    if args.navfile:
        with open(args.navfile, "w") as f:
            json.dump(nav, f)
    for sid, size in sorted(streams.items()):
        kind = ("video" if 0xE0 <= sid <= 0xEF else
                "audio" if 0xC0 <= sid <= 0xDF else
                "private" if sid == 0xBD else "other")
        print(f"stream 0x{sid:02x} ({kind}): {size} bytes")
    return 0 if streams else 1


if __name__ == "__main__":
    sys.exit(main())
