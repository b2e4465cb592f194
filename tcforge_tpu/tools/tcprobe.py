"""tcprobe — probe input streams (import/tcprobe.c analogue).

Prints a human summary by default or machine-readable JSON with -B
(the analogue of the reference's binary ProbeInfo dump consumed by the
engine, src/probe.c:336-393).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tcprobe",
                                description="probe media streams")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-B", dest="machine", action="store_true",
                   help="machine-readable JSON output")
    args = p.parse_args(argv)

    from tcforge_tpu.io.probe import probe_file
    try:
        info = probe_file(args.input)
    except FileNotFoundError:
        print(f"tcprobe: no such file: {args.input}", file=sys.stderr)
        return 1
    if args.machine:
        d = dataclasses.asdict(info)
        d["magic"] = info.magic.value
        d["codec"] = info.codec.name.lower()
        d["format"] = info.format.value
        for t, src in zip(d["tracks"], info.tracks):
            t["codec"] = src.codec.name.lower()
        print(json.dumps(d))
    else:
        print(f"[tcprobe] file: {args.input}")
        print(info.describe())
    return 0


if __name__ == "__main__":
    sys.exit(main())
