"""tccat — concatenating stream extractor (import/tccat.c analogue).

Concatenates files (or a VOB directory) to stdout/file; for MPEG program
streams it can optionally extract the video ES on the fly (-x video,
the tcextract role for the common pipeline).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from typing import List, Optional


def cat_paths(inputs: List[str]) -> List[str]:
    """Expand directory/VOB-dir arguments like tccat's dir mode."""
    out = []
    for p in inputs:
        if os.path.isdir(p):
            vobs = sorted(glob.glob(os.path.join(p, "*.vob"))
                          + glob.glob(os.path.join(p, "*.VOB")))
            out.extend(vobs if vobs else sorted(
                os.path.join(p, f) for f in os.listdir(p)))
        else:
            out.append(p)
    return out


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tccat",
                                description="concatenate media streams")
    p.add_argument("-i", dest="inputs", nargs="+", required=True)
    p.add_argument("-o", dest="output", help="output file (default stdout)")
    p.add_argument("-x", dest="extract", choices=["video"],
                   help="extract the video ES from MPEG-PS/TS input")
    p.add_argument("-T", dest="ts_pid", default="0",
                   help="TS video pid (hex), or DVD title[,chapter] "
                   "when the input is a VIDEO_TS rip (tccat.c -T)")
    p.add_argument("-L", dest="all_chapters", action="store_true",
                   help="process all following chapters (tccat -L)")
    p.add_argument("-S", dest="seek", type=int, default=0,
                   help="seek to VOB stream offset n x 2kB")
    p.add_argument("-a", dest="audio", action="store_true",
                   help="dump the AVI file's audio stream")
    p.add_argument("-d", dest="verbose", type=int, default=0,
                   help="verbosity mode (parity)")
    args = p.parse_args(argv)

    if args.audio:
        # -a: byte-dump the AVI audio track (tccat.c AVI mode)
        from tcforge_tpu.io.avi import AviReader
        out = (open(args.output, "wb") if args.output
               else sys.stdout.buffer)
        try:
            for path in args.inputs:
                with AviReader(path) as r:
                    for chunk in r.read_audio_chunks(0):
                        out.write(chunk)
        finally:
            if args.output:
                out.close()
        return 0

    # DVD rip: -T selects title[,chapter] via the IFO tables
    from tcforge_tpu.io import ifo
    ts_dir = (ifo.find_video_ts(args.inputs[0])
              if len(args.inputs) == 1 else None)
    if ts_dir is not None:
        spec = args.ts_pid if args.ts_pid not in ("", "0") else "1"
        parts = spec.split(",")
        title = int(parts[0])
        chapter = int(parts[1]) if len(parts) > 1 else 0
        if args.all_chapters and chapter:
            # -L: this chapter and all following ones
            titles = ifo.list_titles(ts_dir)
            t = next((tt for tt in titles if tt.title == title),
                     None)
            if t is None:
                print(f"tccat: no title {title} on this disc "
                      f"({len(titles)} title(s))", file=sys.stderr)
                return 1
            chapter = f"{chapter}-{t.chapters}"
        out = (open(args.output, "wb") if args.output
               else sys.stdout.buffer)
        try:
            if chapter:
                chs = str(chapter)
                if "-" in chs:
                    c1, c2 = (int(x) for x in chs.split("-", 1))
                else:
                    c1 = c2 = int(chs)
                spans = []
                for c in range(c1, c2 + 1):
                    spans.extend(ifo.chapter_sectors(ts_dir, title, c))
                n = ifo.extract_sectors(ts_dir, title, spans, out)
            else:
                n = 0
                for v in ifo.title_vobs(ts_dir, title):
                    with open(v, "rb") as f:
                        while True:
                            chunk = f.read(1 << 20)
                            if not chunk:
                                break
                            out.write(chunk)
                            n += len(chunk)
            print(f"[tccat] title {title}"
                  + (f" chapter {chapter}" if chapter else "")
                  + f": {n} bytes", file=sys.stderr)
        finally:
            if args.output:
                out.close()
        return 0

    paths = cat_paths(args.inputs)
    out = open(args.output, "wb") if args.output else sys.stdout.buffer
    try:
        if args.extract == "video":
            from tcforge_tpu.io.mpeg import iter_pes_packets
            from tcforge_tpu.io import ts as tsio
            for path in paths:
                with open(path, "rb") as f:
                    head = f.read(400)
                if tsio.sniff_ts(head):
                    pid = int(args.ts_pid, 16) or None
                    for chunk in tsio.iter_video_es(path, pid=pid):
                        out.write(chunk)
                    continue
                for sid, payload in iter_pes_packets(path):
                    if 0xE0 <= sid <= 0xEF:
                        out.write(payload)
        else:
            skip = args.seek * 2048
            for path in paths:
                with open(path, "rb") as f:
                    if skip:
                        import os as _os
                        size = _os.fstat(f.fileno()).st_size
                        if skip >= size:
                            skip -= size
                            continue
                        f.seek(skip)
                        skip = 0
                    while True:
                        chunk = f.read(1 << 20)
                        if not chunk:
                            break
                        out.write(chunk)
    finally:
        if args.output:
            out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
