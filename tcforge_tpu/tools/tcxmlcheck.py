"""tcxmlcheck — validate a SMIL edit-list file (import/tcxmlcheck.c).

Checks the playlist parses, every clip's source exists and probes, and
optionally prints the resolved structure (-S, the reference's
"print the vob structure" mode).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        prog="tcxmlcheck", description="check a SMIL edit-list file")
    p.add_argument("-i", dest="input", required=True,
                   help="input smil file")
    p.add_argument("-S", dest="show", action="store_true",
                   help="print the resolved structure")
    p.add_argument("-p", dest="audio_file",
                   help="audio smil file (tcxmlcheck -p)")
    p.add_argument("-V", dest="video_only", action="store_true",
                   help="check only the video part")
    p.add_argument("-A", dest="audio_only", action="store_true",
                   help="check only the audio part")
    p.add_argument("-B", dest="bin_dump", action="store_true",
                   help="emit a machine-readable probe line per clip")
    args = p.parse_args(argv)

    from tcforge_tpu.io.probe import probe_file
    from tcforge_tpu.io.smil import parse_smil

    try:
        clips = parse_smil(args.input)
    except (OSError, ValueError) as e:
        print(f"tcxmlcheck: invalid smil file: {e}", file=sys.stderr)
        return 1

    base = os.path.dirname(os.path.abspath(args.input))
    rc = 0
    total = 0
    # -p: a second smil carrying the audio edit list; -V/-A narrow
    # which media kinds get checked (tcxmlcheck.c modes)
    clip_base = {id(c): base for c in clips}
    if args.audio_file:
        try:
            aclips = parse_smil(args.audio_file)
        except (OSError, ValueError) as e:
            print(f"tcxmlcheck: invalid audio smil: {e}",
                  file=sys.stderr)
            return 1
        abase = os.path.dirname(os.path.abspath(args.audio_file))
        for c in aclips:
            clip_base[id(c)] = abase
        clips = list(clips) + list(aclips)
    if args.video_only:
        clips = [c for c in clips if c.media != "audio"]
    elif args.audio_only:
        clips = [c for c in clips if c.media == "audio"]
    for k, clip in enumerate(clips):
        cbase = clip_base.get(id(clip), base)
        src = clip.src if os.path.isabs(clip.src) else \
            os.path.join(cbase, clip.src)
        try:
            info = probe_file(src)
        except (OSError, ValueError) as e:
            print(f"tcxmlcheck: clip {k}: cannot probe {clip.src}: {e}",
                  file=sys.stderr)
            rc = 1
            continue
        fps = info.fps or 25.0
        start, stop = clip.frame_range(fps, info.num_frames or None)
        if info.num_frames:
            stop = min(stop, info.num_frames)
        total += max(0, stop - start)
        if args.bin_dump:
            print(f"{k} {clip.media} {clip.src} {info.width} "
                  f"{info.height} {fps:.3f} {start} {stop}")
        elif args.show:
            print(f"clip {k}: {clip.media} {clip.src} "
                  f"{info.width}x{info.height} @ {fps:.3f} fps, "
                  f"frames [{start}, {stop})")
    if args.show:
        print(f"total: {total} frames")
    if rc == 0 and not args.bin_dump:
        print("tcxmlcheck: ok")
    return rc


if __name__ == "__main__":
    sys.exit(main())
