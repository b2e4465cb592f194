"""tcdemux — MPEG program-stream demultiplexer (import/tcdemux.c
analogue).

Splits a PS into per-stream payload files and can emit a navigation
index (-W analogue) of pack offsets for frame-exact cluster seeking
(the nav-file role of demuxer.c:137).
"""

from __future__ import annotations

import argparse

from tcforge_tpu.tools._cli import pipe_main
import json
import sys
from collections import defaultdict
from typing import Dict, List, Optional




def _main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="tcdemux",
                                description="demux MPEG program streams")
    p.add_argument("-i", dest="input", default="-", help="input file (default stdin)")
    p.add_argument("-o", dest="output_base",
                   help="write per-stream files <base>-<sid>.es")
    p.add_argument("-W", dest="navfile",
                   help="write navigation index (JSON) to file")
    p.add_argument("--list", action="store_true",
                   help="list streams only")
    p.add_argument("-x", dest="codec", default="all",
                   help="process only packs with this payload "
                        "(mpeg2|mp3|ac3|private|all)")
    p.add_argument("-a", dest="tracks", default="0,0",
                   help="extract audio[,video] track [0,0]")
    p.add_argument("-S", dest="unit",
                   help="presentation unit: emit only PSU n's video "
                        "ES bytes")
    p.add_argument("-M", dest="sync_mode", type=int, default=1,
                   help="PES A-V sync mode (parity)")
    p.add_argument("-O", dest="keep_seq", action="store_true",
                   help="do not skip initial sequence (parity)")
    p.add_argument("-f", dest="fps", type=float, default=25.0,
                   help="frame rate")
    p.add_argument("-P", dest="syncfile",
                   help="write synchronization data (pack PTS index) "
                        "to file")
    args = p.parse_args(argv)

    if args.unit is not None:
        # -S unit: cut the video ES at PSU (sequence-header)
        # boundaries and emit only the requested unit — the byte
        # source for the engine's --psu_mode / cluster PSU splits
        from tcforge_tpu.io.mpeg import es_unit_ranges, read_video_es
        unit = int(str(args.unit).split(",")[0])
        es = read_video_es(args.input)
        ranges = es_unit_ranges(es)
        if unit >= len(ranges):
            print(f"tcdemux: unit {unit} out of range "
                  f"({len(ranges)} PSUs)", file=sys.stderr)
            return 1
        a, b = ranges[unit]
        out = (open(args.output_base, "wb") if args.output_base
               else sys.stdout.buffer)
        out.write(es[a:b])
        if args.output_base:
            out.close()
        return 0

    with open(args.input, "rb") as f:
        magic = f.read(4)
    if magic == b"OggS":
        return _demux_ogg(args)

    from tcforge_tpu.io.mpeg import iter_pes_packets

    ach, _, vch = str(args.tracks).partition(",")
    ach = int(ach or 0)
    vch = int(vch or 0)

    def _wanted(sid: int) -> bool:
        c = args.codec
        if c in ("all", ""):
            return True
        if c in ("mpeg2", "video", "m2v", "mpeg2video"):
            return sid == 0xE0 + vch
        if c in ("mp3", "mp2", "mpeg-audio", "audio"):
            return sid == 0xC0 + ach
        if c in ("ac3", "private", "ps1"):
            return sid == 0xBD
        return True

    streams: Dict[int, int] = defaultdict(int)
    outputs: Dict[int, object] = {}
    nav: List[dict] = []
    sync: List[dict] = []
    npackets = 0
    for sid, payload in iter_pes_packets(args.input):
        if not _wanted(sid):
            continue
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
    if args.syncfile:
        # -P: per-stream byte progression (the demuxer.c sync log
        # role: enough to re-align A/V cuts offline)
        with open(args.syncfile, "w") as f:
            json.dump({"fps": args.fps, "sync_mode": args.sync_mode,
                       "streams": {f"0x{sid:02x}": size
                                   for sid, size in
                                   sorted(streams.items())}}, f)
    if args.navfile:
        # PSU/picture index (seqinfo role): sequence-header byte
        # ranges of the video ES + cumulative coded-picture counts —
        # what -L / cluster seeking cuts on (src/split.c:146)
        from tcforge_tpu.io.mpeg import es_unit_ranges, read_video_es
        es = read_video_es(args.input)
        units = []
        count = 0
        for a, b in es_unit_ranges(es):
            pics = es.count(b"\x00\x00\x01\x00", a, b)
            units.append({"offset": a, "end": b,
                          "first_picture": count, "pictures": pics})
            count += pics
        with open(args.navfile, "w") as f:
            json.dump({"packets": nav, "units": units,
                       "total_pictures": count}, f)
    for sid, size in sorted(streams.items()):
        kind = ("video" if 0xE0 <= sid <= 0xEF else
                "audio" if 0xC0 <= sid <= 0xDF else
                "private" if sid == 0xBD else "other")
        print(f"stream 0x{sid:02x} ({kind}): {size} bytes")
    if not streams:
        # not a program stream: a raw video ES still demuxes trivially
        # (tcdemux passthrough) and gets the nav index above
        import os
        if b"\x00\x00\x01\xb3" in open(args.input, "rb").read(1 << 16):
            print(f"stream 0xe0 (video ES): "
                  f"{os.path.getsize(args.input)} bytes")
            return 0
    return 0 if streams else 1


def _demux_ogg(args) -> int:
    """OGG branch: list logical streams; -o extracts each stream's
    pages to <base>-<serial>.ogg (probe_ogg.c stream walk +
    tcdemux-style splitting)."""
    from tcforge_tpu.io.ogg import identify_streams, extract_stream

    with open(args.input, "rb") as f:
        streams = identify_streams(f)
    if not streams:
        print("no logical streams found", file=sys.stderr)
        return 1
    for s in streams:
        extra = ""
        if s.kind == "video":
            extra = f" {s.width}x{s.height} @ {s.fps:.3f} fps"
        elif s.kind == "audio":
            extra = f" {s.samplerate} Hz, {s.channels} ch"
        print(f"stream serial 0x{s.serial:08x} ({s.kind}): "
              f"{s.codec}{extra}")
    if args.output_base and not args.list:
        for s in streams:
            with open(args.input, "rb") as f, \
                    open(f"{args.output_base}-{s.serial:08x}.ogg",
                         "wb") as out:
                n = extract_stream(f, out, s.serial)
            print(f"wrote {args.output_base}-{s.serial:08x}.ogg "
                  f"({n} pages)")
    return 0




main = pipe_main(_main)


if __name__ == "__main__":
    sys.exit(main())
