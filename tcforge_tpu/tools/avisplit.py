"""avisplit — split an AVI into chunks (tools/avisplit.c analogue).

Reference option surface: ``-s`` splits by chunk SIZE in megabytes,
``-t s1-s2[,s3-s4,..]`` extracts time/framecode ranges (``-c`` merges
them into one output on the fly), ``-H n`` stops after the first n
chunks, ``-f FILE`` stamps AVI LIST-INFO comments onto the outputs.
The library-level :func:`split` keeps a frames-per-chunk interface
(what the cluster tooling wants).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional, Tuple


def _read_comments(path: Optional[str]) -> Optional[dict]:
    """AVI comment file: 'TAG text' lines (avimisc.c AVI_info tags)."""
    if not path:
        return None
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(None, 1)
            if len(parts) == 2 and len(parts[0]) == 4:
                out[parts[0]] = parts[1]
    return out or None


def _open_like(r, out_path: str, comments: Optional[dict]):
    from tcforge_tpu.io.avi import (AviAudioStream, AviVideoStream,
                                    AviWriter)
    audio = [AviAudioStream(rate=a.rate, channels=a.channels,
                            bits=a.bits, format_tag=a.format_tag,
                            byte_rate=a.byte_rate)
             for a in r.audio]
    return AviWriter(out_path, AviVideoStream(
        fourcc=r.video.fourcc, width=r.video.width,
        height=r.video.height, fps=r.video.fps), audio,
        comments=comments)


def _copy_span(r, w, pos: int, end: int, n: int, audio_chunks) -> None:
    """Copy video frames [pos, end) plus the proportional share of
    each audio track's chunks."""
    for i in range(pos, end):
        data, key = r.read_video_frame(i)
        w.write_video_frame(data, key)
    for t, ac in enumerate(audio_chunks):
        a0 = pos * len(ac) // n
        a1 = end * len(ac) // n
        for c in ac[a0:a1]:
            w.write_audio(c, t)


def split(input_path: str, frames_per_chunk: int,
          output_base: Optional[str] = None, max_chunks: int = 0,
          comments: Optional[dict] = None) -> List[str]:
    """Frame-count split (the cluster tooling's interface)."""
    from tcforge_tpu.io.avi import AviReader
    from tcforge_tpu.parallel.split import chunk_output_name
    base = output_base or input_path
    r = AviReader(input_path)
    outputs = []
    n = r.video_frames
    chunk = 0
    audio_chunks = [list(r.read_audio_chunks(t))
                    for t in range(len(r.audio))]
    pos = 0
    while pos < n:
        if max_chunks and chunk >= max_chunks:
            break
        out_path = chunk_output_name(base, chunk)
        with _open_like(r, out_path, comments) as w:
            end = min(pos + frames_per_chunk, n)
            _copy_span(r, w, pos, end, n, audio_chunks)
        outputs.append(out_path)
        pos = end
        chunk += 1
    r.close()
    return outputs


def split_by_size(input_path: str, size_mb: int,
                  output_base: Optional[str] = None,
                  max_chunks: int = 0,
                  comments: Optional[dict] = None) -> List[str]:
    """Reference ``-s``: cut a new chunk when the accumulated video
    payload passes size_mb megabytes (avisplit.c SPLIT_BY_SIZE)."""
    from tcforge_tpu.io.avi import AviReader
    r = AviReader(input_path)
    n = r.video_frames
    limit = max(1, size_mb) << 20
    cuts = [0]
    acc = 0
    # chunk sizes come straight from the index — no payload reads
    for i, (_off, size, _flags) in enumerate(r._video_index):
        acc += size
        if acc >= limit and i + 1 < n:
            cuts.append(i + 1)
            acc = 0
    cuts.append(n)
    r.close()
    spans = [(cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)]
    if max_chunks:
        spans = spans[:max_chunks]
    return split_spans(input_path, spans, output_base,
                       comments=comments)


def split_spans(input_path: str, spans: List[Tuple[int, int]],
                output_base: Optional[str] = None, cat: bool = False,
                comments: Optional[dict] = None) -> List[str]:
    """Extract [start, end) frame spans, one output per span (or one
    merged output with ``cat`` — the reference's ``-t``/``-c``)."""
    from tcforge_tpu.io.avi import AviReader
    from tcforge_tpu.parallel.split import chunk_output_name
    base = output_base or input_path
    r = AviReader(input_path)
    n = r.video_frames
    audio_chunks = [list(r.read_audio_chunks(t))
                    for t in range(len(r.audio))]
    outputs = []
    if cat:
        out_path = chunk_output_name(base, 0)
        with _open_like(r, out_path, comments) as w:
            for pos, end in spans:
                _copy_span(r, w, max(0, pos), min(end, n), n,
                           audio_chunks)
        outputs.append(out_path)
    else:
        for k, (pos, end) in enumerate(spans):
            out_path = chunk_output_name(base, k)
            with _open_like(r, out_path, comments) as w:
                _copy_span(r, w, max(0, pos), min(end, n), n,
                           audio_chunks)
            outputs.append(out_path)
    r.close()
    return outputs


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="avisplit", description="split AVI")
    p.add_argument("-i", dest="input", required=True)
    p.add_argument("-s", dest="size_mb", type=int,
                   help="de-chunk based on size in MB")
    p.add_argument("--frames", dest="frames", type=int,
                   help="frames per chunk (cluster-mode interface)")
    p.add_argument("-t", dest="times",
                   help="s1-s2[,s3-s4,..] time/framecode ranges")
    p.add_argument("-c", dest="cat", action="store_true",
                   help="merge -t ranges into one output")
    p.add_argument("-H", dest="max_chunks", type=int, default=0,
                   help="split only first n chunks")
    p.add_argument("-f", dest="comfile",
                   help="read AVI comments from FILE")
    p.add_argument("-o", dest="output", help="output base name")
    args = p.parse_args(argv)
    comments = _read_comments(args.comfile)
    if args.times:
        from tcforge_tpu.core.framecode import parse_ranges
        from tcforge_tpu.io.avi import AviReader
        r = AviReader(args.input)
        fps = r.video.fps or 25.0
        r.close()
        ranges = parse_ranges(args.times, fps)
        spans = [(rg.stf, rg.etf) for rg in ranges.ranges]
        outs = split_spans(args.input, spans, args.output,
                           cat=args.cat, comments=comments)
    elif args.frames:
        outs = split(args.input, args.frames, args.output,
                     max_chunks=args.max_chunks, comments=comments)
    elif args.size_mb is not None:
        outs = split_by_size(args.input, args.size_mb, args.output,
                             max_chunks=args.max_chunks,
                             comments=comments)
    else:
        p.error("need -s SIZE_MB, --frames N or -t ranges")
    for o in outs:
        print(o)
    return 0


if __name__ == "__main__":
    sys.exit(main())
