"""avimerge — concatenate AVI files (tools/avimerge.c analogue).

Streams must share geometry/fourcc/rate; video chunks and audio chunks
are appended in order, the index is rebuilt by the writer.  This is the
join step of cluster mode (docs/README.cluster).  Reference extras:
``-p file`` multiplexes an additional audio track from a separate
AVI/WAV (``-a`` selects its source track, ``-A`` the output slot),
``-f FILE`` stamps LIST-INFO comments.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def load_index_file(path: str):
    """Parse an AVIIDX1 text index (aviindex -o): returns
    (video_entries [(pos, len, flags)], audio_entries {track:
    [(pos, len)]}) — avilib's avi_parse_index_from_file role."""
    video = []
    audio = {}
    with open(path) as f:
        magic = f.readline()
        if not magic.upper().startswith("AVIIDX1"):
            raise ValueError(f"{path}: not an AVI index file")
        f.readline()                   # column header
        for line in f:
            parts = line.split()
            if len(parts) < 7:
                continue
            typ = int(parts[1])
            pos = int(parts[4])
            ln = int(parts[5])
            key = int(parts[6])
            if typ == 1:
                video.append((pos, ln, 0x10 if key else 0))
            elif typ >= 2:
                audio.setdefault(typ - 2, []).append((pos, ln))
    return video, audio


def merge(inputs: List[str], output: str,
          extra_audio: Optional[str] = None, a_track: int = 0,
          out_track: Optional[int] = None,
          comments: Optional[dict] = None,
          index_file: Optional[str] = None) -> int:
    from tcforge_tpu.io.avi import (AviAudioStream, AviReader,
                                    AviVideoStream, AviWriter)
    readers = [AviReader(p) for p in inputs]
    if index_file:
        # avimerge -x: override the FIRST input's chunk map with an
        # externally generated index (salvage workflow: aviindex -o)
        vid, aud = load_index_file(index_file)
        r0 = readers[0]
        r0._video_index = vid
        for t, entries in aud.items():
            while len(r0._audio_index) <= t:
                r0._audio_index.append([])
            r0._audio_index[t] = entries
    v0 = readers[0].video
    for r, path in zip(readers, inputs):
        if (r.video.width, r.video.height, r.video.fourcc) != \
                (v0.width, v0.height, v0.fourcc):
            raise ValueError(
                f"{path}: stream geometry/codec mismatch "
                f"({r.video.width}x{r.video.height} {r.video.fourcc} vs "
                f"{v0.width}x{v0.height} {v0.fourcc})")
    audio = [AviAudioStream(rate=a.rate, channels=a.channels, bits=a.bits,
                            format_tag=a.format_tag,
                            byte_rate=a.byte_rate)
             for a in readers[0].audio]
    # -p: additional audio track from a separate AVI or WAV file
    extra_chunks = None
    if extra_audio:
        if extra_audio.lower().endswith(".wav"):
            from tcforge_tpu.io.wav import WavReader
            wr = WavReader(extra_audio)
            info = wr.info
            spec = AviAudioStream(rate=info.rate,
                                  channels=info.channels,
                                  bits=info.bits)
            pcm = []
            while True:
                got = wr.read_samples(info.rate)   # ~1 s per chunk
                if got is None:
                    break
                pcm.append(got.tobytes())
            wr.close()
            extra_chunks = pcm
        else:
            er = AviReader(extra_audio)
            a = er.audio[a_track]
            spec = AviAudioStream(rate=a.rate, channels=a.channels,
                                  bits=a.bits, format_tag=a.format_tag,
                                  byte_rate=a.byte_rate)
            extra_chunks = list(er.read_audio_chunks(a_track))
            er.close()
        slot = out_track if out_track is not None else len(audio)
        while len(audio) <= slot:
            audio.append(spec)
        audio[slot] = spec
        extra_slot = slot              # avimerge.c skips the replaced
        #                                input track (j == out_track)
    total = 0
    with AviWriter(output, AviVideoStream(
            fourcc=v0.fourcc, width=v0.width, height=v0.height,
            fps=v0.fps), audio, comments=comments) as w:
        for r in readers:
            for i in range(r.video_frames):
                data, key = r.read_video_frame(i)
                w.write_video_frame(data, key)
                total += 1
            for t in range(len(r.audio)):
                if extra_chunks is not None and t == extra_slot:
                    continue           # replaced by the -p track
                for chunk in r.read_audio_chunks(t):
                    w.write_audio(chunk, t)
            r.close()
        if extra_chunks is not None:
            for chunk in extra_chunks:
                w.write_audio(chunk, extra_slot)
    return total


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="avimerge",
                                description="merge AVI files")
    p.add_argument("-o", dest="output", required=True)
    p.add_argument("-i", dest="inputs", nargs="+", required=True)
    p.add_argument("-p", dest="extra_audio",
                   help="multiplex additional audio track from file")
    p.add_argument("-a", dest="a_track", type=int, default=0,
                   help="audio track number in -p input")
    p.add_argument("-A", dest="out_track", type=int, default=None,
                   help="audio track slot in the output [next]")
    p.add_argument("-f", dest="comfile",
                   help="read AVI comments from FILE")
    p.add_argument("-x", dest="index_file",
                   help="read the first input's AVI index from FILE "
                        "(see aviindex -o)")
    args = p.parse_args(argv)
    comments = None
    if args.comfile:
        from tcforge_tpu.tools.avisplit import _read_comments
        comments = _read_comments(args.comfile)
    n = merge(args.inputs, args.output, extra_audio=args.extra_audio,
              a_track=args.a_track, out_track=args.out_track,
              comments=comments, index_file=args.index_file)
    print(f"[avimerge] wrote {n} frames -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
