"""Fake ``mplayer`` binary for the mplayer importer tests.

Speaks exactly the slice of the mplayer CLI contract
import_mplayer.c relied on (and our MplayerImporter drives):

- ``-vo yuv4mpeg:file=<fifo>`` → writes a deterministic Y4M stream
  to the fifo (the video side);
- ``-ao pcm:nowaveheader:file=<fifo>`` → writes deterministic raw
  s16le stereo samples (the audio side);
- the input file is the last argument (ignored for content, but the
  basename seeds nothing — frames are a pure index formula so tests
  can regenerate them independently).

Deterministic formulas (mirrored in test_mplayer_import.py):
  y[f,i,j] = (7*f + 3*i + j) & 0xFF     (WxH)
  u[f,i,j] = (13*f + i + 2*j) & 0xFF    (W/2 x H/2)
  v[f,i,j] = (29*f + 5*i + j) & 0xFF
  pcm[s,c] = ((s * 31 + c * 7) % 8192) - 4096
"""

import sys

W, H, FRAMES = 64, 32, 12
RATE, CH, SAMPLES = 8000, 2, 4000


def video_frames():
    out = []
    for f in range(FRAMES):
        y = bytes(((7 * f + 3 * i + j) & 0xFF)
                  for i in range(H) for j in range(W))
        u = bytes(((13 * f + i + 2 * j) & 0xFF)
                  for i in range(H // 2) for j in range(W // 2))
        v = bytes(((29 * f + 5 * i + j) & 0xFF)
                  for i in range(H // 2) for j in range(W // 2))
        out.append(y + u + v)
    return out


def pcm_bytes():
    import struct
    vals = []
    for s in range(SAMPLES):
        for c in range(CH):
            vals.append(((s * 31 + c * 7) % 8192) - 4096)
    return struct.pack("<%dh" % len(vals), *vals)


def main(argv):
    vo = ao = None
    for a in argv:
        if a.startswith("yuv4mpeg:file="):
            vo = a.split("=", 1)[1]
        if a.startswith("pcm:nowaveheader:file="):
            ao = a.split("=", 1)[1]
    if vo:
        with open(vo, "wb") as f:
            f.write(b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n"
                    % (W, H))
            for fr in video_frames():
                f.write(b"FRAME\n")
                f.write(fr)
    elif ao:
        with open(ao, "wb") as f:
            f.write(pcm_bytes())
    else:
        sys.exit(2)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
