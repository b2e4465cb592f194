"""AVI import module (import_avi.c analogue: direct avilib access).

Handles raw-fourcc video payloads (I420/YV12/YUY2/UYVY/RGB) and PCM
audio tracks; compressed fourccs raise until a decoder module claims
them.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.io.avi import AviReader
from tcforge_tpu.io.rawio import unpack_frame
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          register)

_FOURCC_FMT = {
    "I420": ImageFormat.YUV420P, "IYUV": ImageFormat.YUV420P,
    "YV12": ImageFormat.YV12, "YUY2": ImageFormat.YUY2,
    "UYVY": ImageFormat.UYVY, "YVYU": ImageFormat.YVYU,
    "RGB": ImageFormat.RGB24, "DIB": ImageFormat.BGR24, "": ImageFormat.BGR24,
}


def _have_bridge() -> bool:
    try:
        from tcforge_tpu.native import av
        return av.available()
    except Exception:
        return False


@register
class AviImporter(Importer):
    info = ModuleInfo(name="avi", kind=ModuleKind.DEMULTIPLEXOR,
                      media="both",
                      codecs_out=(Codec.YUV420P, Codec.RGB24, Codec.PCM),
                      formats_in=(ContainerFormat.AVI,))
    desc = ModuleDesc(name="avi", comment="AVI container reader (avilib)",
                      params=[ParamSpec("track", "audio track", "d", 0)])

    def open(self, path: Optional[str]) -> None:
        self._r = AviReader(path)
        v = self._r.video
        self.width, self.height = v.width, v.height
        self.fps = v.fps
        fcc = v.fourcc.strip().upper()
        self._jpeg = fcc in ("MJPG", "JPEG", "AVDJ", "DMB1")
        self._lzo = fcc == "LZO2"
        self._ff = None
        self._mp4 = None
        if self._lzo:
            # transcode's own LZO2 frames: 16-byte header + LZO1X
            # payload of the raw I420 planes (import_lzo.c role)
            self.format = ImageFormat.YUV420P
        elif self._jpeg:
            # Motion-JPEG: every chunk is a standalone baseline JPEG
            # (tables in-stream; decoded via Pillow like the mov path)
            self.format = ImageFormat.RGB24
        elif fcc in ("XVID", "DIVX", "DX50", "MP4V", "FMP4",
                     "M4S2", "MP4S") and (
                __import__("os").environ.get(
                    "TCFORGE_NATIVE_MPEG4") == "1"
                or not _have_bridge()):
            # MPEG-4 part 2 (DivX/Xvid): the in-tree decoder
            # (io/mpeg4dec.py) — transcode's flagship import case,
            # bridge-free
            from tcforge_tpu.io.mpeg4dec import Mpeg4Decoder
            self._mp4 = Mpeg4Decoder()
            self._mp4_debt = 0       # packed-chunk placeholder credit
            self._mp4_flushed = False
            self.format = ImageFormat.YUV420P
        elif fcc not in _FOURCC_FMT:
            # compressed fourcc: delegate the video track to the
            # FFmpeg importer (probe.c select_modules chose
            # import_ffmpeg for these); audio stays on avilib
            try:
                from tcforge_tpu.modules.importers.ffmpeg_import \
                    import FfmpegImporter
                self._ff = FfmpegImporter(self.job)
                self._ff.open(path)
            except Exception:
                raise ValueError(
                    f"avi: compressed fourcc {fcc!r} needs a decoder "
                    "module (FFmpeg/OpenCV delegation unavailable)")
            self.format = ImageFormat.RGB24
        else:
            self.format = _FOURCC_FMT[fcc]
        self.total_frames = self._r.video_frames
        self._pos = 0
        track = self.options.get("track", 0) or self.job.a_track
        self._audio_iter = None
        self._audio_dec = None
        self._audio_buf = np.zeros((0, 2), np.int16)
        if track < len(self._r.audio):
            a = self._r.audio[track]
            self.audio_rate = a.rate
            self.audio_channels = a.channels
            self._audio_iter = self._r.read_audio_chunks(track)
            fmt = getattr(a, "format_tag", 1)
            if fmt in (0x50, 0x55, 0x2000):
                # compressed track (MP2/MP3/AC3): decode through the
                # FFmpeg bridge — the legacy AVI-with-MP3 case the
                # reference handled via lame (import_avi + decode_mp3)
                from tcforge_tpu.native import av
                if not av.available():
                    raise NotImplementedError(
                        "avi: compressed audio track (tag "
                        f"0x{fmt:04x}) needs the FFmpeg bridge "
                        "(make -C native)")
                name = {0x50: "mp2", 0x55: "mp3", 0x2000: "ac3"}[fmt]
                self._audio_dec = av.AvAudioDecoder(name)
            self._audio_dtype = np.int16 if a.bits == 16 else np.uint8
            self._audio_buf = np.zeros((0, a.channels), self._audio_dtype)

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        if self._ff is not None:
            return self._ff.read_video_batch(n)
        if self._mp4 is not None:
            ys, us, vs = [], [], []
            while len(ys) < n and (self._pos < self.total_frames
                                   or not self._mp4_flushed):
                if self._pos >= self.total_frames:
                    # EOS: emit the reorder-delayed final non-B frame
                    # (B-VOP streams hold one frame back)
                    self._mp4_flushed = True
                    f = self._mp4.flush()
                    got = [f] if f is not None else []
                else:
                    raw, _key = self._r.read_video_frame(self._pos)
                    self._pos += 1
                    if not raw:
                        if self._mp4_debt > 0:
                            # placeholder for a B already emitted by
                            # a packed P+B chunk
                            self._mp4_debt -= 1
                            got = []
                        elif self._mp4.last is not None:
                            # drop-frame chunk: repeat
                            got = [self._mp4._crop()]
                        else:
                            got = []
                    else:
                        got = self._mp4.decode_frames(bytes(raw))
                        if len(got) > 1:
                            self._mp4_debt += len(got) - 1
                for g in got:
                    ys.append(g[0])
                    us.append(g[1])
                    vs.append(g[2])
            if not ys:
                return None
            return {"y": np.stack(ys), "u": np.stack(us),
                    "v": np.stack(vs)}
        frames = []
        while len(frames) < n and self._pos < self.total_frames:
            raw, _key = self._r.read_video_frame(self._pos)
            self._pos += 1
            if not raw:
                continue   # drop-frame chunk (avilib zero-size chunks)
            if self._lzo:
                from tcforge_tpu.io import tclzo
                from tcforge_tpu.io.rawio import unpack_frame as upf
                raw2, _fl = tclzo.unpack_frame(
                    raw, self.width * self.height * 3 // 2 + 64)
                frames.append(upf(raw2, self.format, self.width,
                                  self.height))
                continue
            if self._jpeg:
                import io as _io

                from PIL import Image
                img = Image.open(_io.BytesIO(raw)).convert("RGB")
                frames.append((np.asarray(img),))
                continue
            frames.append(unpack_frame(raw, self.format, self.width,
                                       self.height))
        if not frames:
            return None
        if len(frames[0]) == 1:
            return {"rgb": np.stack([f[0] for f in frames])}
        return {"y": np.stack([f[0] for f in frames]),
                "u": np.stack([f[1] for f in frames]),
                "v": np.stack([f[2] for f in frames])}

    def read_audio_batch(self, n_samples: int) -> Optional[np.ndarray]:
        if self._audio_iter is None:
            return None
        while self._audio_buf.shape[0] < n_samples:
            if self._audio_dec is not None:
                got = self._audio_dec.read()
                if got is not None:
                    if got.shape[1] != self.audio_channels:
                        self.audio_channels = got.shape[1]
                    self._audio_buf = (got if not len(self._audio_buf)
                                       else np.concatenate(
                                           [self._audio_buf, got]))
                    continue
                chunk = next(self._audio_iter, None)
                if chunk is None:
                    self._audio_dec.flush()
                    got = self._audio_dec.read()
                    if got is not None:
                        self._audio_buf = (got if not len(
                            self._audio_buf) else np.concatenate(
                            [self._audio_buf, got]))
                    break
                self._audio_dec.feed(chunk)
                continue
            chunk = next(self._audio_iter, None)
            if chunk is None:
                break
            a = np.frombuffer(chunk, self._audio_dtype).reshape(
                -1, max(1, self.audio_channels))
            self._audio_buf = np.concatenate([self._audio_buf, a])
        if self._audio_buf.shape[0] == 0:
            return None
        out = self._audio_buf[:n_samples]
        self._audio_buf = self._audio_buf[n_samples:]
        return out

    def seek(self, frame: int) -> bool:
        """-L fast seek: jump the video index, discard matching audio."""
        if self._ff is not None:
            self._ff.seek(frame)
        self._pos = min(frame, self.total_frames)
        if self._audio_iter is not None and self.fps:
            self.read_audio_batch(
                int(round(frame * self.audio_rate / self.fps)))
        return True

    def close(self) -> None:
        if self._ff is not None:
            self._ff.close()
        self._r.close()
