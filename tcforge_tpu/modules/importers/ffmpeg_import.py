"""FFmpeg-backed import module (import_ffmpeg.c analogue).

The reference decoded through libavcodec when FFmpeg was available at
build time; this build reaches the same decoders through OpenCV's
FFMPEG videoio backend (cv2.VideoCapture) — H.264/MPEG-4/whatever
this FFmpeg build carries decodes to RGB frames.  Audio rides the
libavformat bridge (AvFileAudio) when the file carries a decodable
audio track."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          register)


@register
class FfmpegImporter(Importer):
    info = ModuleInfo(name="ffmpeg", kind=ModuleKind.DEMULTIPLEXOR,
                      media="both", codecs_out=(Codec.RGB24,))
    desc = ModuleDesc(
        name="ffmpeg", comment="FFmpeg decoder via OpenCV videoio "
        "(any codec this FFmpeg build carries; video only)")

    def open(self, path: Optional[str]) -> None:
        # native tier first: libavformat+libavcodec straight to
        # YUV420P (no RGB round trip); cv2 videoio as fallback
        self._cap = None
        self._vid = None
        try:
            from tcforge_tpu.native import av
            self._vid = av.AvFileVideo(path)
        except Exception:
            self._vid = None
        if self._vid is not None:
            self.width = self._vid.width
            self.height = self._vid.height
            self.fps = self._vid.fps or 25.0
            self.total_frames = self._vid.total_frames
            self.format = ImageFormat.YUV420P
        else:
            try:
                import cv2
            except ImportError:
                raise NotImplementedError(
                    "ffmpeg: neither the FFmpeg bridge nor OpenCV "
                    "(cv2) is available; use the native importers "
                    "(-x mpeg/avi/y4m/mov/nuv)")
            self._cap = cv2.VideoCapture(path)
            if not self._cap.isOpened():
                # Reclassify as audio-only ONLY when the container
                # truly has no video stream (a video stream whose
                # codec merely fails to open must stay a loud error,
                # not silently drop the video).
                self._cap = None
                if self._container_has_video(path):
                    raise ValueError(
                        f"ffmpeg: cannot decode the video stream in "
                        f"{path!r} (codec unsupported by this FFmpeg "
                        "build)")
                self.width = self.height = 0
                self.fps = 0.0
                self.total_frames = 0
                self.format = ImageFormat.YUV420P
                # audio opens in the shared bridge block below; an
                # audio-less file errors there
                self._open_audio(path, required=True)
                return
            self.width = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            self.height = int(
                self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            self.fps = float(self._cap.get(cv2.CAP_PROP_FPS)) or 25.0
            n = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
            self.total_frames = n if n > 0 else None
            self.format = ImageFormat.RGB24
        # audio track through the libavformat bridge, when present
        self._open_audio(path, required=False)

    @staticmethod
    def _container_has_video(path: str) -> bool:
        try:
            from tcforge_tpu.native import av
            pk = av.AvFilePackets(path)   # best VIDEO stream or raise
            pk.close()
            return True
        except Exception:
            return False

    def _open_audio(self, path: str, required: bool) -> None:
        self._aud = None
        try:
            from tcforge_tpu.native import av
            self._aud = av.AvFileAudio(path)
            self.audio_rate = self._aud.rate
            self.audio_channels = self._aud.channels
        except Exception as e:
            self._aud = None
            if required:
                raise ValueError(
                    f"ffmpeg: cannot open {path!r} (no decodable "
                    f"video or audio stream: {e})")

    def read_audio_batch(self, samples: int) -> Optional[np.ndarray]:
        if self._aud is None:
            return None
        chunks = []
        have = 0
        while have < samples:
            got = self._aud.read(samples - have)
            if got is None:
                break
            if len(got):
                chunks.append(got)
                have += len(got)
        if not chunks:
            return None
        return np.concatenate(chunks)

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        if self._vid is not None:
            ys, us, vs = [], [], []
            while len(ys) < n:
                got = self._vid.read()
                if got is None:
                    break
                ys.append(got[0])
                us.append(got[1])
                vs.append(got[2])
            if not ys:
                return None
            return {"y": np.stack(ys), "u": np.stack(us),
                    "v": np.stack(vs)}
        frames = []
        while len(frames) < n:
            ok, bgr = self._cap.read()
            if not ok:
                break
            frames.append(np.ascontiguousarray(bgr[:, :, ::-1]))
        if not frames:
            return None
        return {"rgb": np.stack(frames)}

    def seek(self, frame: int) -> bool:
        if self._vid is not None:
            return False               # engine decode-and-drop path
        import cv2
        return bool(self._cap.set(cv2.CAP_PROP_POS_FRAMES, frame))

    def close(self) -> None:
        if self._vid is not None:
            self._vid.close()
            self._vid = None
        if self._cap is not None:
            self._cap.release()
        if getattr(self, "_aud", None) is not None:
            self._aud.close()
            self._aud = None
