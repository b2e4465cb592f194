"""QuickTime/MOV import and export modules (import_mov.c analogue;
the reference's export went through libquicktime, here a native
writer).

Import decodes uncompressed and photo-JPEG video tracks plus classic
PCM audio.  Export: the ``mov`` muxer pairs with the ``movjpeg`` (PIL
photo-JPEG) or ``raw`` video encoder; PCM audio rides along as a
``sowt`` track.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.io import mov
from tcforge_tpu.modules.registry import (Encoder, Importer, ModuleInfo,
                                          ModuleKind, Muxer, register)


@register
class MovImporter(Importer):
    info = ModuleInfo(name="mov", kind=ModuleKind.DEMULTIPLEXOR,
                      media="both",
                      codecs_out=(Codec.RGB24, Codec.YUV420P, Codec.PCM),
                      formats_in=(ContainerFormat.MOV,))
    desc = ModuleDesc(name="mov", comment="QuickTime/MOV reader "
                      "(raw/yv12/2vuy/jpeg video, PCM audio)")

    def open(self, path: Optional[str]) -> None:
        self._r = mov.MovReader(path)
        v = self._r.video
        a = self._r.audio
        if v is not None:
            self.width, self.height = v.width, v.height
            self.fps = v.fps or self.job.fps or 25.0
            self._vlocs = v.sample_locations()
            self.total_frames = len(self._vlocs)
            fcc = v.fourcc.lower()
            self._ff = None
            if fcc in ("yv12", "y420", "2vuy", "yuv2"):
                self.format = ImageFormat.YUV420P
            elif fcc in mov.VIDEO_FOURCCS:
                self.format = ImageFormat.RGB24
            else:
                # compressed codec (avc1/mp4v/hvc1...): delegate the
                # video track to FFmpeg via OpenCV (import_ffmpeg role)
                from tcforge_tpu.modules.importers.ffmpeg_import \
                    import FfmpegImporter
                self._ff = FfmpegImporter(self.job)
                self._ff.open(path)
                self.format = ImageFormat.RGB24
            self._v = v
        else:
            self._vlocs = []
            self._v = None
        self._vpos = 0
        if a is not None:
            self.audio_rate = a.samplerate
            self.audio_channels = a.channels or 2
            self._alocs = a.sample_locations()
            self._a = a
        else:
            self._alocs = []
            self._a = None
        self._apos = 0
        self._abuf = np.zeros((0, self.audio_channels or 2), np.int16)

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        if self._v is None:
            return None
        if self._ff is not None:
            return self._ff.read_video_batch(n)
        planes: Dict[str, List[np.ndarray]] = {}
        while self._vpos < len(self._vlocs) and \
                len(next(iter(planes.values()), [])) < n:
            data = self._r.read_sample(self._vlocs[self._vpos])
            self._vpos += 1
            dec = mov.decode_video_sample(self._v.fourcc, data,
                                          self.width, self.height)
            for k, arr in dec.items():
                planes.setdefault(k, []).append(arr)
        if not planes:
            return None
        return {k: np.stack(v) for k, v in planes.items()}

    def read_audio_batch(self, n_samples: int) -> Optional[np.ndarray]:
        if self._a is None:
            return None
        chunks = [self._abuf]
        have = len(self._abuf)
        while have < n_samples and self._apos < len(self._alocs):
            data = self._r.read_sample(self._alocs[self._apos])
            self._apos += 1
            pcm = mov.decode_audio_bytes(self._a.fourcc, data,
                                         self._a.channels,
                                         self._a.bits)
            chunks.append(pcm)
            have += len(pcm)
        pcm = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
        if len(pcm) == 0:
            return None
        out, self._abuf = pcm[:n_samples], pcm[n_samples:]
        return out

    def close(self) -> None:
        if getattr(self, "_ff", None) is not None:
            self._ff.close()
        self._r.close()


@register
class MovJpegEncoder(Encoder):
    """Photo-JPEG video encoder for the mov muxer (what the
    reference's mov path produced via libquicktime's jpeg codec)."""

    info = ModuleInfo(name="movjpeg", kind=ModuleKind.ENCODER,
                      media="video",
                      codecs_in=(Codec.RGB24, Codec.YUV420P),
                      codecs_out=(Codec.JPEG,))
    desc = ModuleDesc(
        name="movjpeg", comment="photo-JPEG encoder",
        params=[ParamSpec("quality", "JPEG quality", "d", 90, 10, 100)])

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        import io as _io
        from PIL import Image
        from tcforge_tpu.ops.colorspace import convert
        if fb.format != ImageFormat.RGB24:
            fb = convert(fb, ImageFormat.RGB24)
        rgb = np.asarray(fb.rgb)
        out = []
        q = self.options["quality"]
        for i in range(fb.batch):
            buf = _io.BytesIO()
            Image.fromarray(rgb[i]).save(buf, "JPEG", quality=q)
            out.append(buf.getvalue())
        return out


@register
class MovMuxer(Muxer):
    info = ModuleInfo(name="mov", kind=ModuleKind.MULTIPLEXOR,
                      media="both", codecs_in=(Codec.ANY,),
                      formats_out=(ContainerFormat.MOV,))
    desc = ModuleDesc(name="mov", comment="QuickTime/MOV writer")

    def open(self, path: str) -> None:
        w = self.job.ex_v_width or self.job.im_v_width
        h = self.job.ex_v_height or self.job.im_v_height
        enc = self.job.ex_v_module
        if enc == "movjpeg":
            fourcc = "jpeg"
        elif self.job.im_colorspace == ImageFormat.RGB24:
            fourcc = "raw "
        else:
            fourcc = "yv12"
        self._fourcc = fourcc
        self._w = mov.MovWriter(
            path, w, h, self.job.out_fps or self.job.fps or 25.0,
            fourcc=fourcc, audio_rate=self.job.a_rate,
            audio_channels=self.job.a_chan)

    def write_video(self, payload: bytes, keyframe: bool = True) -> int:
        if self._fourcc == "yv12":
            # raw encoder emits packed planar I420; reorder to yv12
            w, h = self._w.width, self._w.height
            ysz, csz = w * h, (w * h) // 4
            payload = (payload[:ysz] + payload[ysz + csz:ysz + 2 * csz]
                       + payload[ysz:ysz + csz])
        self._w.write_video_sample(payload)
        return len(payload)

    def write_audio(self, payload: bytes, track: int = 0) -> int:
        pcm = np.frombuffer(payload, "<i2")
        ch = max(1, self.job.a_chan)
        self._w.write_audio(pcm.reshape(-1, ch))
        return len(payload)

    def close(self) -> None:
        self._w.close()
