"""NuppelVideo import module (import_nuv analogue) + nuv encoder/muxer.

Video: raw YUV420 ('0'), RTjpeg ('1'), black ('N') and repeat-last
('L') frames; lzo-wrapped variants ('2'/'3') are reported unsupported
(no lzo in this environment).  Audio: raw PCM ('0').  The export side
(encoder "nuvrtj" + muxer "nuv") writes RTjpeg streams with the quant
tables in a leading 'D' frame, mirroring NuppelVideo's recorder.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from tcforge_tpu.core import log
from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.io import nuv
from tcforge_tpu.modules.registry import (Encoder, Importer, ModuleInfo,
                                          ModuleKind, Muxer, register)


@register
class NuvImporter(Importer):
    info = ModuleInfo(name="nuv", kind=ModuleKind.DEMULTIPLEXOR,
                      media="both", codecs_out=(Codec.YUV420P, Codec.PCM),
                      formats_in=(ContainerFormat.NUV,))
    desc = ModuleDesc(name="nuv",
                      comment="NuppelVideo import (RTjpeg/raw)")

    def open(self, path: Optional[str]) -> None:
        self._f = open(path, "rb")
        hdr = nuv.read_file_header(self._f)
        self.width, self.height = hdr.width, hdr.height
        self.fps = hdr.fps or 25.0
        self.format = ImageFormat.YUV420P
        self.audio_rate = 44100
        self.audio_channels = 2
        if hdr.videoblocks > 0:
            self.total_frames = hdr.videoblocks
        self._frames = nuv.iter_frames(self._f)
        self._dec = None
        self._last = None
        self._audio = bytearray()
        self._saw_audio = False

    def _black(self):
        h, w = self.height, self.width
        return (np.full((h, w), 16, np.uint8),
                np.full((h // 2, w // 2), 128, np.uint8),
                np.full((h // 2, w // 2), 128, np.uint8))

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        from tcforge_tpu.io.rtjpeg import RTjpegDecompressor
        ys, us, vs = [], [], []
        for ftype, ctype, _tc, payload in self._frames:
            if ftype == "D":
                if ctype == "R":
                    self._dec = RTjpegDecompressor(payload, self.width,
                                                   self.height)
                continue
            if ftype == "A":
                if ctype == "0":
                    self._audio += payload
                    self._saw_audio = True
                continue
            if ftype != "V":
                continue
            if ctype == "0":               # raw YUV420
                ysz = self.width * self.height
                csz = ysz // 4
                y = np.frombuffer(payload, np.uint8, ysz) \
                    .reshape(self.height, self.width)
                u = np.frombuffer(payload, np.uint8, csz, ysz) \
                    .reshape(self.height // 2, self.width // 2)
                v = np.frombuffer(payload, np.uint8, csz, ysz + csz) \
                    .reshape(self.height // 2, self.width // 2)
                self._last = (y, u, v)
            elif ctype == "1":             # RTjpeg
                if self._dec is None:
                    raise ValueError("nuv: RTjpeg frame before the "
                                     "compressor data ('D') frame")
                self._last = self._dec.decompress(payload)
            elif ctype == "N":             # black frame
                self._last = self._black()
            elif ctype == "L":             # repeat last
                if self._last is None:
                    self._last = self._black()
            elif ctype in ("2", "3"):
                raise NotImplementedError(
                    "nuv: lzo-compressed frames are not supported "
                    "(no lzo in this build)")
            else:
                log.warn("nuv", "unknown video comptype %r", ctype)
                continue
            y, u, v = self._last
            ys.append(y)
            us.append(u)
            vs.append(v)
            if len(ys) >= n:
                break
        if not ys:
            return None
        return {"y": np.stack(ys), "u": np.stack(us), "v": np.stack(vs)}

    def read_audio_batch(self, n_samples: int) -> Optional[np.ndarray]:
        if not self._saw_audio:
            return None
        want = n_samples * 2 * 2           # 16-bit stereo
        chunk = bytes(self._audio[:want])
        del self._audio[:len(chunk)]
        if not chunk:
            return None
        pcm = np.frombuffer(chunk, "<i2")
        return pcm.reshape(-1, 2)

    def close(self) -> None:
        self._f.close()


@register
class NuvRtjEncoder(Encoder):
    """RTjpeg video encoder (the NuppelVideo recorder's codec)."""

    info = ModuleInfo(name="nuvrtj", kind=ModuleKind.ENCODER,
                      media="video", codecs_in=(Codec.YUV420P,),
                      codecs_out=(Codec.NUV,))
    desc = ModuleDesc(
        name="nuvrtj", comment="RTjpeg encoder (NuppelVideo)",
        params=[ParamSpec("quality", "RTjpeg quality", "d", 255, 16,
                          255)])

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        self._enc = None

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        from tcforge_tpu.io.rtjpeg import RTjpegCompressor
        if fb.format != ImageFormat.YUV420P:
            raise ValueError("nuvrtj needs YUV420P input")
        if self._enc is None:
            self._enc = RTjpegCompressor(fb.width, fb.height,
                                         self.options["quality"])
            # TCModuleExtraData analogue: codec side data for the muxer
            self.job.extradata["rtjpeg_tables"] = self._enc.tables()
        y = np.asarray(fb.y)
        u = np.asarray(fb.u)
        v = np.asarray(fb.v)
        return [self._enc.compress(y[i], u[i], v[i])
                for i in range(fb.batch)]

    def tables(self) -> bytes:
        return self._enc.tables() if self._enc else b""


@register
class NuvMuxer(Muxer):
    info = ModuleInfo(name="nuv", kind=ModuleKind.MULTIPLEXOR,
                      media="both", codecs_in=(Codec.ANY,),
                      formats_out=(ContainerFormat.NUV,))
    desc = ModuleDesc(name="nuv", comment="NuppelVideo writer")

    def open(self, path: str) -> None:
        self._f = open(path, "w+b")
        hdr = nuv.NuvHeader(width=self.job.ex_v_width or
                            self.job.im_v_width,
                            height=self.job.ex_v_height or
                            self.job.im_v_height,
                            fps=self.job.out_fps or self.job.fps or 25.0)
        nuv.write_file_header(self._f, hdr)
        self._wrote_tables = False
        self._frames = 0
        self._fps = hdr.fps

    def write_video(self, payload: bytes, keyframe: bool = True) -> int:
        if not self._wrote_tables:
            # TCModuleExtraData analogue: quant tables from the encoder
            tables = self.job.extradata.get("rtjpeg_tables", b"")
            if tables:
                nuv.write_frame(self._f, "D", "R", tables)
            self._wrote_tables = True
        tc = int(self._frames * 1000 / max(1e-6, self._fps))
        nuv.write_frame(self._f, "V", "1", payload, timecode=tc)
        self._frames += 1
        return len(payload)

    def write_audio(self, payload: bytes, track: int = 0) -> int:
        tc = int(self._frames * 1000 / max(1e-6, self._fps))
        nuv.write_frame(self._f, "A", "0", payload, timecode=tc)
        return len(payload)

    def close(self) -> None:
        self._f.close()
