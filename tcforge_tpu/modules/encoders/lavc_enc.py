"""libavcodec video encoder module (encode_lavc.c analogue) through
the FFmpeg bridge: per-frame packets (B-frames disabled so payload ==
display frame, matching the engine's payload model)."""

from __future__ import annotations

from typing import List

import numpy as np

from tcforge_tpu.core.codecs import Codec
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (Encoder, ModuleInfo, ModuleKind,
                                          register)


@register
class LavcEncoder(Encoder):
    info = ModuleInfo(name="lavc", kind=ModuleKind.ENCODER,
                      media="video", codecs_in=(Codec.YUV420P,),
                      codecs_out=(Codec.XVID,))
    desc = ModuleDesc(
        name="lavc", comment="libavcodec video encoder (FFmpeg "
        "bridge; encode_lavc.c role)",
        params=[ParamSpec("codec", "codec name (mpeg4|mjpeg|"
                          "mpeg1video|mpeg2video|...)", "s", "mpeg4"),
                ParamSpec("bitrate", "bitrate kbps", "d", 0, 0,
                          100000),
                ParamSpec("gop", "GOP size", "d", 12, 1, 300)])

    def __init__(self, job, options: str = ""):
        # free-form codec options ride alongside the engine params
        # (encode_lavc.c parses the optstring against its lavc.cfg
        # table) — carve them out before the strict parse
        from tcforge_tpu.modules.encoders.encoder_cfg import \
            split_extra_options
        known, self.extra_opts = split_extra_options(
            self.desc, options)
        super().__init__(job, known)
        from tcforge_tpu.native import av
        if not av.available():
            raise NotImplementedError(
                "lavc: FFmpeg bridge not built (make -C native); "
                "MPEG-4 encode also works via '-y raw,...,lavf'")
        self._enc = None
        self._av = av

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        # lavc.cfg: the [codec] section carries lavc option names
        # verbatim (encode_lavc.c:1288 reads the section named after
        # the export codec); optstring keys override
        from tcforge_tpu.modules.encoders.encoder_cfg import \
            read_encoder_cfg
        codec = str(self.options["codec"])
        avopts = read_encoder_cfg("lavc.cfg", section=codec)
        avopts.update(self.extra_opts)
        # -V yuv422p sessions encode natively at 4:2:2 when the codec
        # side asks for it (pixel_format=yuv422p via the AVOptions
        # tier — cfg file OR optstring); any other combination
        # converts to 4:2:0 AND pins the context to yuv420p so the
        # codec's pixel format always matches the plane geometry fed
        # to it (a mismatch would over-read the chroma buffers)
        want_422 = (avopts.get("pixel_format") == "yuv422p"
                    and fb.format == ImageFormat.YUV422P)
        if not want_422 and avopts.get("pixel_format") == "yuv422p":
            from tcforge_tpu.core import log
            log.warn("lavc", "pixel_format=yuv422p ignored: the "
                     "session runs %s (use -V yuv422p)",
                     fb.format.value)
            avopts["pixel_format"] = "yuv420p"
        if fb.format != ImageFormat.YUV420P and not want_422:
            from tcforge_tpu.ops.colorspace import convert
            fb = convert(fb, ImageFormat.YUV420P)
        y = np.asarray(fb.y)
        u = np.asarray(fb.u)
        v = np.asarray(fb.v)
        if self._enc is None:
            kbps = int(self.options["bitrate"]) \
                or self.job.bitrate or 4000
            pass_n = self.job.divxmultipass \
                if self.job.divxmultipass in (1, 2) else 0
            self._enc = self._av.AvVideoEncoder(
                codec, fb.width, fb.height,
                self.job.out_fps or self.job.fps or 25.0,
                bitrate=kbps * 1000, gop=int(self.options["gop"]),
                pass_n=pass_n, stats_file=self.job.divxlogfile,
                opts=avopts)
        out: List[bytes] = []
        for i in range(fb.batch):
            for payload, _key in self._enc.encode(y[i], u[i], v[i]):
                out.append(payload)
        return out

    def flush(self) -> List[bytes]:
        if self._enc is None:
            return []
        tail = [p for p, _ in self._enc.flush()]
        self.last_flush_frames = len(tail)   # one frame per packet
        self._enc.close()        # flush the pass-1 stats log to disk
        self._enc = None
        return tail
