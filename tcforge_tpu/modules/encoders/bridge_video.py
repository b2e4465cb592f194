"""Bridge-backed video encoders under their reference module names
(encode_x264.c, encode_xvid.c, encode_theora.c, encode_dv.c
analogues).

The reference linked libx264/libxvidcore/libtheora/libdv directly;
this build reaches the same codecs through the system libavcodec
(native/tcforge_av.cpp — the libtcext role), which bundles them.
Packets are per-display-frame (B-frames disabled) so they slot into
the engine's payload model like every other encoder.  When the bridge
library is missing the modules degrade to the old precise gate
messages.
"""

from __future__ import annotations

from typing import List

import numpy as np

from tcforge_tpu.core.codecs import Codec
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (Encoder, ModuleInfo, ModuleKind,
                                          register)


class _BridgeVideoEncoder(Encoder):
    """Shared bridge plumbing; subclasses pin the codec."""

    codec_name = ""                   # libavcodec encoder name
    global_header = False             # xiph codecs: headers in extradata
    extradata_key = ""                # job.extradata slot for headers
    gate_message = ""
    config_file = ""                  # x264.cfg / xvid.cfg tier

    def __init__(self, job, options: str = ""):
        # reference encoders accept every cfg-table option in the
        # module option string too (encode_x264.c:1047) — carve the
        # free-form codec options out before the strict param parse
        from tcforge_tpu.modules.encoders.encoder_cfg import \
            split_extra_options
        known, self.extra_opts = split_extra_options(
            self.desc, options)
        super().__init__(job, known)
        from tcforge_tpu.native import av
        if not av.available():
            raise NotImplementedError(
                f"{self.info.name}: {self.gate_message}")
        self._av = av
        self._enc = None

    def _translate_avopts(self, raw) -> dict:
        """cfg/optstring keys → libavcodec AVOptions (identity by
        default; x264/xvid override)."""
        return dict(raw)

    def _avopts(self) -> dict:
        """Merged AVOptions: cfg file first, then module optstring
        overrides (the reference's read-file-then-reparse order)."""
        from tcforge_tpu.modules.encoders.encoder_cfg import \
            read_encoder_cfg
        raw = {}
        if self.config_file:
            raw.update(read_encoder_cfg(self.config_file))
        raw.update(self.extra_opts)
        return self._translate_avopts(raw)

    def _open(self, fb: FrameBatch) -> None:
        kbps = int(self.options.get("bitrate", 0)) \
            or self.job.bitrate or 4000
        # container-aware header placement: lavf containers (mp4/mkv)
        # want SPS/PPS in extradata (global_header); self-contained
        # streams (AVI, raw ES) want them in-band
        gh = self.global_header or (
            self.codec_name == "libx264"
            and self.job.ex_m_module == "lavf")
        # -R multipass (encode_x264.c cfg pass handling): pass 1
        # writes the rate-control log, pass 2 reads it back; pass 3
        # (constant quant) has no stats file
        pass_n = self.job.divxmultipass \
            if self.job.divxmultipass in (1, 2) else 0
        self._enc = self._av.AvVideoEncoder(
            self.codec_name, fb.width, fb.height,
            self.job.out_fps or self.job.fps or 25.0,
            bitrate=kbps * 1000,
            gop=int(self.options.get("keyint", 0)
                    or self.options.get("gop", 0) or 250),
            global_header=gh, pass_n=pass_n,
            stats_file=self.job.divxlogfile,
            opts=self._avopts())
        if not hasattr(self.job, "extradata"):
            self.job.extradata = {}
        if gh:
            self.job.extradata["video_extradata"] = \
                self._enc.extradata
        if self.extradata_key:
            pkts = self._av.split_xiph_extradata(self._enc.extradata)
            if pkts:
                from tcforge_tpu.modules.encoders.vorbis_enc import \
                    pack_header_packets
                self.job.extradata[self.extradata_key] = \
                    pack_header_packets(pkts)

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        if fb.format != ImageFormat.YUV420P:
            from tcforge_tpu.ops.colorspace import convert
            fb = convert(fb, ImageFormat.YUV420P)
        y, u, v = np.asarray(fb.y), np.asarray(fb.u), np.asarray(fb.v)
        if self._enc is None:
            self._open(fb)
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
        # free now so the pass-1 stats log is flushed+closed before a
        # same-process pass 2 reads it
        self._enc.close()
        self._enc = None
        return tail


@register
class X264Encoder(_BridgeVideoEncoder):
    """H.264 via libx264 (encode_x264.c role) — Annex-B elementary
    stream packets (raw ES, AVI 'H264', OGM)."""
    info = ModuleInfo(name="x264", kind=ModuleKind.ENCODER,
                      media="video", codecs_in=(Codec.YUV420P,),
                      codecs_out=(Codec.H264,))
    desc = ModuleDesc(
        name="x264", comment="H.264 encoder (libx264 via the FFmpeg "
        "bridge)",
        params=[ParamSpec("bitrate", "bitrate kbps", "d", 0, 0, 100000),
                ParamSpec("keyint", "max GOP size", "d", 250, 1, 1000)])
    codec_name = "libx264"
    config_file = "x264.cfg"
    gate_message = ("FFmpeg bridge not built (make -C native); "
                    "libx264 rides libavcodec here")

    def _translate_avopts(self, raw) -> dict:
        from tcforge_tpu.modules.encoders.encoder_cfg import \
            x264_avopts
        return x264_avopts(raw)


@register
class XvidEncoder(_BridgeVideoEncoder):
    """MPEG-4 ASP via libxvidcore (encode_xvid.c role).

    Falls back to the in-tree Simple Profile encoder
    (io/mpeg4enc.py) when the bridge is absent;
    TCFORGE_NATIVE_MPEG4ENC=1 forces it."""
    info = ModuleInfo(name="xvid", kind=ModuleKind.ENCODER,
                      media="video", codecs_in=(Codec.YUV420P,),
                      codecs_out=(Codec.XVID,))
    desc = ModuleDesc(
        name="xvid", comment="MPEG-4 encoder (libxvidcore via the "
        "FFmpeg bridge, or the in-tree SP encoder)",
        params=[ParamSpec("bitrate", "bitrate kbps", "d", 0, 0, 100000),
                ParamSpec("keyint", "max GOP size", "d", 250, 1, 1000),
                ParamSpec("quant", "native-encoder quantizer 1..31",
                          "d", 5, 1, 31),
                ParamSpec("bframes", "native-encoder consecutive "
                          "B-VOPs 0..7", "d", 0, 0, 7),
                ParamSpec("four_mv", "native-encoder per-block "
                          "motion vectors", "d", 0, 0, 1)])
    codec_name = "libxvid"
    config_file = "xvid.cfg"
    gate_message = ("FFmpeg bridge not built (make -C native); "
                    "alternatively '-y raw,...,lavf -F XVID'")

    def __init__(self, job, options: str = ""):
        import os
        self._native = None
        forced = os.environ.get("TCFORGE_NATIVE_MPEG4ENC") == "1"
        if not forced:
            try:
                super().__init__(job, options)
                return
            except NotImplementedError:
                pass                      # bridge absent: go native
        from tcforge_tpu.modules.encoders.encoder_cfg import \
            split_extra_options
        known, self.extra_opts = split_extra_options(self.desc, options)
        Encoder.__init__(self, job, known)
        # the parsed options dict fills defaults in; explicitness is
        # only visible in the raw optstring
        from tcforge_tpu.core.optstr import parse_optstr
        self._given = set(parse_optstr(options))
        self._native = True
        self._enc = None

    def _translate_avopts(self, raw) -> dict:
        from tcforge_tpu.modules.encoders.encoder_cfg import \
            xvid_avopts
        return xvid_avopts(raw)

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        if not self._native:
            return super().encode_video(fb)
        if fb.format != ImageFormat.YUV420P:
            from tcforge_tpu.ops.colorspace import convert
            fb = convert(fb, ImageFormat.YUV420P)
        if self._enc is None:
            from tcforge_tpu.io.mpeg4enc import Mpeg4NativeEncoder
            self._enc = Mpeg4NativeEncoder(
                fb.width, fb.height,
                fps=float(self.job.out_fps or self.job.fps or 25.0),
                qscale=int(self.options.get("quant", 5)),
                gop=int(self.options.get("keyint", 0) or 250),
                bframes=int(self.options.get("bframes", 0)),
                four_mv=bool(int(self.options.get("four_mv", 0))),
                # an EXPLICIT quant= means constant quality: only an
                # explicit bitrate= (or -w with no quant) engages RC
                # — job.bitrate defaults to 1800, which used to
                # silently override quant= into rate control
                bitrate_kbps=int(self.options.get("bitrate", 0))
                or (0 if "quant" in self._given
                    else int(self.job.bitrate or 0)))
        y, u, v = np.asarray(fb.y), np.asarray(fb.u), np.asarray(fb.v)
        out = []
        for i in range(fb.batch):
            out.extend(c for c, _ in self._enc.push(y[i], u[i], v[i]))
        return out

    def flush(self) -> List[bytes]:
        if self._native:
            if self._enc is not None:
                tail = [c for c, _ in self._enc.flush()]
                self.last_flush_frames = len(tail)
                return tail
            return []
        return super().flush()


@register
class TheoraEncoder(_BridgeVideoEncoder):
    """Theora via libtheora (encode_theora.c role).  Leaves the three
    xiph header packets in job.extradata['theora_headers'] for the ogg
    muxer's native theora logical stream.

    Falls back to the in-tree encoder (io/theoraenc.py) when the
    bridge is absent; TCFORGE_NATIVE_THEORAENC=1 forces it."""
    info = ModuleInfo(name="theora", kind=ModuleKind.ENCODER,
                      media="video", codecs_in=(Codec.YUV420P,),
                      codecs_out=(Codec.THEORA,))
    desc = ModuleDesc(
        name="theora", comment="Theora encoder (libtheora via the "
        "FFmpeg bridge, or the in-tree encoder)",
        params=[ParamSpec("bitrate", "bitrate kbps", "d", 0, 0, 100000),
                ParamSpec("keyint", "max GOP size", "d", 64, 1, 1000),
                ParamSpec("qi", "native-encoder quality 0..63",
                          "d", 45, 0, 63)])
    codec_name = "libtheora"
    global_header = True
    extradata_key = "theora_headers"
    gate_message = ("FFmpeg bridge not built (make -C native); "
                    "libtheora rides libavcodec here")

    def __init__(self, job, options: str = ""):
        import os
        self._native = None
        forced = os.environ.get("TCFORGE_NATIVE_THEORAENC") == "1"
        if not forced:
            try:
                super().__init__(job, options)
                return
            except NotImplementedError:
                pass                      # bridge absent: go native
        from tcforge_tpu.modules.encoders.encoder_cfg import \
            split_extra_options
        known, self.extra_opts = split_extra_options(self.desc, options)
        Encoder.__init__(self, job, known)
        self._native = True
        self._enc = None

    def _fps_rational(self) -> tuple:
        fps = float(self.job.out_fps or self.job.fps or 25.0)
        for num, den in ((24000, 1001), (30000, 1001), (60000, 1001)):
            if abs(fps - num / den) < 1e-3:
                return num, den
        if abs(fps - round(fps)) < 1e-6:
            return int(round(fps)), 1
        return int(round(fps * 1000)), 1000

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        if not self._native:
            return super().encode_video(fb)
        if fb.format != ImageFormat.YUV420P:
            from tcforge_tpu.ops.colorspace import convert
            fb = convert(fb, ImageFormat.YUV420P)
        if self._enc is None:
            from tcforge_tpu.io.theoraenc import TheoraNativeEncoder
            self._enc = TheoraNativeEncoder(
                fb.width, fb.height, fps=self._fps_rational(),
                qi=int(self.options.get("qi", 45)),
                gop=int(self.options.get("keyint", 0) or 64))
            if not hasattr(self.job, "extradata"):
                self.job.extradata = {}
            from tcforge_tpu.modules.encoders.vorbis_enc import \
                pack_header_packets
            self.job.extradata["theora_headers"] = \
                pack_header_packets(self._enc.headers)
        y, u, v = np.asarray(fb.y), np.asarray(fb.u), np.asarray(fb.v)
        return [self._enc.encode(y[i], u[i], v[i])[0]
                for i in range(fb.batch)]

    def flush(self) -> List[bytes]:
        if self._native:
            return []
        return super().flush()


@register
class DvVideoEncoder(_BridgeVideoEncoder):
    """DV via libavcodec's dvvideo encoder (encode_dv.c role).
    Geometry must be a DV system size (720x576 PAL 4:2:0 /
    720x480 NTSC 4:1:1 — session chroma converts at the module
    boundary).  Both systems fall back to the in-tree DV25 encoder
    (io/dvenc.py) when the bridge is absent;
    TCFORGE_NATIVE_DVENC=1 forces it."""
    info = ModuleInfo(name="dv", kind=ModuleKind.ENCODER,
                      media="video", codecs_in=(Codec.YUV420P,),
                      codecs_out=(Codec.DV,))
    desc = ModuleDesc(
        name="dv", comment="DV video encoder (libavcodec dvvideo via "
        "the FFmpeg bridge, or the in-tree DV25 encoder)",
        params=[ParamSpec("bitrate", "ignored (DV is CBR)", "d", 0, 0,
                          100000)])
    codec_name = "dvvideo"
    gate_message = "FFmpeg bridge not built (make -C native)"

    @staticmethod
    def _chroma_420_to_411(c: np.ndarray) -> np.ndarray:
        """(h/2, w/2) 4:2:0 chroma -> (h, w/4) 4:1:1: average
        horizontal pairs, repeat rows (the libdv-style resite the
        reference's encode_dv.c relied on libdv for)."""
        pairs = ((c[:, 0::2].astype(np.int32)
                  + c[:, 1::2] + 1) >> 1).astype(np.uint8)
        return np.repeat(pairs, 2, axis=0)

    def __init__(self, job, options: str = ""):
        import os
        self._native = None
        forced = os.environ.get("TCFORGE_NATIVE_DVENC") == "1"
        if not forced:
            try:
                super().__init__(job, options)
                return
            except NotImplementedError:
                pass
        from tcforge_tpu.modules.encoders.encoder_cfg import \
            split_extra_options
        known, self.extra_opts = split_extra_options(self.desc, options)
        Encoder.__init__(self, job, known)
        self._native = True
        self._enc = None

    def _open(self, fb: FrameBatch) -> None:
        if (fb.width, fb.height) not in ((720, 576), (720, 480)):
            raise ValueError(
                "dv: DV requires 720x576 (PAL) or 720x480 (NTSC) — "
                f"got {fb.width}x{fb.height}; add -Z 720x576")
        if fb.height == 480:
            # NTSC DV is 4:1:1: the lavc dvvideo encoder refuses
            # yuv420p at 525/60, so open the context at yuv411p and
            # convert chroma at the feed
            self.extra_opts = dict(self.extra_opts,
                                   pixel_format="yuv411p")
        super()._open(fb)

    def encode_video(self, fb: FrameBatch) -> List[bytes]:
        ntsc = fb.height == 480
        if not self._native and not ntsc:
            return super().encode_video(fb)
        if fb.format != ImageFormat.YUV420P:
            from tcforge_tpu.ops.colorspace import convert
            fb = convert(fb, ImageFormat.YUV420P)
        y, u, v = np.asarray(fb.y), np.asarray(fb.u), np.asarray(fb.v)
        if not self._native:
            # bridge NTSC: 4:1:1 planes into the yuv411p context
            if self._enc is None:
                self._open(fb)
            out: List[bytes] = []
            for i in range(fb.batch):
                out.extend(p for p, _ in self._enc.encode(
                    y[i], self._chroma_420_to_411(u[i]),
                    self._chroma_420_to_411(v[i])))
            return out
        if self._enc is None:
            from tcforge_tpu.io.dvenc import DVEncoder
            self._enc = DVEncoder()
        if ntsc:
            return [self._enc.encode(
                y[i], self._chroma_420_to_411(u[i]),
                self._chroma_420_to_411(v[i]))
                for i in range(fb.batch)]
        return [self._enc.encode(y[i], u[i], v[i])
                for i in range(fb.batch)]

    def flush(self) -> List[bytes]:
        if self._native:
            return []
        return super().flush()
