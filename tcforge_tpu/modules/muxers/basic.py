"""Y4M / AVI / WAV / raw / null multiplexors
(multiplex_{y4m,avi,wav,raw,null}.c analogues)."""

from __future__ import annotations

from fractions import Fraction
from typing import Optional

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (ModuleInfo, ModuleKind, Muxer,
                                          register)


def _fps_to_ratio(fps: float):
    """Best rational fps for container headers (frc table first)."""
    from tcforge_tpu.core import ratiocodes
    code = ratiocodes.frc_code_from_value(fps)
    if code is not None:
        return ratiocodes.frc_code_to_ratio(code)
    frac = Fraction(fps).limit_denominator(65535)
    return frac.numerator, frac.denominator


@register
class Y4MMuxer(Muxer):
    info = ModuleInfo(name="y4m", kind=ModuleKind.MULTIPLEXOR, media="video",
                      codecs_in=(Codec.YUV420P, Codec.YUV422P, Codec.RAW),
                      formats_out=(ContainerFormat.YUV4MPEG,))
    desc = ModuleDesc(name="y4m", comment="YUV4MPEG2 stream writer")

    def open(self, path: str) -> None:
        from tcforge_tpu.io.y4m import Y4MHeader, Y4MWriter
        w, h = ((self.job.ex_v_width, self.job.ex_v_height)
                if self.job.ex_v_width else self.job.export_size())
        num, den = _fps_to_ratio(self.job.out_fps)
        fmt = self.job.im_colorspace
        # Y4M is YUV-only: RGB sessions (-V rgb24) convert at the
        # muxer boundary (the reference's export-side csp negotiation)
        self._rgb_in = fmt.is_rgb
        self._size = (w, h)
        if not fmt.is_planar or fmt.is_rgb:
            fmt = ImageFormat.YUV420P
        self._w = Y4MWriter(path, Y4MHeader(
            width=w, height=h, fps_num=num, fps_den=den, format=fmt))

    def write_video(self, payload: bytes, keyframe: bool = True) -> int:
        if self._rgb_in:
            import numpy as np
            from tcforge_tpu.core.formats import ImageFormat
            from tcforge_tpu.core.frame import FrameBatch
            from tcforge_tpu.ops import colorspace
            w, h = self._size
            rgb = np.frombuffer(payload, np.uint8).reshape(h, w, 3)
            fb = FrameBatch.from_numpy(rgb=rgb[None],
                                       fmt=self.job.im_colorspace)
            out = colorspace.convert(fb, ImageFormat.YUV420P)
            payload = (np.asarray(out.y[0]).tobytes()
                       + np.asarray(out.u[0]).tobytes()
                       + np.asarray(out.v[0]).tobytes())
        # payload is a packed planar frame; write through raw framing
        self._w._f.write(b"FRAME\n")
        self._w._f.write(payload)
        self._w.frames_written += 1
        return len(payload)

    def close(self) -> None:
        self._w.close()


@register
class AviMuxer(Muxer):
    info = ModuleInfo(name="avi", kind=ModuleKind.MULTIPLEXOR, media="both",
                      codecs_in=(Codec.ANY,),
                      formats_out=(ContainerFormat.AVI,))
    desc = ModuleDesc(name="avi", comment="AVI container writer (avilib)",
                      params=[ParamSpec("fourcc", "video fourcc", "s", "")])

    _FMT_FOURCC = {
        ImageFormat.YUV420P: "I420", ImageFormat.YV12: "YV12",
        ImageFormat.YUY2: "YUY2", ImageFormat.UYVY: "UYVY",
        ImageFormat.RGB24: "RGB ", ImageFormat.BGR24: "DIB ",
    }

    def open(self, path: str) -> None:
        from tcforge_tpu.io.avi import (AviAudioStream, AviVideoStream,
                                        AviWriter)
        w, h = ((self.job.ex_v_width, self.job.ex_v_height)
                if self.job.ex_v_width else self.job.export_size())
        # -F doubles as fourcc (short, no '=') or encoder option string
        job_fcc = self.job.ex_v_fcc or ""
        if "=" in job_fcc or len(job_fcc) > 4:
            job_fcc = ""
        # compressed video encoders imply their fourcc (players route
        # the stream by strf biCompression, like the wFormatTag below)
        enc_fcc = {"x264": "H264", "xvid": "XVID", "mpeg2": "mpg2",
                   "dv": "dvsd", "movjpeg": "MJPG",
                   "theora": "theo"}.get(self.job.ex_v_module or "", "")
        fourcc = (self.options.get("fourcc") or job_fcc or enc_fcc
                  or self._FMT_FOURCC.get(self.job.im_colorspace, "I420"))
        video = AviVideoStream(fourcc=fourcc.strip(), width=w, height=h,
                               fps=self.job.out_fps)
        tracks = []
        if self.job.audio_out_file is None and self.job.a_rate:
            # compressed audio encoders stamp their wFormatTag so
            # players route the track to the right codec
            tag = {"lame": 0x55, "mp3": 0x55, "mp2enc": 0x50,
                   "toolame": 0x50, "faac": 0xFF}.get(
                self.job.ex_a_module, 1)
            byte_rate = 0
            if tag != 1:
                import struct as _s
                blob = self.job.extradata.get("audio_byte_rate")
                byte_rate = _s.unpack("<I", blob)[0] if blob \
                    else 16000
            tracks.append(AviAudioStream(
                format_tag=tag, byte_rate=byte_rate,
                rate=(self.job.mp3frequency or self.job.a_rate),
                channels=self.job.dm_chan, bits=self.job.dm_bits))
        comments = None
        cf = getattr(self.job, "avi_comments_file", None)
        if cf:
            # reference format: one "TAG text" per line (avimerge -c)
            comments = {}
            with open(cf) as f:
                for line in f:
                    line = line.strip()
                    if line and not line.startswith("#"):
                        tag, _, text = line.partition(" ")
                        comments[tag[:4]] = text.strip()
        self._w = AviWriter(path, video, tracks, comments=comments)

    def write_video(self, payload: bytes, keyframe: bool = True) -> int:
        self._w.write_video_frame(payload, keyframe)
        return len(payload)

    def write_audio(self, payload: bytes, track: int = 0) -> int:
        self._w.write_audio(payload, track)
        return len(payload)

    def close(self) -> None:
        self._w.close()


@register
class WavMuxer(Muxer):
    info = ModuleInfo(name="wav", kind=ModuleKind.MULTIPLEXOR, media="audio",
                      codecs_in=(Codec.PCM,),
                      formats_out=(ContainerFormat.WAV,))
    desc = ModuleDesc(name="wav", comment="RIFF/WAVE PCM writer")

    def open(self, path: str) -> None:
        from tcforge_tpu.io.wav import WavInfo, WavWriter
        self._w = WavWriter(path, WavInfo(
            rate=(self.job.mp3frequency or self.job.a_rate),
            channels=self.job.dm_chan, bits=self.job.dm_bits))

    def write_video(self, payload: bytes, keyframe: bool = True) -> int:
        raise NotImplementedError("wav mux is audio-only")

    def write_audio(self, payload: bytes, track: int = 0) -> int:
        import numpy as np
        a = np.frombuffer(payload, np.int16).reshape(
            -1, max(1, self.job.dm_chan))
        self._w.write_samples(a)
        return len(payload)

    def close(self) -> None:
        self._w.close()


@register
class RawMuxer(Muxer):
    info = ModuleInfo(name="raw", kind=ModuleKind.MULTIPLEXOR, media="both",
                      codecs_in=(Codec.ANY,),
                      formats_out=(ContainerFormat.RAW,))
    desc = ModuleDesc(name="raw", comment="headerless stream writer")

    def open(self, path: str) -> None:
        self._path = path
        self._f = open(path, "wb")
        self._fa = None
        # audio-only session: the payload stream IS the output file
        job = self.job
        self._audio_to_main = not (job.ex_v_width or job.im_v_width)

    def write_video(self, payload: bytes, keyframe: bool = True) -> int:
        self._f.write(payload)
        return len(payload)

    def write_audio(self, payload: bytes, track: int = 0) -> int:
        # audio goes to a sibling <name>.aud stream, never interleaved
        # into the raw video file (multiplex_raw.c:49,95-124 — the
        # reference opens a second fd with the RAW_AUD_EXT suffix);
        # audio-only sessions write the main file directly
        if self._audio_to_main:
            self._f.write(payload)
            return len(payload)
        if self._fa is None:
            self._fa = open(self._path + ".aud", "wb")
        self._fa.write(payload)
        return len(payload)

    def close(self) -> None:
        self._f.close()
        if self._fa is not None:
            self._fa.close()


@register
class NullMuxer(Muxer):
    info = ModuleInfo(name="null", kind=ModuleKind.MULTIPLEXOR, media="both",
                      codecs_in=(Codec.ANY,), formats_out=())
    desc = ModuleDesc(name="null", comment="discard output (multiplex_null)")

    def open(self, path: str) -> None:
        self.bytes_written = 0

    def write_video(self, payload: bytes, keyframe: bool = True) -> int:
        self.bytes_written += len(payload)
        return len(payload)

    def write_audio(self, payload: bytes, track: int = 0) -> int:
        self.bytes_written += len(payload)
        return len(payload)


@register
class LavfMuxer(Muxer):
    """multiplex_lavf.c analogue, two tiers:

    1. NATIVE (libavformat via the FFmpeg bridge): when the session's
       video encoder produces a known coded stream (x264/xvid/theora/
       dv/mpeg2/movjpeg/lavc), packets are muxed straight into the
       container the filename implies — .mp4/.mkv/.ts/.mov/.avi —
       with mp3/mp2/ac3/aac audio tracks alongside.
    2. cv2 fallback (raw frames in): with ``-y raw,...,lavf`` the
       payloads are raw frames; OpenCV's VideoWriter encodes them
       with the -F fourcc (mp4v/XVID/MJPG/FFV1/VP80/VP90)."""

    info = ModuleInfo(name="lavf", kind=ModuleKind.MULTIPLEXOR,
                      media="both", codecs_in=(Codec.ANY,),
                      formats_out=(ContainerFormat.AVI,))
    desc = ModuleDesc(
        name="lavf", comment="FFmpeg container muxer (native "
        "libavformat for coded streams; OpenCV encode for raw)",
        params=[ParamSpec("codec", "cv2 fallback fourcc (mp4v|XVID|"
                          "DIVX|MJPG|FFV1|VP80|VP90)", "s", "mp4v"),
                ParamSpec("format", "libavformat name override "
                          "(else from the filename)", "s", "")])

    # session video-encoder module -> libavcodec codec id name
    _V_CODEC = {"x264": "h264", "xvid": "mpeg4", "theora": "theora",
                "dv": "dvvideo", "mpeg2": "mpeg2video",
                "movjpeg": "mjpeg"}
    # audio encoder module -> (codec name, samples per packet)
    _A_CODEC = {"lame": ("mp3", 1152), "mp2enc": ("mp2", 1152),
                "toolame": ("mp2", 1152), "ac3enc": ("ac3", 1536),
                "faac": ("aac", 1024), "flac": ("flac", 4608)}

    def _try_native(self, path: str) -> bool:
        job = self.job
        vmod = job.ex_v_module or ""
        vcodec = self._V_CODEC.get(vmod)
        if vcodec is None and vmod == "lavc":
            vcodec = str(job.ex_v_fcc or "mpeg4").split("=")[0]
        session_audio_only = getattr(job, "audio_only_session",
                                     False)
        amod = job.ex_a_module or ""
        acodec_known = (amod in self._A_CODEC
                        or (session_audio_only
                            and amod in ("", "raw", "null", "wav")))
        # NB: "copy" is NOT in the allowlist — a copy/passthrough
        # video module emits non-empty payloads, and opening the
        # audio-only mux would write a header then die in
        # write_video mid-run (truly video-less copy sessions set
        # audio_only_session and take the first arm).
        audio_only = ((vcodec is None or session_audio_only)
                      and (session_audio_only
                           or vmod in ("", "null"))
                      and acodec_known and job.a_rate
                      and job.audio_out_file is None)
        if vcodec is None and not audio_only:
            return False
        from tcforge_tpu.native import av
        if not av.available():
            return False
        w = job.ex_v_width or job.im_v_width
        h = job.ex_v_height or job.im_v_height
        fps = job.out_fps or job.fps or 25.0
        xd = b""
        hdrs_key = {"theora": "theora_headers"}.get(vcodec)
        if hdrs_key and hdrs_key in getattr(job, "extradata", {}):
            from tcforge_tpu.modules.encoders.vorbis_enc import \
                unpack_header_packets
            xd = av.xiph_extradata(
                unpack_header_packets(job.extradata[hdrs_key]))
        elif "video_extradata" in getattr(job, "extradata", {}):
            xd = job.extradata["video_extradata"]
        try:
            self._mux = av.AvMuxer(path,
                                   str(self.options.get("format", "")))
            self._vi = (self._mux.add_video(vcodec, w, h, fps, xd)
                        if not audio_only else -1)
            self._ai = -1
            acodec = self._A_CODEC.get(job.ex_a_module or "")
            if acodec is None and audio_only:
                # audio-only session with raw PCM payloads: mux as
                # pcm_s16le; per-write duration derives from size
                acodec = ("pcm_s16le", 0)
            if acodec and job.audio_out_file is None and job.a_rate:
                name, spp = acodec
                # frame size is rate-dependent for some codecs
                # (flac: 4608 at 44.1/48k but 2304/1152/576 lower) —
                # the encoder module stashes the real value
                import struct as _s
                fs_blob = getattr(job, "extradata", {}).get(
                    "audio_frame_size")
                if fs_blob:
                    spp = _s.unpack("<I", fs_blob)[0] or spp
                rate = job.mp3frequency or job.a_rate
                axd = getattr(job, "extradata", {}).get(
                    "audio_extradata", b"")
                self._ai = self._mux.add_audio(name, rate,
                                               job.dm_chan or 2, axd)
                self._aspp = spp
                self._apcm_ch = job.dm_chan or 2
            self._mux.write_header()
        except (ValueError, NotImplementedError):
            # half-built muxer must not capture later writes
            if self._mux is not None:
                try:
                    self._mux.close()
                except Exception:
                    pass
                self._mux = None
            return False
        self._vpts = 0
        self._apts = 0
        return True

    def open(self, path: str) -> None:
        self._mux = None
        self._flacf = None
        if self._try_native(path):
            return
        job = self.job
        if path.lower().endswith(".flac") \
                and (job.ex_a_module or "") == "flac" \
                and job.a_rate and job.audio_out_file is None:
            # bare-FLAC tier (no bridge needed): the container IS
            # fLaC + STREAMINFO + frames — pairs with the native
            # io/flac.py encoder fallback
            xd = getattr(job, "extradata", {}).get(
                "audio_extradata", b"")
            if not xd:
                from tcforge_tpu.io.flac import FlacEncoder
                xd = FlacEncoder(job.mp3frequency or job.a_rate,
                                 job.dm_chan or 2).streaminfo()
            self._flacf = open(path, "wb")
            self._flacf.write(b"fLaC" + bytes([0x80])
                              + len(xd).to_bytes(3, "big") + xd)
            return
        try:
            import cv2
        except ImportError:
            raise NotImplementedError(
                "lavf: OpenCV (cv2) not available in this build; use "
                "the native muxers (avi/y4m/ogg/mov/mpg/raw)")
        job = self.job
        w = job.ex_v_width or job.im_v_width
        h = job.ex_v_height or job.im_v_height
        if not (w and h):
            raise ValueError(
                "lavf: no video geometry — for an audio-only output "
                "use a codec the native muxer carries (flac/mp3/mp2/"
                "ac3/aac) and keep the audio on this output "
                "(no -m)")
        fcc = job.ex_v_fcc or ""
        if "=" in fcc or len(fcc) != 4:
            fcc = str(self.options["codec"])
        self._cv2 = cv2
        self._size = (w, h)
        self._fmt = job.im_colorspace
        self._w = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*fcc),
            job.out_fps or job.fps or 25.0, (w, h))
        if not self._w.isOpened():
            raise ValueError(
                f"lavf: FFmpeg refused fourcc {fcc!r} for {path!r} "
                "(try mp4v/XVID/MJPG/FFV1 and an .avi/.mp4 name)")

    def write_video(self, payload: bytes, keyframe: bool = True) -> int:
        if getattr(self, "_flacf", None) is not None:
            if payload:
                raise ValueError(
                    "lavf: video payload in a bare-FLAC output "
                    "(drop the video encoder)")
            return 0
        if self._mux is not None:
            if self._vi < 0:           # audio-only native mux
                if payload:
                    raise ValueError(
                        "lavf: video payload in an audio-only "
                        "container (drop the video encoder or give "
                        "the output a video track)")
                return 0
            self._mux.write(self._vi, payload, self._vpts, 1, keyframe)
            self._vpts += 1
            return len(payload)
        import numpy as np

        from tcforge_tpu.io.rawio import unpack_frame
        planes = unpack_frame(payload, self._fmt, self._size[0],
                              self._size[1])
        if len(planes) == 1:               # packed RGB
            rgb = planes[0]
        else:
            from tcforge_tpu.core.frame import FrameBatch
            from tcforge_tpu.ops import colorspace
            from tcforge_tpu.core.formats import ImageFormat
            fb = FrameBatch.from_numpy(y=planes[0][None],
                                       u=planes[1][None],
                                       v=planes[2][None],
                                       fmt=self._fmt)
            rgb = np.asarray(
                colorspace.convert(fb, ImageFormat.RGB24).rgb[0])
        self._w.write(np.ascontiguousarray(rgb[:, :, ::-1]))
        return len(payload)

    def write_audio(self, payload: bytes, track: int = 0) -> int:
        if getattr(self, "_flacf", None) is not None:
            self._flacf.write(payload)
            return len(payload)
        if self._mux is not None and getattr(self, "_ai", -1) >= 0:
            spp = self._aspp or max(1, len(payload)
                                    // (2 * getattr(self, "_apcm_ch",
                                                    2)))
            self._mux.write(self._ai, payload, self._apts, spp, True)
            self._apts += spp
            return len(payload)
        return 0

    def close(self) -> None:
        if getattr(self, "_flacf", None) is not None:
            self._flacf.close()
            self._flacf = None
            return
        if self._mux is not None:
            self._mux.close()
            self._mux = None
            return
        self._w.release()


@register
class DvMuxer(Muxer):
    """Raw DV/DIF stream writer that INJECTS the session's PCM audio
    into the frames' AAUX sections (DV carries audio inside the
    video DIF — the reference reached this only through libdv's
    full-frame encoder).  Video payloads must be DV frames (the dv
    encoder, or passthrough of a DV source); audio must be 16-bit
    PCM at 48 kHz stereo — anything else raises."""
    info = ModuleInfo(name="dv", kind=ModuleKind.MULTIPLEXOR,
                      media="both", codecs_in=(Codec.DV, Codec.PCM),
                      formats_out=(ContainerFormat.DV_FILE,))
    desc = ModuleDesc(name="dv", comment="DV/DIF writer with native "
                      "AAUX audio injection (48k/16-bit stereo)")

    def open(self, path: str) -> None:
        import numpy as _np
        job = self.job
        self._np = _np
        self._f = open(path, "wb")
        self._frames = []          # pending video frames
        self._pcm = _np.zeros((0, 2), _np.int16)
        self._has_audio = bool(job.dm_chan)
        if self._has_audio:
            rate = job.mp3frequency or job.a_rate
            if rate != 48000 or (job.dm_bits or 16) != 16:
                raise ValueError(
                    "dv mux: AAUX injection needs 48000 Hz 16-bit "
                    f"audio (got {rate} Hz / {job.dm_bits} bit); "
                    "resample with -E 48000,16,2")

    def _pump(self) -> None:
        from tcforge_tpu.io.dvenc import inject_audio
        while self._frames and (not self._has_audio
                                or len(self._pcm) >= 1920):
            fr = self._frames.pop(0)
            if self._has_audio:
                fr = inject_audio(fr, self._pcm[:1920])
                self._pcm = self._pcm[1920:]
            self._f.write(fr)

    def write_video(self, payload: bytes, keyframe: bool = True) -> int:
        if len(payload) != 144000:
            raise ValueError("dv mux: payload is not a PAL DV frame "
                             f"({len(payload)} bytes); use -y dv "
                             "and -Z 720x576")
        self._frames.append(payload)
        self._pump()
        return len(payload)

    def write_audio(self, payload: bytes, track: int = 0) -> int:
        if not self._has_audio:
            return 0
        ch = self.job.dm_chan
        pcm = self._np.frombuffer(payload, self._np.int16)
        pcm = pcm.reshape(-1, ch)
        if ch == 1:
            pcm = self._np.repeat(pcm, 2, axis=1)
        self._pcm = self._np.concatenate([self._pcm, pcm[:, :2]])
        self._pump()
        return len(payload)

    def close(self) -> None:
        from tcforge_tpu.io.dvenc import inject_audio
        # flush: pad trailing audio with silence
        while self._frames:
            fr = self._frames.pop(0)
            if self._has_audio:
                fr = inject_audio(fr, self._pcm[:1920])
                self._pcm = self._pcm[1920:] if len(self._pcm) > 1920 \
                    else self._np.zeros((0, 2), self._np.int16)
            self._f.write(fr)
        self._f.close()
