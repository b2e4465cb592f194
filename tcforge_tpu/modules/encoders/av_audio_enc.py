"""Compressed-audio encoder modules through the FFmpeg bridge
(encode_lame.c / encode_faac.c analogues + the VCD/SVCD 'mp2enc'
toolame role).  PCM batches in, codec byte streams out."""

from __future__ import annotations

from typing import List

import numpy as np

from tcforge_tpu.core.codecs import Codec
from tcforge_tpu.core.frame import AudioBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (Encoder, ModuleInfo, ModuleKind,
                                          register)


class _BridgeAudioEncoder(Encoder):
    codec_name = ""
    default_kbps = 192
    # subclasses with an in-tree encoder set these: the factory takes
    # (rate, channels, bitrate_bps) and returns an AvAudioEncoder-
    # shaped object; the env var forces the native path for A/B
    native_factory = None
    native_force_env = ""

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        import os as _os
        from tcforge_tpu.native import av
        rate = job.mp3frequency or job.a_rate
        ch = job.dm_chan or job.a_chan or 2
        kbps = int(self.options.get("bitrate", 0) or 0) \
            or (job.mp3bitrate if getattr(job, "mp3bitrate", 0)
                else self.default_kbps)
        forced = bool(self.native_force_env
                      and _os.environ.get(self.native_force_env) == "1")
        if (forced or not av.available()) \
                and type(self).native_factory is not None:
            self._enc = type(self).native_factory(rate, ch, kbps * 1000)
        elif not av.available():
            raise NotImplementedError(
                f"{self.info.name}: FFmpeg bridge not built "
                "(make -C native)")
        else:
            self._enc = av.AvAudioEncoder(self.codec_name, rate, ch,
                                          kbps * 1000)
        # one payload per coded frame (1152/1536/1024 samples): keeps
        # muxer timelines exact (lavf pts, AVI chunk counts)
        self._enc.set_framed(True)
        # muxers (avi) need the average byte rate for the stream
        # headers of byte-stream tracks
        import struct as _s
        job.extradata["audio_byte_rate"] = _s.pack(
            "<I", kbps * 1000 // 8)
        # codec headers for container muxers (flac STREAMINFO, aac
        # AudioSpecificConfig, ...).  NOTE: flac's STREAMINFO is the
        # open-time snapshot — total_samples/MD5 stay zero (players
        # tolerate; libavformat would need NEW_EXTRADATA side data to
        # rewrite the header on trailer).
        xd = self._enc.extradata
        if xd:
            job.extradata["audio_extradata"] = xd
        fs = self._enc.frame_size
        if fs:
            job.extradata["audio_frame_size"] = _s.pack("<I", fs)

    def encode_video(self, fb) -> List[bytes]:
        raise NotImplementedError(
            f"{self.info.name} is an audio-only encoder")

    def encode_audio(self, ab: AudioBatch) -> List[bytes]:
        pcm = np.asarray(ab.pcm)
        self._enc.feed(pcm.reshape(-1, pcm.shape[-1]))
        return self._enc.read_packets()

    def flush(self) -> List[bytes]:
        self._enc.flush()
        out = self._enc.read_packets()
        self.last_flush_frames = 0
        return out


@register
class LameEncoder(_BridgeAudioEncoder):
    info = ModuleInfo(name="lame", kind=ModuleKind.ENCODER,
                      media="audio", codecs_in=(Codec.PCM,),
                      codecs_out=(Codec.MP3,))
    desc = ModuleDesc(
        name="lame", comment="MP3 audio encoder (FFmpeg bridge, or "
        "the in-tree io/mp3enc.py spec encoder when the bridge is "
        "absent; the encode_lame.c role)",
        params=[ParamSpec("bitrate", "bitrate kbps", "d", 0, 0, 320)])
    codec_name = "mp3"
    default_kbps = 128
    native_force_env = "TCFORGE_NATIVE_MP3ENC"

    @staticmethod
    def native_factory(rate, ch, bps):
        from tcforge_tpu.io.mp3enc import NativeMp3Encoder
        return NativeMp3Encoder(rate, ch, bps)


@register
class Mp2Encoder(_BridgeAudioEncoder):
    info = ModuleInfo(name="mp2enc", kind=ModuleKind.ENCODER,
                      media="audio", codecs_in=(Codec.PCM,),
                      codecs_out=(Codec.MP2,))
    desc = ModuleDesc(
        name="mp2enc", comment="MPEG-1 layer II audio encoder "
        "(FFmpeg bridge, or the in-tree io/mpaenc.py spec encoder "
        "when the bridge is absent; VCD/SVCD audio — the "
        "toolame/mp2enc role)",
        params=[ParamSpec("bitrate", "bitrate kbps", "d", 0, 0, 384)])
    codec_name = "mp2"
    default_kbps = 224
    native_force_env = "TCFORGE_NATIVE_MP2ENC"

    @staticmethod
    def native_factory(rate, ch, bps):
        from tcforge_tpu.io.mpaenc import NativeAudioEncoder
        return NativeAudioEncoder(rate, ch, bps)


@register
class FaacEncoder(_BridgeAudioEncoder):
    info = ModuleInfo(name="faac", kind=ModuleKind.ENCODER,
                      media="audio", codecs_in=(Codec.PCM,),
                      codecs_out=(Codec.AAC,))
    desc = ModuleDesc(
        name="faac", comment="AAC audio encoder (FFmpeg bridge, or "
        "the in-tree io/aacenc.py LC encoder when the bridge is "
        "absent; the encode_faac.c role)",
        params=[ParamSpec("bitrate", "bitrate kbps", "d", 0, 0, 320)])
    codec_name = "aac"
    default_kbps = 128
    native_force_env = "TCFORGE_NATIVE_AACENC"

    @staticmethod
    def native_factory(rate, ch, bps):
        from tcforge_tpu.io.aacenc import NativeAacEncoder
        return NativeAacEncoder(rate, ch, bps)


@register
class Ac3Encoder(_BridgeAudioEncoder):
    info = ModuleInfo(name="ac3enc", kind=ModuleKind.ENCODER,
                      media="audio", codecs_in=(Codec.PCM,),
                      codecs_out=(Codec.AC3,))
    desc = ModuleDesc(
        name="ac3enc", comment="AC-3 audio encoder (FFmpeg bridge, "
        "or the in-tree io/a52enc.py spec encoder when the bridge is "
        "absent; DVD audio — pairs with the mpg muxer's private "
        "sub-stream)",
        params=[ParamSpec("bitrate", "bitrate kbps", "d", 0, 0, 640)])
    codec_name = "ac3"
    default_kbps = 192
    native_force_env = "TCFORGE_NATIVE_AC3ENC"

    @staticmethod
    def native_factory(rate, ch, bps):
        from tcforge_tpu.io.a52enc import NativeAc3Encoder
        return NativeAc3Encoder(rate, ch, bps)


@register
class FlacEncoder(_BridgeAudioEncoder):
    info = ModuleInfo(name="flac", kind=ModuleKind.ENCODER,
                      media="audio", codecs_in=(Codec.PCM,),
                      codecs_out=(Codec.FLAC,))
    desc = ModuleDesc(
        name="flac", comment="FLAC lossless audio encoder (FFmpeg "
        "bridge, or the in-tree io/flac.py spec encoder when the "
        "bridge is absent; beyond the reference encoder set — pairs "
        "with the lavf muxer for .flac/.mkv outputs)",
        params=[ParamSpec("bitrate", "ignored (lossless)", "d", 0,
                          0, 0)])
    codec_name = "flac"
    default_kbps = 0
    native_force_env = "TCFORGE_NATIVE_FLAC"

    @staticmethod
    def native_factory(rate, ch, bps):
        from tcforge_tpu.io.flac import NativeFlacEncoder
        return NativeFlacEncoder(rate, ch, bps)
