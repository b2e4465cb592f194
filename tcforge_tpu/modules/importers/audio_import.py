"""Compressed-audio import modules (import_mp3.c / import_ac3.c
analogues) through the FFmpeg bridge (native/tcforge_av.cpp — the
libtcext role: the reference decoded these via lame and liba52 when
those libraries were present at build time)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          register)

_CHUNK = 1 << 16


class _BridgeAudioImporter(Importer):
    """Streaming file decode: feed windows, read PCM on demand."""

    codec_name = ""

    def open(self, path: Optional[str]) -> None:
        from tcforge_tpu.native import av
        if not av.available():
            if self.codec_name in ("mp3", "ac3"):
                # in-tree decoders: MPEG-1 Layer I/II (io/mp2dec.py,
                # Layer III still needs the bridge and raises there)
                # and AC-3 (io/a52dec.py)
                if self.codec_name == "ac3":
                    from tcforge_tpu.io.a52dec import StreamDecoder
                else:
                    from tcforge_tpu.io.mp2dec import StreamDecoder
                self._f = open(path, "rb")
                self._dec = StreamDecoder()
                self._eof = False
                self._buf = None
                while not self._dec.rate and not self._eof:
                    self._pump()
                self.audio_rate = self._dec.rate
                self.audio_channels = self._dec.channels
                return
            raise NotImplementedError(
                f"{self.info.name}: FFmpeg bridge not built "
                "(make -C native); decode unavailable")
        self._f = open(path, "rb")
        self._dec = av.AvAudioDecoder(self.codec_name)
        self._eof = False
        self._buf: Optional[np.ndarray] = None
        # prime until the stream params are known
        while not self._dec.rate and not self._eof:
            self._pump()
        self.audio_rate = self._dec.rate
        self.audio_channels = self._dec.channels

    def _pump(self) -> None:
        data = self._f.read(_CHUNK)
        if not data:
            if not self._eof:
                self._dec.flush()
            self._eof = True
            return
        self._dec.feed(data)

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        return None

    def read_audio_batch(self, samples: int) -> Optional[np.ndarray]:
        chunks = [] if self._buf is None else [self._buf]
        have = 0 if self._buf is None else len(self._buf)
        self._buf = None
        while have < samples:
            got = self._dec.read()
            if got is not None:
                chunks.append(got)
                have += len(got)
                continue
            if self._eof:
                break
            self._pump()
        if not chunks:
            return None
        pcm = np.concatenate(chunks)
        out, rest = pcm[:samples], pcm[samples:]
        self._buf = rest if len(rest) else None
        return out if len(out) else None

    def close(self) -> None:
        self._dec.close()
        self._f.close()


@register
class Mp3Importer(_BridgeAudioImporter):
    info = ModuleInfo(name="mp3", kind=ModuleKind.DEMULTIPLEXOR,
                      media="audio", codecs_out=(Codec.PCM,),
                      formats_in=(ContainerFormat.MP3_FILE,))
    desc = ModuleDesc(name="mp3", comment="MPEG audio (layers I-III) "
                      "decode via the FFmpeg bridge")
    codec_name = "mp3"


@register
class Ac3Importer(_BridgeAudioImporter):
    info = ModuleInfo(name="ac3", kind=ModuleKind.DEMULTIPLEXOR,
                      media="audio", codecs_out=(Codec.PCM,),
                      formats_in=(ContainerFormat.AC3_FILE,))
    desc = ModuleDesc(name="ac3", comment="AC-3/A52 audio decode via "
                      "the FFmpeg bridge")
    codec_name = "ac3"


@register
class FlacImporter(Importer):
    """FLAC file import: libavformat file-level decode through the
    bridge when present, the in-tree io/flac.py decoder otherwise
    (lossless either way — both paths are bit-exact)."""

    info = ModuleInfo(name="flac", kind=ModuleKind.DEMULTIPLEXOR,
                      media="audio", codecs_out=(Codec.PCM,),
                      formats_in=(ContainerFormat.FLAC_FILE,))
    desc = ModuleDesc(name="flac", comment="FLAC audio decode "
                      "(bridge or the native io/flac.py decoder)")

    def open(self, path: Optional[str]) -> None:
        import os as _os
        from tcforge_tpu.native import av
        self._fa = None
        if av.available() \
                and _os.environ.get("TCFORGE_NATIVE_FLAC") != "1":
            self._fa = av.AvFileAudio(path)
            self.audio_rate = self._fa.rate
            self.audio_channels = self._fa.channels
            self._pcm = None
            self._pos = 0
            return
        from tcforge_tpu.io.flac import decode_stream
        with open(path, "rb") as f:
            pcm, rate, ch, bps = decode_stream(f.read())
        if bps > 16:
            pcm = pcm >> (bps - 16)
        elif bps < 16:
            pcm = pcm << (16 - bps)
        self._pcm = pcm.astype(np.int16)
        self._pos = 0
        self.audio_rate = rate
        self.audio_channels = ch

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        return None

    def read_audio_batch(self, samples: int) -> Optional[np.ndarray]:
        if self._fa is not None:
            chunks = []
            have = 0
            while have < samples:
                got = self._fa.read()
                if got is None:
                    break
                chunks.append(got)
                have += len(got)
            if not chunks:
                return None
            return np.concatenate(chunks)
        out = self._pcm[self._pos:self._pos + samples]
        self._pos += len(out)
        return out if len(out) else None

    def close(self) -> None:
        if self._fa is not None:
            self._fa.close()
            self._fa = None
        self._pcm = None


@register
class AacImporter(Importer):
    """Raw ADTS AAC import: libavformat file-level decode through
    the bridge when present, the in-tree io/aacdec.py LC decoder
    otherwise (oracle-matched to <= 2 LSB, so both paths agree)."""

    info = ModuleInfo(name="aac", kind=ModuleKind.DEMULTIPLEXOR,
                      media="audio", codecs_out=(Codec.PCM,),
                      formats_in=(ContainerFormat.AAC_FILE,))
    desc = ModuleDesc(name="aac", comment="AAC-LC audio decode "
                      "(bridge or the native io/aacdec.py decoder)")

    def open(self, path: Optional[str]) -> None:
        import os as _os
        from tcforge_tpu.native import av
        self._fa = None
        if av.available() \
                and _os.environ.get("TCFORGE_NATIVE_AAC") != "1":
            self._fa = av.AvFileAudio(path)
            self.audio_rate = self._fa.rate
            self.audio_channels = self._fa.channels
            self._pcm = None
            self._pos = 0
            return
        from tcforge_tpu.io.aacdec import decode_adts_stream
        with open(path, "rb") as f:
            pcm, rate, ch = decode_adts_stream(f.read())
        self._pcm = pcm
        self._pos = 0
        self.audio_rate = rate
        self.audio_channels = ch

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        return None

    def read_audio_batch(self, samples: int) -> Optional[np.ndarray]:
        if self._fa is not None:
            chunks = []
            have = 0
            while have < samples:
                got = self._fa.read()
                if got is None:
                    break
                chunks.append(got)
                have += len(got)
            if not chunks:
                return None
            return np.concatenate(chunks)
        out = self._pcm[self._pos:self._pos + samples]
        self._pos += len(out)
        return out if len(out) else None

    def close(self) -> None:
        if self._fa is not None:
            self._fa.close()
            self._fa = None
        self._pcm = None
