"""OGG import module (import_ogg.c analogue).

Container demux is fully native (tcforge_tpu.io.ogg).  OGM (OggDS)
streams carrying raw video (I420/YV12/UYVY/YUY2/RGB fourccs) and PCM
audio decode in-process — this round-trips the ogg multiplexor's
output.  Vorbis audio decodes in-process too (io/vorbis.py — the
reference used libvorbis, import/decode_ogg.c).  Theora video
decodes through the FFmpeg bridge when present, else the in-tree
decoder (io/theora.py, validated bit-exact against libavcodec;
TCFORGE_NATIVE_THEORA=1 forces it).  Divx stays gated with a
precise message; probe/stream listing/extraction always work
(tcprobe/tcdemux paths).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.optstr import ModuleDesc
from tcforge_tpu.modules.registry import (Importer, ModuleInfo, ModuleKind,
                                          register)

_RAW_FOURCC = {"I420", "YV12", "UYVY", "YUY2", "RGB ", "DIB "}


@register
class OggImporter(Importer):
    info = ModuleInfo(name="ogg", kind=ModuleKind.DEMULTIPLEXOR,
                      media="both",
                      codecs_out=(Codec.YUV420P, Codec.PCM),
                      formats_in=(ContainerFormat.OGG,))
    desc = ModuleDesc(name="ogg", comment="OGG/OGM container (raw OGM "
                      "video + PCM/Vorbis decode; theora native or "
                      "via the FFmpeg bridge)")

    def open(self, path: Optional[str]) -> None:
        from tcforge_tpu.io.ogg import (identify_streams, iter_pages,
                                        ogm_parse_data_packet,
                                        pages_to_packets)
        with open(path, "rb") as f:
            streams = identify_streams(f)
        video = next((s for s in streams if s.kind == "video"), None)
        audio = next((s for s in streams if s.kind == "audio"), None)
        v_ok = video is not None and video.codec in _RAW_FOURCC
        v_theora = video is not None and video.codec == "theora"
        a_ok = audio is not None and audio.codec in ("0001", "pcm",
                                                     "PCM ")
        a_vorbis = audio is not None and audio.codec == "vorbis"
        _native_theora = bool(os.environ.get("TCFORGE_NATIVE_THEORA"))
        if v_theora and not _native_theora:
            from tcforge_tpu.native import av as _av
            if not (_av.available() and _av.have_codec("theora")):
                _native_theora = True     # in-tree decoder fallback
        if not v_ok and not a_ok and not a_vorbis and not v_theora:
            found = ", ".join(f"{s.codec} ({s.kind})"
                              for s in streams) or "none"
            raise NotImplementedError(
                f"ogg: found streams: {found} — no theora/divx "
                "decoder in this build; use tcdemux to extract "
                "streams, or transcode the decoded output of an "
                "external decoder")
        self._vpayloads: List[bytes] = []
        self._theora = None
        self._theora_prev = None      # last emitted planes (dup marks)
        self._apcm = b""
        if v_theora:
            # theora video: header triple -> extradata, data packets
            # through the in-tree decoder (io/theora.py, validated
            # bit-exact vs libavcodec) or the FFmpeg bridge (the
            # reference import path used libtheora the same way)
            hdrs: List[bytes] = []
            data: List[bytes] = []
            with open(path, "rb") as f:
                for _, pkt in pages_to_packets(iter_pages(f),
                                               serial=video.serial):
                    if len(hdrs) < 3:
                        hdrs.append(pkt)
                    else:
                        # zero-length packets are valid "repeat the
                        # previous frame" markers — keep them
                        data.append(pkt)
            if _native_theora:
                from tcforge_tpu.io.theora import TheoraDecoder
                self._theora = TheoraDecoder(hdrs)
            else:
                from tcforge_tpu.native import av as _av
                self._theora = _av.AvVideoDecoder(
                    "theora", header_packets=hdrs)
            self._vpayloads = data
            self.width, self.height = video.width, video.height
            self.fps = video.fps or 25.0
        if v_ok:
            if video.codec not in ("I420", "YV12"):
                raise NotImplementedError(
                    f"ogg: OGM raw fourcc {video.codec!r} not wired yet "
                    "(I420/YV12 supported)")
            self.width, self.height = video.width, video.height
            self.fps = video.fps or 25.0
            self._fourcc = video.codec
            with open(path, "rb") as f:
                for _, pkt in pages_to_packets(iter_pages(f),
                                               serial=video.serial):
                    if pkt and not (pkt[0] & 0x01):
                        payload, _, _ = ogm_parse_data_packet(pkt)
                        self._vpayloads.append(payload)
        if a_ok:
            self.audio_rate = audio.samplerate
            self.audio_channels = audio.channels or 2
            with open(path, "rb") as f:
                chunks = []
                for _, pkt in pages_to_packets(iter_pages(f),
                                               serial=audio.serial):
                    if pkt and not (pkt[0] & 0x01):
                        payload, _, _ = ogm_parse_data_packet(pkt)
                        chunks.append(payload)
                self._apcm = b"".join(chunks)
        elif a_vorbis:
            # in-process Vorbis decode (reference: decode_ogg.c via
            # libvorbis; here io/vorbis.py) — float synthesis to s16
            from tcforge_tpu.io.vorbis import VorbisDecoder
            dec = VorbisDecoder()
            self.audio_rate = audio.samplerate
            self.audio_channels = audio.channels or 2
            pcm_chunks = []
            with open(path, "rb") as f:
                for _, pkt in pages_to_packets(iter_pages(f),
                                               serial=audio.serial):
                    if not pkt:
                        continue
                    if pkt[0] & 0x01:          # header packet (1/3/5)
                        dec.header_packet(pkt)
                        continue
                    out = dec.audio_packet(pkt)
                    if out is not None and len(out):
                        pcm_chunks.append(np.clip(
                            np.rint(out * 32768.0),
                            -32768, 32767).astype("<i2"))
            if pcm_chunks:
                self._apcm = np.concatenate(pcm_chunks).tobytes()
            self.audio_channels = dec.channels or self.audio_channels
        self._vpos = 0
        self._apos = 0
        self.total_frames = len(self._vpayloads) or None

    def read_video_batch(self, n: int) -> Optional[Dict[str, np.ndarray]]:
        if self._vpos >= len(self._vpayloads):
            return None
        take = self._vpayloads[self._vpos:self._vpos + n]
        self._vpos += len(take)
        if self._theora is not None:
            ys, us, vs = [], [], []
            for pkt in take:
                if not pkt:
                    # dup-frame marker: repeat the previous output —
                    # the cache covers a marker landing FIRST in a
                    # batch (the repeated frame went out last batch)
                    prev = (ys[-1], us[-1], vs[-1]) if ys \
                        else self._theora_prev
                    if prev is not None:
                        ys.append(prev[0])
                        us.append(prev[1])
                        vs.append(prev[2])
                    continue
                got = self._theora.decode(pkt)
                if got is None:
                    continue
                y, u, v = got
                # theora codes mb-aligned; crop to display size
                ys.append(y[:self.height, :self.width])
                us.append(u[:self.height // 2, :self.width // 2])
                vs.append(v[:self.height // 2, :self.width // 2])
            if not ys:
                return None
            self._theora_prev = (ys[-1], us[-1], vs[-1])
            return {"y": np.stack(ys), "u": np.stack(us),
                    "v": np.stack(vs)}
        w, h = self.width, self.height
        ys, us, vs = [], [], []
        for raw in take:
            buf = np.frombuffer(raw, np.uint8)
            y = buf[:w * h].reshape(h, w)
            c1 = buf[w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
            c2 = buf[w * h + w * h // 4:w * h + w * h // 2] \
                .reshape(h // 2, w // 2)
            u, v = (c1, c2) if self._fourcc == "I420" else (c2, c1)
            ys.append(y)
            us.append(u)
            vs.append(v)
        return {"y": np.stack(ys), "u": np.stack(us), "v": np.stack(vs)}

    def read_audio_batch(self, samples: int) -> Optional[np.ndarray]:
        ch = self.audio_channels
        nbytes = samples * ch * 2
        chunk = self._apcm[self._apos:self._apos + nbytes]
        if not chunk:
            return None
        self._apos += len(chunk)
        a = np.frombuffer(chunk, np.int16)
        usable = (a.shape[0] // ch) * ch
        return a[:usable].reshape(-1, ch)

    def close(self) -> None:
        pass
