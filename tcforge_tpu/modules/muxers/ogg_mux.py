"""OGG/OGM multiplexor (multiplex/multiplex_ogg.c analogue).

The reference muxer paged theora/vorbis packets through libogg; this
build has no external codec encoders, so the writer targets the OggDS
("OGM") layout its own importer and probe read back
(import/probe_ogg.c:88-260 semantics): one logical stream per medium,
BOS pages carrying ogm_stream_header packets, data packets with the
OGM flags byte (keyframe + sample-count field).  Pure byte layout —
pages, lacing, CRC — no codec libraries involved.
"""

from __future__ import annotations

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (ModuleInfo, ModuleKind, Muxer,
                                          register)


@register
class OggMuxer(Muxer):
    info = ModuleInfo(name="ogg", kind=ModuleKind.MULTIPLEXOR,
                      media="both", codecs_in=(Codec.ANY,),
                      formats_out=(ContainerFormat.OGG,))
    desc = ModuleDesc(
        name="ogg", comment="OGG/OGM multiplexor (OggDS raw payloads)",
        params=[ParamSpec("fourcc", "video stream fourcc", "s", "I420"),
                ParamSpec("stream", "enable shout streaming using given "
                          "label as identifier (shout.cfg section)",
                          "s", "")])

    V_SERIAL = 0x0001CAFE
    A_SERIAL = 0x0002CAFE

    def open(self, path: str) -> None:
        from tcforge_tpu.io.ogg import (OggPageWriter, ogm_audio_header,
                                        ogm_video_header)
        # shout broadcast (multiplex_ogg.c stream= option): every ogg
        # page written to the file is also sent to the icecast server.
        # Connect BEFORE opening the output so a config/connect error
        # leaves no dangling fd or empty file behind.
        self._shout = None
        label = self.options.get("stream", "")
        if label:
            from tcforge_tpu.io.shout import ShoutClient, ShoutConfig
            self._shout = ShoutClient(ShoutConfig.from_file(label))
            self._shout.open()
        self._f = open(path, "wb")
        if self._shout is not None:
            self._f = _ShoutTee(self._f, self._shout)
        job = self.job
        self._vw = None
        self._aw = None
        self._frames = 0
        self._samples = 0
        w = job.ex_v_width or job.im_v_width
        h = job.ex_v_height or job.im_v_height
        # native Theora logical stream when the theora encoder is
        # active (headers via extradata, like vorbis below)
        self._theora = None
        self._kfgshift = 6
        self._vkey_base = 0            # frame index of the last key
        if "theora_headers" in getattr(job, "extradata", {}):
            from tcforge_tpu.modules.encoders.vorbis_enc import \
                unpack_header_packets
            pkts = unpack_header_packets(
                job.extradata["theora_headers"])
            self._theora = pkts if len(pkts) == 3 else None
        if self._theora:
            ident = self._theora[0]
            # KFGSHIFT: 5 bits of the QUAL/KFGSHIFT/PF word at
            # bytes 40-41 of the ident packet (Theora I 6.2)
            if len(ident) >= 42:
                word = (ident[40] << 8) | ident[41]
                self._kfgshift = (word >> 5) & 0x1F
        if w and h:
            self._vw = OggPageWriter(self._f, self.V_SERIAL)
        # audio present when the session carries a PCM track
        rate = job.mp3frequency or job.a_rate
        # native Vorbis logical stream when the vorbis encoder is
        # active (it leaves its three header packets in extradata —
        # the TCModuleExtraData handoff of multiplex_ogg.c)
        self._vorbis = b""
        if "vorbis_headers" in getattr(job, "extradata", {}):
            from tcforge_tpu.modules.encoders.vorbis_enc import \
                unpack_header_packets
            self._vorbis = unpack_header_packets(
                job.extradata["vorbis_headers"])
            import struct as _s
            (self._hop,) = _s.unpack(
                "<I", job.extradata["vorbis_hop"])
        if ((getattr(job, "dm_chan", 0) and rate) or self._vorbis) \
                and job.audio_out_file is None:
            self._aw = OggPageWriter(self._f, self.A_SERIAL)
        # ALL BOS pages first (Ogg framing: every stream's first page
        # must precede any other page — libavformat rejects the file
        # otherwise), then the secondary header pages per stream.
        if self._vw:
            if self._theora:
                self._vw.write_packet(self._theora[0], 0, flush=True)
            else:
                hdr = ogm_video_header(self.options["fourcc"], w, h,
                                       job.fps or 25.0)
                self._vw.write_packet(hdr, 0, flush=True)
        if self._aw:
            if self._vorbis:
                self._aw.write_packet(self._vorbis[0], 0, flush=True)
                self._held = None      # last-packet holdback (granule
                #                        clamp on the final page)
            else:
                self._block = job.dm_chan * (job.dm_bits // 8)
                hdr = ogm_audio_header(rate, job.dm_chan, job.dm_bits,
                                       self._block)
                self._aw.write_packet(hdr, 0, flush=True)
        if self._vw and self._theora:
            self._vw.write_packet(self._theora[1], 0, flush=False)
            self._vw.write_packet(self._theora[2], 0, flush=True)
        elif self._vw:
            # OGM streams carry TWO header packets (BOS + comment);
            # demuxers wait for both before opening the stream
            from tcforge_tpu.io.ogg import ogm_comment_header
            self._vw.write_packet(ogm_comment_header(), 0, flush=True)
        if self._aw and self._vorbis:
            self._aw.write_packet(self._vorbis[1], 0, flush=False)
            self._aw.write_packet(self._vorbis[2], 0, flush=True)
        elif self._aw:
            from tcforge_tpu.io.ogg import ogm_comment_header
            self._aw.write_packet(ogm_comment_header(), 0, flush=True)

    def _pace(self) -> None:
        """shout_send + shout_sync pacing: report the stream time the
        pages written so far represent, then let the client sleep if
        we are ahead of real time (multiplex_ogg.c:168-175)."""
        if self._shout is None:
            return
        t = 0.0
        fps = self.job.out_fps or self.job.fps or 25.0
        if self._frames:
            t = self._frames / fps
        if self._samples:
            rate = self.job.mp3frequency or self.job.a_rate or 48000
            t = max(t, self._samples / float(rate))
        self._shout.set_stream_time(t)
        self._shout.sync()

    def write_video(self, payload: bytes, keyframe: bool = True) -> int:
        from tcforge_tpu.io.ogg import ogm_data_packet
        if self._theora:
            # keyframe detectable from the packet itself: bit 0x40 of
            # the first byte set = inter frame (Theora I 7.1); zero-
            # length packets are dup frames.  granulepos =
            # (keyframe_no << kfgshift) | frames_since — frame
            # numbers 1-based per Theora I A.1 (th_granule_frame
            # subtracts the 1 back).
            i = self._frames                  # 0-based display index
            if payload and not (payload[0] & 0x40):
                self._vkey_base = i + 1
            self._frames += 1
            granule = (self._vkey_base << self._kfgshift) \
                | (i + 1 - self._vkey_base)
            self._vw.write_packet(payload, granule, flush=True)
            self._pace()
            return len(payload)
        self._frames += 1
        pkt = ogm_data_packet(payload, 1, keyframe)
        self._vw.write_packet(pkt, self._frames, flush=True)
        self._pace()
        return len(payload)

    def write_audio(self, payload: bytes, track: int = 0) -> int:
        from tcforge_tpu.io.ogg import ogm_data_packet
        if self._aw is None:
            return 0
        if self._vorbis:
            # one Vorbis packet per payload; granulepos = PCM samples
            # decodable through the last packet on the page ((k-1)*hop
            # for packet k — the first, priming packet decodes to 0).
            # The newest packet is held back so the FINAL page can
            # carry the exact stream length (Vorbis I A.2).
            if self._held is not None:
                self._aw.write_packet(self._held,
                                      self._clamped(self._samples),
                                      flush=True)
                self._samples += self._hop
            self._held = payload
            self._pace()
            return len(payload)
        samples = len(payload) // max(1, self._block)
        self._samples += samples
        pkt = ogm_data_packet(payload, samples, True)
        self._aw.write_packet(pkt, self._samples, flush=True)
        self._pace()
        return len(payload)

    def _clamped(self, granule: int) -> int:
        """Clamp to the true PCM length once the encoder has reported
        it (flush-time, via extradata) — padding past the end must not
        extend the granule timeline (Vorbis I A.2: the final pages end
        the stream at the exact sample count)."""
        import struct as _s
        total = self.job.extradata.get("vorbis_total_samples")
        if total is not None:
            (true_len,) = _s.unpack("<Q", total)
            granule = min(granule, true_len)
        return granule

    def close(self) -> None:
        if self._vw:
            self._vw.close()
        if self._aw:
            if self._vorbis and self._held is not None:
                self._aw.write_packet(self._held,
                                      self._clamped(self._samples),
                                      flush=True)
                self._held = None
            self._aw.close()
        self._f.close()
        if self._shout is not None:
            self._shout.close()
            self._shout = None


class _ShoutTee:
    """File wrapper that forwards every write to the shout client as
    well (the tcsh->send call per written buffer in multiplex_ogg.c)."""

    def __init__(self, f, client):
        self._f = f
        self._client = client

    def write(self, data: bytes) -> int:
        n = self._f.write(data)
        self._client.send(data)
        return n

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()
