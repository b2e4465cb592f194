"""Stream probing: magic sniffing + per-format probers filling the Job.

Rebuild of the reference probe stack: magic signature table
(``import/fileinfo.c:146-220``, 64 TC_MAGIC_* signatures), per-format
probers (``import/probe_*.c``) and the engine-side autoprobe
(``src/probe.c:53-120`` probe_stream_data -> probe_to_vob).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import List, Optional

from tcforge_tpu.core.codecs import Codec, ContainerFormat
from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.job import Job
from tcforge_tpu.core import ratiocodes


@dataclass
class ProbeTrack:
    codec: Codec = Codec.UNKNOWN
    bitrate: int = 0
    samplerate: int = 0
    channels: int = 0
    bits: int = 16
    lavf_codec: str = ""          # codec name when only FFmpeg knows it


@dataclass
class ProbeInfo:
    """ProbeInfo analogue (import/tcprobe binary dump payload)."""

    magic: ContainerFormat = ContainerFormat.UNKNOWN
    width: int = 0
    height: int = 0
    fps: float = 0.0
    frc: int = 0
    asr: int = 0
    codec: Codec = Codec.UNKNOWN
    num_frames: int = 0
    is_video: bool = False
    tracks: List[ProbeTrack] = field(default_factory=list)
    format: ImageFormat = ImageFormat.UNKNOWN
    lavf_container: str = ""      # libavformat fallback details
    lavf_vcodec: str = ""

    def describe(self) -> str:
        name = self.magic.value
        if self.magic == ContainerFormat.UNKNOWN and self.lavf_container:
            name = f"{self.lavf_container} (lavf)"
        lines = [f"container: {name}"]
        if self.is_video:
            vcodec = self.lavf_vcodec or self.codec.name.lower()
            lines.append(
                f"video: {vcodec} {self.width}x{self.height}"
                f" @ {self.fps:.3f} fps"
                + (f", {self.num_frames} frames" if self.num_frames else ""))
        for i, t in enumerate(self.tracks):
            acodec = t.lavf_codec or t.codec.name.lower()
            lines.append(f"audio[{i}]: {acodec}"
                         f" {t.samplerate} Hz, {t.channels} ch, {t.bits} bit")
        return "\n".join(lines)


_ASF_GUID = bytes((0x30, 0x26, 0xB2, 0x75, 0x8E, 0x66, 0xCF, 0x11,
                   0xA6, 0xD9, 0x00, 0xAA, 0x00, 0x62, 0xCE, 0x6C))
_MXF_MAGIC = bytes((0x06, 0x0E, 0x2B, 0x34, 0x02, 0x05, 0x01, 0x01))


def sniff_magic(path: str) -> ContainerFormat:
    """Header magic detection (fileinfo.c:146-220 analogue,
    incl. the leading zero-padding skip VOB rips often need)."""
    with open(path, "rb") as f:
        head = f.read(400)
        # zero-padding detection (fileinfo.c:166-177): skip leading
        # 4-byte zero groups up to TC_MAX_SEEK_BYTES
        if head[:4] == b"\x00\x00\x00\x00":
            skipped = 0
            while (head[:4] == b"\x00\x00\x00\x00"
                   and skipped < (1 << 20)):
                nz = 0
                while (nz + 4 <= len(head)
                       and head[nz:nz + 4] == b"\x00\x00\x00\x00"):
                    nz += 4
                skipped += nz
                head = head[nz:] + f.read(nz)
            if len(head) < 400:
                head += f.read(400 - len(head))
    if len(head) < 4:
        return ContainerFormat.UNKNOWN
    from tcforge_tpu.io.ts import sniff_ts
    if sniff_ts(head):
        return ContainerFormat.MPEG_TS
    if head[:4] == b"RIFF" and len(head) >= 12:
        if head[8:12] == b"AVI ":
            return ContainerFormat.AVI
        if head[8:12] == b"WAVE":
            return ContainerFormat.WAV
        if head[8:12] == b"CDXA":
            return ContainerFormat.CDXA
    if head[:8] == b"YUV4MPEG":       # fileinfo.c accepts the bare
        return ContainerFormat.YUV4MPEG   # 8-byte tag too
    if head[:4] == b"\x00\x00\x01\xba":
        return ContainerFormat.MPEG_PS
    if head[:4] in (b"\x00\x00\x01\xb3", b"\x00\x00\x01\xb0",
                    b"\x00\x00\x01\xb5"):
        # b5 = extension start (TC_MAGIC_PICEXT): an ES cut mid-GOP
        return ContainerFormat.MPEG_ES
    if head[:3] == b"\x00\x00\x01" and head[3:4] in (b"\xe0", b"\xc0"):
        return ContainerFormat.MPEG_PES
    if head[:4] == b"OggS":
        return ContainerFormat.OGG
    if head[:4] == b"\x7f\xfe\x80\x01":
        return ContainerFormat.DTS_FILE
    if head[:3] == b"ID3":
        return ContainerFormat.MP3_FILE
    if head[0] == 0xFF and (head[1] & 0xE0) == 0xE0:
        # MPEG audio syncword: layer bits split MP2 from MP3
        # (fileinfo.c:204-231 TC_MAGIC_MP2 vs MP3 family)
        layer = (head[1] >> 1) & 3
        return (ContainerFormat.MP2_FILE if layer == 2
                else ContainerFormat.MP3_FILE)
    if head[:2] == b"\x0b\x77":
        return ContainerFormat.AC3_FILE
    # MPEG audio sync behind 1-2 bytes of odd zero padding
    # (fileinfo.c:378-408: cmp_16_bits(buf+1/buf+2, MP3 family))
    for off in (1, 2):
        if (head[off] == 0xFF and (head[off + 1] & 0xE0) == 0xE0
                and head[:off] == b"\x00" * off):
            layer = (head[off + 1] >> 1) & 3
            return (ContainerFormat.MP2_FILE if layer == 2
                    else ContainerFormat.MP3_FILE)
    if head[:3] == b"\x1f\x07\x00":
        return ContainerFormat.DV_FILE
    if head[:16] == _ASF_GUID:
        return ContainerFormat.ASF
    if head[:8] == _MXF_MAGIC:
        return ContainerFormat.MXF
    if head[:4] == b"FLV\x01":
        return ContainerFormat.FLV
    if head[:4] == b".RMF":
        return ContainerFormat.RMF
    if head[:5] == b"BSDAV":
        return ContainerFormat.BSDAV
    if head[:4] == b".snd":
        return ContainerFormat.SUNAU
    if head[:6] == b"vncLog":
        return ContainerFormat.VNC_LOG
    if head[:4] in (b"PV3\x01", b"PV3\x02"):
        return ContainerFormat.PV3
    if head[:2] == b"\x01\xda":
        return ContainerFormat.SGI_IMAGE
    if len(head) >= 12 and head[4:8] in (b"ftyp", b"moov", b"mdat",
                                         b"wide", b"free", b"cmov",
                                         b"pnot"):
        return ContainerFormat.MOV
    if head[:2] == b"PV":
        return ContainerFormat.PVN
    if head[:2] in (b"P4", b"P5", b"P6"):
        return ContainerFormat.PPM_STREAM
    if head[:8] == b"\x89PNG\r\n\x1a\n":
        return ContainerFormat.IMAGES
    if head[:3] == b"\xff\xd8\xff":
        return ContainerFormat.IMAGES
    if head[:4] in (b"II*\x00", b"MM\x00*", b"GIF8"):
        return ContainerFormat.IMAGES
    if head.lstrip()[:5] in (b"<?xml", b"<smil"):
        return ContainerFormat.XML
    if head[:11] == b"NuppelVideo":
        return ContainerFormat.NUV
    if head[:2] == b"BM" and len(head) >= 6:
        return ContainerFormat.IMAGES
    if head[:4] in (b"VAGp", b"SShd"):
        return ContainerFormat.VAG
    return ContainerFormat.UNKNOWN


_FOURCC_FORMAT = {
    "I420": ImageFormat.YUV420P,
    "IYUV": ImageFormat.YUV420P,
    "YV12": ImageFormat.YV12,
    "YUY2": ImageFormat.YUY2,
    "UYVY": ImageFormat.UYVY,
    "YVYU": ImageFormat.YVYU,
    "RGB": ImageFormat.RGB24,
    "DIB": ImageFormat.RGB24,
    "": ImageFormat.RGB24,
}

_FOURCC_CODEC = {
    "I420": Codec.YUV420P, "IYUV": Codec.YUV420P, "YV12": Codec.YV12,
    "YUY2": Codec.YUY2, "UYVY": Codec.UYVY,
}


def _probe_avi(path: str, info: ProbeInfo) -> None:
    from tcforge_tpu.io.avi import AviReader
    with AviReader(path) as r:
        info.is_video = True
        info.width, info.height = r.video.width, r.video.height
        info.fps = r.video.fps
        info.num_frames = r.video_frames
        fcc = r.video.fourcc.strip().upper()
        info.format = _FOURCC_FORMAT.get(fcc, ImageFormat.UNKNOWN)
        from tcforge_tpu.core.codecs import codec_from_fourcc
        info.codec = _FOURCC_CODEC.get(
            fcc, codec_from_fourcc(fcc) if fcc else Codec.RGB24)
        if info.codec == Codec.UNKNOWN and info.format != ImageFormat.UNKNOWN:
            info.codec = Codec.RAW
        for a in r.audio:
            info.tracks.append(ProbeTrack(
                codec={1: Codec.PCM, 0x50: Codec.MP2, 0x55: Codec.MP3,
                       0xFF: Codec.AAC, 0x2000: Codec.AC3}.get(
                    a.format_tag, Codec.UNKNOWN),
                samplerate=a.rate, channels=a.channels, bits=a.bits))


def _probe_y4m(path: str, info: ProbeInfo) -> None:
    from tcforge_tpu.io.y4m import Y4MReader
    with Y4MReader(path) as r:
        h = r.header
        info.is_video = True
        info.width, info.height = h.width, h.height
        info.fps = h.fps
        info.codec = Codec.YUV4MPEG
        info.format = h.format
        # frame count from file size (fixed frame stride)
        size = os.path.getsize(path)
        stride = h.frame_bytes + 6  # "FRAME\n"
        hdr_len = len(h.to_line())
        if size > hdr_len:
            info.num_frames = (size - hdr_len) // stride


def _probe_wav(path: str, info: ProbeInfo) -> None:
    from tcforge_tpu.io.wav import WavReader
    with WavReader(path) as r:
        info.tracks.append(ProbeTrack(
            codec=Codec.PCM, samplerate=r.info.rate,
            channels=r.info.channels, bits=r.info.bits))


def probe_file(path: str, probe_mb: int = 0) -> ProbeInfo:
    """probe_stream_data analogue: sniff + deep probe.

    probe_mb: -H hint — how deep (MB) byte-scanning probers may look.
    """
    info = ProbeInfo()
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    info.magic = sniff_magic(path)
    if info.magic == ContainerFormat.AVI:
        _probe_avi(path, info)
    elif info.magic == ContainerFormat.YUV4MPEG:
        _probe_y4m(path, info)
    elif info.magic == ContainerFormat.WAV:
        _probe_wav(path, info)
    elif info.magic in (ContainerFormat.MPEG_PS,
                        ContainerFormat.MPEG_ES):
        from tcforge_tpu.io.mpeg import probe_mpeg
        probe_mpeg(path, info,
                   limit=(probe_mb << 20) if probe_mb else 2 << 20)
    elif info.magic == ContainerFormat.MPEG_TS:
        # transport stream: extract a little video ES first (the
        # sequence header may straddle TS packet payloads)
        from tcforge_tpu.io import ts as tsio
        from tcforge_tpu.io.mpeg import SEQ_START, parse_sequence_header
        es = b""
        for chunk in tsio.iter_video_es(path):
            es += chunk
            if len(es) >= (1 << 16):
                break
        pos = es.find(SEQ_START)
        if pos >= 0:
            seq = parse_sequence_header(es[pos + 4:pos + 16])
            if seq:
                info.is_video = True
                (info.width, info.height, info.asr, info.fps) = seq
                info.codec = Codec.MPEG2
        # PMT census: report the audio elementary streams too
        try:
            for epid, stype in sorted(
                    tsio.scan_programs(path).items()):
                name = tsio.TS_STREAM_TYPES.get(stype, "")
                if name in ("mp2", "aac", "aac_latm", "ac3"):
                    info.tracks.append(ProbeTrack(
                        codec={"mp2": Codec.MP2, "ac3": Codec.AC3,
                               }.get(name, Codec.AAC),
                        lavf_codec=name))
        except Exception:
            pass
    elif info.magic == ContainerFormat.SUNAU:
        from tcforge_tpu.io.au import AuReader
        try:
            with AuReader(path) as r:
                info.tracks.append(ProbeTrack(
                    codec=Codec.PCM, samplerate=r.rate,
                    channels=r.channels,
                    bits=16 if r.encoding == 3 else 8))
        except (ValueError, NotImplementedError):
            pass
    elif info.magic == ContainerFormat.VAG:
        from tcforge_tpu.io.vag import parse_header as _vag_hdr
        with open(path, "rb") as f:
            got = _vag_hdr(f.read(64))
        if got is not None:
            info.tracks.append(ProbeTrack(
                codec=(Codec.PCM if got.is_pcm else Codec.VAG),
                samplerate=got.rate, channels=got.channels, bits=16))
    elif info.magic == ContainerFormat.DV_FILE:
        from tcforge_tpu.io import dv as dvio
        with open(path, "rb") as f:
            frame = f.read(dvio.PAL_FRAME)
        d = dvio.parse_frame_info(frame)
        info.is_video = True
        info.width, info.height = d.width, d.height
        info.fps = d.fps
        info.codec = Codec.DV
        info.asr = 3 if d.is_wide else 2
        try:
            sz = os.path.getsize(path)
            info.num_frames = sz // d.frame_size
        except OSError:
            pass
        info.tracks.append(ProbeTrack(
            codec=Codec.PCM, samplerate=d.audio_rate,
            channels=2, bits=16))
    elif info.magic == ContainerFormat.OGG:
        from tcforge_tpu.io.ogg import identify_streams
        with open(path, "rb") as f:
            streams = identify_streams(f)
        for s in streams:
            if s.kind == "video" and not info.is_video:
                info.is_video = True
                info.width, info.height = s.width, s.height
                info.fps = s.fps
                info.codec = (Codec.THEORA if s.codec == "theora"
                              else Codec.UNKNOWN)
            elif s.kind == "audio":
                info.tracks.append(ProbeTrack(
                    codec=(Codec.VORBIS if s.codec == "vorbis"
                           else Codec.SPEEX if s.codec == "speex"
                           else Codec.FLAC if s.codec == "flac"
                           else Codec.UNKNOWN),
                    samplerate=s.samplerate, channels=s.channels,
                    bits=s.bits or 16))
    elif info.magic == ContainerFormat.MOV:
        from tcforge_tpu.io.mov import MovReader
        with MovReader(path) as r:
            v, a = r.video, r.audio
            if v is not None:
                info.is_video = True
                info.width, info.height = v.width, v.height
                info.fps = v.fps
                info.num_frames = v.n_samples
                fcc = v.fourcc.lower()
                if fcc in ("yv12", "y420"):
                    info.format = ImageFormat.YUV420P
                    info.codec = Codec.YUV420P
                elif fcc in ("2vuy", "yuv2"):
                    info.format = ImageFormat.UYVY
                    info.codec = Codec.UYVY
                elif fcc in ("jpeg", "mjpa"):
                    info.format = ImageFormat.RGB24
                    info.codec = Codec.MJPEG
                else:
                    info.format = ImageFormat.RGB24
                    info.codec = Codec.RGB24
            if a is not None:
                info.tracks.append(ProbeTrack(
                    codec=Codec.PCM, samplerate=a.samplerate,
                    channels=a.channels, bits=a.bits))
    elif info.magic == ContainerFormat.PVN:
        from tcforge_tpu.io import pvn
        with open(path, "rb") as f:
            hdr = pvn.read_header(f)
        info.is_video = True
        info.width, info.height = hdr.width, hdr.height
        info.fps = hdr.framerate
        info.num_frames = hdr.nframes
        info.codec = Codec.RGB24
        info.format = (ImageFormat.RGB24 if hdr.channels == 3
                       else ImageFormat.GRAY8)
    if info.magic == ContainerFormat.UNKNOWN:
        # libavformat fallback (mkv/webm/flv/whatever the bundled
        # FFmpeg demuxes) — the probe result still drives module
        # selection (ffmpeg importer)
        try:
            from tcforge_tpu.native import av as _av
            got = _av.fmtprobe(path)
        except Exception:
            got = None
        if got:
            info.lavf_container = got.get("container", "")
            for v in got["video"][:1]:
                info.is_video = True
                info.width, info.height = v["width"], v["height"]
                info.fps = v["fps"]
                info.lavf_vcodec = v["codec"]
            for a in got["audio"]:
                info.tracks.append(ProbeTrack(
                    codec=Codec.UNKNOWN, samplerate=a["rate"],
                    channels=a["channels"], bits=16,
                    lavf_codec=a["codec"]))
    if info.fps > 0:
        code = ratiocodes.frc_code_from_value(info.fps)
        info.frc = code if code is not None else 0
    return info


def probe_to_job(info: ProbeInfo, job: Job) -> Job:
    """probe_to_vob analogue (src/probe.c:395): fill the job record."""
    if info.is_video:
        job.im_v_width = info.width
        job.im_v_height = info.height
        if info.fps > 0:
            job.fps = info.fps
        job.im_frc = info.frc
        job.im_v_codec = info.codec
        job.im_v_format = info.magic
        if not (info.format.is_planar or info.format
                == ImageFormat.UNKNOWN) and not info.format.is_rgb:
            # packed YUV source: keep the packed layout internal
            job.im_colorspace = info.format
        # RGB sources stay at the -V internal colorspace; the engine
        # flips to RGB passthrough only when the muxer can take RGB
        if info.num_frames and job.max_frames is None:
            job.max_frames = info.num_frames
    if info.tracks:
        t = info.tracks[0]
        job.a_rate = t.samplerate or job.a_rate
        job.a_chan = t.channels or job.a_chan
        job.a_bits = t.bits or job.a_bits
        job.im_a_codec = t.codec
    return job
