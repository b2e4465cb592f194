"""ctypes wrapper over native/libtcforge_av.so — the FFmpeg bridge
(libtcext role).  Everything here degrades to None/False when the
shim or the system FFmpeg libraries are absent; callers gate features
on :func:`available`."""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libtcforge_av.so")


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    from tcforge_tpu import native as _host
    if _host.DISABLED:
        return None
    if _TRIED:
        return _LIB
    _TRIED = True
    from tcforge_tpu.native.build import ensure_fresh
    ensure_fresh()
    try:
        lib = ctypes.CDLL(_lib_path())
    except OSError:
        return None
    c_vp, c_i, c_i64, c_cp = (ctypes.c_void_p, ctypes.c_int,
                              ctypes.c_int64, ctypes.c_char_p)
    sigs = {
        "tc_avad_new": (c_vp, [c_cp]),
        "tc_avad_set_extradata": (c_i, [c_vp, c_cp, c_i]),
        "tc_avad_feed": (c_i, [c_vp, c_vp, c_i]),
        "tc_avad_flush": (c_i, [c_vp]),
        "tc_avad_rate": (c_i, [c_vp]),
        "tc_avad_channels": (c_i, [c_vp]),
        "tc_avad_read": (c_i64, [c_vp, c_vp, c_i64]),
        "tc_avad_err": (c_cp, [c_vp]),
        "tc_avad_free": (None, [c_vp]),
        "tc_avae_new": (c_vp, [c_cp, c_i, c_i, c_i]),
        "tc_avae_set_framed": (c_i, [c_vp, c_i]),
        "tc_avae_extradata": (c_i, [c_vp, c_vp, c_i]),
        "tc_avae_frame_size": (c_i, [c_vp]),
        "tc_avae_feed": (c_i, [c_vp, c_vp, c_i64]),
        "tc_avae_flush": (c_i, [c_vp]),
        "tc_avae_read": (c_i64, [c_vp, c_vp, c_i64]),
        "tc_avae_err": (c_cp, [c_vp]),
        "tc_avae_free": (None, [c_vp]),
        "tc_avvd_new": (c_vp, [c_cp]),
        "tc_avvd_set_extradata": (c_i, [c_vp, c_cp, c_i]),
        "tc_avvd_feed": (c_i, [c_vp, c_vp, c_i]),
        "tc_avvd_recv": (c_i, [c_vp, c_vp, c_vp, c_vp,
                               ctypes.POINTER(c_i),
                               ctypes.POINTER(c_i)]),
        "tc_avvd_recv2": (c_i, [c_vp, c_vp, c_vp, c_vp,
                                ctypes.POINTER(c_i),
                                ctypes.POINTER(c_i), c_i]),
        "tc_avvd_src_chroma": (c_i, [c_vp]),
        "tc_avvd_flush": (c_i, [c_vp]),
        "tc_avvd_err": (c_cp, [c_vp]),
        "tc_avvd_free": (None, [c_vp]),
        "tc_avve_new": (c_vp, [c_cp, c_i, c_i, c_i, c_i, c_i, c_i]),
        "tc_avve_new2": (c_vp, [c_cp, c_i, c_i, c_i, c_i, c_i, c_i,
                                c_i]),
        "tc_avve_new3": (c_vp, [c_cp, c_i, c_i, c_i, c_i, c_i, c_i,
                                c_i, c_i, c_cp]),
        "tc_avve_new4": (c_vp, [c_cp, c_i, c_i, c_i, c_i, c_i, c_i,
                                c_i, c_i, c_cp, c_cp]),
        "tc_avve_chroma": (c_i, [c_vp]),
        "tc_avve_extradata": (c_i, [c_vp, c_vp, c_i]),
        "tc_avve_feed": (c_i, [c_vp, c_vp, c_vp, c_vp]),
        "tc_avve_flush": (c_i, [c_vp]),
        "tc_avve_read": (c_i64, [c_vp, c_vp, c_i64]),
        "tc_avve_err": (c_cp, [c_vp]),
        "tc_avve_free": (None, [c_vp]),
        "tc_lzo1x_decode": (c_i, [c_vp, c_i, c_vp,
                                  ctypes.POINTER(c_i)]),
        "tc_fmtprobe": (c_i, [c_cp, c_vp, c_i]),
        "tc_fmtvideo_open": (c_vp, [c_cp]),
        "tc_fmtvideo_width": (c_i, [c_vp]),
        "tc_fmtvideo_height": (c_i, [c_vp]),
        "tc_fmtvideo_fps": (ctypes.c_double, [c_vp]),
        "tc_fmtvideo_nframes": (c_i64, [c_vp]),
        "tc_fmtvideo_read": (c_i, [c_vp, c_vp, c_vp, c_vp]),
        "tc_fmtvideo_free": (None, [c_vp]),
        "tc_mux_open": (c_vp, [c_cp, c_cp]),
        "tc_mux_add_video": (c_i, [c_vp, c_cp, c_i, c_i, c_i, c_i,
                                   c_vp, c_i]),
        "tc_mux_add_audio": (c_i, [c_vp, c_cp, c_i, c_i, c_vp, c_i]),
        "tc_mux_write_header": (c_i, [c_vp]),
        "tc_mux_write": (c_i, [c_vp, c_i, c_vp, c_i64, c_i64, c_i64,
                               c_i]),
        "tc_mux_err": (c_cp, [c_vp]),
        "tc_mux_close": (c_i, [c_vp]),
        "tc_fmtaudio_open": (c_vp, [c_cp, c_i]),
        "tc_fmtaudio_pump": (c_i, [c_vp]),
        "tc_fmtaudio_rate": (c_i, [c_vp]),
        "tc_fmtaudio_channels": (c_i, [c_vp]),
        "tc_fmtaudio_eof": (c_i, [c_vp]),
        "tc_fmtaudio_read": (c_i64, [c_vp, c_vp, c_i64]),
        "tc_fmtaudio_free": (None, [c_vp]),
        "tc_fmtpkt_open": (c_vp, [c_cp, c_i]),
        "tc_fmtpkt_codec": (c_i, [c_vp, c_vp, c_i]),
        "tc_fmtpkt_extradata": (c_i, [c_vp, c_vp, c_i]),
        "tc_fmtpkt_next": (c_i64, [c_vp, c_vp, c_i64]),
        "tc_fmtpkt_free": (None, [c_vp]),
    }
    try:
        for name, (res, args) in sigs.items():
            fn = getattr(lib, name)
            fn.restype = res
            fn.argtypes = args
    except AttributeError:
        return None
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


def have_codec(name: str, encoder: bool = False) -> bool:
    lib = load()
    if lib is None:
        return False
    fn = lib.tc_avae_new if encoder else lib.tc_avad_new
    if encoder:
        h = fn(name.encode(), 48000, 2, 192000)
        if h:
            lib.tc_avae_free(h)
        return bool(h)
    h = fn(name.encode())
    if h:
        lib.tc_avad_free(h)
    return bool(h)


def split_xiph_extradata(blob: bytes) -> List[bytes]:
    """Extradata blob -> header packets.  FFmpeg uses two layouts:
    255-lacing (first byte = npackets-1, vorbis encoder) and plain
    16-bit-BE length prefixes (libtheora encoder)."""
    if not blob:
        return []
    if blob[0] == 2:                   # 255-lacing, 3 packets
        pos = 1
        sizes = []
        for _ in range(2):
            ln = 0
            while pos < len(blob) and blob[pos] == 255:
                ln += 255
                pos += 1
            ln += blob[pos]
            pos += 1
            sizes.append(ln)
        out = [blob[pos:pos + sizes[0]],
               blob[pos + sizes[0]:pos + sizes[0] + sizes[1]],
               blob[pos + sizes[0] + sizes[1]:]]
        if all(out):
            return out
    # u16be length-prefixed walk
    out = []
    pos = 0
    while pos + 2 <= len(blob):
        ln = (blob[pos] << 8) | blob[pos + 1]
        pos += 2
        out.append(blob[pos:pos + ln])
        pos += ln
    return out if pos == len(blob) and out else [blob]


def xiph_extradata(headers: List[bytes]) -> bytes:
    """FFmpeg's extradata layout for Vorbis/Theora: packet count - 1,
    then 255-stuffed lacing sizes of all but the last packet, then
    the packet bytes."""
    out = bytearray([len(headers) - 1])
    for pkt in headers[:-1]:
        n = len(pkt)
        while n >= 255:
            out.append(255)
            n -= 255
        out.append(n)
    for pkt in headers:
        out += pkt
    return bytes(out)


class AvAudioDecoder:
    """Byte stream (or packets) in, interleaved int16 PCM out."""

    def __init__(self, codec: str,
                 header_packets: Optional[List[bytes]] = None):
        lib = load()
        if lib is None:
            raise NotImplementedError(
                "FFmpeg bridge not built (native/libtcforge_av.so)")
        self._lib = lib
        self._h = lib.tc_avad_new(codec.encode())
        if not self._h:
            raise NotImplementedError(
                f"FFmpeg: no decoder for {codec!r}")
        if header_packets:
            blob = xiph_extradata(header_packets)
            lib.tc_avad_set_extradata(self._h, blob, len(blob))

    def feed(self, data: bytes) -> None:
        if data and self._lib.tc_avad_feed(self._h, data,
                                           len(data)) < 0:
            raise ValueError("audio decode failed: " +
                             (self._lib.tc_avad_err(self._h) or
                              b"").decode())

    def flush(self) -> None:
        self._lib.tc_avad_flush(self._h)

    @property
    def rate(self) -> int:
        return self._lib.tc_avad_rate(self._h)

    @property
    def channels(self) -> int:
        return self._lib.tc_avad_channels(self._h)

    def read(self, max_samples: int = 1 << 18) -> Optional[np.ndarray]:
        """Drain up to max_samples per channel (callers loop until
        None — the backlog may exceed one read)."""
        ch = max(1, self.channels)
        out = []
        while True:
            buf = np.empty(max_samples * ch, np.int16)
            n = self._lib.tc_avad_read(self._h, buf.ctypes.data,
                                       buf.size)
            if n <= 0:
                break
            out.append(buf[:n])
            if n < buf.size:
                break
        if not out:
            return None
        return np.concatenate(out).reshape(-1, ch)

    def close(self) -> None:
        if self._h:
            self._lib.tc_avad_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class AvAudioEncoder:
    """Interleaved int16 PCM in, packet byte stream out."""

    def __init__(self, codec: str, rate: int, channels: int,
                 bitrate: int = 192000):
        lib = load()
        if lib is None:
            raise NotImplementedError(
                "FFmpeg bridge not built (native/libtcforge_av.so)")
        self._lib = lib
        self._h = lib.tc_avae_new(codec.encode(), rate, channels,
                                  bitrate)
        if not self._h:
            raise NotImplementedError(
                f"FFmpeg: no encoder for {codec!r} at {rate} Hz")
        self.channels = channels
        self.framed = False

    def set_framed(self, framed: bool = True) -> None:
        """Length-prefix each packet in read() output (codecs without
        self-framing byte streams: vorbis)."""
        self.framed = framed
        self._lib.tc_avae_set_framed(self._h, int(framed))

    @property
    def extradata(self) -> bytes:
        buf = np.empty(1 << 16, np.uint8)
        n = self._lib.tc_avae_extradata(self._h, buf.ctypes.data,
                                        buf.size)
        return buf[:max(0, n)].tobytes()

    def read_packets(self) -> List[bytes]:
        data = getattr(self, "_pkt_carry", b"") + self.read()
        out = []
        pos = 0
        while pos + 4 <= len(data):
            ln = int.from_bytes(data[pos:pos + 4], "big")
            if pos + 4 + ln > len(data):
                break                  # split across the read cap
            pos += 4
            out.append(data[pos:pos + ln])
            pos += ln
        self._pkt_carry = data[pos:]
        return out

    @property
    def frame_size(self) -> int:
        return self._lib.tc_avae_frame_size(self._h)

    def feed(self, pcm: np.ndarray) -> None:
        pcm = np.ascontiguousarray(pcm, np.int16)
        if self._lib.tc_avae_feed(self._h, pcm.ctypes.data,
                                  pcm.shape[0]) < 0:
            raise ValueError("audio encode failed: " +
                             (self._lib.tc_avae_err(self._h) or
                              b"").decode())

    def flush(self) -> None:
        self._lib.tc_avae_flush(self._h)

    def read(self) -> bytes:
        chunks = []
        while True:
            buf = np.empty(1 << 22, np.uint8)
            n = self._lib.tc_avae_read(self._h, buf.ctypes.data,
                                       buf.size)
            if n <= 0:
                break
            chunks.append(buf[:n].tobytes())
            if n < buf.size:
                break
        return b"".join(chunks)

    def close(self) -> None:
        if self._h:
            self._lib.tc_avae_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class AvVideoDecoder:
    """One coded frame per feed; YUV420P planes out."""

    def __init__(self, codec: str,
                 header_packets: Optional[List[bytes]] = None):
        lib = load()
        if lib is None:
            raise NotImplementedError(
                "FFmpeg bridge not built (native/libtcforge_av.so)")
        self._lib = lib
        self._h = lib.tc_avvd_new(codec.encode())
        if not self._h:
            raise NotImplementedError(
                f"FFmpeg: no decoder for {codec!r}")
        if header_packets:
            blob = xiph_extradata(header_packets)
            lib.tc_avvd_set_extradata(self._h, blob, len(blob))

    @staticmethod
    def _chroma_shape(chroma: int, W: int, H: int):
        """(rows, cols) of a chroma plane for the family: 1 = 4:2:0,
        2 = 4:2:2 (full vertical), 3 = 4:1:1 (quarter width, full
        vertical — DV NTSC), 4 = 4:4:4."""
        if chroma == 4:
            return H, W
        if chroma == 3:
            return H, W // 4
        return (H if chroma == 2 else H // 2), W // 2

    def decode(self, packet: bytes, chroma: int = 1
               ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                   np.ndarray]]:
        """chroma: 1 = YUV420P out, 2 = YUV422P out (full vertical
        chroma), 3 = YUV411P out (quarter-width chroma); 2/3 need a
        bridge built with tc_avvd_recv2."""
        lib = self._lib
        if lib.tc_avvd_feed(self._h, packet, len(packet)) < 0:
            raise ValueError("video decode failed: " +
                             (lib.tc_avvd_err(self._h) or b"")
                             .decode())
        w = ctypes.c_int()
        h = ctypes.c_int()
        # geometry probe first (frame stays queued in the codec until
        # buffers are provided? no — recv consumes; so probe via a
        # null call only when size unknown)
        rc = lib.tc_avvd_recv(self._h, None, None, None,
                              ctypes.byref(w), ctypes.byref(h))
        if rc <= 0:
            return None
        if hasattr(lib, "tc_avvd_src_chroma"):
            # source chroma family of the held frame (2 = 4:2:2)
            self.last_src_chroma = int(
                lib.tc_avvd_src_chroma(self._h))
        W, H = w.value, h.value
        y = np.empty((H, W), np.uint8)
        u = np.empty(self._chroma_shape(chroma, W, H), np.uint8)
        v = np.empty_like(u)
        if chroma in (2, 3, 4):
            if not hasattr(lib, "tc_avvd_recv2"):
                raise NotImplementedError(
                    "FFmpeg bridge too old for 4:2:2/4:1:1 output "
                    "(rebuild native/libtcforge_av.so)")
            rc = lib.tc_avvd_recv2(self._h, y.ctypes.data,
                                   u.ctypes.data, v.ctypes.data,
                                   ctypes.byref(w), ctypes.byref(h),
                                   chroma)
        else:
            rc = lib.tc_avvd_recv(self._h, y.ctypes.data,
                                  u.ctypes.data, v.ctypes.data,
                                  ctypes.byref(w), ctypes.byref(h))
        if rc <= 0:
            return None
        return y, u, v

    def flush(self, chroma: int = 1):
        """Signal EOS and drain delayed frames (list of plane
        tuples)."""
        lib = self._lib
        if not hasattr(lib, "tc_avvd_flush"):
            return []
        lib.tc_avvd_flush(self._h)
        out = []
        while True:
            w = ctypes.c_int()
            h = ctypes.c_int()
            rc = lib.tc_avvd_recv(self._h, None, None, None,
                                  ctypes.byref(w), ctypes.byref(h))
            if rc <= 0:
                break
            W, H = w.value, h.value
            y = np.empty((H, W), np.uint8)
            u = np.empty(self._chroma_shape(chroma, W, H), np.uint8)
            v = np.empty_like(u)
            rc = lib.tc_avvd_recv2(self._h, y.ctypes.data,
                                   u.ctypes.data, v.ctypes.data,
                                   ctypes.byref(w), ctypes.byref(h),
                                   chroma) \
                if chroma in (2, 3, 4) else \
                lib.tc_avvd_recv(self._h, y.ctypes.data,
                                 u.ctypes.data, v.ctypes.data,
                                 ctypes.byref(w), ctypes.byref(h))
            if rc <= 0:
                break
            out.append((y, u, v))
        return out

    def close(self) -> None:
        if self._h:
            self._lib.tc_avvd_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class AvVideoEncoder:
    """YUV420P planes in; (payload, keyframe) packets out."""

    def __init__(self, codec: str, width: int, height: int,
                 fps: float = 25.0, bitrate: int = 4_000_000,
                 gop: int = 12, global_header: bool = False,
                 pass_n: int = 0, stats_file: Optional[str] = None,
                 opts: Optional[dict] = None):
        lib = load()
        if lib is None:
            raise NotImplementedError(
                "FFmpeg bridge not built (native/libtcforge_av.so)")
        self._lib = lib
        from fractions import Fraction
        if abs(fps - 30000 / 1001) < 1e-3:
            num, den = 30000, 1001
        elif abs(fps - 24000 / 1001) < 1e-3:
            num, den = 24000, 1001
        elif abs(fps - 60000 / 1001) < 1e-3:
            num, den = 60000, 1001
        else:
            fr = Fraction(fps).limit_denominator(65535)
            num, den = fr.numerator, fr.denominator
        opt_blob = None
        if opts:
            # cfg-file / optstring AVOptions (x264.cfg et al.):
            # newline-separated "key=value" lines for tc_avve_new4
            opt_blob = "\n".join(
                f"{k}={v}" for k, v in opts.items()).encode()
        if (pass_n or opt_blob) and hasattr(lib, "tc_avve_new4"):
            self._h = lib.tc_avve_new4(
                codec.encode(), width, height, num, den, bitrate,
                gop, 1 if global_header else 0, pass_n,
                (stats_file or "divx4.log").encode() if pass_n
                else None, opt_blob)
            if not self._h:
                if pass_n:
                    raise ValueError(
                        f"FFmpeg: pass-{pass_n} open failed for "
                        f"{codec!r} (missing/unreadable stats file "
                        f"{stats_file!r}?)")
                raise NotImplementedError(
                    f"FFmpeg: no encoder for {codec!r}")
        elif pass_n and hasattr(lib, "tc_avve_new3"):
            # -R multipass: AV_CODEC_FLAG_PASS1/2 + stats log
            self._h = lib.tc_avve_new3(
                codec.encode(), width, height, num, den, bitrate,
                gop, 1 if global_header else 0, pass_n,
                (stats_file or "divx4.log").encode())
            if not self._h:
                raise ValueError(
                    f"FFmpeg: pass-{pass_n} open failed for "
                    f"{codec!r} (missing/unreadable stats file "
                    f"{stats_file!r}?)")
        elif hasattr(lib, "tc_avve_new2"):
            self._h = lib.tc_avve_new2(codec.encode(), width, height,
                                       num, den, bitrate, gop,
                                       1 if global_header else 0)
        else:
            self._h = lib.tc_avve_new(codec.encode(), width, height,
                                      num, den, bitrate, gop)
        if not self._h:
            raise NotImplementedError(
                f"FFmpeg: no encoder for {codec!r}")

    @property
    def extradata(self) -> bytes:
        """Codec global headers (xiph lacing for theora/vorbis)."""
        if not hasattr(self._lib, "tc_avve_extradata"):
            return b""
        buf = np.empty(1 << 16, np.uint8)
        n = self._lib.tc_avve_extradata(self._h, buf.ctypes.data,
                                        buf.size)
        return buf[:max(0, n)].tobytes()

    def _read_packets(self) -> List[Tuple[bytes, bool]]:
        chunks = [getattr(self, "_pkt_carry", b"")]
        while True:
            buf = np.empty(1 << 22, np.uint8)
            n = self._lib.tc_avve_read(self._h, buf.ctypes.data,
                                       buf.size)
            if n <= 0:
                break
            chunks.append(buf[:n].tobytes())
            if n < buf.size:
                break
        data = b"".join(chunks)
        out: List[Tuple[bytes, bool]] = []
        pos = 0
        while pos + 5 <= len(data):
            ln = int.from_bytes(data[pos:pos + 4], "big")
            if pos + 5 + ln > len(data):
                break                  # split across the read cap
            key = bool(data[pos + 4])
            pos += 5
            out.append((data[pos:pos + ln], key))
            pos += ln
        self._pkt_carry = data[pos:]
        return out

    def encode(self, y: np.ndarray, u: np.ndarray,
               v: np.ndarray) -> List[Tuple[bytes, bool]]:
        y = np.ascontiguousarray(y, np.uint8)
        u = np.ascontiguousarray(u, np.uint8)
        v = np.ascontiguousarray(v, np.uint8)
        # the C side fills planes per the context's pixel format:
        # refuse geometry that doesn't match it (an undersized chroma
        # buffer would be over-read)
        fam = self._lib.tc_avve_chroma(self._h)
        want = AvVideoDecoder._chroma_shape(fam, y.shape[1],
                                            y.shape[0])
        if u.shape != want or v.shape != want:
            raise ValueError(
                f"encoder pixel format expects {want} chroma "
                f"planes, got {u.shape} (pass matching planes or "
                "drop the pixel_format option)")
        if self._lib.tc_avve_feed(self._h, y.ctypes.data,
                                  u.ctypes.data, v.ctypes.data) < 0:
            raise ValueError("video encode failed: " +
                             (self._lib.tc_avve_err(self._h) or b"")
                             .decode())
        return self._read_packets()

    def flush(self) -> List[Tuple[bytes, bool]]:
        self._lib.tc_avve_flush(self._h)
        return self._read_packets()

    def close(self) -> None:
        if self._h:
            self._lib.tc_avve_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def lzo1x_decode(data: bytes, max_out: int) -> bytes:
    """LZO1X decompression via libavutil (import_lzo.c role)."""
    lib = load()
    if lib is None:
        raise NotImplementedError(
            "lzo: FFmpeg bridge not built (make -C native)")
    out = np.empty(max_out, np.uint8)
    n = ctypes.c_int(max_out)
    rc = lib.tc_lzo1x_decode(data, len(data), out.ctypes.data,
                             ctypes.byref(n))
    if rc != 0:
        raise ValueError("lzo: corrupt LZO1X stream")
    return out[:n.value].tobytes()


def fmtprobe(path: str) -> Optional[dict]:
    """libavformat probe: container/duration/stream summary, or None
    when the bridge is absent or the file is unknown to FFmpeg."""
    lib = load()
    if lib is None or not hasattr(lib, "tc_fmtprobe"):
        return None
    buf = ctypes.create_string_buffer(1 << 14)
    n = lib.tc_fmtprobe(path.encode(), buf, len(buf))
    if n <= 0:
        return None
    out = {"video": [], "audio": []}
    for line in buf.value.decode("utf-8", "replace").splitlines():
        key, _, val = line.partition("=")
        if key == "container":
            out["container"] = val
        elif key == "duration":
            out["duration"] = float(val)
        elif key == "video":
            codec, geo, fps = val.split()
            w, h = geo.split("x")
            out["video"].append({"codec": codec, "width": int(w),
                                 "height": int(h),
                                 "fps": float(fps)})
        elif key == "audio":
            codec, rate, ch = val.split()
            out["audio"].append({"codec": codec, "rate": int(rate),
                                 "channels": int(ch)})
    return out


class AvMuxer:
    """libavformat container writer (multiplex_lavf.c role): coded
    packets in, mp4/mkv/mpegts/avi/mov/... out.  Streams use a fixed
    input timebase (video 1/fps, audio 1/rate); pass pts in those
    units."""

    def __init__(self, path: str, format: str = ""):
        lib = load()
        if lib is None:
            raise NotImplementedError(
                "FFmpeg bridge not built (native/libtcforge_av.so)")
        if not hasattr(lib, "tc_mux_open"):
            raise NotImplementedError(
                "FFmpeg bridge too old — rebuild: make -C native")
        self._lib = lib
        self._h = lib.tc_mux_open(path.encode(), format.encode())
        if not self._h:
            raise ValueError(
                f"lavf: cannot open {path!r} (format {format!r})")

    def _xd(self, extradata):
        if not extradata:
            return None, 0
        buf = np.frombuffer(bytes(extradata), np.uint8)
        return buf.ctypes.data, len(extradata)

    def add_video(self, codec: str, width: int, height: int,
                  fps: float, extradata: bytes = b"") -> int:
        from fractions import Fraction
        if abs(fps - 30000 / 1001) < 1e-3:
            num, den = 30000, 1001
        elif abs(fps - 24000 / 1001) < 1e-3:
            num, den = 24000, 1001
        else:
            fr = Fraction(fps).limit_denominator(65535)
            num, den = fr.numerator, fr.denominator
        self._xd_keep = bytes(extradata)      # keepalive for ctypes
        ptr, ln = self._xd(self._xd_keep)
        idx = self._lib.tc_mux_add_video(self._h, codec.encode(),
                                         width, height, num, den,
                                         ptr, ln)
        if idx < 0:
            raise ValueError(f"lavf: cannot add video {codec!r}")
        return idx

    def add_audio(self, codec: str, rate: int, channels: int,
                  extradata: bytes = b"") -> int:
        self._xda_keep = bytes(extradata)
        ptr, ln = self._xd(self._xda_keep)
        idx = self._lib.tc_mux_add_audio(self._h, codec.encode(),
                                         rate, channels, ptr, ln)
        if idx < 0:
            raise ValueError(f"lavf: cannot add audio {codec!r}")
        return idx

    def write_header(self) -> None:
        if self._lib.tc_mux_write_header(self._h) < 0:
            raise ValueError("lavf: " +
                             (self._lib.tc_mux_err(self._h) or b"")
                             .decode())

    def write(self, stream: int, data: bytes, pts: int,
              duration: int = 1, key: bool = True) -> None:
        buf = np.frombuffer(data, np.uint8)
        if self._lib.tc_mux_write(self._h, stream, buf.ctypes.data,
                                  len(data), pts, duration,
                                  1 if key else 0) < 0:
            raise ValueError("lavf: " +
                             (self._lib.tc_mux_err(self._h) or b"")
                             .decode())

    def close(self) -> None:
        if self._h:
            self._lib.tc_mux_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class AvFileVideo:
    """libavformat-backed file video decode straight to YUV420P (no
    RGB round trip) — the native tier of the import_ffmpeg.c role."""

    def __init__(self, path: str):
        lib = load()
        if lib is None or not hasattr(lib, "tc_fmtvideo_open"):
            raise NotImplementedError(
                "FFmpeg bridge not built (native/libtcforge_av.so)")
        self._lib = lib
        self._h = lib.tc_fmtvideo_open(path.encode())
        if not self._h:
            raise NotImplementedError(
                f"FFmpeg: no decodable video in {path!r}")
        self.width = lib.tc_fmtvideo_width(self._h)
        self.height = lib.tc_fmtvideo_height(self._h)
        self.fps = lib.tc_fmtvideo_fps(self._h)
        n = lib.tc_fmtvideo_nframes(self._h)
        self.total_frames = int(n) if n > 0 else None

    def read(self):
        """-> (y, u, v) uint8 planes or None at EOF."""
        w, h = self.width, self.height
        y = np.empty((h, w), np.uint8)
        u = np.empty((h // 2, w // 2), np.uint8)
        v = np.empty((h // 2, w // 2), np.uint8)
        rc = self._lib.tc_fmtvideo_read(self._h, y.ctypes.data,
                                        u.ctypes.data, v.ctypes.data)
        if rc < 0:
            raise ValueError("video decode failed")
        if rc == 0:
            return None
        return y, u, v

    def close(self) -> None:
        if self._h:
            self._lib.tc_fmtvideo_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class AvFileAudio:
    """libavformat-backed file audio decode: any container this
    FFmpeg build demuxes (DV, MP4, MKV, ...) -> interleaved s16."""

    def __init__(self, path: str, track: int = 0):
        lib = load()
        if lib is None:
            raise NotImplementedError(
                "FFmpeg bridge not built (native/libtcforge_av.so)")
        self._lib = lib
        self._h = lib.tc_fmtaudio_open(path.encode(), track)
        if not self._h:
            raise NotImplementedError(
                f"FFmpeg: no decodable audio track {track} in "
                f"{path!r}")
        self.rate = lib.tc_fmtaudio_rate(self._h)
        self.channels = lib.tc_fmtaudio_channels(self._h)

    def read(self, max_samples: int = 1 << 18):
        lib = self._lib
        if lib.tc_fmtaudio_pump(self._h) < 0:
            raise ValueError("audio decode failed")
        ch = max(1, self.channels)
        buf = np.empty(max_samples * ch, np.int16)
        n = lib.tc_fmtaudio_read(self._h, buf.ctypes.data, buf.size)
        if n <= 0:
            return None if lib.tc_fmtaudio_eof(self._h) else                 np.empty((0, ch), np.int16)
        return buf[:n].reshape(-1, ch)

    def close(self) -> None:
        if self._h:
            self._lib.tc_fmtaudio_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class AvFilePackets:
    """Raw stored-packet extraction for ANY container libavformat
    demuxes (the extract_mxf.c role): tcextract's fallback data
    plane.  stream: -1 best video, -2 best audio, or an index."""

    def __init__(self, path: str, stream: int = -1):
        lib = load()
        if lib is None:
            raise NotImplementedError("FFmpeg bridge not built")
        self._lib = lib
        self._h = lib.tc_fmtpkt_open(path.encode(), stream)
        if not self._h:
            raise ValueError(
                f"FFmpeg cannot demux {path!r} (or no such stream)")

    @property
    def codec(self) -> str:
        buf = ctypes.create_string_buffer(64)
        self._lib.tc_fmtpkt_codec(self._h, buf, 64)
        return buf.value.decode()

    @property
    def extradata(self) -> bytes:
        buf = np.empty(1 << 16, np.uint8)
        n = self._lib.tc_fmtpkt_extradata(self._h, buf.ctypes.data,
                                          buf.size)
        return buf[:max(0, n)].tobytes()

    def __iter__(self):
        buf = np.empty(1 << 24, np.uint8)
        while True:
            n = self._lib.tc_fmtpkt_next(self._h, buf.ctypes.data,
                                         buf.size)
            if n <= 0:
                if n < 0:
                    raise ValueError("packet exceeds 16 MB")
                return
            yield buf[:n].tobytes()

    def close(self) -> None:
        if self._h:
            self._lib.tc_fmtpkt_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
