"""V4L2 webcam/tuner capture — the import/v4l/import_v4l2.c role.

Real Video4Linux2 streaming-I/O capture over ctypes: QUERYCAP
capability check, S_FMT pixel-format negotiation down a candidate
list, S_PARM frame-rate hint, REQBUFS/QUERYBUF mmap ring setup,
STREAMON, then DQBUF -> copy -> QBUF grabs with the EIO resync
recovery the reference does (import_v4l2.c:287-561: requeue every
buffer after an EIO and carry on).

The kernel interface is injected (``DeviceOps``) so the negotiation
and ring logic is unit-testable against a scripted fake; the real ops
use fcntl.ioctl + mmap on /dev/video*.
"""

from __future__ import annotations

import ctypes
import errno
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

# ------------------------------------------------------------------ #
# uapi structs (linux/videodev2.h) — ctypes mirrors; ioctl codes are
# computed from sizeof like the _IOWR macro does

V4L2_BUF_TYPE_VIDEO_CAPTURE = 1
V4L2_MEMORY_MMAP = 1
V4L2_CAP_VIDEO_CAPTURE = 0x00000001
V4L2_CAP_STREAMING = 0x04000000
V4L2_BUF_FLAG_DONE = 0x00000004
V4L2_FIELD_NONE = 1


def fourcc(code: str) -> int:
    a, b, c, d = (ord(x) for x in code)
    return a | (b << 8) | (c << 16) | (d << 24)


PIX_FMT_YUYV = fourcc("YUYV")
PIX_FMT_UYVY = fourcc("UYVY")
PIX_FMT_RGB24 = fourcc("RGB3")
PIX_FMT_BGR24 = fourcc("BGR3")
PIX_FMT_YUV420 = fourcc("YU12")
PIX_FMT_GREY = fourcc("GREY")

# negotiation order mirrors v4l2_format_conversions: native planar
# first, then packed 4:2:2, then RGB (import_v4l2.c:84-130)
CANDIDATE_FORMATS: Tuple[int, ...] = (
    PIX_FMT_YUV420, PIX_FMT_YUYV, PIX_FMT_UYVY,
    PIX_FMT_RGB24, PIX_FMT_BGR24, PIX_FMT_GREY)


class v4l2_capability(ctypes.Structure):
    _fields_ = [("driver", ctypes.c_char * 16),
                ("card", ctypes.c_char * 32),
                ("bus_info", ctypes.c_char * 32),
                ("version", ctypes.c_uint32),
                ("capabilities", ctypes.c_uint32),
                ("device_caps", ctypes.c_uint32),
                ("reserved", ctypes.c_uint32 * 3)]


class v4l2_pix_format(ctypes.Structure):
    _fields_ = [("width", ctypes.c_uint32),
                ("height", ctypes.c_uint32),
                ("pixelformat", ctypes.c_uint32),
                ("field", ctypes.c_uint32),
                ("bytesperline", ctypes.c_uint32),
                ("sizeimage", ctypes.c_uint32),
                ("colorspace", ctypes.c_uint32),
                ("priv", ctypes.c_uint32),
                ("flags", ctypes.c_uint32),
                ("ycbcr_enc", ctypes.c_uint32),
                ("quantization", ctypes.c_uint32),
                ("xfer_func", ctypes.c_uint32)]


class _fmt_union(ctypes.Union):
    _fields_ = [("pix", v4l2_pix_format),
                ("raw_data", ctypes.c_uint8 * 200)]


class v4l2_format(ctypes.Structure):
    # the in-kernel union holds pointers -> 8-byte alignment
    _fields_ = [("type", ctypes.c_uint32),
                ("_pad", ctypes.c_uint32),
                ("fmt", _fmt_union)]


class v4l2_requestbuffers(ctypes.Structure):
    _fields_ = [("count", ctypes.c_uint32),
                ("type", ctypes.c_uint32),
                ("memory", ctypes.c_uint32),
                ("capabilities", ctypes.c_uint32),
                ("flags", ctypes.c_uint8),
                ("reserved", ctypes.c_uint8 * 3)]


class v4l2_timecode(ctypes.Structure):
    _fields_ = [("type", ctypes.c_uint32),
                ("flags", ctypes.c_uint32),
                ("frames", ctypes.c_uint8),
                ("seconds", ctypes.c_uint8),
                ("minutes", ctypes.c_uint8),
                ("hours", ctypes.c_uint8),
                ("userbits", ctypes.c_uint8 * 4)]


class _timeval(ctypes.Structure):
    _fields_ = [("tv_sec", ctypes.c_long),
                ("tv_usec", ctypes.c_long)]


class _buf_m(ctypes.Union):
    _fields_ = [("offset", ctypes.c_uint32),
                ("userptr", ctypes.c_ulong),
                ("fd", ctypes.c_int32)]


class v4l2_buffer(ctypes.Structure):
    _fields_ = [("index", ctypes.c_uint32),
                ("type", ctypes.c_uint32),
                ("bytesused", ctypes.c_uint32),
                ("flags", ctypes.c_uint32),
                ("field", ctypes.c_uint32),
                ("timestamp", _timeval),
                ("timecode", v4l2_timecode),
                ("sequence", ctypes.c_uint32),
                ("memory", ctypes.c_uint32),
                ("m", _buf_m),
                ("length", ctypes.c_uint32),
                ("reserved2", ctypes.c_uint32),
                ("request_fd", ctypes.c_uint32)]


class v4l2_fract(ctypes.Structure):
    _fields_ = [("numerator", ctypes.c_uint32),
                ("denominator", ctypes.c_uint32)]


class v4l2_captureparm(ctypes.Structure):
    _fields_ = [("capability", ctypes.c_uint32),
                ("capturemode", ctypes.c_uint32),
                ("timeperframe", v4l2_fract),
                ("extendedmode", ctypes.c_uint32),
                ("readbuffers", ctypes.c_uint32),
                ("reserved", ctypes.c_uint32 * 4)]


class _parm_union(ctypes.Union):
    _fields_ = [("capture", v4l2_captureparm),
                ("raw_data", ctypes.c_uint8 * 200)]


class v4l2_streamparm(ctypes.Structure):
    _fields_ = [("type", ctypes.c_uint32),
                ("parm", _parm_union)]


def _IOC(direction: int, nr: int, size: int) -> int:
    # _IOC(dir, 'V', nr, size): NRSHIFT 0, TYPESHIFT 8, SIZESHIFT 16,
    # DIRSHIFT 30 (generic Linux ABI, x86/arm64 alike)
    return (direction << 30) | (size << 16) | (ord("V") << 8) | nr


_R, _W, _RW = 2, 1, 3

VIDIOC_QUERYCAP = _IOC(_R, 0, ctypes.sizeof(v4l2_capability))
VIDIOC_S_FMT = _IOC(_RW, 5, ctypes.sizeof(v4l2_format))
VIDIOC_REQBUFS = _IOC(_RW, 8, ctypes.sizeof(v4l2_requestbuffers))
VIDIOC_QUERYBUF = _IOC(_RW, 9, ctypes.sizeof(v4l2_buffer))
VIDIOC_QBUF = _IOC(_RW, 15, ctypes.sizeof(v4l2_buffer))
VIDIOC_DQBUF = _IOC(_RW, 17, ctypes.sizeof(v4l2_buffer))
VIDIOC_STREAMON = _IOC(_W, 18, ctypes.sizeof(ctypes.c_int))
VIDIOC_STREAMOFF = _IOC(_W, 19, ctypes.sizeof(ctypes.c_int))
VIDIOC_S_PARM = _IOC(_RW, 22, ctypes.sizeof(v4l2_streamparm))


# ------------------------------------------------------------------ #
# device ops: real kernel interface + injectable test double


class DeviceOps:
    """Real /dev/video* interface (fcntl.ioctl + mmap)."""

    def __init__(self, dev: str):
        self.fd = os.open(dev, os.O_RDWR)
        self._maps: List = []

    def ioctl(self, request: int, arg) -> None:
        import fcntl
        fcntl.ioctl(self.fd, request, arg)

    def mmap(self, length: int, offset: int):
        import mmap as _mmap
        m = _mmap.mmap(self.fd, length,
                       flags=_mmap.MAP_SHARED,
                       prot=_mmap.PROT_READ | _mmap.PROT_WRITE,
                       offset=offset)
        self._maps.append(m)
        return m

    def close(self) -> None:
        for m in self._maps:
            try:
                m.close()
            except (BufferError, ValueError):
                pass
        os.close(self.fd)


class V4l2Capture:
    """Format negotiation + mmap ring + grab loop."""

    def __init__(self, ops, width: int, height: int, fps: float,
                 n_buffers: int = 8,
                 candidates: Tuple[int, ...] = CANDIDATE_FORMATS):
        self.ops = ops
        self.width, self.height = width, height
        self._check_capabilities()
        self.pixelformat, self.sizeimage = self._setup_format(candidates)
        self._set_fps(fps)
        self.buffers = self._setup_ring(n_buffers)
        self._stream_on()

    # ------------------------------------------------- negotiation --

    def _check_capabilities(self) -> None:
        caps = v4l2_capability()
        self.ops.ioctl(VIDIOC_QUERYCAP, caps)
        if not caps.capabilities & V4L2_CAP_VIDEO_CAPTURE:
            raise IOError("device does not support video capture")
        if not caps.capabilities & V4L2_CAP_STREAMING:
            raise IOError("device does not support streaming (mmap) "
                          "capture")
        self.driver = caps.driver.decode("ascii", "replace")
        self.card = caps.card.decode("ascii", "replace")

    def _setup_format(self, candidates) -> Tuple[int, int]:
        """Try each candidate pixelformat until S_FMT accepts one
        (tc_v4l2_video_setup_image_format's conversion walk)."""
        last_err: Optional[Exception] = None
        for pf in candidates:
            fmt = v4l2_format()
            fmt.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
            fmt.fmt.pix.width = self.width
            fmt.fmt.pix.height = self.height
            fmt.fmt.pix.pixelformat = pf
            fmt.fmt.pix.field = V4L2_FIELD_NONE
            try:
                self.ops.ioctl(VIDIOC_S_FMT, fmt)
            except OSError as e:
                last_err = e
                continue
            if fmt.fmt.pix.pixelformat != pf:
                continue              # driver silently switched format
            # driver may adjust geometry; accept what it gave us
            self.width = int(fmt.fmt.pix.width)
            self.height = int(fmt.fmt.pix.height)
            return pf, int(fmt.fmt.pix.sizeimage)
        raise IOError(
            f"no usable pixel format supported by card ({last_err})")

    def _set_fps(self, fps: float) -> None:
        parm = v4l2_streamparm()
        parm.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
        parm.parm.capture.timeperframe.numerator = 1000
        parm.parm.capture.timeperframe.denominator = \
            max(1, int(round(fps * 1000)))
        try:
            self.ops.ioctl(VIDIOC_S_PARM, parm)
        except OSError:
            pass                      # advisory, like the reference

    def _setup_ring(self, n: int) -> List:
        req = v4l2_requestbuffers()
        req.count = n
        req.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
        req.memory = V4L2_MEMORY_MMAP
        self.ops.ioctl(VIDIOC_REQBUFS, req)
        if req.count < 2:
            raise IOError(f"driver granted only {req.count} capture "
                          "buffer(s)")
        maps = []
        for i in range(req.count):
            buf = v4l2_buffer()
            buf.index = i
            buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
            buf.memory = V4L2_MEMORY_MMAP
            self.ops.ioctl(VIDIOC_QUERYBUF, buf)
            maps.append(self.ops.mmap(buf.length, buf.m.offset))
            self.ops.ioctl(VIDIOC_QBUF, buf)
        return maps

    def _stream_on(self) -> None:
        self.ops.ioctl(VIDIOC_STREAMON,
                       ctypes.c_int(V4L2_BUF_TYPE_VIDEO_CAPTURE))

    # ------------------------------------------------------- grabs --

    def _requeue_all(self) -> None:
        """EIO resync: drain then requeue the whole ring
        (import_v4l2.c:352-380)."""
        for i in range(len(self.buffers)):
            buf = v4l2_buffer()
            buf.index = i
            buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
            buf.memory = V4L2_MEMORY_MMAP
            try:
                self.ops.ioctl(VIDIOC_DQBUF, buf)
            except OSError:
                pass
        for i in range(len(self.buffers)):
            buf = v4l2_buffer()
            buf.index = i
            buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
            buf.memory = V4L2_MEMORY_MMAP
            try:
                self.ops.ioctl(VIDIOC_QBUF, buf)
            except OSError:
                pass

    def grab(self) -> Optional[bytes]:
        """One frame's raw bytes (negotiated pixelformat), or None
        when the driver signalled EIO and the ring was resynced."""
        buf = v4l2_buffer()
        buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
        buf.memory = V4L2_MEMORY_MMAP
        try:
            self.ops.ioctl(VIDIOC_DQBUF, buf)
        except OSError as e:
            if e.errno == errno.EIO:
                self._requeue_all()
                return None
            raise
        data = bytes(self.buffers[buf.index][:self.sizeimage])
        qbuf = v4l2_buffer()
        qbuf.index = buf.index
        qbuf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
        qbuf.memory = V4L2_MEMORY_MMAP
        self.ops.ioctl(VIDIOC_QBUF, qbuf)
        return data

    def close(self) -> None:
        try:
            self.ops.ioctl(VIDIOC_STREAMOFF,
                           ctypes.c_int(V4L2_BUF_TYPE_VIDEO_CAPTURE))
        except OSError:
            pass
        self.ops.close()


# ------------------------------------------------------------------ #
# raw frame -> plane dict


def frame_to_planes(data: bytes, pixelformat: int, width: int,
                    height: int) -> Dict[str, np.ndarray]:
    """Convert one captured frame to the importer plane contract."""
    if pixelformat == PIX_FMT_YUV420:
        n = width * height
        a = np.frombuffer(data, np.uint8, n + n // 2)
        return {"y": a[:n].reshape(height, width),
                "u": a[n:n + n // 4].reshape(height // 2, width // 2),
                "v": a[n + n // 4:].reshape(height // 2, width // 2)}
    if pixelformat in (PIX_FMT_YUYV, PIX_FMT_UYVY):
        a = np.frombuffer(data, np.uint8,
                          width * height * 2).reshape(height, width * 2)
        if pixelformat == PIX_FMT_YUYV:
            y, u, v = a[:, 0::2], a[:, 1::4], a[:, 3::4]
        else:
            y, u, v = a[:, 1::2], a[:, 0::4], a[:, 2::4]
        # 4:2:2 -> 4:2:0 by vertical chroma pair averaging (the
        # reference routed through tcv_convert the same way)
        u = ((u[0::2].astype(np.uint16) + u[1::2]) // 2).astype(np.uint8)
        v = ((v[0::2].astype(np.uint16) + v[1::2]) // 2).astype(np.uint8)
        return {"y": np.ascontiguousarray(y), "u": u, "v": v}
    if pixelformat in (PIX_FMT_RGB24, PIX_FMT_BGR24):
        a = np.frombuffer(data, np.uint8,
                          width * height * 3).reshape(height, width, 3)
        if pixelformat == PIX_FMT_BGR24:
            a = a[:, :, ::-1]
        return {"rgb": np.ascontiguousarray(a)}
    if pixelformat == PIX_FMT_GREY:
        y = np.frombuffer(data, np.uint8,
                          width * height).reshape(height, width)
        flat = np.full((height // 2, width // 2), 128, np.uint8)
        return {"y": y.copy(), "u": flat, "v": flat.copy()}
    raise ValueError(f"unsupported pixelformat 0x{pixelformat:08x}")
