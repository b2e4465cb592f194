"""V4L2 capture logic vs a scripted ioctl fake.

No /dev/video* exists in this container, so the negotiation/ring/grab
logic runs against a fake implementing the VIDIOC contract: S_FMT
accepts only a scripted pixelformat, REQBUFS clamps the ring, DQBUF
serves deterministic frames (optionally failing once with EIO like a
USB camera hiccup)."""

import ctypes
import errno

import numpy as np
import pytest

from tcforge_tpu.io import v4l2 as V


def _yuyv_frame(i, w, h):
    """Deterministic packed YUYV test pattern."""
    a = np.arange(w * h * 2, dtype=np.int64)
    return ((a * 7 + i * 13) % 251).astype(np.uint8).tobytes()


class FakeV4l2Device:
    """Scripted kernel double for the DeviceOps interface."""

    def __init__(self, accept=V.PIX_FMT_YUYV, w=64, h=48, grant=4,
                 eio_at=None, adjust_to=None):
        self.accept = accept
        self.w, self.h = w, h
        self.grant = grant
        self.eio_at = eio_at
        self.adjust_to = adjust_to      # driver-corrected geometry
        self.frame_no = 0
        self.queued = []
        self.store = {}
        self.streaming = False
        self.log = []

    def ioctl(self, request, arg):
        self.log.append(request)
        if request == V.VIDIOC_QUERYCAP:
            arg.driver = b"fakecam"
            arg.card = b"Fake Camera 9000"
            arg.capabilities = (V.V4L2_CAP_VIDEO_CAPTURE
                                | V.V4L2_CAP_STREAMING)
        elif request == V.VIDIOC_S_FMT:
            if arg.fmt.pix.pixelformat != self.accept:
                raise OSError(errno.EINVAL, "bad format")
            if self.adjust_to:
                arg.fmt.pix.width, arg.fmt.pix.height = self.adjust_to
            self.w = int(arg.fmt.pix.width)
            self.h = int(arg.fmt.pix.height)
            arg.fmt.pix.sizeimage = self._frame_size()
        elif request == V.VIDIOC_S_PARM:
            self.fps_asked = (arg.parm.capture.timeperframe.denominator
                              / arg.parm.capture.timeperframe.numerator)
        elif request == V.VIDIOC_REQBUFS:
            arg.count = min(arg.count, self.grant)
            self.nbuf = arg.count
        elif request == V.VIDIOC_QUERYBUF:
            arg.length = self._frame_size()
            arg.m.offset = arg.index * 4096 * 64
        elif request == V.VIDIOC_QBUF:
            assert arg.index not in self.queued
            self.queued.append(arg.index)
        elif request == V.VIDIOC_DQBUF:
            if not self.streaming or not self.queued:
                raise OSError(errno.EAGAIN, "no buffer")
            if self.eio_at is not None and self.frame_no == self.eio_at:
                self.eio_at = None
                self.queued.clear()   # driver dropped the whole ring
                raise OSError(errno.EIO, "usb babble")
            ix = self.queued.pop(0)
            self.store[ix][:] = self._gen_frame()
            arg.index = ix
            arg.bytesused = self._frame_size()
        elif request == V.VIDIOC_STREAMON:
            self.streaming = True
        elif request == V.VIDIOC_STREAMOFF:
            self.streaming = False
        else:
            raise OSError(errno.ENOTTY, f"unsupported ioctl {request:x}")

    def _frame_size(self):
        if self.accept in (V.PIX_FMT_YUYV, V.PIX_FMT_UYVY):
            return self.w * self.h * 2
        if self.accept in (V.PIX_FMT_RGB24, V.PIX_FMT_BGR24):
            return self.w * self.h * 3
        if self.accept == V.PIX_FMT_GREY:
            return self.w * self.h
        return self.w * self.h * 3 // 2

    def _gen_frame(self):
        i = self.frame_no
        self.frame_no += 1
        return _yuyv_frame(i, self.w, self.h)[:self._frame_size()]

    def mmap(self, length, offset):
        ix = offset // (4096 * 64)
        self.store[ix] = bytearray(length)
        return self.store[ix]

    def close(self):
        self.closed = True


class TestNegotiation:
    def test_format_walk_lands_on_accepted(self):
        dev = FakeV4l2Device(accept=V.PIX_FMT_YUYV)
        cap = V.V4l2Capture(dev, 64, 48, 25.0)
        assert cap.pixelformat == V.PIX_FMT_YUYV
        assert cap.sizeimage == 64 * 48 * 2
        # ring fully queued and streaming
        assert dev.nbuf == 4 and dev.streaming
        assert len(cap.buffers) == 4

    def test_driver_adjusted_geometry_is_accepted(self):
        dev = FakeV4l2Device(accept=V.PIX_FMT_YUV420,
                             adjust_to=(320, 240))
        cap = V.V4l2Capture(dev, 999, 777, 25.0)
        assert (cap.width, cap.height) == (320, 240)

    def test_no_format_raises(self):
        dev = FakeV4l2Device(accept=0xDEAD)
        with pytest.raises(IOError, match="no usable pixel format"):
            V.V4l2Capture(dev, 64, 48, 25.0)

    def test_capability_gate(self):
        class NoCap(FakeV4l2Device):
            def ioctl(self, request, arg):
                if request == V.VIDIOC_QUERYCAP:
                    arg.capabilities = V.V4L2_CAP_VIDEO_CAPTURE
                    return
                super().ioctl(request, arg)
        with pytest.raises(IOError, match="streaming"):
            V.V4l2Capture(NoCap(), 64, 48, 25.0)


class TestGrabLoop:
    def test_frames_bit_exact_and_ring_requeued(self):
        dev = FakeV4l2Device()
        cap = V.V4l2Capture(dev, 64, 48, 25.0)
        for i in range(10):       # > ring size: buffers recycle
            got = cap.grab()
            assert got == _yuyv_frame(i, 64, 48)
        assert sorted(dev.queued) == list(range(4))
        cap.close()
        assert not dev.streaming and dev.closed

    def test_eio_resync(self):
        dev = FakeV4l2Device(eio_at=2)
        cap = V.V4l2Capture(dev, 64, 48, 25.0)
        assert cap.grab() is not None
        assert cap.grab() is not None
        assert cap.grab() is None          # EIO: resync, no frame
        got = cap.grab()                   # ring recovered
        assert got is not None


class TestConversions:
    def test_yuyv_to_planar(self):
        w, h = 8, 4
        rng = np.random.default_rng(0)
        raw = rng.integers(0, 256, (h, w * 2), np.uint8)
        p = V.frame_to_planes(raw.tobytes(), V.PIX_FMT_YUYV, w, h)
        np.testing.assert_array_equal(p["y"], raw[:, 0::2])
        u = raw[:, 1::4]
        exp_u = ((u[0::2].astype(int) + u[1::2]) // 2).astype(np.uint8)
        np.testing.assert_array_equal(p["u"], exp_u)
        assert p["u"].shape == (h // 2, w // 2)

    def test_bgr_swaps(self):
        w, h = 4, 2
        raw = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
        p = V.frame_to_planes(raw.tobytes(), V.PIX_FMT_BGR24, w, h)
        np.testing.assert_array_equal(p["rgb"], raw[:, :, ::-1])

    def test_yuv420_passthrough(self):
        w, h = 16, 8
        raw = np.arange(w * h * 3 // 2, dtype=np.uint8)
        p = V.frame_to_planes(raw.tobytes(), V.PIX_FMT_YUV420, w, h)
        np.testing.assert_array_equal(p["y"].ravel(), raw[:w * h])


class TestImporterModule:
    def test_importer_over_fake(self):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "v4l2",
                         Job(im_v_width=64, im_v_height=48, fps=25.0),
                         "frames=6")
        imp._open_capture(FakeV4l2Device(), "/dev/fake0")
        assert (imp.width, imp.height) == (64, 48)
        b = imp.read_video_batch(8)
        imp.close()
        assert b["y"].shape == (6, 48, 64)
        # frame 0 luma bit-exact vs the generator
        exp = np.frombuffer(_yuyv_frame(0, 64, 48),
                            np.uint8).reshape(48, 128)[:, 0::2]
        np.testing.assert_array_equal(b["y"][0], exp)

    def test_gate_only_on_absence(self):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "v4l2", Job())
        with pytest.raises(NotImplementedError,
                           match="does not exist"):
            imp.open("/dev/video77")


class TestOssCapture:
    """OSS negotiation + read loop over a scripted ioctl fake
    (import_oss.c role)."""

    class FakeOss:
        def __init__(self, rate_granted=None, pcm=b""):
            from tcforge_tpu.io import oss as O
            self.O = O
            self.rate_granted = rate_granted
            self.pcm = pcm
            self.pos = 0
            self.closed = False

        def ioctl_int(self, request, value):
            O = self.O
            if request == O.SNDCTL_DSP_SETFMT:
                return O.AFMT_S16_LE
            if request == O.SNDCTL_DSP_CHANNELS:
                return min(value, 2)
            if request == O.SNDCTL_DSP_SPEED:
                return self.rate_granted or value
            raise OSError(25, "ENOTTY")

        def read(self, n):
            out = self.pcm[self.pos:self.pos + min(n, 128)]
            self.pos += len(out)
            return out

        def close(self):
            self.closed = True

    def test_negotiation_and_read(self):
        from tcforge_tpu.io.oss import OssCapture
        pcm = np.arange(-400, 400, dtype="<i2").tobytes()
        dev = self.FakeOss(pcm=pcm)
        cap = OssCapture(dev, 48000, 2)
        assert (cap.rate, cap.channels) == (48000, 2)
        got = cap.read_samples(400)
        np.testing.assert_array_equal(
            got.ravel(), np.arange(-400, 400, dtype=np.int16))
        assert cap.read_samples(16) is None     # stream dry
        cap.close()
        assert dev.closed

    def test_driver_adjusted_rate_reported(self):
        from tcforge_tpu.io.oss import OssCapture
        cap = OssCapture(self.FakeOss(rate_granted=44100), 48000, 2)
        assert cap.rate == 44100

    def test_importer_module_over_fake(self):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "oss",
                         Job(a_rate=48000, a_chan=2))
        pcm = np.arange(2048, dtype="<i2").tobytes()
        imp._open_capture(self.FakeOss(pcm=pcm))
        assert imp.audio_rate == 48000
        b = imp.read_audio_batch(512)
        assert b.shape == (512, 2)
        imp.close()
