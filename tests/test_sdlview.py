"""sdlview filter: native X11 display client (io/x11view.py) against
the synthetic wire-protocol server (tests/x11_server.py).  The server
records CreateWindow/PutImage into a model framebuffer; tests compare
the painted pixels bit-exactly against the filter's own RGB
conversion of the frames."""

import socket

import numpy as np
import pytest

from tests.x11_server import X11TestServer


def _connect(srv):
    return socket.create_connection(("127.0.0.1", srv.port), 10.0)


def _yuv_batch(n, w, h, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randint(0, 256, (n, h, w), np.uint8).astype(np.uint8),
            rng.randint(0, 256, (n, h // 2, w // 2), np.uint8),
            rng.randint(0, 256, (n, w and h // 2, w // 2), np.uint8))


class TestX11Viewer:
    def test_window_and_putimage_roundtrip(self):
        from tcforge_tpu.io.x11view import X11Viewer
        srv = X11TestServer(width=640, height=480)
        v = X11Viewer(sock=_connect(srv))
        v.open_window(48, 32, title="hello")
        rgb = np.random.RandomState(1).randint(
            0, 256, (32, 48, 3), np.uint8)
        v.put_frame(rgb)
        v.close()
        srv.join()
        assert srv.wm_name == "hello"
        assert srv.painted.shape == (32, 48, 3)
        assert np.array_equal(srv.painted, rgb)

    def test_strip_splitting(self):
        """Frames larger than the server's max request length go out
        in row strips and still reassemble exactly."""
        from tcforge_tpu.io.x11view import X11Viewer
        srv = X11TestServer(width=640, height=480)
        v = X11Viewer(sock=_connect(srv))
        v.max_request = 6 + 64 * 3    # force 3-row strips at w=64
        v.open_window(64, 40)
        rgb = np.random.RandomState(2).randint(
            0, 256, (40, 64, 3), np.uint8)
        v.put_frame(rgb)
        v.close()
        srv.join()
        assert srv.put_count > 1
        assert np.array_equal(srv.painted, rgb)

    def test_big_endian_masks(self):
        from tcforge_tpu.io.x11view import X11Viewer
        srv = X11TestServer(width=64, height=48, byte_order="big",
                            masks=(0x0000FF, 0x00FF00, 0xFF0000))
        v = X11Viewer(sock=_connect(srv))
        v.open_window(16, 8)
        rgb = np.random.RandomState(3).randint(
            0, 256, (8, 16, 3), np.uint8)
        v.put_frame(rgb)
        v.close()
        srv.join()
        assert np.array_equal(srv.painted, rgb)


class TestSdlviewFilter:
    def _make(self, srv):
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.filters.sdlview import SdlviewFilter
        SdlviewFilter._inject_sock = _connect(srv)
        try:
            f = SdlviewFilter(Job(), "")
        finally:
            SdlviewFilter._inject_sock = None
        return f

    def test_paints_every_frame(self):
        from tcforge_tpu.core.formats import ImageFormat
        from tcforge_tpu.core.frame import FrameBatch
        from tcforge_tpu.ops import colorspace
        srv = X11TestServer(width=640, height=480)
        f = self._make(srv)
        w, h, n = 64, 48, 3
        f.init_state(w, h, ImageFormat.YUV420P)
        y, u, v = _yuv_batch(n, w, h)
        fb = FrameBatch.from_numpy(y=y, u=u, v=v,
                                   fmt=ImageFormat.YUV420P)
        _, state = f.apply(fb, None)
        f.collect(state)
        f.close()
        srv.join()
        want = np.asarray(
            colorspace.convert(fb, ImageFormat.RGB24).rgb)
        assert srv.frame_done == n
        assert len(srv.history) == n
        for k in range(n):
            assert np.array_equal(srv.history[k], want[k])

    def test_registered_name(self):
        import tcforge_tpu.modules  # noqa: F401
        from tcforge_tpu.modules.registry import (ModuleKind,
                                                  list_modules)
        assert "sdlview" in list_modules(ModuleKind.FILTER)