"""X11 screen-grab importer vs the in-tree synthetic X server
(import/x11source.c parity — GetImage over the wire protocol)."""

import numpy as np
import pytest

from tests.x11_server import X11TestServer


def _frames(n=3, w=64, h=48, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), np.uint8)
            for _ in range(n)]


def _connect(srv):
    import socket
    from tcforge_tpu.io.x11grab import X11Grabber
    s = socket.create_connection(("127.0.0.1", srv.port), 10.0)
    return X11Grabber(sock=s)


class TestX11Grabber:
    def test_setup_and_frames_bit_exact(self):
        frames = _frames()
        srv = X11TestServer(frames=[f.copy() for f in frames])
        g = _connect(srv)
        assert (g.width, g.height) == (64, 48)
        assert (g.red_mask, g.green_mask, g.blue_mask) == \
            (0xFF0000, 0x00FF00, 0x0000FF)
        for want in frames:
            got = g.get_image()
            np.testing.assert_array_equal(got, want)
        g.close()
        srv.join()

    def test_big_endian_and_bgr_masks(self):
        frames = _frames(2, seed=1)
        srv = X11TestServer(frames=[f.copy() for f in frames],
                            byte_order="big",
                            masks=(0x0000FF, 0x00FF00, 0xFF0000))
        g = _connect(srv)
        np.testing.assert_array_equal(g.get_image(), frames[0])
        g.close()

    def test_eof_when_script_ends(self):
        srv = X11TestServer(frames=_frames(1))
        g = _connect(srv)
        g.get_image()
        with pytest.raises(EOFError):
            g.get_image()
        g.close()

    def test_parse_display(self):
        from tcforge_tpu.io.x11grab import parse_display
        assert parse_display(":0") == (None, 0)
        assert parse_display(":1.0") == (None, 1)
        assert parse_display("remote:2") == ("remote", 2)


class TestX11Importer:
    def test_importer_module(self):
        import socket
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.io.x11grab import X11Grabber
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        frames = _frames(4, seed=2)
        srv = X11TestServer(frames=[f.copy() for f in frames])
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "x11",
                         Job(fps=25.0), "frames=4,realtime=0")
        s = socket.create_connection(("127.0.0.1", srv.port), 10.0)
        imp._grab = X11Grabber(sock=s)
        imp._open_common()
        assert (imp.width, imp.height) == (64, 48)
        b = imp.read_video_batch(8)
        imp.close()
        assert b["rgb"].shape == (4, 48, 64, 3)
        np.testing.assert_array_equal(b["rgb"][-1], frames[-1])

    def test_gate_without_display(self, monkeypatch):
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.registry import ModuleKind, new_module
        monkeypatch.delenv("DISPLAY", raising=False)
        imp = new_module(ModuleKind.DEMULTIPLEXOR, "x11", Job())
        with pytest.raises(NotImplementedError, match="DISPLAY"):
            imp.open(None)


class TestXauthParse:
    def test_cookie_roundtrip(self, tmp_path, monkeypatch):
        import struct
        from tcforge_tpu.io.x11grab import read_xauth_cookie
        cookie = bytes(range(16))

        def field(b):
            return struct.pack(">H", len(b)) + b

        rec = (struct.pack(">H", 256) + field(b"host")
               + field(b"0") + field(b"MIT-MAGIC-COOKIE-1")
               + field(cookie))
        p = tmp_path / "auth"
        p.write_bytes(rec)
        monkeypatch.setenv("XAUTHORITY", str(p))
        assert read_xauth_cookie(0) == (b"MIT-MAGIC-COOKIE-1", cookie)
        assert read_xauth_cookie(7) == (b"", b"")   # number mismatch
