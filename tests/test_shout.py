"""Shoutcast/icecast streaming for the ogg muxer.

Covers the multiplex_ogg.c `stream=<label>` + shout.cfg path
(reference multiplex/multiplex_ogg.c:54-205, multiplex/shout.cfg)
against an in-tree fake icecast server — same fixture philosophy as
the synthetic RFB/X11 servers.
"""

import socket
import struct
import threading
import wave

import numpy as np
import pytest


class FakeIcecast:
    """Minimal icecast2 source endpoint: accepts one SOURCE request,
    checks Basic auth, replies 200 (or 401), then collects the raw
    stream bytes until the client closes."""

    def __init__(self, password="hackme"):
        self.password = password
        self.request_line = ""
        self.headers = {}
        self.payload = b""
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        conn, _ = self.sock.accept()
        conn.settimeout(10.0)
        buf = b""
        while b"\r\n\r\n" not in buf:
            chunk = conn.recv(4096)
            if not chunk:
                break
            buf += chunk
        head, _, rest = buf.partition(b"\r\n\r\n")
        lines = head.decode("latin-1").split("\r\n")
        self.request_line = lines[0]
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            self.headers[k.strip().lower()] = v.strip()
        import base64
        want = base64.b64encode(
            f"source:{self.password}".encode()).decode()
        if self.headers.get("authorization") != f"Basic {want}":
            conn.sendall(b"HTTP/1.0 401 Unauthorized\r\n\r\n")
            conn.close()
            return
        conn.sendall(b"HTTP/1.0 200 OK\r\n\r\n")
        data = [rest]
        while True:
            try:
                chunk = conn.recv(65536)
            except OSError:
                break
            if not chunk:
                break
            data.append(chunk)
        self.payload = b"".join(data)
        conn.close()

    def join(self, timeout=10.0):
        self._thread.join(timeout)
        self.sock.close()


def write_cfg(path, port, password="hackme", label="TV"):
    path.write_text(
        f"[{label}]\n"
        f"host = 127.0.0.1\n"
        f"port = {port}\n"
        f"password = {password}\n"
        f"mount = tv.ogg\n"
        f"public = yes\n"
        f"description = live! tv stream\n")


class TestShoutClient:
    def test_config_parse(self, tmp_path, monkeypatch):
        from tcforge_tpu.io.shout import ShoutConfig
        write_cfg(tmp_path / "shout.cfg", 8888)
        cfg = ShoutConfig.from_file("TV", dirs=[str(tmp_path)])
        assert cfg.host == "127.0.0.1"
        assert cfg.port == 8888
        assert cfg.password == "hackme"
        assert cfg.mount == "tv.ogg"
        assert cfg.public is True
        assert cfg.description == "live! tv stream"

    def test_config_missing_section(self, tmp_path):
        from tcforge_tpu.io.shout import ShoutConfig, ShoutError
        write_cfg(tmp_path / "shout.cfg", 8888)
        with pytest.raises(ShoutError):
            ShoutConfig.from_file("RADIO", dirs=[str(tmp_path)])

    def test_handshake_and_data(self, tmp_path):
        from tcforge_tpu.io.shout import ShoutClient, ShoutConfig
        srv = FakeIcecast()
        write_cfg(tmp_path / "shout.cfg", srv.port)
        cfg = ShoutConfig.from_file("TV", dirs=[str(tmp_path)])
        cli = ShoutClient(cfg)
        cli.open()
        cli.send(b"OggS" + bytes(100))
        cli.send(b"tail")
        cli.close()
        srv.join()
        assert srv.request_line == "SOURCE /tv.ogg HTTP/1.0"
        assert srv.headers["content-type"] == "application/ogg"
        assert srv.headers["ice-public"] == "1"
        assert srv.headers["ice-description"] == "live! tv stream"
        assert srv.payload == b"OggS" + bytes(100) + b"tail"

    def test_bad_password_rejected(self, tmp_path):
        from tcforge_tpu.io.shout import (ShoutClient, ShoutConfig,
                                          ShoutError)
        srv = FakeIcecast(password="right")
        write_cfg(tmp_path / "shout.cfg", srv.port, password="wrong")
        cfg = ShoutConfig.from_file("TV", dirs=[str(tmp_path)])
        with pytest.raises(ShoutError, match="refused"):
            ShoutClient(cfg).open()
        srv.join()

    def test_sync_does_not_run_ahead(self, tmp_path):
        """sync() sleeps when the stream timeline is ahead of wall."""
        import time
        from tcforge_tpu.io.shout import ShoutClient, ShoutConfig
        srv = FakeIcecast()
        write_cfg(tmp_path / "shout.cfg", srv.port)
        cfg = ShoutConfig.from_file("TV", dirs=[str(tmp_path)])
        cli = ShoutClient(cfg)
        cli.open()
        cli.set_stream_time(0.15)
        t0 = time.monotonic()
        cli.sync()
        assert time.monotonic() - t0 >= 0.10
        cli.close()
        srv.join()


class TestShoutE2E:
    def _wav(self, path, rate, sig):
        pcm = np.clip(sig * 32767.0, -32768, 32767).astype("<i2")
        with wave.open(str(path), "wb") as w:
            w.setnchannels(sig.shape[1])
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())

    def test_vorbis_ogg_broadcast_matches_file(self, tmp_path,
                                               monkeypatch):
        """Audio-only wav → vorbis → ogg session with stream=TV:
        the server receives byte-identical data to the output file."""
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.pipeline.engine import Pipeline
        srv = FakeIcecast()
        write_cfg(tmp_path / "shout.cfg", srv.port)
        monkeypatch.setenv("TCFORGE_CONFIG_DIR", str(tmp_path))
        rate = 48000
        t = np.arange(rate // 4) / rate
        sig = np.stack([0.5 * np.sin(2 * np.pi * 440 * t)] * 2, axis=1)
        self._wav(tmp_path / "a.wav", rate, sig)
        out = tmp_path / "a.ogg"
        job = Job()
        job.video_in_file = str(tmp_path / "a.wav")
        job.video_out_file = str(out)
        job.ex_a_module = "vorbis"
        job.ex_m_module = "ogg"
        job.ex_m_string = "stream=TV"
        Pipeline(job).run(progress=False)
        srv.join()
        assert srv.payload == out.read_bytes()
        assert len(srv.payload) > 1000
