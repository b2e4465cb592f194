"""Icecast/shoutcast source client (the libshout role).

The reference ogg multiplexor broadcasts every Ogg page it writes to
an icecast server when `stream=<label>` is given, configured from the
`[label]` section of shout.cfg (multiplex/multiplex_ogg.c:54-205 +
multiplex/shout.cfg).  libshout isn't available here (and links a
whole TLS/resolver stack we don't need), so this is an in-tree client
speaking the icecast2 HTTP source protocol libshout uses by default:

    SOURCE /<mount> HTTP/1.0
    Authorization: Basic base64("source:" + password)
    Content-Type: application/ogg
    ice-name / ice-public / ice-description / ice-genre / ice-url
    <blank line>
    ...raw ogg pages...

and expecting an HTTP 2xx status line back before streaming.

Pacing follows shout_sync() semantics: the caller reports how much
stream time the bytes sent so far represent, and sync() sleeps until
wall-clock catches up, so a faster-than-realtime encoder doesn't
flood the server.
"""

from __future__ import annotations

import base64
import socket
import time
from dataclasses import dataclass
from typing import Optional, Sequence

from tcforge_tpu.core import cfgfile

SHOUT_CONFIG_FILE = "shout.cfg"


class ShoutError(RuntimeError):
    pass


@dataclass
class ShoutConfig:
    """One [label] section of shout.cfg (tc_shout_configure's
    TCConfigEntry table, multiplex_ogg.c:89-100)."""

    host: str = ""
    port: int = 0
    password: str = ""
    mount: str = ""
    public: bool = True
    description: str = ""
    genre: str = ""
    name: str = ""
    url: str = ""

    @classmethod
    def from_file(cls, label: str,
                  dirs: Optional[Sequence[str]] = None) -> "ShoutConfig":
        """Read `[label]` from shout.cfg.  The reference searches the
        current directory (multiplex_ogg.c:106 `dirs = {".", NULL}`);
        we search "." then the usual config dirs."""
        search = list(dirs) if dirs is not None else \
            ["."] + cfgfile.default_config_dirs()
        path = cfgfile.find_config_file(SHOUT_CONFIG_FILE, search)
        if path is None:
            raise ShoutError(
                f"shout streaming requested (stream={label}) but no "
                f"{SHOUT_CONFIG_FILE} found in {search}")
        entries = [
            cfgfile.ConfigEntry("host", "str", ""),
            cfgfile.ConfigEntry("port", "int", 0, 1, 65535),
            cfgfile.ConfigEntry("password", "str", ""),
            cfgfile.ConfigEntry("mount", "str", ""),
            cfgfile.ConfigEntry("public", "flag", True),
            cfgfile.ConfigEntry("description", "str", ""),
            cfgfile.ConfigEntry("genre", "str", ""),
            cfgfile.ConfigEntry("name", "str", ""),
            cfgfile.ConfigEntry("url", "str", ""),
        ]
        vals = cfgfile.read_file(path, label, entries)
        cfg = cls(**vals)
        if not cfg.host or not cfg.port or not cfg.mount:
            raise ShoutError(
                f"shout.cfg section [{label}] needs host, port and "
                f"mount (got host={cfg.host!r} port={cfg.port} "
                f"mount={cfg.mount!r})")
        return cfg


class ShoutClient:
    """Open/send/sync/close against an icecast2-style server."""

    def __init__(self, cfg: ShoutConfig,
                 content_type: str = "application/ogg",
                 timeout: float = 10.0):
        self.cfg = cfg
        self.content_type = content_type
        self.timeout = timeout
        self._sock: Optional[socket.socket] = None
        self._t0 = 0.0
        self._stream_time = 0.0

    # -- connection -------------------------------------------------
    def open(self) -> None:
        cfg = self.cfg
        mount = cfg.mount if cfg.mount.startswith("/") else "/" + cfg.mount
        auth = base64.b64encode(
            f"source:{cfg.password}".encode()).decode()
        lines = [
            f"SOURCE {mount} HTTP/1.0",
            f"Authorization: Basic {auth}",
            "User-Agent: tcforge_tpu",
            f"Content-Type: {self.content_type}",
            f"ice-public: {1 if cfg.public else 0}",
        ]
        if cfg.name:
            lines.append(f"ice-name: {cfg.name}")
        if cfg.description:
            lines.append(f"ice-description: {cfg.description}")
        if cfg.genre:
            lines.append(f"ice-genre: {cfg.genre}")
        if cfg.url:
            lines.append(f"ice-url: {cfg.url}")
        req = ("\r\n".join(lines) + "\r\n\r\n").encode()
        try:
            sock = socket.create_connection(
                (cfg.host, cfg.port), timeout=self.timeout)
        except OSError as e:
            raise ShoutError(
                f"connecting to SHOUT server {cfg.host}:{cfg.port}: "
                f"{e}") from e
        try:
            sock.sendall(req)
            status = self._read_status_line(sock)
            parts = status.split(None, 2)
            if len(parts) < 2 or not parts[1].startswith("2"):
                raise ShoutError(
                    f"SHOUT server refused source connection: "
                    f"{status.strip()!r}")
        except Exception:
            sock.close()
            raise
        self._sock = sock
        self._t0 = time.monotonic()
        self._stream_time = 0.0

    @staticmethod
    def _read_status_line(sock: socket.socket) -> str:
        buf = b""
        while b"\n" not in buf:
            chunk = sock.recv(256)
            if not chunk:
                break
            buf += chunk
        return buf.split(b"\n", 1)[0].decode("latin-1", "replace")

    # -- data plane -------------------------------------------------
    def send(self, data: bytes) -> None:
        if self._sock is None:
            raise ShoutError("send on closed SHOUT connection")
        try:
            self._sock.sendall(data)
        except OSError as e:
            raise ShoutError(
                f"sending data to SHOUT server: {e}") from e

    def set_stream_time(self, seconds: float) -> None:
        """Report total stream time represented by the data sent so
        far (the muxer knows frames/fps and samples/rate; libshout
        derives the same from ogg granulepos)."""
        self._stream_time = max(self._stream_time, seconds)

    def sync(self) -> None:
        """shout_sync(): sleep until wall-clock catches up with the
        stream timeline so we never run ahead of real time."""
        ahead = self._stream_time - (time.monotonic() - self._t0)
        if ahead > 0:
            time.sleep(min(ahead, 1.0))

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def __enter__(self) -> "ShoutClient":
        self.open()
        return self

    def __exit__(self, *exc) -> None:
        self.close()
