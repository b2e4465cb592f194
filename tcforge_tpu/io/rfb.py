"""RFB (VNC) client — the import_vnc.c role, done natively.

The reference forked ``vncrec`` and parsed its RGB pipe output
(/root/reference/import/import_vnc.c:29-99); this is a real in-process
RFB client speaking protocol versions 3.3/3.7/3.8 with None security,
Raw and CopyRect encodings, and incremental framebuffer-update
polling.  The client keeps a (H, W, 3) uint8 RGB framebuffer that
each update mutates in place; ``poll_frame()`` returns snapshots.

Protocol reference: RFC 6143 (The Remote Framebuffer Protocol).
"""

from __future__ import annotations

import socket
import struct
from typing import Optional, Tuple

import numpy as np

# client -> server message types
_SET_PIXEL_FORMAT = 0
_SET_ENCODINGS = 2
_FB_UPDATE_REQUEST = 3

# server -> client message types
_FB_UPDATE = 0
_SET_COLOUR_MAP = 1
_BELL = 2
_SERVER_CUT_TEXT = 3

ENC_RAW = 0
ENC_COPYRECT = 1


class RfbError(RuntimeError):
    pass


def parse_display(path: str) -> Tuple[str, int]:
    """``vnc://host[:port]``, ``host::port`` or X-style ``host:N``
    (display N -> port 5900+N, vncviewer convention)."""
    s = path
    if s.startswith("vnc://"):
        s = s[6:]
        if ":" in s:
            host, p = s.rsplit(":", 1)
            return host or "localhost", int(p)
        return s or "localhost", 5900
    if "::" in s:
        host, p = s.split("::", 1)
        return host or "localhost", int(p)
    if ":" in s:
        host, d = s.rsplit(":", 1)
        n = int(d)
        # X display numbers are small; literal ports pass through
        return host or "localhost", (5900 + n if n < 100 else n)
    return s or "localhost", 5900


class RfbClient:
    """Minimal but real RFB client (Raw + CopyRect)."""

    def __init__(self, host: str, port: int, shared: bool = True,
                 timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout)
        self.sock.settimeout(timeout)
        self._handshake(shared)
        self._set_pixel_format()
        self._set_encodings([ENC_COPYRECT, ENC_RAW])
        self.fb = np.zeros((self.height, self.width, 3), np.uint8)
        self._first = True

    # ---------------------------------------------------------- io --

    def _read(self, n: int) -> bytes:
        chunks = []
        while n > 0:
            b = self.sock.recv(n)
            if not b:
                raise EOFError("RFB server closed the connection")
            chunks.append(b)
            n -= len(b)
        return b"".join(chunks)

    # --------------------------------------------------- handshake --

    def _handshake(self, shared: bool) -> None:
        ver = self._read(12)
        if not ver.startswith(b"RFB "):
            raise RfbError(f"not an RFB server: {ver!r}")
        try:
            major, minor = int(ver[4:7]), int(ver[8:11])
        except ValueError:
            raise RfbError(f"bad RFB version string: {ver!r}")
        if (major, minor) >= (3, 8):
            self.version = (3, 8)
        elif (major, minor) >= (3, 7):
            self.version = (3, 7)
        else:
            self.version = (3, 3)
        self.sock.sendall(b"RFB %03d.%03d\n" % self.version)

        if self.version == (3, 3):
            # server decides: u32 security type
            (sec,) = struct.unpack(">I", self._read(4))
            if sec == 0:
                raise RfbError("server refused: "
                               + self._read_reason())
            if sec != 1:
                raise RfbError(f"unsupported security type {sec} "
                               "(only None is implemented)")
        else:
            n = self._read(1)[0]
            if n == 0:
                raise RfbError("server refused: "
                               + self._read_reason())
            types = self._read(n)
            if 1 not in types:
                raise RfbError("server offers no None security "
                               f"(types={list(types)})")
            self.sock.sendall(bytes([1]))
            if self.version == (3, 8):
                (result,) = struct.unpack(">I", self._read(4))
                if result != 0:
                    raise RfbError("security handshake failed: "
                                   + self._read_reason())

        self.sock.sendall(bytes([1 if shared else 0]))   # ClientInit
        w, h = struct.unpack(">HH", self._read(4))
        self.server_pixel_format = self._read(16)
        (nlen,) = struct.unpack(">I", self._read(4))
        self.name = self._read(nlen).decode("latin-1")
        self.width, self.height = w, h

    def _read_reason(self) -> str:
        (n,) = struct.unpack(">I", self._read(4))
        return self._read(n).decode("latin-1", "replace")

    # ---------------------------------------------------- requests --

    def _set_pixel_format(self) -> None:
        """Canonical 32bpp true-colour RGBX (little-endian, shifts
        0/8/16) so raw rect bytes are [R, G, B, pad] in memory."""
        pf = struct.pack(">BBBBHHHBBBxxx", 32, 24, 0, 1,
                         255, 255, 255, 0, 8, 16)
        self.sock.sendall(struct.pack(">Bxxx", _SET_PIXEL_FORMAT) + pf)

    def _set_encodings(self, encs) -> None:
        msg = struct.pack(">BxH", _SET_ENCODINGS, len(encs))
        msg += b"".join(struct.pack(">i", e) for e in encs)
        self.sock.sendall(msg)

    def request_update(self, incremental: bool = True) -> None:
        self.sock.sendall(struct.pack(
            ">BBHHHH", _FB_UPDATE_REQUEST, 1 if incremental else 0,
            0, 0, self.width, self.height))

    # ----------------------------------------------------- updates --

    def _apply_raw(self, x: int, y: int, w: int, h: int) -> None:
        data = np.frombuffer(self._read(w * h * 4), np.uint8)
        self.fb[y:y + h, x:x + w] = \
            data.reshape(h, w, 4)[:, :, :3]

    def _apply_copyrect(self, x: int, y: int, w: int, h: int) -> None:
        sx, sy = struct.unpack(">HH", self._read(4))
        self.fb[y:y + h, x:x + w] = \
            self.fb[sy:sy + h, sx:sx + w].copy()

    def recv_update(self) -> bool:
        """Block for one server message; True when it was a
        FramebufferUpdate (the fb mutated)."""
        t = self._read(1)[0]
        if t == _FB_UPDATE:
            self._read(1)                      # padding
            (nrects,) = struct.unpack(">H", self._read(2))
            for _ in range(nrects):
                x, y, w, h, enc = struct.unpack(">HHHHi",
                                                self._read(12))
                if enc == ENC_RAW:
                    self._apply_raw(x, y, w, h)
                elif enc == ENC_COPYRECT:
                    self._apply_copyrect(x, y, w, h)
                else:
                    raise RfbError(f"server sent unrequested "
                                   f"encoding {enc}")
            return True
        if t == _SET_COLOUR_MAP:
            self._read(3)
            first, n = struct.unpack(">HH", self._read(4))
            self._read(n * 6)
            return False
        if t == _BELL:
            return False
        if t == _SERVER_CUT_TEXT:
            self._read(3)
            (n,) = struct.unpack(">I", self._read(4))
            self._read(n)
            return False
        raise RfbError(f"unknown server message type {t}")

    def poll_frame(self) -> np.ndarray:
        """Request one update (full on the first call, incremental
        after), apply it, and return an fb snapshot."""
        self.request_update(incremental=not self._first)
        self._first = False
        while not self.recv_update():
            pass
        return self.fb.copy()

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass
