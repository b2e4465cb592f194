"""X11 screen capture — the import/x11source.c role, done natively.

The reference grabs the root window through libX11's XGetImage /
XShmGetImage (/root/reference/import/x11source.c:121-176); this module
speaks the X11 wire protocol itself over the display socket: connection
setup (with MIT-MAGIC-COOKIE-1 auth from XAUTHORITY when present),
setup-reply parsing down to the root window geometry and visual masks,
then repeated GetImage(ZPixmap) requests converted to RGB frames.

No libX11, no XShm (a wire client cannot share memory) — but the same
observable behavior: full-screen RGB frames at the session rate.
"""

from __future__ import annotations

import os
import socket
import struct
from typing import Optional, Tuple

import numpy as np


class X11Error(RuntimeError):
    pass


def parse_display(display: str) -> Tuple[Optional[str], int]:
    """DISPLAY string -> (host or None for unix socket, display#)."""
    disp = display or ":0"
    host, _, rest = disp.rpartition(":")
    num = rest.split(".")[0]
    return (host or None), int(num or 0)


def read_xauth_cookie(display_num: int) -> Tuple[bytes, bytes]:
    """MIT-MAGIC-COOKIE-1 for this display from XAUTHORITY (the
    .Xauthority record format: big-endian u16 family + 4 length-
    prefixed fields).  Returns (name, data) or (b"", b"")."""
    path = os.environ.get("XAUTHORITY",
                          os.path.expanduser("~/.Xauthority"))
    try:
        with open(path, "rb") as f:
            raw = f.read()
    except OSError:
        return b"", b""
    pos = 0

    def field():
        nonlocal pos
        (n,) = struct.unpack(">H", raw[pos:pos + 2])
        pos += 2
        out = raw[pos:pos + n]
        pos += n
        return out

    while pos + 2 <= len(raw):
        pos += 2                       # family
        _addr = field()
        number = field()
        name = field()
        data = field()
        if number in (b"", str(display_num).encode()) \
                and name == b"MIT-MAGIC-COOKIE-1":
            return name, data
    return b"", b""


def _pad4(n: int) -> int:
    return (4 - (n & 3)) & 3


class X11Grabber:
    """Minimal wire-protocol X11 client: setup + GetImage polling."""

    def __init__(self, display: Optional[str] = None,
                 timeout: float = 10.0, sock=None):
        if sock is not None:
            self.sock = sock               # injected (tests)
            num = 0
        else:
            host, num = parse_display(
                display or os.environ.get("DISPLAY", ":0"))
            if host:
                self.sock = socket.create_connection(
                    (host, 6000 + num), timeout)
            else:
                path = f"/tmp/.X11-unix/X{num}"
                self.sock = socket.socket(socket.AF_UNIX,
                                          socket.SOCK_STREAM)
                self.sock.settimeout(timeout)
                self.sock.connect(path)
        self._seq = 0
        self._handshake(num)

    def _read(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            b = self.sock.recv(n - len(out))
            if not b:
                raise EOFError("X server closed the connection")
            out += b
        return out

    # ------------------------------------------------- connection --

    def _handshake(self, display_num: int) -> None:
        name, data = read_xauth_cookie(display_num)
        req = struct.pack("<BxHHHHxx", ord("l"), 11, 0,
                          len(name), len(data))
        req += name + b"\x00" * _pad4(len(name))
        req += data + b"\x00" * _pad4(len(data))
        self.sock.sendall(req)
        head = self._read(8)
        status = head[0]
        (extra,) = struct.unpack("<H", head[6:8])
        body = self._read(extra * 4)
        if status == 0:
            rlen = head[1]
            raise X11Error("X11 setup refused: "
                           + body[24 - 8:24 - 8 + rlen]
                           .decode("latin-1", "replace")
                           if len(body) > 16 else "refused")
        if status != 1:
            raise X11Error(f"X11 setup status {status} "
                           "(authenticate?)")
        self._parse_setup(body)

    def _parse_setup(self, b: bytes) -> None:
        (_release, rid_base, rid_mask, _motion, vlen, maxreq,
         nscreens, nformats, img_order) = struct.unpack(
            "<IIIIHHBBB", b[:23])
        p = 32 + vlen + _pad4(vlen)    # fixed 32B head + vendor
        p += nformats * 8
        # first screen
        (root, _cmap, _white, _black, _inputs, w, h) = struct.unpack(
            "<IIIIIHH", b[p:p + 24])
        root_visual = struct.unpack("<I", b[p + 32:p + 36])[0]
        ndepths = b[p + 39]
        self.root = root
        self.root_visual = root_visual
        self.rid_base, self.rid_mask = rid_base, rid_mask
        self.max_request = maxreq      # in 4-byte units
        self.width, self.height = w, h
        self.byte_order = "big" if img_order else "little"
        # find the root visual's channel masks
        q = p + 40
        self.red_mask = 0xFF0000
        self.green_mask = 0x00FF00
        self.blue_mask = 0x0000FF
        self.depth = 24
        for _ in range(ndepths):
            depth = b[q]
            (nvis,) = struct.unpack("<H", b[q + 2:q + 4])
            q += 8
            for _v in range(nvis):
                vid, _cls, _bits, _ce, rm, gm, bm = struct.unpack(
                    "<IBBHIII", b[q:q + 20])
                if vid == root_visual:
                    self.red_mask, self.green_mask, self.blue_mask = \
                        rm, gm, bm
                    self.depth = depth
                q += 24

    # ---------------------------------------------------- GetImage --

    def get_image(self, x: int = 0, y: int = 0,
                  w: Optional[int] = None,
                  h: Optional[int] = None) -> np.ndarray:
        """GetImage(ZPixmap) on the root window -> (h, w, 3) RGB."""
        w = self.width if w is None else w
        h = self.height if h is None else h
        req = struct.pack("<BBHIhhHHI", 73, 2, 5, self.root,
                          x, y, w, h, 0xFFFFFFFF)
        self.sock.sendall(req)
        self._seq += 1
        head = self._read(32)
        if head[0] == 0:               # protocol error
            code = head[1]
            raise X11Error(f"GetImage failed (X error {code})")
        (nwords,) = struct.unpack("<I", head[4:8])
        data = self._read(nwords * 4)
        return self._decode_zpixmap(data, w, h)

    def _decode_zpixmap(self, data: bytes, w: int, h: int
                        ) -> np.ndarray:
        """ZPixmap depth-24/32 (bpp 32) -> RGB via the visual masks."""
        order = "<u4" if self.byte_order == "little" else ">u4"
        vals = np.frombuffer(data, order, h * w) \
            .reshape(h, w).astype(np.uint32)

        def chan(mask):
            if not mask:
                return np.zeros((h, w), np.uint8)
            shift = (mask & -mask).bit_length() - 1
            width = int(mask >> shift).bit_length()
            v = (vals >> np.uint32(shift)) & np.uint32(mask >> shift)
            if width < 8:
                v = (v * 255) // ((1 << width) - 1)
            return v.astype(np.uint8)

        return np.stack([chan(self.red_mask), chan(self.green_mask),
                         chan(self.blue_mask)], axis=-1)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass
