"""Synthetic RFB (VNC) server fixture.

Serves exactly one client on a localhost socket: version handshake
(3.3 / 3.7 / 3.8), None security, ServerInit, then answers each
FramebufferUpdateRequest with the next scripted update.  It keeps its
own model framebuffer, so tests can compare the client's framebuffer
bit-exactly against ``server.model``.

Scripted update ops (one update = list of ops -> one FramebufferUpdate
with one rect per op):
  ("fill", x, y, w, h, (r, g, b))  -- paint model, send as Raw
  ("raw",  x, y, w, h)             -- send model region as Raw
  ("copy", x, y, w, h, sx, sy)     -- CopyRect from (sx, sy)

When the script runs out the server closes the connection (EOF ends
the capture, like a vanished VNC session).
"""

from __future__ import annotations

import socket
import struct
import threading

import numpy as np


class RfbTestServer:
    def __init__(self, width=64, height=48, version=(3, 8),
                 name="tcforge-fake", updates=None):
        self.width, self.height = width, height
        self.version = version
        self.name = name
        self.updates = list(updates or [])
        self.model = np.zeros((height, width, 3), np.uint8)
        self.error = None
        self._srv = socket.socket()
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- #

    def _read(self, n):
        out = b""
        while len(out) < n:
            b = self._conn.recv(n - len(out))
            if not b:
                raise EOFError
            out += b
        return out

    def _serve(self):
        try:
            self._conn, _ = self._srv.accept()
            self._conn.settimeout(10.0)
            self._handshake()
            self._message_loop()
        except EOFError:
            pass
        except Exception as e:          # surfaced by the test
            self.error = e
        finally:
            try:
                self._conn.close()
            except Exception:
                pass
            self._srv.close()

    def _handshake(self):
        self._conn.sendall(b"RFB %03d.%03d\n" % self.version)
        cli = self._read(12)
        assert cli.startswith(b"RFB "), cli
        cver = (int(cli[4:7]), int(cli[8:11]))
        if self.version == (3, 3):
            assert cver == (3, 3), cver
            self._conn.sendall(struct.pack(">I", 1))       # None
        else:
            assert cver == self.version, (cver, self.version)
            self._conn.sendall(bytes([1, 1]))              # [None]
            sel = self._read(1)[0]
            assert sel == 1, sel
            if self.version >= (3, 8):
                self._conn.sendall(struct.pack(">I", 0))   # OK
        self._read(1)                                      # ClientInit
        # ServerInit: geometry + a deliberately awkward default pixel
        # format (big-endian 16bpp) the client must override
        pf = struct.pack(">BBBBHHHBBBxxx", 16, 16, 1, 1,
                         31, 63, 31, 11, 5, 0)
        self._conn.sendall(struct.pack(">HH", self.width, self.height)
                           + pf
                           + struct.pack(">I", len(self.name))
                           + self.name.encode())
        # until SetPixelFormat arrives, encode with the default above
        self._pf = (16, True, 31, 63, 31, 11, 5, 0)

    def _message_loop(self):
        pending = list(self.updates)
        while True:
            t = self._read(1)[0]
            if t == 0:                                 # SetPixelFormat
                self._read(3)
                (bpp, depth, be, tc, rm, gm, bm, rs, gs, bs
                 ) = struct.unpack(">BBBBHHHBBB", self._read(16)[:13])
                assert tc == 1, "only true-colour clients supported"
                self._pf = (bpp, bool(be), rm, gm, bm, rs, gs, bs)
            elif t == 2:                               # SetEncodings
                self._read(1)
                (n,) = struct.unpack(">H", self._read(2))
                self._encodings = struct.unpack(
                    ">%di" % n, self._read(4 * n))
            elif t == 3:                               # FBUpdateRequest
                self._read(9)
                if not pending:
                    return                             # script done
                self._send_update(pending.pop(0))
            else:
                raise AssertionError(f"unexpected client message {t}")

    # ------------------------------------------------------------- #

    def _encode_raw(self, region):
        bpp, be, rm, gm, bm, rs, gs, bs = self._pf
        r = region[:, :, 0].astype(np.uint32)
        g = region[:, :, 1].astype(np.uint32)
        b = region[:, :, 2].astype(np.uint32)
        if bpp == 16:
            val = (((r * rm // 255) << rs) | ((g * gm // 255) << gs)
                   | ((b * bm // 255) << bs)).astype(np.uint16)
            return val.astype(">u2" if be else "<u2").tobytes()
        val = ((r << rs) | (g << gs) | (b << bs)).astype(np.uint32)
        return val.astype(">u4" if be else "<u4").tobytes()

    def _send_update(self, ops):
        msg = struct.pack(">BxH", 0, len(ops))
        for op in ops:
            kind = op[0]
            if kind == "fill":
                _, x, y, w, h, color = op
                self.model[y:y + h, x:x + w] = color
                msg += struct.pack(">HHHHi", x, y, w, h, 0)
                msg += self._encode_raw(self.model[y:y + h, x:x + w])
            elif kind == "raw":
                _, x, y, w, h = op
                msg += struct.pack(">HHHHi", x, y, w, h, 0)
                msg += self._encode_raw(self.model[y:y + h, x:x + w])
            elif kind == "copy":
                _, x, y, w, h, sx, sy = op
                self.model[y:y + h, x:x + w] = \
                    self.model[sy:sy + h, sx:sx + w].copy()
                msg += struct.pack(">HHHHi", x, y, w, h, 1)
                msg += struct.pack(">HH", sx, sy)
            else:
                raise ValueError(kind)
        self._conn.sendall(msg)

    def join(self, timeout=10.0):
        self._thread.join(timeout)
        if self.error:
            raise self.error
