"""Synthetic X11 server fixture: enough wire protocol for the grab
client — connection setup reply (one screen, one 24-bit TrueColor
visual) and GetImage(ZPixmap) replies served from a model framebuffer.
Tests compare the client's RGB frames bit-exactly against the model."""

from __future__ import annotations

import socket
import struct
import threading

import numpy as np


def _pad4(n):
    return (4 - (n & 3)) & 3


class X11TestServer:
    def __init__(self, width=64, height=48, frames=None,
                 byte_order="little",
                 masks=(0xFF0000, 0x00FF00, 0x0000FF),
                 expect_cookie=None):
        self.width, self.height = width, height
        self.frames = list(frames or [])     # model RGB frames served
        self.served = 0
        self.byte_order = byte_order
        self.masks = masks
        self.expect_cookie = expect_cookie
        self.error = None
        self._srv = socket.socket()
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

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
            self._setup()
            self._loop()
        except EOFError:
            pass
        except Exception as e:
            self.error = e
        finally:
            try:
                self._conn.close()
            except Exception:
                pass
            self._srv.close()

    def _setup(self):
        head = self._read(12)
        assert head[0] == ord("l"), head
        nlen, dlen = struct.unpack("<HH", head[6:10])
        name = self._read(nlen + _pad4(nlen))[:nlen]
        data = self._read(dlen + _pad4(dlen))[:dlen]
        if self.expect_cookie is not None:
            assert (name, data) == (b"MIT-MAGIC-COOKIE-1",
                                    self.expect_cookie), (name, data)
        vendor = b"tcforge-fake"
        root_visual = 0x21
        img_order = 1 if self.byte_order == "big" else 0
        body = struct.pack("<IIIIHHBBBBBBBBxxxx",
                           11_000_000,      # release
                           0x200000, 0x1FFFFF, 256,
                           len(vendor), 65535,
                           1,               # screens
                           1,               # pixmap formats
                           img_order, 0, 32, 32, 8, 255)
        body += vendor + b"\x00" * _pad4(len(vendor))
        body += struct.pack("<BBBxxxxx", 24, 32, 32)   # pixmap format
        rm, gm, bm = self.masks
        screen = struct.pack("<IIIIIHHHHHHIBBBB",
                             0x6A, 0x20, 0xFFFFFF, 0, 0,
                             self.width, self.height, 300, 200,
                             1, 1, root_visual, 0, 0, 24, 1)
        depth = struct.pack("<BxHxxxx", 24, 1)
        visual = struct.pack("<IBBHIIIxxxx", root_visual, 4, 8, 256,
                             rm, gm, bm)
        body += screen + depth + visual
        reply = struct.pack("<BxHHH", 1, 11, 0, len(body) // 4)
        self._conn.sendall(reply + body)

    def _loop(self):
        while True:
            req = self._read(4)
            opcode = req[0]
            (length,) = struct.unpack("<H", req[2:4])
            rest = self._read(length * 4 - 4)
            if opcode == 1:                  # CreateWindow
                (wid, _parent, _x, _y, w, h) = struct.unpack(
                    "<IIhhHH", rest[:16])
                self.window = wid
                self.painted = np.zeros((h, w, 3), np.uint8)
                self.put_count = 0
                continue
            if opcode == 18:                 # ChangeProperty
                (_wid, _prop, _type, fmt) = struct.unpack(
                    "<IIIB", rest[:13])
                (nunits,) = struct.unpack("<I", rest[16:20])
                self.wm_name = rest[20:20 + nunits].decode("latin-1")
                continue
            if opcode in (8, 55):            # MapWindow / CreateGC
                continue
            if opcode == 72:                 # PutImage
                (_draw, _gc, w, h, dx, dy, _pad, _depth) = \
                    struct.unpack("<IIHHhhBB", rest[:18])
                data = rest[20:20 + h * w * 4]
                order = (">u4" if self.byte_order == "big"
                         else "<u4")
                vals = np.frombuffer(data, order, h * w) \
                    .reshape(h, w).astype(np.uint32)
                rm, gm, bm = self.masks

                def dec(mask):
                    s = (mask & -mask).bit_length() - 1
                    return ((vals >> np.uint32(s))
                            & np.uint32(mask >> s)).astype(np.uint8)

                self.painted[dy:dy + h, dx:dx + w] = np.stack(
                    [dec(rm), dec(gm), dec(bm)], axis=-1)
                self.put_count += 1
                self.frame_done = getattr(self, "frame_done", 0)
                if dy + h >= self.painted.shape[0]:
                    self.frame_done += 1
                    self.history = getattr(self, "history", [])
                    self.history.append(self.painted.copy())
                continue
            if opcode != 73:                 # GetImage otherwise
                raise AssertionError(f"unexpected opcode {opcode}")
            _drawable, x, y, w, h = struct.unpack("<IhhHH", rest[:12])
            if not self.frames:
                return                       # script done -> EOF
            frame = self.frames.pop(0)
            self.served += 1
            self.model_last = frame
            rm, gm, bm = self.masks

            def sh(mask):
                return (mask & -mask).bit_length() - 1

            vals = ((frame[y:y + h, x:x + w, 0].astype(np.uint32)
                     << sh(rm))
                    | (frame[y:y + h, x:x + w, 1].astype(np.uint32)
                       << sh(gm))
                    | (frame[y:y + h, x:x + w, 2].astype(np.uint32)
                       << sh(bm)))
            order = ">u4" if self.byte_order == "big" else "<u4"
            data = vals.astype(order).tobytes()
            head = struct.pack("<BBHII", 1, 24, 0, len(data) // 4,
                               0x21) + b"\x00" * 20
            self._conn.sendall(head + data)

    def join(self, timeout=10.0):
        self._thread.join(timeout)
        if self.error:
            raise self.error
