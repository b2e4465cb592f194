"""Native X11 frame display: wire-protocol window + PutImage client.

The reference's sdlview filter (filter/preview/filter_sdlview.c) is a
minimal "paint every frame into a window" preview on SDL.  This build
has no SDL, but it already speaks raw X11 for screen capture
(io/x11grab.py), so the display path reuses that client core and adds
the output half of the core protocol: CreateWindow, MapWindow,
CreateGC, ChangeProperty(WM_NAME) and PutImage(ZPixmap).

Frames are packed into 32-bpp ZPixmap words through the server's
visual channel masks (the exact inverse of the grab client's decode)
and sent in row strips that respect the server's maximum request
length, so arbitrarily large frames work without the BIG-REQUESTS
extension.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from tcforge_tpu.io.x11grab import X11Grabber, _pad4


class X11Viewer(X11Grabber):
    """X11 client that owns one InputOutput window and paints RGB
    frames into it."""

    def __init__(self, display: Optional[str] = None,
                 timeout: float = 10.0, sock=None):
        super().__init__(display=display, timeout=timeout, sock=sock)
        self._next_rid = 0
        self.window = 0
        self.gc = 0

    # -------------------------------------------------- resources --

    def _new_rid(self) -> int:
        shift = (self.rid_mask & -self.rid_mask).bit_length() - 1
        rid = self.rid_base | ((self._next_rid << shift)
                               & self.rid_mask)
        self._next_rid += 1
        return rid

    def _request(self, data: bytes) -> None:
        self.sock.sendall(data)
        self._seq += 1

    # ----------------------------------------------------- window --

    def open_window(self, w: int, h: int,
                    title: str = "tcforge preview") -> int:
        """CreateWindow + WM_NAME + CreateGC + MapWindow."""
        self.window = self._new_rid()
        # CreateWindow(1): depth, wid, parent, x, y, w, h, border,
        # class InputOutput(1), CopyFromParent visual, value-mask
        # background-pixel(0x2) = black
        self._request(struct.pack(
            "<BBHIIhhHHHHIII", 1, self.depth, 9, self.window,
            self.root, 0, 0, w, h, 0, 1, 0, 0x2, 0x000000))
        name = title.encode()
        # ChangeProperty(18) Replace on WM_NAME(39)/STRING(31)
        self._request(struct.pack(
            "<BBHIIIBxxxI", 18, 0, 6 + (len(name) + 3) // 4,
            self.window, 39, 31, 8, len(name))
            + name + b"\x00" * _pad4(len(name)))
        self.gc = self._new_rid()
        # CreateGC(55) on the window, no values
        self._request(struct.pack("<BxHIII", 55, 4, self.gc,
                                  self.window, 0))
        # MapWindow(8)
        self._request(struct.pack("<BxHI", 8, 2, self.window))
        return self.window

    # ------------------------------------------------------ paint --

    def _encode_zpixmap(self, rgb: np.ndarray) -> bytes:
        """(h, w, 3) RGB -> 32-bpp ZPixmap bytes via the visual
        masks (inverse of the grab client's decode)."""
        h, w = rgb.shape[:2]
        vals = np.zeros((h, w), np.uint32)
        for c, mask in enumerate((self.red_mask, self.green_mask,
                                  self.blue_mask)):
            if not mask:
                continue
            shift = (mask & -mask).bit_length() - 1
            width = int(mask >> shift).bit_length()
            v = rgb[..., c].astype(np.uint32)
            if width < 8:
                v >>= 8 - width
            vals |= (v << np.uint32(shift)) & np.uint32(mask)
        order = "<u4" if self.byte_order == "little" else ">u4"
        return vals.astype(order).tobytes()

    def put_frame(self, rgb: np.ndarray, x: int = 0,
                  y: int = 0) -> None:
        """PutImage(ZPixmap) the full frame, split into row strips
        under the server's maximum request length."""
        if not self.window:
            self.open_window(rgb.shape[1], rgb.shape[0])
        h, w = rgb.shape[:2]
        # request = 6 words header + w words per row
        max_rows = max(1, (self.max_request - 6) // max(1, w))
        for y0 in range(0, h, max_rows):
            strip = rgb[y0:y0 + max_rows]
            data = self._encode_zpixmap(strip)
            self._request(struct.pack(
                "<BBHIIHHhhBBH", 72, 2, 6 + len(data) // 4,
                self.window, self.gc, w, strip.shape[0], x, y + y0,
                0, self.depth, 0) + data)