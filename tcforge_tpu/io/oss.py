"""OSS audio capture — the import/import_oss.c role.

Real Open Sound System capture over ctypes ioctls: SNDCTL_DSP_SETFMT
(s16le), SNDCTL_DSP_CHANNELS, SNDCTL_DSP_SPEED negotiation (the driver
may adjust each value — import_oss.c:93-131 errors on mismatch, we
report the adjusted value and let the session resample), then plain
read() of interleaved samples.

The kernel interface is injected (``ops``) so the negotiation logic is
unit-testable against a scripted fake, like io/v4l2.py.
"""

from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np


def _IOWR_P(nr: int) -> int:
    # _IOWR('P', nr, int): dir RW(3)<<30 | size 4<<16 | 'P'<<8 | nr
    return (3 << 30) | (4 << 16) | (ord("P") << 8) | nr


SNDCTL_DSP_SPEED = _IOWR_P(2)
SNDCTL_DSP_SETFMT = _IOWR_P(5)
SNDCTL_DSP_CHANNELS = _IOWR_P(6)
AFMT_S16_LE = 0x10


class OssDeviceOps:
    """Real /dev/dsp* interface."""

    def __init__(self, dev: str):
        self.fd = os.open(dev, os.O_RDONLY)

    def ioctl_int(self, request: int, value: int) -> int:
        import fcntl
        buf = bytearray(struct.pack("i", value))
        fcntl.ioctl(self.fd, request, buf)
        return struct.unpack("i", buf)[0]

    def read(self, nbytes: int) -> bytes:
        return os.read(self.fd, nbytes)

    def close(self) -> None:
        os.close(self.fd)


class OssCapture:
    def __init__(self, ops, rate: int, channels: int):
        self.ops = ops
        fmt = ops.ioctl_int(SNDCTL_DSP_SETFMT, AFMT_S16_LE)
        if fmt != AFMT_S16_LE:
            raise IOError(f"OSS device cannot do s16le (got {fmt:#x})")
        self.channels = ops.ioctl_int(SNDCTL_DSP_CHANNELS, channels)
        # drivers may adjust the rate (import_oss.c treats a mismatch
        # as fatal; we report what the hardware granted)
        self.rate = ops.ioctl_int(SNDCTL_DSP_SPEED, rate)

    def read_samples(self, n: int) -> Optional[np.ndarray]:
        """(n, channels) int16, or None at end of stream."""
        want = n * self.channels * 2
        chunks = []
        got = 0
        while got < want:
            b = self.ops.read(want - got)
            if not b:
                break
            chunks.append(b)
            got += len(b)
        if not got:
            return None
        data = b"".join(chunks)
        usable = len(data) // (2 * self.channels) * 2 * self.channels
        return np.frombuffer(data[:usable], "<i2") \
            .reshape(-1, self.channels)

    def close(self) -> None:
        self.ops.close()
