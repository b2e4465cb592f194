"""ALSA PCM capture — the import/import_alsa.c role, bridge-free.

The reference opened devices through libasound
(import_alsa.c:60-200: snd_pcm_open / hw_params / readi).  This
module speaks the KERNEL PCM ioctl ABI directly on
``/dev/snd/pcmC<card>D<dev>c`` — the same interface libasound's hw
plugin wraps — so no user-space ALSA library is needed:

- SNDRV_PCM_IOCTL_PVERSION sanity check,
- SNDRV_PCM_IOCTL_HW_PARAMS with a refine-style snd_pcm_hw_params
  struct (3 access/format/subformat bitmasks + 12 value intervals;
  we request RW_INTERLEAVED s16le at an exact rate/channel count and
  read back what the driver granted),
- SNDRV_PCM_IOCTL_PREPARE + START,
- SNDRV_PCM_IOCTL_READI_FRAMES (struct snd_xferi) for interleaved
  frames.

The kernel interface is injected (``ops``) so the negotiation logic
is unit-testable against a scripted fake, like io/v4l2.py and
io/oss.py.
"""

from __future__ import annotations

import glob
import os
import re
import struct
from typing import Optional, Tuple

import numpy as np


# ------------------------------------------------------------------ #
# ioctl numbers (sound/asound.h, 'A' ioctls, x86_64 sizes)
# ------------------------------------------------------------------ #

def _ioc(direction: int, nr: int, size: int) -> int:
    return (direction << 30) | (size << 16) | (ord("A") << 8) | nr


HW_PARAMS_SIZE = 608          # struct snd_pcm_hw_params on 64-bit
XFERI_SIZE = 24               # struct snd_xferi on 64-bit

SNDRV_PCM_IOCTL_PVERSION = _ioc(2, 0x00, 4)
SNDRV_PCM_IOCTL_HW_PARAMS = _ioc(3, 0x11, HW_PARAMS_SIZE)
SNDRV_PCM_IOCTL_PREPARE = _ioc(0, 0x40, 0)
SNDRV_PCM_IOCTL_START = _ioc(0, 0x42, 0)
SNDRV_PCM_IOCTL_READI_FRAMES = _ioc(2, 0x51, XFERI_SIZE)

# hw_params parameter indices
PARAM_ACCESS = 0              # masks: 0..2
PARAM_FORMAT = 1
PARAM_SUBFORMAT = 2
PARAM_FIRST_INTERVAL = 8      # intervals: 8..19
PARAM_SAMPLE_BITS = 8
PARAM_FRAME_BITS = 9
PARAM_CHANNELS = 10
PARAM_RATE = 11
PARAM_PERIOD_SIZE = 13
PARAM_BUFFER_SIZE = 17

ACCESS_RW_INTERLEAVED = 3
FORMAT_S16_LE = 2
SUBFORMAT_STD = 0

INTERVAL_FLAG_INTEGER = 4     # bit 2 of the snd_interval bitfield

# struct layout offsets (64-bit): flags u32; masks[3]x32B;
# mres[5]x32B; intervals[12]x12B; ires[9]x12B; rmask; cmask; info;
# msbits; rate_num; rate_den; fifo_size u64; reserved[64]
_OFF_MASKS = 4
_OFF_INTERVALS = 4 + 8 * 32
_OFF_RMASK = _OFF_INTERVALS + 21 * 12
_OFF_INFO = _OFF_RMASK + 8


class HwParams:
    """Mutable snd_pcm_hw_params buffer with mask/interval access."""

    def __init__(self):
        self.buf = bytearray(HW_PARAMS_SIZE)
        # "any": all mask bits set, all intervals full-range
        for m in range(3):
            off = _OFF_MASKS + m * 32
            self.buf[off:off + 32] = b"\xff" * 32
        for i in range(12):
            off = _OFF_INTERVALS + i * 12
            struct.pack_into("<III", self.buf, off,
                             0, 0xFFFFFFFF, 0)
        struct.pack_into("<I", self.buf, _OFF_RMASK, 0xFFFFFFFF)

    def set_mask(self, param: int, bit: int) -> None:
        off = _OFF_MASKS + param * 32
        self.buf[off:off + 32] = b"\x00" * 32
        word = off + 4 * (bit >> 5)
        struct.pack_into("<I", self.buf, word, 1 << (bit & 31))

    def set_interval(self, param: int, value: int) -> None:
        off = _OFF_INTERVALS + (param - PARAM_FIRST_INTERVAL) * 12
        struct.pack_into("<III", self.buf, off, value, value,
                         INTERVAL_FLAG_INTEGER)

    def get_interval(self, param: int) -> Tuple[int, int]:
        off = _OFF_INTERVALS + (param - PARAM_FIRST_INTERVAL) * 12
        lo, hi, _fl = struct.unpack_from("<III", self.buf, off)
        return lo, hi


class AlsaDeviceOps:
    """Real /dev/snd/pcmC*D*c interface."""

    def __init__(self, dev: str):
        self.fd = os.open(dev, os.O_RDWR)

    def ioctl(self, request: int, arg) -> None:
        import fcntl
        fcntl.ioctl(self.fd, request, arg)

    def close(self) -> None:
        os.close(self.fd)


def find_capture_device(spec: Optional[str] = None) -> str:
    """Resolve an import_alsa-style device spec to a PCM node:
    ``hw:C,D`` / ``hw:C`` / ``plughw:C,D`` -> /dev/snd/pcmC<C>D<D>c,
    a literal /dev/snd path passes through, None/'default' picks the
    first capture node."""
    if spec and spec.startswith("/dev/"):
        return spec
    if spec and spec not in ("default", ""):
        m = re.match(r"(?:plug)?hw:(\d+)(?:,(\d+))?$", spec)
        if not m:
            raise ValueError(f"alsa: unsupported device spec {spec!r}")
        card, dev = int(m.group(1)), int(m.group(2) or 0)
        return f"/dev/snd/pcmC{card}D{dev}c"
    nodes = sorted(glob.glob("/dev/snd/pcmC*D*c"))
    if not nodes:
        raise FileNotFoundError("no ALSA capture device")
    return nodes[0]


class AlsaCapture:
    """Negotiated interleaved s16le capture stream."""

    def __init__(self, ops, rate: int, channels: int):
        self.ops = ops
        ver = bytearray(4)
        ops.ioctl(SNDRV_PCM_IOCTL_PVERSION, ver)
        self.protocol = struct.unpack("<I", ver)[0]
        hw = HwParams()
        hw.set_mask(PARAM_ACCESS, ACCESS_RW_INTERLEAVED)
        hw.set_mask(PARAM_FORMAT, FORMAT_S16_LE)
        hw.set_mask(PARAM_SUBFORMAT, SUBFORMAT_STD)
        hw.set_interval(PARAM_SAMPLE_BITS, 16)
        hw.set_interval(PARAM_CHANNELS, channels)
        hw.set_interval(PARAM_RATE, rate)
        ops.ioctl(SNDRV_PCM_IOCTL_HW_PARAMS, hw.buf)
        # drivers may adjust (import_alsa.c lets snd_pcm_hw_params
        # pick the nearest); report what was granted
        self.channels = hw.get_interval(PARAM_CHANNELS)[0]
        self.rate = hw.get_interval(PARAM_RATE)[0]
        self.period_size = hw.get_interval(PARAM_PERIOD_SIZE)[0]
        ops.ioctl(SNDRV_PCM_IOCTL_PREPARE, 0)
        ops.ioctl(SNDRV_PCM_IOCTL_START, 0)

    def read_samples(self, n: int) -> Optional[np.ndarray]:
        """(n, channels) int16, or None at end of stream."""
        out = np.empty((0, self.channels), "<i2")
        remaining = n
        parts = []
        got = 0
        while remaining > 0:
            chunk = min(remaining, max(self.period_size, 1) or 1024)
            buf = np.zeros(chunk * self.channels, "<i2")
            xfer = bytearray(XFERI_SIZE)
            struct.pack_into("<qQQ", xfer, 0, 0,
                             buf.ctypes.data, chunk)
            try:
                self.ops.ioctl(SNDRV_PCM_IOCTL_READI_FRAMES, xfer)
            except OSError:
                break
            result = struct.unpack_from("<q", xfer, 0)[0]
            if result <= 0:
                break
            parts.append(buf[:result * self.channels])
            got += result
            remaining -= result
        if not got:
            return None
        return np.concatenate(parts).reshape(-1, self.channels)

    def close(self) -> None:
        self.ops.close()
