"""ALSA kernel-PCM capture (io/alsa.py) against a scripted fake
device — the io/v4l2.py test pattern.  The fake implements the real
ioctl ABI surface (hw_params buffer layout, snd_xferi reads via the
user pointer) so the negotiation logic is exercised byte-for-byte.
Reference: import/import_alsa.c:60-200 (libasound open/hw_params/
readi)."""

import ctypes
import struct

import numpy as np
import pytest

from tcforge_tpu.io import alsa as A


class FakeAlsaDevice:
    """Scripted /dev/snd/pcmC0D0c."""

    def __init__(self, grant_rate=None, grant_channels=None,
                 period=128, signal=None, protocol=0x20012):
        self.grant_rate = grant_rate
        self.grant_channels = grant_channels
        self.period = period
        self.signal = signal          # (n, ch) int16 to serve
        self.protocol = protocol
        self.pos = 0
        self.prepared = False
        self.started = False
        self.seen_access = None
        self.seen_format = None

    def _mask_bit(self, buf, param):
        off = 4 + param * 32
        bits = struct.unpack_from("<8I", buf, off)
        out = [w * 32 + b for w in range(8) for b in range(32)
               if bits[w] >> b & 1]
        return out

    def ioctl(self, request, arg):
        if request == A.SNDRV_PCM_IOCTL_PVERSION:
            struct.pack_into("<I", arg, 0, self.protocol)
            return
        if request == A.SNDRV_PCM_IOCTL_HW_PARAMS:
            self.seen_access = self._mask_bit(arg, A.PARAM_ACCESS)
            self.seen_format = self._mask_bit(arg, A.PARAM_FORMAT)
            base = 4 + 8 * 32

            def geti(p):
                off = base + (p - A.PARAM_FIRST_INTERVAL) * 12
                return struct.unpack_from("<II", arg, off)

            def seti(p, v):
                off = base + (p - A.PARAM_FIRST_INTERVAL) * 12
                struct.pack_into("<III", arg, off, v, v, 4)

            rate = geti(A.PARAM_RATE)[0]
            ch = geti(A.PARAM_CHANNELS)[0]
            self.rate = self.grant_rate or rate
            self.channels = self.grant_channels or ch
            seti(A.PARAM_RATE, self.rate)
            seti(A.PARAM_CHANNELS, self.channels)
            seti(A.PARAM_PERIOD_SIZE, self.period)
            return
        if request == A.SNDRV_PCM_IOCTL_PREPARE:
            self.prepared = True
            return
        if request == A.SNDRV_PCM_IOCTL_START:
            assert self.prepared, "START before PREPARE"
            self.started = True
            return
        if request == A.SNDRV_PCM_IOCTL_READI_FRAMES:
            assert self.started, "READI before START"
            _res, ptr, frames = struct.unpack_from("<qQQ", arg, 0)
            avail = 0 if self.signal is None else \
                len(self.signal) - self.pos
            n = min(frames, avail, self.period)
            if n <= 0:
                raise OSError(32, "EPIPE")   # no more data
            chunk = np.ascontiguousarray(
                self.signal[self.pos:self.pos + n], "<i2")
            ctypes.memmove(ptr, chunk.ctypes.data, chunk.nbytes)
            self.pos += n
            struct.pack_into("<q", arg, 0, n)
            return
        raise OSError(25, f"ENOTTY {request:#x}")

    def close(self):
        self.closed = True


def _sig(n, ch=2, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(-32768, 32767, (n, ch)).astype(np.int16)


class TestNegotiation:
    def test_exact_grant(self):
        dev = FakeAlsaDevice()
        cap = A.AlsaCapture(dev, 48000, 2)
        assert (cap.rate, cap.channels) == (48000, 2)
        assert cap.period_size == 128
        assert dev.seen_access == [A.ACCESS_RW_INTERLEAVED]
        assert dev.seen_format == [A.FORMAT_S16_LE]
        assert dev.started

    def test_driver_adjusted_rate_reported(self):
        dev = FakeAlsaDevice(grant_rate=44100, grant_channels=1)
        cap = A.AlsaCapture(dev, 48000, 2)
        assert (cap.rate, cap.channels) == (44100, 1)


class TestReads:
    def test_samples_bit_exact_across_periods(self):
        sig = _sig(1000)
        dev = FakeAlsaDevice(signal=sig, period=128)
        cap = A.AlsaCapture(dev, 48000, 2)
        got = cap.read_samples(700)
        assert got.shape == (700, 2)
        assert np.array_equal(got, sig[:700])
        got2 = cap.read_samples(700)
        assert np.array_equal(got2, sig[700:1000])

    def test_end_of_stream_none(self):
        dev = FakeAlsaDevice(signal=_sig(10), period=16)
        cap = A.AlsaCapture(dev, 48000, 2)
        assert cap.read_samples(10).shape == (10, 2)
        assert cap.read_samples(4) is None


class TestDeviceSpec:
    def test_hw_spec(self):
        assert A.find_capture_device("hw:1,2") == \
            "/dev/snd/pcmC1D2c"
        assert A.find_capture_device("hw:0") == "/dev/snd/pcmC0D0c"
        assert A.find_capture_device("plughw:2,1") == \
            "/dev/snd/pcmC2D1c"

    def test_literal_path(self):
        assert A.find_capture_device("/dev/snd/pcmC3D0c") == \
            "/dev/snd/pcmC3D0c"

    def test_bad_spec(self):
        with pytest.raises(ValueError):
            A.find_capture_device("surround51:0")


class TestImporter:
    def test_importer_batches(self):
        import tcforge_tpu.modules  # noqa: F401  (registry)
        from tcforge_tpu.core.job import Job
        from tcforge_tpu.modules.importers.device_import import \
            AlsaImporter
        sig = _sig(600)
        job = Job(a_rate=48000, a_chan=2)
        imp = AlsaImporter.__new__(AlsaImporter)
        imp.job = job
        imp._open_capture(FakeAlsaDevice(signal=sig, period=100))
        assert imp.audio_rate == 48000
        b1 = imp.read_audio_batch(256)
        b2 = imp.read_audio_batch(512)
        assert np.array_equal(np.concatenate([b1, b2]), sig[:600])
        imp.close()
