"""ctypes bindings for the native host-IO library (libtcforge_host.so).

The reference's runtime is C throughout; here the Python engine rides a
C++ fast path for container streaming and byte shuffles when the library
is built (``make -C native``), and transparently falls back to the pure-
Python implementations otherwise.  ``python -m tcforge_tpu.native.build``
builds it in-tree.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_SEARCHED = False
# --accel none/C: force the pure jax/python paths (the reference
# flag selected the SIMD level; here "acceleration" = the native
# C++ fast paths).  Set before the first load().
DISABLED = False


def disable() -> None:
    global DISABLED, _LIB, _SEARCHED
    DISABLED = True
    _LIB = None
    _SEARCHED = True


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "native", "libtcforge_host.so")


def load() -> Optional[ctypes.CDLL]:
    """Load the native library; None if not built."""
    global _LIB, _SEARCHED
    if DISABLED:
        return None
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    from tcforge_tpu.native.build import ensure_fresh
    ensure_fresh()
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    c_p = ctypes.c_void_p
    c_cp = ctypes.c_char_p
    c_l = ctypes.c_long
    c_i = ctypes.c_int
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lp = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.tc_y4m_open.restype = c_p
    lib.tc_y4m_open.argtypes = [c_cp]
    for fn in ("tc_y4m_width", "tc_y4m_height", "tc_y4m_fps_num",
               "tc_y4m_fps_den"):
        getattr(lib, fn).restype = c_i
        getattr(lib, fn).argtypes = [c_p]
    lib.tc_y4m_frame_bytes.restype = c_l
    lib.tc_y4m_frame_bytes.argtypes = [c_p]
    lib.tc_y4m_chroma.restype = c_cp
    lib.tc_y4m_chroma.argtypes = [c_p]
    lib.tc_y4m_read_batch.restype = c_l
    lib.tc_y4m_read_batch.argtypes = [c_p, u8p, c_l]
    lib.tc_y4m_close.restype = None
    lib.tc_y4m_close.argtypes = [c_p]

    lib.tc_y4m_create.restype = c_p
    lib.tc_y4m_create.argtypes = [c_cp, c_i, c_i, c_i, c_i, c_cp]
    lib.tc_y4m_write_batch.restype = c_l
    lib.tc_y4m_write_batch.argtypes = [c_p, u8p, c_l]
    lib.tc_y4m_writer_close.restype = None
    lib.tc_y4m_writer_close.argtypes = [c_p]

    lib.tc_avi_scan_movi.restype = c_l
    lib.tc_avi_scan_movi.argtypes = [c_cp, c_l, lp, lp, i32p, c_l]

    lib.tc_yuy2_to_planar.restype = None
    lib.tc_yuy2_to_planar.argtypes = [u8p, u8p, u8p, u8p, c_l, c_l]
    lib.tc_planar_to_yuy2.restype = None
    lib.tc_planar_to_yuy2.argtypes = [u8p, u8p, u8p, u8p, c_l, c_l]
    lib.tc_shuffle_channels.restype = None
    lib.tc_shuffle_channels.argtypes = [u8p, u8p, c_l, c_i, i32p]

    lib.tc_m2d_open.restype = c_p
    lib.tc_m2d_open.argtypes = [u8p, ctypes.c_longlong]
    lib.tc_m2d_width.restype = c_i
    lib.tc_m2d_width.argtypes = [c_p]
    lib.tc_m2d_height.restype = c_i
    lib.tc_m2d_height.argtypes = [c_p]
    lib.tc_m2d_fps.restype = ctypes.c_double
    lib.tc_m2d_fps.argtypes = [c_p]
    lib.tc_m2d_chroma.restype = c_i
    lib.tc_m2d_chroma.argtypes = [c_p]
    lib.tc_m2d_next.restype = c_i
    lib.tc_m2d_next.argtypes = [c_p, i32p, i32p, i32p]
    lib.tc_m2d_errmsg.restype = c_cp
    lib.tc_m2d_errmsg.argtypes = [c_p]
    lib.tc_m2d_close.restype = None
    lib.tc_m2d_close.argtypes = [c_p]
    lib.tc_m2d_next2.restype = c_i
    lib.tc_m2d_next2.argtypes = [c_p, i32p, i32p, i32p, i32p, i32p]
    lib.tc_m2d_set_stream.restype = None
    lib.tc_m2d_set_stream.argtypes = [c_p, c_i]
    lib.tc_m2d_set_eos.restype = None
    lib.tc_m2d_set_eos.argtypes = [c_p]
    lib.tc_m2d_tell.restype = ctypes.c_longlong
    lib.tc_m2d_tell.argtypes = [c_p]
    lib.tc_m2d_feed.restype = None
    lib.tc_m2d_feed.argtypes = [c_p, u8p, ctypes.c_longlong]

    lib.tc_requant.restype = ctypes.c_longlong
    lib.tc_requant.argtypes = [u8p, ctypes.c_longlong, ctypes.c_double,
                               ctypes.POINTER(ctypes.c_void_p)]
    lib.tc_requant_free.restype = None
    lib.tc_requant_free.argtypes = [c_p]

    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    lib.tc_m2e_picture.restype = c_i
    lib.tc_m2e_picture.argtypes = [
        c_i, c_i, c_i, c_i, c_i, c_i, c_i, c_i,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"), i16p,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(c_i)]
    lib.tc_m2e_buf_free.restype = None
    lib.tc_m2e_buf_free.argtypes = [c_p]
    try:
        lib.tc_idct_intra_batch.restype = None
        lib.tc_idct_intra_batch.argtypes = [i32p, c_l, c_l, c_l, u8p]
    except AttributeError:
        pass
    try:
        lib.tc_me16_refine.restype = None
        lib.tc_me16_refine.argtypes = [u8p, u8p, c_l, c_l, c_i,
                                       i32p, i32p]
        i16p_ = np.ctypeslib.ndpointer(np.int16,
                                       flags="C_CONTIGUOUS")
        lib.tc_enc_intra_plane.restype = None
        lib.tc_enc_intra_plane.argtypes = [u8p, c_l, c_l, c_i, c_i,
                                           i32p, i32p, i16p_, u8p,
                                           c_i]
        lib.tc_enc_inter_plane.restype = None
        lib.tc_enc_inter_plane.argtypes = [u8p, u8p, c_l, c_l, c_i,
                                           c_i, i32p, i16p_, u8p,
                                           c_i]
        lib.tc_mc_pred_half.restype = None
        lib.tc_mc_pred_half.argtypes = [u8p, c_l, c_l, i32p, c_i, u8p]
        lib.tc_mc_pred_half2.restype = None
        lib.tc_mc_pred_half2.argtypes = [u8p, c_l, c_l, i32p, c_i,
                                         c_i, u8p]
        lib.tc_enc_inter_levels.restype = None
        lib.tc_enc_inter_levels.argtypes = [u8p, u8p, c_l, c_l, c_i,
                                            c_i, i32p, i16p_, c_i]
        lib.tc_enc_intra_sel.restype = None
        lib.tc_enc_intra_sel.argtypes = [u8p, c_l, c_l, c_i, c_i,
                                         i32p, i32p, i32p, i32p, c_l,
                                         i16p_, u8p]
        lib.tc_b_mc_sel_pred.restype = None
        lib.tc_b_mc_sel_pred.argtypes = [u8p, u8p, c_l, c_l, i32p,
                                         i32p, i32p, c_i, u8p]
        lib.tc_b_mc_sel_pred2.restype = None
        lib.tc_b_mc_sel_pred2.argtypes = [u8p, u8p, c_l, c_l, i32p,
                                          i32p, i32p, c_i, c_i, u8p]
    except AttributeError:
        pass
    try:
        lib.tc_bisad.restype = None
        lib.tc_bisad.argtypes = [u8p, u8p, u8p, c_l, c_l, i32p]
        lib.tc_b_select_pred.restype = None
        lib.tc_b_select_pred.argtypes = [u8p, u8p, i32p, c_l, c_l,
                                         c_i, u8p]
        lib.tc_mb_act.restype = None
        lib.tc_mb_act.argtypes = [u8p, c_l, c_l, i32p]
    except AttributeError:
        pass
    try:
        lib.tc_hqdn3d_plane.restype = None
        lib.tc_hqdn3d_plane.argtypes = [u8p, c_l, c_l, c_l,
                                        i32p, i32p, i32p, u8p]
        lib.tc_denoise3d_plane.restype = None
        lib.tc_denoise3d_plane.argtypes = [u8p, c_l, c_l, c_l,
                                           i32p, i32p, i32p, i32p, u8p]
    except AttributeError:      # older .so without the kernels
        pass
    try:
        u32p = np.ctypeslib.ndpointer(np.uint32,
                                      flags="C_CONTIGUOUS")
        lib.tc_th_huff_new.restype = c_p
        lib.tc_th_huff_new.argtypes = [u32p, u8p, u8p, i32p]
        lib.tc_th_huff_free.restype = None
        lib.tc_th_huff_free.argtypes = [c_p]
        lib.tc_th_tokens.restype = ctypes.c_int64
        lib.tc_th_tokens.argtypes = [c_p, u8p, ctypes.c_int64,
                                     ctypes.c_int64, lp, u8p,
                                     c_i, i32p]
        lib.tc_th_predict_dc.restype = None
        lib.tc_th_predict_dc.argtypes = [i32p, u8p, u8p, i32p,
                                         i32p, i32p]
        lib.tc_th_loop_filter.restype = None
        lib.tc_th_loop_filter.argtypes = [u8p, c_i, c_i, c_i, u8p,
                                          c_i, c_i]
    except AttributeError:      # older .so without theora_tokens
        pass
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


# --------------------------------------------------------------------- #
# High-level wrappers


class NativeY4MReader:
    """Batch Y4M reader over the C++ core (Y4MReader-compatible enough
    for the import module fast path)."""

    _CHROMA_SHAPES = {
        b"420": lambda w, h: ((h, w), (h // 2, w // 2), (h // 2, w // 2)),
        b"420jpeg": lambda w, h: ((h, w), (h // 2, w // 2),
                                  (h // 2, w // 2)),
        b"420mpeg2": lambda w, h: ((h, w), (h // 2, w // 2),
                                   (h // 2, w // 2)),
        b"422": lambda w, h: ((h, w), (h, w // 2), (h, w // 2)),
        b"444": lambda w, h: ((h, w), (h, w), (h, w)),
        b"411": lambda w, h: ((h, w), (h, w // 4), (h, w // 4)),
        b"mono": lambda w, h: ((h, w),),
    }

    def __init__(self, path: str):
        lib = load()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        self._h = lib.tc_y4m_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open Y4M stream: {path}")
        self.width = lib.tc_y4m_width(self._h)
        self.height = lib.tc_y4m_height(self._h)
        self.fps = (lib.tc_y4m_fps_num(self._h)
                    / max(1, lib.tc_y4m_fps_den(self._h)))
        self.chroma = lib.tc_y4m_chroma(self._h)
        self.frame_bytes = lib.tc_y4m_frame_bytes(self._h)
        self._shapes = self._CHROMA_SHAPES[self.chroma](self.width,
                                                        self.height)

    def read_batch(self, n: int):
        buf = np.empty(n * self.frame_bytes, np.uint8)
        got = self._lib.tc_y4m_read_batch(self._h, buf, n)
        if got < 0:
            raise IOError("corrupt Y4M stream")
        if got == 0:
            return None
        frames = buf[:got * self.frame_bytes].reshape(got,
                                                      self.frame_bytes)
        planes = []
        off = 0
        for (h, w) in self._shapes:
            sz = h * w
            planes.append(np.ascontiguousarray(
                frames[:, off:off + sz]).reshape(got, h, w))
            off += sz
        return tuple(planes)

    def close(self):
        if self._h:
            self._lib.tc_y4m_close(self._h)
            self._h = None


class NativeY4MWriter:
    def __init__(self, path: str, width: int, height: int,
                 fps_num: int, fps_den: int, chroma: str = "420"):
        lib = load()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        self._h = lib.tc_y4m_create(path.encode(), width, height,
                                    fps_num, fps_den, chroma.encode())
        if not self._h:
            raise IOError(f"cannot create Y4M stream: {path}")

    def write_packed(self, data: np.ndarray, count: int) -> int:
        """Write `count` frames of pre-packed plane bytes."""
        return int(self._lib.tc_y4m_write_batch(
            self._h, np.ascontiguousarray(data, np.uint8).reshape(-1),
            count))

    def close(self):
        if self._h:
            self._lib.tc_y4m_writer_close(self._h)
            self._h = None


def avi_scan_movi(path: str, movi_start: int,
                  max_entries: int = 1 << 20):
    """Fast movi chunk scan; returns (offsets, sizes, kinds) arrays."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library not built")
    offsets = np.zeros(max_entries, np.int64)
    sizes = np.zeros(max_entries, np.int64)
    kinds = np.zeros(max_entries, np.int32)
    n = lib.tc_avi_scan_movi(path.encode(), movi_start, offsets, sizes,
                             kinds, max_entries)
    if n < 0:
        raise IOError(f"cannot scan {path}")
    return offsets[:n], sizes[:n], kinds[:n]


# sentinel returned by next_picture_full in streaming mode: the window
# holds no complete picture — feed() more bytes (or set_eos()) and retry
NEED_DATA = object()


class NativeMpeg2Bitstream:
    """C++ MPEG-2 intra bitstream decoder: headers + slices + VLC +
    dequant on the host, coefficient blocks out (the batched IDCT runs
    in :mod:`tcforge_tpu.io.mpeg2codec`).

    With ``streaming=True`` the input arrives in windows: construct
    with the first chunk, ``feed()`` more as ``next_picture_full``
    returns :data:`NEED_DATA`, ``set_eos()`` at end of input.  Only
    the unconsumed tail is kept (``max_window`` tracks the high-water
    mark)."""

    def __init__(self, data: bytes, streaming: bool = False):
        lib = load()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        self._buf = np.frombuffer(bytes(data), np.uint8)  # keeps alive
        self._h = lib.tc_m2d_open(self._buf, len(self._buf))
        self.streaming = streaming
        self._eos_in = False
        self.max_window = len(self._buf)
        if streaming:
            lib.tc_m2d_set_stream(self._h, 1)
        self.width = lib.tc_m2d_width(self._h)
        self.height = lib.tc_m2d_height(self._h)
        self.fps = lib.tc_m2d_fps(self._h)
        # 1 = 4:2:0, 2 = 4:2:2 (sequence extension chroma_format)
        self.chroma = lib.tc_m2d_chroma(self._h)

    def feed(self, more: bytes) -> None:
        """Append input: the consumed head of the window is dropped
        (tc_m2d_tell) and the parse cursor rebases onto tail+more."""
        pos = int(self._lib.tc_m2d_tell(self._h))
        tail = self._buf[pos:].tobytes() + more
        self._buf = np.frombuffer(tail, np.uint8)
        self._lib.tc_m2d_feed(self._h, self._buf, len(self._buf))
        self.max_window = max(self.max_window, len(self._buf))
        if not self.width:
            self.width = self._lib.tc_m2d_width(self._h)
            self.height = self._lib.tc_m2d_height(self._h)
            self.fps = self._lib.tc_m2d_fps(self._h)
            self.chroma = self._lib.tc_m2d_chroma(self._h)

    def set_eos(self) -> None:
        self._eos_in = True
        self._lib.tc_m2d_set_eos(self._h)

    def next_picture_full(self, out=None):
        """Full I/P/B decode: -> (pic_type, temporal_ref, ycoef, ucoef,
        vcoef, mbinfo) or None at end of stream.

        `out`: optional (ycoef, ucoef, vcoef, mbinfo) C-contiguous
        int32 arrays to decode into (callers batch pictures without
        re-stacking).  Streaming mode also returns NEED_DATA."""
        if not self.width or not self.height:
            return (NEED_DATA if self.streaming and not self._eos_in
                    else None)
        # coded grid rounds up (13818-2 6.3.3); callers crop to display
        mbh, mbw = (self.height + 15) // 16, (self.width + 15) // 16
        bh, bw = mbh * 2, mbw * 2
        if out is not None:
            ycoef, ucoef, vcoef, mbinfo = out
        else:
            ycoef = np.empty((bh, bw, 64), np.int32)
            # chroma block grid: (mbh, mbw) at 4:2:0, (mbh*2, mbw)
            # at 4:2:2 (8x16 chroma macroblocks)
            ch = mbh * self.chroma
            ucoef = np.empty((ch, mbw, 64), np.int32)
            vcoef = np.empty((ch, mbw, 64), np.int32)
            mbinfo = np.empty((mbh * mbw, 12), np.int32)
        meta = np.zeros(4, np.int32)
        rc = self._lib.tc_m2d_next2(self._h, ycoef.reshape(-1),
                                    ucoef.reshape(-1),
                                    vcoef.reshape(-1),
                                    mbinfo.reshape(-1), meta)
        if rc == 0:
            return None
        if rc == 1:
            self.width = self._lib.tc_m2d_width(self._h)
            self.height = self._lib.tc_m2d_height(self._h)
            self.fps = self._lib.tc_m2d_fps(self._h)
            self.chroma = self._lib.tc_m2d_chroma(self._h)
            self.last_picture_structure = int(meta[2])
            self.last_tff = int(meta[3])
            return (int(meta[0]), int(meta[1]), ycoef, ucoef, vcoef,
                    mbinfo)
        if rc == -4:
            return NEED_DATA
        msg = (self._lib.tc_m2d_errmsg(self._h) or b"").decode() \
            or "bitstream ended mid-picture"
        if rc == -1:
            raise EOFError(f"truncated MPEG-2 stream: {msg}")
        if rc == -2:
            raise NotImplementedError(msg)
        raise ValueError(f"MPEG-2 parse error: {msg}")

    def next_coefs(self):
        """Decode the next picture -> (ycoef, ucoef, vcoef) natural-order
        int32 block grids, or None at end of stream."""
        if not self.width or not self.height:
            return None
        mbh, mbw = (self.height + 15) // 16, (self.width + 15) // 16
        bh, bw = mbh * 2, mbw * 2
        ycoef = np.empty((bh, bw, 64), np.int32)
        ch = mbh * self.chroma
        ucoef = np.empty((ch, mbw, 64), np.int32)
        vcoef = np.empty((ch, mbw, 64), np.int32)
        rc = self._lib.tc_m2d_next(self._h, ycoef.reshape(-1),
                                   ucoef.reshape(-1), vcoef.reshape(-1))
        if rc == 0:
            return None
        if rc == 1:
            # geometry may have been (re)established by this call
            self.width = self._lib.tc_m2d_width(self._h)
            self.height = self._lib.tc_m2d_height(self._h)
            self.fps = self._lib.tc_m2d_fps(self._h)
            self.chroma = self._lib.tc_m2d_chroma(self._h)
            return ycoef, ucoef, vcoef
        msg = (self._lib.tc_m2d_errmsg(self._h) or b"").decode() \
            or "bitstream ended mid-picture"
        if rc == -1:
            raise EOFError(f"truncated MPEG-2 stream: {msg}")
        if rc == -2:
            raise NotImplementedError(msg)
        raise ValueError(f"MPEG-2 parse error: {msg}")

    def close(self):
        if self._h:
            self._lib.tc_m2d_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def requant(data: bytes, factor: float) -> bytes:
    """MPEG-2 bitstream-domain requantization (native/mpeg2requant.cpp,
    the tcrequant engine): shrink a video ES toward len(data)/factor
    without re-encoding."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library not built")
    buf = np.frombuffer(data, np.uint8)
    outp = ctypes.c_void_p()
    n = lib.tc_requant(buf, len(data), float(factor),
                       ctypes.byref(outp))
    if n < 0:
        raise ValueError("requantization failed")
    try:
        return ctypes.string_at(outp, n)
    finally:
        lib.tc_requant_free(outp)


def yuy2_to_planar(packed: np.ndarray, width: int, height: int):
    lib = load()
    y = np.empty((height, width), np.uint8)
    u = np.empty((height, width // 2), np.uint8)
    v = np.empty((height, width // 2), np.uint8)
    lib.tc_yuy2_to_planar(np.ascontiguousarray(packed).reshape(-1),
                          y.reshape(-1), u.reshape(-1), v.reshape(-1),
                          width, height)
    return y, u, v


def hqdn3d_available() -> bool:
    lib = load()
    return lib is not None and hasattr(lib, "tc_hqdn3d_plane")


def hqdn3d_plane(frames: np.ndarray, ant: np.ndarray,
                 sp_lut: np.ndarray, tp_lut: np.ndarray):
    """Fused native hqdn3d cascade over a (N,H,W) uint8 plane batch;
    bit-identical to filters/hqdn3d.denoise_plane.  Returns
    (denoised uint8 (N,H,W), updated int32 FrameAnt (H,W))."""
    lib = load()
    n, h, w = frames.shape
    out = np.empty((n, h, w), np.uint8)
    ant_io = np.ascontiguousarray(ant, np.int32).copy()
    lib.tc_hqdn3d_plane(
        np.ascontiguousarray(frames).reshape(-1), n, h, w,
        np.ascontiguousarray(sp_lut, np.int32),
        np.ascontiguousarray(tp_lut, np.int32),
        ant_io.reshape(-1), out.reshape(-1))
    return out, ant_io


def denoise3d_available() -> bool:
    lib = load()
    return lib is not None and hasattr(lib, "tc_denoise3d_plane")


def denoise3d_plane(frames: np.ndarray, prev: np.ndarray,
                    c_h: np.ndarray, c_v: np.ndarray, c_t: np.ndarray):
    """Fused native denoise3d cascade; bit-identical to
    filters/denoise3d.denoise_plane.  Returns (uint8 (N,H,W), new
    int32 carry (H,W))."""
    lib = load()
    n, h, w = frames.shape
    out = np.empty((n, h, w), np.uint8)
    prev_io = np.ascontiguousarray(prev, np.int32).copy()
    lib.tc_denoise3d_plane(
        np.ascontiguousarray(frames).reshape(-1), n, h, w,
        np.ascontiguousarray(c_h, np.int32),
        np.ascontiguousarray(c_v, np.int32),
        np.ascontiguousarray(c_t, np.int32),
        prev_io.reshape(-1), out.reshape(-1))
    return out, prev_io


def m2e_picture(width: int, height: int, pic_type: int,
                temporal_ref: int, qscale_code: int, fcode_f: int,
                fcode_b: int, mbinfo: "np.ndarray",
                levels: "np.ndarray", flags: int = 0) -> bytes:
    """Serialize one MPEG-2 frame picture (native/mpeg2encode.cpp).

    mbinfo: (nmb, 8) int32; levels: (nmb, 6, 64) int16 zigzag;
    flags: picture-extension bits (1 = top_field_first,
    2 = repeat_first_field, 4 = progressive_frame off)."""
    import ctypes
    lib = load()
    if lib is None:
        raise RuntimeError("native library not built")
    mbinfo = np.ascontiguousarray(mbinfo, np.int32).reshape(-1)
    levels = np.ascontiguousarray(levels, np.int16).reshape(-1)
    outp = ctypes.c_void_p()
    outlen = ctypes.c_int()
    rc = lib.tc_m2e_picture(width, height, pic_type, temporal_ref,
                            qscale_code, fcode_f, fcode_b, flags,
                            mbinfo, levels, ctypes.byref(outp),
                            ctypes.byref(outlen))
    if rc != 0:
        raise ValueError(f"mpeg2 picture encode failed (rc={rc})")
    try:
        return ctypes.string_at(outp, outlen.value)
    finally:
        lib.tc_m2e_buf_free(outp)


def idct_available() -> bool:
    lib = load()
    return lib is not None and hasattr(lib, "tc_idct_intra_batch")


def idct_intra_batch(coef: np.ndarray) -> np.ndarray:
    """(n, bh, bw, 64) int32 coefficient grid -> (n, bh*8, bw*8) uint8
    plane batch; same math (and rounding) as mpeg2codec's
    _recon_intra_batch_core, in native C++ (the XLA:CPU batched-matmul
    path costs ~6 ms/frame at SD; this runs well under 1 ms)."""
    lib = load()
    n, bh, bw = coef.shape[:3]
    out = np.empty((n, bh * 8, bw * 8), np.uint8)
    lib.tc_idct_intra_batch(
        np.ascontiguousarray(coef, np.int32).reshape(-1),
        n, bh, bw, out.reshape(-1))
    return out


def me16_available() -> bool:
    lib = load()
    return lib is not None and hasattr(lib, "tc_me16_refine")


def me16_refine(ref: np.ndarray, cur: np.ndarray, r: int):
    """Native MPEG-2 motion estimation (integer hierarchy + half-pel
    refine), bit-exact to io/mpeg2enc.motion_search+halfpel_refine.
    Returns (mvh (mbh, mbw, 2) int32 half-pel, sad (mbh, mbw))."""
    lib = load()
    h, w = ref.shape
    mbh, mbw = h // 16, w // 16
    mvh = np.empty((mbh, mbw, 2), np.int32)
    sad = np.empty((mbh, mbw), np.int32)
    lib.tc_me16_refine(np.ascontiguousarray(ref).reshape(-1),
                       np.ascontiguousarray(cur).reshape(-1),
                       h, w, r, mvh.reshape(-1), sad.reshape(-1))
    return mvh, sad


def enc_blocks_available() -> bool:
    lib = load()
    return lib is not None and hasattr(lib, "tc_enc_intra_plane")


def enc_intra_plane(plane: np.ndarray, qs: int, intra_w: np.ndarray,
                    scan: np.ndarray, m1: bool = False,
                    slot: int = -2, out: np.ndarray = None):
    """Native intra block pipeline (double-precision DCT, the same
    quant/dequant/mismatch integer math as io/mpeg2enc) -> (levels
    int16 in SCAN order, recon plane uint8).  Default layout is
    natural (bh, bw, 64); slot -1 (luma) / 4 / 5 (chroma) writes the
    blocks of a caller-provided (nmb, 6, 64) MB-interleaved ``out``
    directly, replacing a host-side interleave copy."""
    lib = load()
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    lv = np.empty((bh, bw, 64), np.int16) if out is None else out
    rec = np.empty((h, w), np.uint8)
    lib.tc_enc_intra_plane(np.ascontiguousarray(plane).reshape(-1),
                           h, w, int(qs), int(m1),
                           np.ascontiguousarray(intra_w,
                                                np.int32).reshape(-1),
                           np.ascontiguousarray(scan,
                                                np.int32).reshape(-1),
                           lv.reshape(-1), rec.reshape(-1), slot)
    return lv, rec


def enc_inter_plane(cur: np.ndarray, pred: np.ndarray, qs: int,
                    scan: np.ndarray, m1: bool = False,
                    slot: int = -2, out: np.ndarray = None):
    lib = load()
    h, w = cur.shape
    bh, bw = h // 8, w // 8
    lv = np.empty((bh, bw, 64), np.int16) if out is None else out
    rec = np.empty((h, w), np.uint8)
    lib.tc_enc_inter_plane(np.ascontiguousarray(cur).reshape(-1),
                           np.ascontiguousarray(pred).reshape(-1),
                           h, w, int(qs), int(m1),
                           np.ascontiguousarray(scan,
                                                np.int32).reshape(-1),
                           lv.reshape(-1), rec.reshape(-1), slot)
    return lv, rec


def enc_inter_levels(cur: np.ndarray, pred: np.ndarray, qs: int,
                     scan: np.ndarray, m1: bool = False,
                     slot: int = -2, out: np.ndarray = None):
    """Inter block pipeline WITHOUT in-loop recon (bit-identical
    levels to enc_inter_plane) — for B pictures, which are never
    prediction references.  slot/out as in enc_intra_plane."""
    lib = load()
    h, w = cur.shape
    bh, bw = h // 8, w // 8
    lv = np.empty((bh, bw, 64), np.int16) if out is None else out
    lib.tc_enc_inter_levels(np.ascontiguousarray(cur).reshape(-1),
                            np.ascontiguousarray(pred).reshape(-1),
                            h, w, int(qs), int(m1),
                            np.ascontiguousarray(scan,
                                                 np.int32).reshape(-1),
                            lv.reshape(-1), slot)
    return lv


def b_mc_sel_pred(fref: np.ndarray, bref: np.ndarray,
                  fmv: np.ndarray, bmv: np.ndarray,
                  mode: np.ndarray, mb) -> np.ndarray:
    """Fused B-picture MC + mode select: per MB, predict only from
    the reference(s) mode uses (0 fwd / 1 bwd / 2 bi-average) —
    bit-exact to mc_pred_half x2 + b_select_pred.  ``mb`` as in
    mc_pred_half (16x8 chroma tiles at 4:2:2)."""
    lib = load()
    mby, mbx = (mb, mb) if isinstance(mb, int) else mb
    h, w = fref.shape
    out = np.empty((h, w), np.uint8)
    lib.tc_b_mc_sel_pred2(np.ascontiguousarray(fref).reshape(-1),
                          np.ascontiguousarray(bref).reshape(-1),
                          h, w,
                          np.ascontiguousarray(fmv,
                                               np.int32).reshape(-1),
                          np.ascontiguousarray(bmv,
                                               np.int32).reshape(-1),
                          np.ascontiguousarray(mode,
                                               np.int32).reshape(-1),
                          mby, mbx, out.reshape(-1))
    return out


def enc_intra_sel(plane: np.ndarray, qs: int, intra_w: np.ndarray,
                  scan: np.ndarray, bys: np.ndarray, bxs: np.ndarray,
                  rec: np.ndarray, m1: bool = False):
    """Intra-encode ONLY the listed 8x8 blocks (by, bx block coords),
    bit-identical per block to enc_intra_plane; recon is written IN
    PLACE into ``rec`` (a full writable plane, normally the inter
    recon).  Returns levels (nsel, 64) int16 in scan order."""
    lib = load()
    h, w = plane.shape
    bys = np.ascontiguousarray(bys, np.int32)
    bxs = np.ascontiguousarray(bxs, np.int32)
    nsel = bys.size
    lv = np.empty((nsel, 64), np.int16)
    assert rec.flags["C_CONTIGUOUS"] and rec.shape == (h, w)
    lib.tc_enc_intra_sel(np.ascontiguousarray(plane).reshape(-1),
                         h, w, int(qs), int(m1),
                         np.ascontiguousarray(intra_w,
                                              np.int32).reshape(-1),
                         np.ascontiguousarray(scan,
                                              np.int32).reshape(-1),
                         bys.reshape(-1), bxs.reshape(-1), nsel,
                         lv.reshape(-1), rec.reshape(-1))
    return lv


def bisad(fp: np.ndarray, bp: np.ndarray,
          cur: np.ndarray) -> np.ndarray:
    """Per-16x16-MB SAD of the bi-average ((f+b+1)>>1) prediction."""
    lib = load()
    h, w = cur.shape
    mbh, mbw = h // 16, w // 16
    out = np.empty((mbh, mbw), np.int32)
    lib.tc_bisad(np.ascontiguousarray(fp).reshape(-1),
                 np.ascontiguousarray(bp).reshape(-1),
                 np.ascontiguousarray(cur).reshape(-1),
                 h, w, out.reshape(-1))
    return out


def b_select_pred(fp: np.ndarray, bp: np.ndarray, mode: np.ndarray,
                  mb: int) -> np.ndarray:
    """Per-MB prediction select: mode 0 = fwd, 1 = bwd, 2 = bi avg."""
    lib = load()
    h, w = fp.shape
    out = np.empty((h, w), np.uint8)
    lib.tc_b_select_pred(np.ascontiguousarray(fp).reshape(-1),
                         np.ascontiguousarray(bp).reshape(-1),
                         np.ascontiguousarray(mode,
                                              np.int32).reshape(-1),
                         h, w, mb, out.reshape(-1))
    return out


def mb_act(plane: np.ndarray) -> np.ndarray:
    """Per-16x16-MB mean-removed activity (exact integer form)."""
    lib = load()
    h, w = plane.shape
    mbh, mbw = h // 16, w // 16
    out = np.empty((mbh, mbw), np.int32)
    lib.tc_mb_act(np.ascontiguousarray(plane).reshape(-1), h, w,
                  out.reshape(-1))
    return out


def mc_pred_half(ref: np.ndarray, mvh: np.ndarray,
                 mb) -> np.ndarray:
    """Half-pel MC prediction, bit-exact to _mc_pred_half.  ``mb``
    is an int (square tile) or (rows, cols) — 16x8 for 4:2:2
    chroma."""
    lib = load()
    mby, mbx = (mb, mb) if isinstance(mb, int) else mb
    h, w = ref.shape
    out = np.empty((h, w), np.uint8)
    lib.tc_mc_pred_half2(np.ascontiguousarray(ref).reshape(-1), h, w,
                         np.ascontiguousarray(mvh,
                                              np.int32).reshape(-1),
                         mby, mbx, out.reshape(-1))
    return out
