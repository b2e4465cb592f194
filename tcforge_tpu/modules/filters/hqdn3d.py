"""hqdn3d — high-quality 3D (spatio-temporal) denoiser.

Rebuild of ``filter/filter_hqdn3d.c`` (Daniel Moreno's denoiser): three
cascaded nonlinear IIR low-passes — horizontal (along x), vertical
(along y), temporal (across frames) — where the smoothing gain depends on
the local difference through a precalculated similarity curve
(``PrecalcCoefs``, filter_hqdn3d.c:120-133).

TPU-native decomposition (exact, same integer math):

- the reference's single triple-nested pixel loop separates into
  three passes, each a `lax.scan` over ONE axis with the other axes
  (including the batch) fully vectorized:
    H[y, 0] = F<<16;  H[y, x] = lpm(H[y, x-1], F[y, x]<<16, spatial)
    V[0, x] = H[0, x]; V[y, x] = lpm(V[y-1, x], H[y, x], spatial)
    D[n]    = lpm(FrameAnt<<8, V[n], temporal); FrameAnt' = round8(D)
- lpm(prev, curr, C) = curr + C[(prev - curr + 0x10007FF) >> 12]
  (LowPassMul, filter_hqdn3d.c:49-54), with C an 8192-entry int32 LUT.
- FrameAnt (the 16-bit temporal accumulator per plane) is the filter's
  carry state across batches; frames inside a batch are chained with a
  scan over the batch axis, so batching does not change results.

Only YUV420P input is supported, like the reference.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcforge_tpu.core.formats import ImageFormat
from tcforge_tpu.core.frame import FrameBatch
from tcforge_tpu.core.optstr import ModuleDesc, ParamSpec
from tcforge_tpu.modules.registry import (FilterSlot, ModuleInfo, ModuleKind,
                                          VideoFilter, register)

PARAM1_DEFAULT = 4.0     # luma spatial
PARAM2_DEFAULT = 3.0     # chroma spatial
PARAM3_DEFAULT = 6.0     # luma temporal


def precalc_coefs(dist25: float) -> np.ndarray:
    """PrecalcCoefs port (filter_hqdn3d.c:120-133), float64 like C."""
    gamma = math.log(0.25) / math.log(1.0 - dist25 / 255.0 - 0.00001)
    i = np.arange(-256 * 16, 256 * 16, dtype=np.float64)
    # |i| > 4080 entries are unreachable (LowPassMul index range is
    # [16, 8176] for valid uint8 inputs); clamp simil to avoid NaN pow.
    simil = np.maximum(0.0, 1.0 - np.abs(i) / (16 * 255.0))
    c = np.power(simil, gamma) * 65536.0 * i / 16.0
    out = np.where(c < 0, c - 0.5, c + 0.5)
    return out.astype(np.int32)


def coef_fn(dist25: float):
    """Closed-form coefficient evaluation (the LUT's defining formula,
    PrecalcCoefs) — avoids the per-element LUT gather that dominates the
    scan on TPU.  float32 pow differs from the float64 LUT by at most a
    few units in the <<16 domain (~1e-4 of a pixel level), far inside
    the PSNR budget; `exact=1` switches back to the LUT."""
    gamma = math.log(0.25) / math.log(1.0 - dist25 / 255.0 - 0.00001)

    def fn(d: jnp.ndarray) -> jnp.ndarray:
        i = (d - 4096).astype(jnp.float32)
        simil = jnp.maximum(0.0, 1.0 - jnp.abs(i) * (1.0 / 4080.0))
        c = jnp.power(simil, jnp.float32(gamma)) * (65536.0 / 16.0) * i
        return jnp.where(c < 0, c - 0.5, c + 0.5).astype(jnp.int32)

    return fn


def _lpm(prev: jnp.ndarray, curr: jnp.ndarray, coef) -> jnp.ndarray:
    """LowPassMul: curr + Coef[(prev-curr+0x10007FF) >> 12]
    (filter_hqdn3d.c:49-54).  `coef` is an int32 LUT array (exact mode)
    or a callable evaluating the coefficient curve directly."""
    d = (prev - curr + 0x10007FF) >> 12
    if callable(coef):
        return curr + coef(d)
    return curr + jnp.take(coef, d, axis=0)


def denoise_plane(frames: jnp.ndarray, frame_ant: jnp.ndarray,
                  spatial: jnp.ndarray,
                  temporal: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the full hqdn3d cascade over a (N, H, W) uint8 plane batch.

    `frame_ant` is the (H, W) uint16-in-int32 temporal accumulator from
    the previous call (``FrameAnt``); returns (denoised uint8 batch,
    updated frame_ant).
    """
    f = frames.astype(jnp.int32) << 16                       # (N, H, W)

    # Horizontal: scan over W, carry (N, H)
    def h_step(carry, col):
        out = _lpm(carry, col, spatial)
        return out, out

    first = f[..., 0]
    _, h_cols = jax.lax.scan(h_step, first,
                             jnp.moveaxis(f[..., 1:], -1, 0))
    H = jnp.concatenate([first[None], h_cols], axis=0)       # (W, N, H)
    H = jnp.moveaxis(H, 0, -1)                               # (N, H, W)

    # Vertical: scan over H, carry (N, W)
    def v_step(carry, row):
        out = _lpm(carry, row, spatial)
        return out, out

    first_row = H[:, 0, :]
    _, v_rows = jax.lax.scan(v_step, first_row,
                             jnp.moveaxis(H[:, 1:, :], 1, 0))
    V = jnp.concatenate([first_row[None], v_rows], axis=0)   # (H, N, W)
    V = jnp.moveaxis(V, 0, 1)                                # (N, H, W)

    # Temporal: scan over the batch, carry FrameAnt (H, W)
    def t_step(ant, v_frame):
        dst = _lpm(ant << 8, v_frame, temporal)
        new_ant = ((dst + 0x1000007F) >> 8) & 0xFFFF
        dest = ((dst + 0x10007FFF) >> 16) & 0xFF
        return new_ant, dest

    new_ant, dests = jax.lax.scan(t_step, frame_ant, V)
    return dests.astype(jnp.uint8), new_ant


@register
class Hqdn3dFilter(VideoFilter):
    info = ModuleInfo(name="hqdn3d", kind=ModuleKind.FILTER)
    desc = ModuleDesc(
        name="hqdn3d", comment="High Quality 3D Denoiser",
        version="1.0.2",
        capabilities="VYMOE",
        params=[
            ParamSpec("luma", "spatial luma strength", "f", 0.0, 0.0, 100.0),
            ParamSpec("chroma", "spatial chroma strength", "f", 0.0, 0.0,
                      100.0),
            ParamSpec("luma_strength", "temporal luma strength", "f", 0.0,
                      0.0, 100.0),
            ParamSpec("chroma_strength", "temporal chroma strength", "f",
                      0.0, 0.0, 100.0),
            ParamSpec("pre", "run as a pre filter", "d", 0, 0, 1),
            ParamSpec("exact", "bit-exact LUT coefficients (slower)", "d",
                      0, 0, 1),
            ParamSpec("nonative", "disable the C++ CPU fast path", "d",
                      0, 0, 1)])
    slots = FilterSlot.POST_M

    def __init__(self, job, options: str = ""):
        super().__init__(job, options)
        # default/override cascade exactly as filter_hqdn3d.c:218-260
        lum_spac, lum_tmp = PARAM1_DEFAULT, PARAM3_DEFAULT
        chrom_spac = PARAM2_DEFAULT
        chrom_tmp = lum_tmp * chrom_spac / lum_spac
        p1 = self.options["luma"]
        p2 = self.options["chroma"]
        p3 = self.options["luma_strength"]
        p4 = self.options["chroma_strength"]
        if p1:
            lum_spac = p1
            lum_tmp = PARAM3_DEFAULT * p1 / PARAM1_DEFAULT
            chrom_spac = PARAM2_DEFAULT * p1 / PARAM1_DEFAULT
            chrom_tmp = lum_tmp * chrom_spac / lum_spac
        if p2:
            chrom_spac = p2
            chrom_tmp = lum_tmp * chrom_spac / lum_spac
        if p3:
            lum_tmp = p3
            chrom_tmp = lum_tmp * chrom_spac / lum_spac
        if p4:
            chrom_tmp = p4
        self.strengths = (lum_spac, lum_tmp, chrom_spac, chrom_tmp)
        # bit-exactness corrections for the Pallas closed-form curve,
        # probed EAGERLY here (apply() is traced by the chain jit, so
        # the probe cannot run there); None -> curve too far off, the
        # materialized-LUT lax.scan path is used instead
        self._corr = None
        if self._use_pallas():
            from tcforge_tpu.ops.kernels import lut_correction
            try:
                self._corr = {s: lut_correction(s)
                              for s in set(self.strengths)}
            except ValueError:
                self._corr = None
        # the closed-form coefficient curve avoids LUT gathers, a win
        # on TPU; on CPU the per-step pow() dominates the scan, so the
        # (bit-exact) LUT is both faster AND exact there
        if self.options["exact"] or jax.default_backend() != "tpu":
            self._c_lum_s = jnp.asarray(precalc_coefs(lum_spac))
            self._c_lum_t = jnp.asarray(precalc_coefs(lum_tmp))
            self._c_chrom_s = jnp.asarray(precalc_coefs(chrom_spac))
            self._c_chrom_t = jnp.asarray(precalc_coefs(chrom_tmp))
        else:
            self._c_lum_s = coef_fn(lum_spac)
            self._c_lum_t = coef_fn(lum_tmp)
            self._c_chrom_s = coef_fn(chrom_spac)
            self._c_chrom_t = coef_fn(chrom_tmp)
        if self.options["pre"]:
            self.slots = FilterSlot.PRE_M

    def init_state(self, width: int, height: int, fmt: ImageFormat) -> Any:
        if fmt != ImageFormat.YUV420P:
            raise ValueError("hqdn3d only supports YUV420P "
                             "(filter_hqdn3d.c:200)")
        # FrameAnt starts as first frame <<8 in the reference; we mark
        # "uninitialized" with -1 and seed on first batch.
        return {
            "init": jnp.zeros((), jnp.bool_),
            "y": jnp.zeros((height, width), jnp.int32),
            "u": jnp.zeros((height // 2, width // 2), jnp.int32),
            "v": jnp.zeros((height // 2, width // 2), jnp.int32),
        }

    def _use_pallas(self) -> bool:
        """The Pallas kernels are the fast path on TPU; the lax.scan path
        serves CPU (tests) and exact-LUT mode."""
        if self.options["exact"]:
            return False
        import jax
        return jax.default_backend() == "tpu"

    def host_stage(self) -> bool:
        """Fused C++ cascade: the CPU fast path (bit-identical to the
        lax.scan LUT formulation, tested so).  XLA's scan pays heavy
        per-step overhead for these one-row steps on CPU; the native
        sweep runs the whole cascade in one pass per frame (~3.7x).
        Runs as an EAGER chain stage (VideoChain host segmentation) —
        host callbacks inside jit deadlock with threaded dispatch.
        Only taken when the LUTs are materialized (exact/CPU mode)
        and the host library is built; `nonative=1` forces the scan
        path."""
        if self.options.get("nonative") or callable(self._c_lum_s):
            return False
        if jax.default_backend() != "cpu":
            return False
        from tcforge_tpu import native
        return native.hqdn3d_available()

    def apply_host(self, fb: FrameBatch, state: Any):
        """Eager native path (same semantics as apply)."""
        from tcforge_tpu import native
        if not hasattr(self, "_np_luts"):
            self._np_luts = tuple(np.asarray(c, np.int32) for c in
                                  (self._c_lum_s, self._c_lum_t,
                                   self._c_chrom_s, self._c_chrom_t))
        ls, lt, cs, ct = self._np_luts
        inited = bool(np.asarray(state["init"]))

        def run(plane_batch, ant, sp, tp):
            pb = np.asarray(plane_batch)
            ant_np = (np.asarray(ant, np.int32) if inited
                      else pb[0].astype(np.int32) << 8)
            return native.hqdn3d_plane(pb, ant_np, sp, tp)

        y, ant_y = run(fb.y, state["y"], ls, lt)
        u, ant_u = run(fb.u, state["u"], cs, ct)
        v, ant_v = run(fb.v, state["v"], cs, ct)
        new_state = {"init": jnp.ones((), jnp.bool_),
                     "y": jnp.asarray(ant_y), "u": jnp.asarray(ant_u),
                     "v": jnp.asarray(ant_v)}
        return fb.with_planes(y=jnp.asarray(y), u=jnp.asarray(u),
                              v=jnp.asarray(v)), new_state

    def apply(self, fb: FrameBatch, state: Any) -> Tuple[FrameBatch, Any]:
        def seed(plane_batch, ant):
            # reference seeds FrameAnt = first_frame << 8
            # (filter_hqdn3d.c:70-77) when no history exists yet
            return jnp.where(state["init"], ant,
                             plane_batch[0].astype(jnp.int32) << 8)

        if self._use_pallas():
            from tcforge_tpu.ops.kernels import denoise_plane_pallas
            ls, lt, cs, ct = self.strengths
            # bit-exactness corrections probed in __init__ against
            # this backend's own pow lowering (34-86 ±1 entries
            # measured on TPU); None -> curve too far off, use LUT
            corr = self._corr
            if corr is None:
                y, ant_y = denoise_plane(
                    fb.y, seed(fb.y, state["y"]),
                    jnp.asarray(precalc_coefs(ls)),
                    jnp.asarray(precalc_coefs(lt)))
                u, ant_u = denoise_plane(
                    fb.u, seed(fb.u, state["u"]),
                    jnp.asarray(precalc_coefs(cs)),
                    jnp.asarray(precalc_coefs(ct)))
                v, ant_v = denoise_plane(
                    fb.v, seed(fb.v, state["v"]),
                    jnp.asarray(precalc_coefs(cs)),
                    jnp.asarray(precalc_coefs(ct)))
            else:
                y, ant_y = denoise_plane_pallas(
                    fb.y, seed(fb.y, state["y"]), ls, lt,
                    corr[ls], corr[lt])
                u, ant_u = denoise_plane_pallas(
                    fb.u, seed(fb.u, state["u"]), cs, ct,
                    corr[cs], corr[ct])
                v, ant_v = denoise_plane_pallas(
                    fb.v, seed(fb.v, state["v"]), cs, ct,
                    corr[cs], corr[ct])
        else:
            y, ant_y = denoise_plane(fb.y, seed(fb.y, state["y"]),
                                     self._c_lum_s, self._c_lum_t)
            u, ant_u = denoise_plane(fb.u, seed(fb.u, state["u"]),
                                     self._c_chrom_s, self._c_chrom_t)
            v, ant_v = denoise_plane(fb.v, seed(fb.v, state["v"]),
                                     self._c_chrom_s, self._c_chrom_t)
        new_state = {"init": jnp.ones((), jnp.bool_),
                     "y": ant_y, "u": ant_u, "v": ant_v}
        return fb.with_planes(y=y, u=u, v=v), new_state
