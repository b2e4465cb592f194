"""Rate-control quality/adherence grid (the harness behind the
RateController tuning claims in io/mpeg2enc.py).

Encodes two content classes — smooth (scrolling crops of one blurred
base image: near-perfect ME, P residuals cheap, I quality propagates)
and noisy (same structure + per-frame N(0,12) luma noise: expensive P
residuals) — through the native MPEG-4 encoder with rate control at
several geometries/bitrates, and prints mean luma PSNR plus the
achieved/target byte ratio.

Usage:  JAX_PLATFORMS=cpu python benches/rc_grid.py
The IBIAS sweep that picked 0.35 (allocation-side I-quality bias):

    bias 1.00 | smooth176 29.18dB x1.00 | noisy176 24.72dB x1.00
    bias 0.50 | smooth176 30.65dB x0.99 | noisy176 24.88dB x1.00
    bias 0.35 | smooth176 31.18dB x1.00 | noisy176 24.95dB x0.99
    bias 0.25 | smooth176 31.64dB x1.01 | noisy176 25.02dB x1.00
    (320x240/800k rate drift grows past 0.35: x1.07 -> x1.10)

Biasing the QUANTISER without enlarging the I target overshot rate
up to 1.28x — the bias must ride the allocation (see
RateController.pick_qscale).

Final-form grid (with the first-picture complexity-surprise rescale
of the P/B buffers — without it noisy 320x240/500k overshot x1.57,
the first P coding 42x its target at the optimistic d0 quantiser):

    smooth 176x144 250k/500k: 27.95/31.04 dB  x1.05/x0.99
    smooth 320x240 500k/800k: 26.71/29.32 dB  x1.09/x1.04
    noisy  176x144 250k/500k: 23.56/25.00 dB  x1.04/x1.00
    noisy  320x240 500k/800k: 23.12/23.88 dB  x1.25/x1.06
    (the residual x1.25 is the FIRST I's own overspend against the
    blind TM5 initial complexity — single-pass, unavoidable, and
    the quality it buys propagates through the whole GOP)"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def smooth(w, h, n, seed=9):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h + 64, w + 64)).astype(float)
    for ax in range(2):
        base = (base + np.roll(base, 1, ax)
                + np.roll(base, -1, ax)) / 3
    return [(np.clip(base[2 * i:2 * i + h, 3 * i:3 * i + w], 0,
                     255).astype(np.uint8),
             np.clip(base[i:i + h // 2, i:i + w // 2], 0,
                     255).astype(np.uint8),
             np.clip(base[8:8 + h // 2, 4:4 + w // 2], 0,
                     255).astype(np.uint8)) for i in range(n)]


def noisy(w, h, n, seed=4):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h + 64, w + 64)).astype(float)
    for ax in range(2):
        base = (base + np.roll(base, 1, ax)
                + np.roll(base, -1, ax)) / 3
    out = []
    for i in range(n):
        y = np.clip(base[2 * i:2 * i + h, 3 * i:3 * i + w]
                    + rng.normal(0, 12, (h, w)), 0,
                    255).astype(np.uint8)
        out.append((y,
                    np.clip(base[i:i + h // 2, i:i + w // 2], 0,
                            255).astype(np.uint8),
                    np.clip(base[8:8 + h // 2, 4:4 + w // 2], 0,
                            255).astype(np.uint8)))
    return out


def psnr(a, b):
    d = a.astype(float) - b.astype(float)
    m = (d * d).mean()
    return 99.0 if m == 0 else 10 * np.log10(255 * 255 / m)


def run(fs, w, h, kbps, gop=8):
    from tcforge_tpu.io.mpeg4dec import Mpeg4Decoder
    from tcforge_tpu.io.mpeg4enc import Mpeg4NativeEncoder
    enc = Mpeg4NativeEncoder(w, h, fps=25.0, gop=gop,
                             bitrate_kbps=kbps)
    dec = Mpeg4Decoder()
    got, tot = [], 0
    for f in fs:
        for c, _ in enc.push(*f):
            tot += len(c)
            got += dec.decode_frames(c)
    for c, _ in enc.flush():
        tot += len(c)
        got += dec.decode_frames(c)
    tail = dec.flush()
    if tail is not None:
        got.append(tail)
    ps = [psnr(g[0], fs[i][0]) for i, g in enumerate(got)]
    target = kbps * 1000 / 25 * len(fs) / 8
    return float(np.mean(ps)), tot / target


def main():
    import jax
    try:
        jax.config.update("jax_platforms",
                          os.environ.get("JAX_PLATFORMS", "cpu"))
    except Exception:
        pass
    n = 16
    for name, gen in (("smooth", smooth), ("noisy", noisy)):
        for (w, h) in ((176, 144), (320, 240)):
            fs = gen(w, h, n)
            for kbps in ((250, 500) if w == 176 else (500, 800)):
                p, r = run(fs, w, h, kbps)
                print("%-6s %dx%d %4dk: %6.2f dB  rate x%.2f"
                      % (name, w, h, kbps, p, r))


if __name__ == "__main__":
    main()
