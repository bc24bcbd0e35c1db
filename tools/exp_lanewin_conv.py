#!/usr/bin/env python
"""Micro-benchmark: pack4 + scattered 2x2 conv (current s2d stem conv1)
vs a single LANE-WINDOW conv on the un-packed image.

The 4x4 s2d pack costs ~0.29 ms/iter of copies (profile copy.64/65/66).
But the image's (W, C) minor dims merge into one 1056-lane dim for FREE
(row-major reshape, no copy), and on that view the packed stride-4 conv
is exactly a (5, 15) window / (4, 12) stride / C=1 conv:

    out[n, i, j, :] = sum_{u, v} x[n, 4i + u - 1, 12j + v - 3] * K[u, v]

where lane 12j + v - 3 = pixel (4j + dj') channel ch with v = 3dj' + ch + 3
— the same multiply-add set as pack4 + the (2,2,48,128) scattered conv.
If XLA's conv emitter handles C=1/strided-lane windows well, the pack
chain disappears entirely.

Run: python tools/exp_lanewin_conv.py
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pranet2_tpu.ops.patch_embed import pack4
from pranet2_tpu.ops.stem import _scatter_w1, _scatter_w1_packed
from pranet2_tpu.utils.profiling import enable_compile_cache, fence


def lanewin_w(k1):
    """(3,3,Cin,Co) stem conv1 kernel -> (5, 3*5, 1, 4*Co) lane-window
    kernel via the existing 5x5 scatter (taps di,dj' in [-1,3])."""
    w5 = _scatter_w1(k1)                       # (5, 5, Cin, 4*Co)
    cin, co4 = w5.shape[2], w5.shape[3]
    w = jnp.zeros((5, 3 * 5, 1, co4), w5.dtype)
    for djp in range(5):
        for ch in range(cin):
            w = w.at[:, 3 * djp + ch, 0, :].set(w5[:, djp, ch, :])
    return w


def main():
    enable_compile_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 352, 352, 3), np.float32))
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, 32), np.float32) * 0.1)

    dt = jnp.bfloat16

    @jax.jit
    def cur(x):
        xp = pack4(x, dt)                      # (16, 88, 88, 48)
        return lax.conv_general_dilated(
            xp, _scatter_w1_packed(k1).astype(dt), (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    wl = lanewin_w(k1)

    @jax.jit
    def lane(x):
        n, h, w_, c = x.shape
        xr = x.reshape(n, h, w_ * c, 1).astype(dt)
        return lax.conv_general_dilated(
            xr, wl.astype(dt), (4, 12), ((1, 0), (3, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def bench(f):
        out = f(x)
        fence(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(200):
                out = f(x)
            fence(out)
            best = min(best, (time.perf_counter() - t0) / 200)
        return best * 1e3, np.asarray(out, np.float32)

    ms_a, out_a = bench(cur)
    ms_b, out_b = bench(lane)
    err = np.abs(out_a - out_b).max() / max(np.abs(out_a).max(), 1e-6)
    print(f"pack4 + 2x2 conv:   {ms_a:7.3f} ms")
    print(f"lane-window conv:   {ms_b:7.3f} ms")
    print(f"shapes {out_a.shape} vs {out_b.shape}; rel err {err:.2e}")


if __name__ == "__main__":
    main()
