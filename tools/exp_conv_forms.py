#!/usr/bin/env python
"""Which formulation of a dense 3x3 64->512 conv at 88^2 bs16 is fastest?

Isolates the candidate folded fc1+dwconv kernel (see exp_dwfold.py) from the
surrounding concat/bias plumbing to find the fast core.
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)


import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pranet2_tpu.utils.profiling import fence


def bench(tag, fn, *args, iters=30):
    f = jax.jit(fn)
    try:
        out = f(*args)
        fence(out)
    except Exception as e:
        print(f"{tag:46s} FAILED {str(e)[:90]}")
        return
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{tag:46s} {best*1e3:7.3f} ms")


def conv_nhwc(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_nchw(x, k):
    xc = jnp.transpose(x, (0, 3, 1, 2))
    kc = jnp.transpose(k, (3, 2, 0, 1))
    o = lax.conv_general_dilated(
        xc, kc, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.transpose(o, (0, 2, 3, 1))


def im2col_mm(x, k):
    n, h, w, d = x.shape
    c = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, di:di + h, dj:dj + w, :] for di in range(3)
            for dj in range(3)]
    xx = jnp.concatenate(cols, axis=-1)                  # (n,h,w,9d)
    return xx.reshape(n * h * w, 9 * d) @ k.reshape(9 * d, c)


def mm_1x1(x, k1):     # reference point: the plain fc1 matmul
    return jnp.einsum("nhwd,dc->nhwc", x, k1)


def dense_1x1_conv(x, k1):
    return lax.conv_general_dilated(
        x, k1[None, None], (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)
    for (n, h, w, d, c) in [(16, 88, 88, 64, 512), (16, 44, 44, 128, 1024),
                            (16, 22, 22, 320, 1280)]:
        gf = 2 * n * h * w * 9 * d * c / 1e9
        print(f"--- ({n},{h},{w},{d}) -> {c}, 3x3 dense = {gf:.0f} GFLOP ---")
        x = jnp.asarray(rng.standard_normal((n, h, w, d), dtype=np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, d, c), dtype=np.float32)
                        / np.sqrt(9 * d), jnp.bfloat16)
        k1 = k[1, 1]
        bench("conv NHWC bf16", conv_nhwc, x, k)
        bench("conv NCHW bf16 (transposes incl.)", conv_nchw, x, k)
        bench("im2col concat + matmul", im2col_mm, x, k)
        bench("1x1 conv (fc1 alone, ref point)", dense_1x1_conv, x, k1)
        bench("einsum fc1 alone", mm_1x1, x, k1)


if __name__ == "__main__":
    main()
