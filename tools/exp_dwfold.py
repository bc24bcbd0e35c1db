#!/usr/bin/env python
"""Fold PVTv2's fc1+dwconv3x3 pair into ONE dense 3x3 conv (MXU) — experiment.

PVTv2's Mlp is ``fc1 -> dwconv3x3 -> GELU -> fc2`` (``binary_seg/lib/
pvtv2.py:14-30,362``): fc1 (1x1 conv, d->c) and the depthwise 3x3 are both
linear with nothing between, so they compose exactly:

    dwconv(fc1(x) + b1)[p,c] = sum_k w[k,c] * (x[p+dk] @ W1[:,c] + b1[c])
                             = conv3x3_dense(concat(x, ones), K)[p,c]
    K[dk, d, c]  = w[k,c] * W1[d,c]        (d < D)
    K[dk, D, c]  = w[k,c] * b1[c]          (ones channel: zero-padding keeps
                                            the border semantics exact)

XLA's depthwise emitter runs at ~150-200 GB/s on the (16,88,88,512) stage-1
shape (VPU/permute-bound); the folded dense conv rides the MXU instead.
"""

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

from pranet2_tpu.utils.profiling import fence


def dw(x, w, c):
    return lax.conv_general_dilated(
        x, w.reshape(3, 3, 1, c), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def pair(x, W1, b1, wdw, bdw):
    y = jnp.einsum("nhwd,dc->nhwc", x, W1) + b1
    return dw(y, wdw, W1.shape[1]) + bdw


def folded(x, W1, b1, wdw, bdw):
    n, h, wd, d = x.shape
    c = W1.shape[1]
    # K[ki,kj,d,c] = wdw[ki,kj,c] * W1[d,c]; ones-channel carries b1
    K = wdw[:, :, None, :] * W1[None, None, :, :]
    Kb = wdw * b1[None, None, :]
    K = jnp.concatenate([K, Kb[:, :, None, :]], axis=2)      # (3,3,d+1,c)
    xa = jnp.concatenate([x, jnp.ones((n, h, wd, 1), x.dtype)], axis=-1)
    z = lax.conv_general_dilated(
        xa, K, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return z + bdw


def bench(tag, fn, args, iters=30):
    f = jax.jit(fn)
    out = f(*args)
    fence(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{tag:44s} {best*1e3:7.3f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    # (shape of x, hidden c) for PVTv2-b2 stages 1..4 MLPs at 352^2 input
    cases = [((16, 88, 88, 64), 512), ((16, 44, 44, 128), 1024),
             ((16, 22, 22, 320), 1280), ((16, 11, 11, 512), 2048)]
    for xshape, c in cases:
        d = xshape[-1]
        print(f"--- x{xshape} -> hidden {c} ---")
        for dtype in (jnp.bfloat16,):
            x = jnp.asarray(rng.standard_normal(xshape, dtype=np.float32),
                            dtype)
            W1 = jnp.asarray(
                rng.standard_normal((d, c), dtype=np.float32) / np.sqrt(d),
                dtype)
            b1 = jnp.asarray(rng.standard_normal(c, dtype=np.float32), dtype)
            wdw = jnp.asarray(rng.standard_normal((3, 3, c),
                                                  dtype=np.float32), dtype)
            bdw = jnp.asarray(rng.standard_normal(c, dtype=np.float32), dtype)
            a = bench("pair: fc1 + XLA dwconv", pair, (x, W1, b1, wdw, bdw))
            b = bench("folded dense 3x3 (+ones chan)", folded,
                      (x, W1, b1, wdw, bdw))
            # correctness vs f32 pair
            f32 = [v.astype(jnp.float32) for v in (x, W1, b1, wdw, bdw)]
            ref = jax.jit(pair)(*f32)
            ea = float(jnp.max(jnp.abs(a.astype(jnp.float32) - ref)))
            eb = float(jnp.max(jnp.abs(b.astype(jnp.float32) - ref)))
            sc = float(jnp.max(jnp.abs(ref)))
            print(f"   max|pair_bf16 - f32|={ea:.3e}  "
                  f"max|fold_bf16 - f32|={eb:.3e}  (scale {sc:.1f})")


if __name__ == "__main__":
    main()
