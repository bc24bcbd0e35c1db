#!/usr/bin/env python
"""Chained (in-jit) op microbenchmarks — immune to the tunnel dispatch overhead.

A trivial op dispatched sequentially over this image's remote-TPU tunnel costs
~250 us/call (measured), so op-level microbenches that loop at the Python
level overstate small ops by up to 1 ms.  Here each candidate runs K times
inside ONE jit via ``lax.fori_loop`` with a data dependency between
iterations; the reported time is (window / K) minus nothing — overhead is
amortized to noise.

Compares, at PVTv2-b2 stage shapes (352^2 input, bs16):
  * XLA grouped dwconv (the current model path)
  * fc1 einsum alone
  * fc1 + dwconv pair (what the model computes today)
  * folded dense 3x3 conv with ones-channel (exp_dwfold.py candidate)
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


def chain_bench(tag, op, x0, K=60, reps=3):
    """op: x -> y (y any shape); carry x + tiny*mean(y) to serialize."""

    def body(i, c):
        y = op(c)
        # fold a scalar of y back into the carry: forces iteration order,
        # keeps shapes static, cost is one small reduce per iteration
        return c + (jnp.mean(y) * jnp.asarray(1e-30, c.dtype)).astype(c.dtype)

    f = jax.jit(lambda x: lax.fori_loop(0, K, body, x))
    out = f(x0)
    fence(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(x0)
        fence(out)
        dt = (time.perf_counter() - t0) / K
        best = dt if best is None else min(best, dt)
    print(f"{tag:46s} {best*1e3:7.3f} ms")
    return best


def main():
    rng = np.random.default_rng(0)
    # (x shape, hidden) for stages 1..4 of PVTv2-b2 at 352^2 bs16
    cases = [((16, 88, 88, 64), 512), ((16, 44, 44, 128), 1024),
             ((16, 22, 22, 320), 1280), ((16, 11, 11, 512), 2048)]
    for xshape, c in cases:
        n, h, w, d = xshape
        print(f"--- x{xshape} hidden {c} ---")
        x = jnp.asarray(rng.standard_normal(xshape, dtype=np.float32),
                        jnp.bfloat16)
        W1 = jnp.asarray(rng.standard_normal((d, c), np.float32)
                         / np.sqrt(d), jnp.bfloat16)
        b1 = jnp.asarray(rng.standard_normal(c, np.float32), jnp.bfloat16)
        wdw = jnp.asarray(rng.standard_normal((3, 3, c), np.float32),
                          jnp.bfloat16)
        y0 = jnp.asarray(rng.standard_normal((n, h, w, c), np.float32),
                         jnp.bfloat16)

        def dwconv(t):
            return lax.conv_general_dilated(
                t, wdw.reshape(3, 3, 1, c), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        def fc1(t):
            return jnp.einsum("nhwd,dc->nhwc", t, W1) + b1

        def pair(t):
            return dwconv(fc1(t))

        K = wdw[:, :, None, :] * W1[None, None, :, :]
        Kb = wdw * b1[None, None, :]
        Kf = jnp.concatenate([K, Kb[:, :, None, :]], axis=2)

        def folded(t):
            ta = jnp.concatenate(
                [t, jnp.ones((n, h, w, 1), t.dtype)], axis=-1)
            return lax.conv_general_dilated(
                ta, Kf, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def folded_nobias(t):
            return lax.conv_general_dilated(
                t, K, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        chain_bench("XLA grouped dwconv (on hidden)", dwconv, y0)
        chain_bench("fc1 einsum", fc1, x)
        chain_bench("pair fc1+dwconv", pair, x)
        chain_bench("folded dense 3x3 (+ones)", folded, x)
        chain_bench("folded dense 3x3 (no bias chan)", folded_nobias, x)


if __name__ == "__main__":
    main()
