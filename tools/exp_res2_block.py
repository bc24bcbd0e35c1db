#!/usr/bin/env python
"""Fused Bottle2neck kernel: parity + timing vs the XLA composition.

Shapes = the four Res2Net layer configs at 352^2 bs16 (the PraNet-V2
inference hot path).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from pranet2_tpu.ops.res2_block import (fused_bottle2neck,
                                        reference_bottle2neck)
from pranet2_tpu.utils.profiling import fence

CFGS = [  # (H, W, Cin, width)
    ("layer1", 88, 88, 256, 26),
    ("layer2", 44, 44, 512, 52),
    ("layer3", 22, 22, 1024, 104),
    ("layer4", 11, 11, 2048, 208),
]


def make_params(rng, cin, width, dtype):
    cout = cin
    w1 = rng.standard_normal((cin, 4 * width), np.float32) * (cin ** -0.5)
    wd = rng.standard_normal((3, 3, 3 * width, width), np.float32) * 0.1
    w3 = rng.standard_normal((4, width, cout), np.float32) * (width ** -0.5)
    mk = lambda n: (rng.standard_normal(n, np.float32) * 0.1,
                    rng.standard_normal(n, np.float32) * 0.1)
    s1, t1 = mk(4 * width)
    sd = rng.standard_normal((3, width), np.float32) * 0.1 + 1.0
    td = rng.standard_normal((3, width), np.float32) * 0.1
    s3, t3 = mk(cout)
    j = lambda a: jnp.asarray(a)
    return (j(w1), j(s1 + 1.0), j(t1), j(wd), j(sd), j(td), j(w3),
            j(s3 + 1.0), j(t3))


def bench_chained(block_fn, x, params, reps=20, iters=5):
    """Per-block ms from a chain of `reps` block applications in ONE jit.

    Tiny kernels dispatch faster than the tunnel enqueues; single-call
    loops measure RPC latency.  Chaining inside one program (the block is
    shape-preserving, like the real model) measures device time.
    """

    @jax.jit
    def many(x):
        for _ in range(reps):
            x = block_fn(x, *params)
        return x

    out = many(x)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = many(x)
    fence(out)
    return (time.perf_counter() - t0) / iters / reps * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    for name, h, w, cin, width in CFGS:
        x = jnp.asarray(
            rng.standard_normal((args.bs, h, w, cin), np.float32) * 0.5
        ).astype(jnp.bfloat16)
        params = make_params(rng, cin, width, jnp.bfloat16)
        o1 = np.asarray(jax.jit(fused_bottle2neck)(x, *params), np.float32)
        o2 = np.asarray(jax.jit(reference_bottle2neck)(x, *params),
                        np.float32)
        scale = max(np.abs(o2).max(), 1e-6)
        err = np.abs(o1 - o2).max() / scale
        t_f = bench_chained(fused_bottle2neck, x, params)
        t_r = bench_chained(reference_bottle2neck, x, params)
        print(f"{name}: rel_err={err:.2e}  fused={t_f:.3f} ms/block  "
              f"xla={t_r:.3f} ms/block  speedup={t_r / t_f:.2f}x")


if __name__ == "__main__":
    main()
