#!/usr/bin/env python
"""Micro-benchmark: pack4 formulations, standalone on the chip.

Round-4b motivation: the input 4x4 s2d pack chain is 0.29 ms/iter of
PraNet-V2's ~7.5 ms (profile: copy.64/65/66) and 0.24 ms of PVT's — pure
data movement at ~124 GB/s.  The packed CHANNEL ORDER is a free choice
(both consumers scatter their conv weights to match), so formulations
that permute channels differently are still exact restructures:

  v0  current quad-major (a*4+b)*3+c: 6-D reshape + transpose(0,1,3,2,4,5)
  v1  same order, 5-D form (merged (b,c)=12 minor)
  v3  two-stage pack2(pack2(x)) — channel ((a0*2+b0)*12 + (a1*2+b1)*3+c)
  v4  pixel-minor (b*3+c)*4+a: one 2-D minor-dim transpose (4,1056)->(1056,4)

A Pallas one-pass kernel was tried first and does NOT compile: Mosaic
rejects the lane-splitting reshape (1,4*ht,W*C)->(ht,4,W/4,4C)
("infer-vector-layout: unsupported shape cast"), so the XLA transpose
emitter is the only packing path; this experiment picks the cheapest.

Run: python tools/exp_pack4.py
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

from pranet2_tpu.utils.profiling import enable_compile_cache, fence


def v0(x, dt):
    n, h, w, c = x.shape
    z = x.astype(dt).reshape(n, h // 4, 4, w // 4, 4, c)
    return z.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 4, w // 4, 16 * c)


def v1(x, dt):
    n, h, w, c = x.shape
    z = x.astype(dt).reshape(n, h // 4, 4, w // 4, 4 * c)
    return z.transpose(0, 1, 3, 2, 4).reshape(n, h // 4, w // 4, 16 * c)


def _pack2(z):
    n, h, w, c = z.shape
    z = z.reshape(n, h // 2, 2, w // 2, 2, c)
    return z.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def v3(x, dt):
    return _pack2(_pack2(x.astype(dt)))


def v4(x, dt):
    n, h, w, c = x.shape
    z = x.astype(dt).reshape(n, h // 4, 4, w * c)
    z = z.transpose(0, 1, 3, 2)                      # minor-dim 2-D transpose
    return z.reshape(n, h // 4, w // 4, 16 * c)      # free splits/merges


def bench(fn, x, iters=200):
    f = jax.jit(lambda v: fn(v, jnp.bfloat16))
    out = f(x)
    fence(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(x)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3, np.asarray(out)


def main():
    enable_compile_cache()
    print(f"device: {jax.devices()[0].device_kind}")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (16, 352, 352, 3), dtype=np.float32))
    gb = (x.size * 4 + x.size * 2) / 1e9

    ref = None
    for name, fn in (("v0 quad-major 6-D", v0), ("v1 quad-major 5-D", v1),
                     ("v3 pack2 x2", v3), ("v4 pixel-minor 2-D T", v4)):
        ms, out = bench(fn, x)
        if name.startswith("v0"):
            ref = out
        # v3/v4 are channel permutations of v0 — compare element SETS
        same = (np.sort(out, axis=-1) == np.sort(ref, axis=-1)).all() \
            if ref is not None else True
        print(f"{name:22s} {ms:7.3f} ms  ({gb / ms * 1e3:6.0f} GB/s)"
              f"  perm-parity={bool(same)}")


if __name__ == "__main__":
    main()
