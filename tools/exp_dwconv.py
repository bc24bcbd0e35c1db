#!/usr/bin/env python
"""PVT stage-1/2 depthwise-conv experiments on the real chip (VERDICT r2 #1c).

Candidates at the stall shapes (16,88,88,512) / (16,44,44,1024) bf16:
  A. XLA grouped conv (current model path; the ~200 GB/s baseline)
  B. Pallas cb=128 whole-plane kernel, bf16 pad + f32 acc (round-2 kernel
     never ran at these shapes — its VMEM bound rejected them)
  C. Pallas with bf16 accumulation (lower VMEM pressure)
  D. 9-shifted-add formulation in plain XLA (fusion test)
Each timed with the fenced protocol; prints GB/s effective.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pranet2_tpu.utils.profiling import fence


def xla_dw(x, w):
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, w.reshape(3, 3, 1, c), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _kernel_f32acc(x_ref, w_ref, o_ref):
    x = x_ref[0]                       # (H, W, cb) bf16
    w = w_ref[...]
    h, width, cb = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((h, width, cb), jnp.float32)
    for di in range(3):
        for dj in range(3):
            tap = xp[di:di + h, dj:dj + width, :].astype(jnp.float32)
            acc = acc + tap * w[di, dj].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _kernel_bf16acc(x_ref, w_ref, o_ref):
    x = x_ref[0]
    w = w_ref[...]
    h, width, cb = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((h, width, cb), x.dtype)
    for di in range(3):
        for dj in range(3):
            acc = acc + xp[di:di + h, dj:dj + width, :] * w[di, dj]
    o_ref[0] = acc.astype(o_ref.dtype)


def pallas_dw(x, w, kernel, cb=128, vmem_mb=None):
    n, h, width, c = x.shape
    grid = (n, c // cb)
    kw = {}
    if vmem_mb:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, width, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, width, cb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cb), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, width, cb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        **kw,
    )(x, w.reshape(3, 3, c))


def shifted_add(x, w):
    n, h, width, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(x, jnp.float32)
    for di in range(3):
        for dj in range(3):
            acc = acc + (xp[:, di:di + h, dj:dj + width, :]
                         .astype(jnp.float32) * w[di, dj].astype(jnp.float32))
    return acc.astype(x.dtype)


def bench(tag, fn, x, w, iters=30):
    f = jax.jit(fn)
    try:
        out = f(x, w)
        fence(out)
    except Exception as e:
        print(f"{tag:34s} FAILED: {str(e)[:120]}")
        return None
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(x, w)
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    gb = 2 * x.size * x.dtype.itemsize / 1e9
    print(f"{tag:34s} {best*1e3:7.3f} ms  {gb/best:6.0f} GB/s")
    return out


def main():
    rng = np.random.default_rng(0)
    for shape in [(16, 88, 88, 512), (16, 44, 44, 1024)]:
        print(f"--- {shape} bf16 ---")
        x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, shape[-1]),
                                            dtype=np.float32), jnp.bfloat16)
        ref = bench("A: XLA grouped conv", xla_dw, x, w)
        o = bench("B: pallas cb128 f32acc",
                  functools.partial(pallas_dw, kernel=_kernel_f32acc,
                                    vmem_mb=100), x, w)
        if o is not None and ref is not None:
            err = float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(f"   max |B - A| = {err:.3e}")
        o = bench("C: pallas cb128 bf16acc",
                  functools.partial(pallas_dw, kernel=_kernel_bf16acc,
                                    vmem_mb=100), x, w)
        if o is not None and ref is not None:
            err = float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(f"   max |C - A| = {err:.3e}")
        bench("D: XLA 9-shifted-add", shifted_add, x, w)
        for cb in (256, 512):
            if shape[-1] % cb == 0:
                bench(f"B{cb}: pallas cb{cb} f32acc",
                      functools.partial(pallas_dw, kernel=_kernel_f32acc,
                                        cb=cb, vmem_mb=100), x, w)


if __name__ == "__main__":
    main()
