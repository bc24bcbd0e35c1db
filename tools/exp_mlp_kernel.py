#!/usr/bin/env python
"""Ablation microbench for the fused PVT MLP Pallas kernel.

Chains many kernel calls inside one jit (x -> out -> x) so the ~250us
per-dispatch tunnel overhead (measured, exp_profile_candidates) cannot
contaminate per-call numbers.  Ablations isolate where kernel time goes:
LN, fc1, dwconv taps, GELU, fc2.  Also measures a pure-FMA VPU ceiling
kernel for the chip so "VPU-bound" is a number, not a guess.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=20, inner=10):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters / inner)
    return best


# ---------------- VPU ceiling ----------------

def vpu_kernel(x_ref, o_ref, *, fmas):
    x = x_ref[...]
    acc = x * 1.0000001
    for i in range(fmas):
        acc = acc * 1.0000001 + x
    o_ref[...] = acc


def vpu_ceiling():
    shape = (512, 1024)  # 2 MB f32
    x = jnp.ones(shape, jnp.float32)
    for fmas in (64, 256):
        k = pl.pallas_call(
            functools.partial(vpu_kernel, fmas=fmas),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            grid=(256,),
            in_specs=[pl.BlockSpec(shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        f = jax.jit(k)
        t = timed(f, x, inner=256)
        gflop = shape[0] * shape[1] * fmas * 2 / 1e9
        print(f"  VPU f32 FMA chain x{fmas}: {t*1e6:8.2f} us/step  "
              f"-> {gflop/t/1e3:6.2f} TFLOP/s")


# ---------------- kernel ablations ----------------

def make_variant(mode):
    """Return a fused-MLP-like kernel with parts ablated."""

    def kernel(xp_ref, xc_ref, xn_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
               dwk_ref, dwb_ref, w2_ref, b2_ref, o_ref):
        i = pl.program_id(1)
        nh = pl.num_programs(1)
        xc = xc_ref[0]
        ht, w, d = xc.shape
        top = jnp.where(i == 0, jnp.zeros_like(xc[:1]), xp_ref[0, ht - 1:ht])
        bot = jnp.where(i == nh - 1, jnp.zeros_like(xc[:1]), xn_ref[0, 0:1])
        xh = jnp.concatenate([top, xc, bot], axis=0)

        if mode == "noln":
            y = xh.astype(jnp.float32)
        else:
            xf = xh.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
            y = (xf - mu) * lax.rsqrt(var + 1e-6)
            y = y * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)

        c = w1_ref.shape[-1]

        if mode == "y9":
            # Fold the ENTIRE depthwise conv into one MXU matmul: for each
            # of the 9 taps k=(di,dj), (y_k @ w1) * dwk_k == y_k @ (w1 *
            # dwk_k[None,:]) — so concat the 9 shifted narrow slices on the
            # channel axis and contract once against the column-scaled
            # stacked weights (9d, c).  9x fc1 FLOPs, near-zero VPU taps.
            # Shifts as flattened-row rolls so every slice is offset-0
            # (Mosaic cannot concat slices at different sublane offsets).
            r = (ht + 2) * w
            y2 = y.reshape(r, d)
            dwkf = dwk_ref[...].astype(xc.dtype)
            cols, wrows = [], []
            for dj in range(3):
                for di in range(3):
                    shift = (1 - di) * w + (1 - dj)
                    ys = pltpu.roll(y2, shift % r, axis=0)
                    cols.append(ys.astype(xc.dtype))
                    wrows.append(w1_ref[...] * dwkf[di, dj][None, :])
            y9 = jnp.concatenate(cols, axis=-1)[w:(ht + 1) * w]
            w9 = jnp.concatenate(wrows, axis=0)
            acc = jnp.dot(y9, w9, preferred_element_type=jnp.float32)
            acc = acc.reshape(ht, w, c) + dwb_ref[...].astype(jnp.float32)
            from pranet2_tpu.ops.pvt_mlp import _gelu_erf
            g = _gelu_erf(acc)
            out = jnp.dot(g.reshape(ht * w, c).astype(xc.dtype), w2_ref[...],
                          preferred_element_type=jnp.float32)
            out = out + b2_ref[...].astype(jnp.float32)
            o_ref[0] = xc + out.reshape(ht, w, d).astype(o_ref.dtype)
            return

        if mode == "lowp2":
            # MXU accumulates f32 (Mosaic requires 32-bit acc) but the
            # hidden copy is downcast immediately: taps and GELU run on
            # packed bf16 lanes (2x VPU throughput vs the f32 default).
            zb = jnp.dot(y.reshape((ht + 2) * w, d).astype(xc.dtype),
                         w1_ref[...],
                         preferred_element_type=jnp.float32
                         ).astype(xc.dtype)
            zb = zb.reshape(ht + 2, w, c) + b1_ref[...].astype(zb.dtype)
            row = lax.broadcasted_iota(jnp.int32, (ht + 2, 1, 1), 0)
            border = (((row == 0) & (i == 0))
                      | ((row == ht + 1) & (i == nh - 1)))
            zb = jnp.where(border, jnp.zeros_like(zb), zb)
            zp = jnp.pad(zb, ((0, 0), (1, 1), (0, 0)))
            dwkb = dwk_ref[...].astype(zb.dtype)
            acc = jnp.zeros((ht, w, c), zb.dtype)
            for dj in range(3):
                s = zp[:, dj:dj + w, :]
                for di in range(3):
                    acc = acc + s[di:di + ht] * dwkb[di, dj]
            acc = acc + dwb_ref[...].astype(zb.dtype)
            from pranet2_tpu.ops.pvt_mlp import _gelu_erf
            g = _gelu_erf(acc)
            out = jnp.dot(g.reshape(ht * w, c), w2_ref[...],
                          preferred_element_type=jnp.float32)
            out = out + b2_ref[...].astype(jnp.float32)
            o_ref[0] = xc + out.reshape(ht, w, d).astype(o_ref.dtype)
            return

        z = jnp.dot(y.reshape((ht + 2) * w, d).astype(xc.dtype), w1_ref[...],
                    preferred_element_type=jnp.float32)
        z = z.reshape(ht + 2, w, c) + b1_ref[...].astype(jnp.float32)

        row = lax.broadcasted_iota(jnp.int32, (ht + 2, 1, 1), 0)
        border = ((row == 0) & (i == 0)) | ((row == ht + 1) & (i == nh - 1))
        z = jnp.where(border, 0.0, z)

        if mode == "nodw":
            acc = z[1:ht + 1] + dwb_ref[...].astype(jnp.float32)
        elif mode == "dw3":  # only the aligned column (no W shifts)
            acc = jnp.zeros((ht, w, c), jnp.float32)
            dwk = dwk_ref[...].astype(jnp.float32)
            for di in range(3):
                acc = acc + z[di:di + ht] * dwk[di, 1]
            acc = acc + dwb_ref[...].astype(jnp.float32)
        else:
            zp = jnp.pad(z, ((0, 0), (1, 1), (0, 0)))
            dwk = dwk_ref[...].astype(jnp.float32)
            acc = jnp.zeros((ht, w, c), jnp.float32)
            for dj in range(3):
                s = zp[:, dj:dj + w, :]
                for di in range(3):
                    acc = acc + s[di:di + ht] * dwk[di, dj]
            acc = acc + dwb_ref[...].astype(jnp.float32)

        if mode == "nogelu":
            g = acc
        elif mode == "relu":
            g = jnp.maximum(acc, 0.0)
        else:
            from pranet2_tpu.ops.pvt_mlp import _gelu_erf
            g = _gelu_erf(acc)

        out = jnp.dot(g.reshape(ht * w, c).astype(xc.dtype), w2_ref[...],
                      preferred_element_type=jnp.float32)
        out = out + b2_ref[...].astype(jnp.float32)
        o_ref[0] = xc + out.reshape(ht, w, d).astype(o_ref.dtype)

    return kernel


def run_variant(mode, n, h, w, d, c, ht, inner=10):
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, w, d)), dt)
    lns = jnp.ones((d,), jnp.float32)
    lnb = jnp.zeros((d,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, c)) * 0.05, dt)
    b1 = jnp.zeros((c,), jnp.float32)
    dwk = jnp.asarray(rng.standard_normal((3, 3, c)) * 0.1, jnp.float32)
    dwb = jnp.zeros((c,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c, d)) * 0.05, dt)
    b2 = jnp.zeros((d,), jnp.float32)

    grid = (n, h // ht)
    xspec = lambda im: pl.BlockSpec((1, ht, w, d), im, memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (0,) * len(shape), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        make_variant(mode),
        out_shape=jax.ShapeDtypeStruct((n, h, w, d), dt),
        grid=grid,
        in_specs=[
            xspec(lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0)),
            xspec(lambda ni, hi: (ni, hi, 0, 0)),
            xspec(lambda ni, hi: (ni, jnp.minimum(hi + 1, h // ht - 1), 0, 0)),
            wspec((d,)), wspec((d,)), wspec((d, c)), wspec((c,)),
            wspec((3, 3, c)), wspec((c,)), wspec((c, d)), wspec((d,)),
        ],
        out_specs=pl.BlockSpec((1, ht, w, d), lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def chained(x):
        def body(_, x):
            return call(x, x, x, lns, lnb, w1, b1, dwk, dwb, w2, b2)
        return lax.fori_loop(0, inner, body, x)

    t = timed(chained, x, inner=inner)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=2)
    args = ap.parse_args()

    print("== VPU ceiling ==")
    vpu_ceiling()

    stages = {
        1: (16, 88, 88, 64, 512, 8),
        2: (16, 44, 44, 128, 1024, 11),
        3: (16, 22, 22, 320, 1280, 22),
        4: (16, 11, 11, 512, 2048, 11),
    }
    for st in ([args.stage] if args.stage else [1, 2, 3, 4]):
        n, h, w, d, c, ht = stages[st]
        print(f"== stage {st}: x=({n},{h},{w},{d}) hidden C={c} ht={ht} ==")
        for mode in ("full", "y9", "lowp2", "nogelu", "relu", "nodw", "dw3",
                     "noln"):
            t = run_variant(mode, n, h, w, d, c, ht)
            print(f"  {mode:8s}: {t*1e3:7.3f} ms/call")


if __name__ == "__main__":
    main()
