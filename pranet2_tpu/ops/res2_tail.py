"""Fused Bottle2neck tail — Pallas TPU kernel for ``relu(bn3(conv3(cc)) + short)``.

Every Res2Net Bottle2neck (``binary_seg/lib/Res2Net_v1b.py:36-96``) ends with
a 1x1 projection, an inference BatchNorm, a residual add and a ReLU.  Composed
from XLA ops that tail is two device passes: the conv writes its (N,H,W,4p)
output to HBM, then a separate elementwise fusion reads it back, reads the
shortcut, and writes the result — at layer 1 (88^2, 256 ch, bs16) each of the
three blocks pays ~190 MB for the second pass alone, the "residual+ReLU
output fusions" residue of the round-4 profile (~1.3 ms/iter total).

Because conv3 is 1x1 the tail is a pure matmul with no halo: this kernel
reads the concat tensor once, runs the projection on the MXU, applies the
folded BN scale/shift, adds the shortcut and ReLUs — one read of each input,
one write of the output.  Folded BN ==> inference only; the training path
uses the unfused module chain.

Carries a custom VJP that recomputes through the XLA reference composition so
autodiff through an inference-mode model still works.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _kernel(cc_ref, sh_ref, w3_ref, s3_ref, t3_ref, o_ref):
    cc = cc_ref[0]                                    # (ht, W, C)
    ht, w, c = cc.shape
    z = jnp.dot(cc.reshape(ht * w, c), w3_ref[...],
                preferred_element_type=jnp.float32)
    z = z * s3_ref[...] + t3_ref[...]
    z = z.reshape(ht, w, -1) + sh_ref[0].astype(jnp.float32)
    o_ref[0] = jnp.maximum(z, 0.0).astype(o_ref.dtype)


def reference_tail(cc, short, w3, s3, t3):
    """Plain-XLA composition (fallback + VJP recompute path)."""
    z = jnp.dot(cc, w3.astype(cc.dtype)).astype(jnp.float32)
    out = jnp.maximum(z * s3 + t3 + short.astype(jnp.float32), 0.0)
    return out.astype(cc.dtype)


def _pick_ht(h: int, w: int, cin: int, cout: int) -> int | None:
    """Largest row-tile keeping the in+out blocks ~<=4 MB (double-buffered)."""
    budget = 4 * 1024 * 1024
    pad = lambda c: -(-c // 128) * 128
    per_row = w * (pad(cin) + 2 * pad(cout)) * 4
    for ht in (h, 44, 32, 22, 16, 11, 8, 4, 2, 1):
        if ht <= h and h % ht == 0 and ht * per_row <= budget:
            return ht
    return None


@jax.custom_vjp
def fused_tail(cc, short, w3, s3, t3):
    """``relu(bn3(conv3_1x1(cc)) + short)`` — one fused pass.

    cc: (N, H, W, Cin) the split-concat tensor; short: (N, H, W, Cout) the
    residual shortcut (the block input, or the downsample branch for stage
    blocks); w3: (Cin, Cout); s3/t3: folded-BN scale/shift (f32).  Falls
    back to the XLA composition off-TPU or for untileable shapes.
    """
    return _impl(cc, short, w3, s3, t3)


def _impl(cc, short, w3, s3, t3):
    from pranet2_tpu.ops._pallas import interpret_mode, use_kernel

    n, h, w, cin = cc.shape
    cout = w3.shape[-1]
    # w must be a sublane multiple: the kernel's (ht, w, c) -> (ht*w, c)
    # collapse is only a free layout cast when the inner sublane dim tiles
    # evenly (Mosaic rejects it at layer 3/4's 22/11-wide maps:
    # 'infer-vector-layout: unsupported shape cast').  Those layers' maps
    # are 16x/64x smaller than layer 1's, so the XLA fallback costs little.
    ht = _pick_ht(h, w, cin, cout) if (_HAS_PLTPU and w % 8 == 0) else None
    if ht is None or not use_kernel(_HAS_PLTPU):
        return reference_tail(cc, short, w3, s3, t3)
    dt = cc.dtype
    wspec = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), dt),
        interpret=interpret_mode(),
        grid=(n, h // ht),
        in_specs=[
            pl.BlockSpec((1, ht, w, cin), lambda ni, hi: (ni, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, w, cout), lambda ni, hi: (ni, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec((cin, cout)), wspec((cout,)), wspec((cout,)),
        ],
        out_specs=pl.BlockSpec((1, ht, w, cout),
                               lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
    )(cc, short, w3.astype(dt), s3, t3)


def _vjp_fwd(cc, short, w3, s3, t3):
    return _impl(cc, short, w3, s3, t3), (cc, short, w3, s3, t3)


def _vjp_bwd(res, g):
    _, vjp = jax.vjp(reference_tail, *res)
    return vjp(g)


fused_tail.defvjp(_vjp_fwd, _vjp_bwd)
