"""Depthwise 3x3 convolution — exact Pallas TPU kernel + XLA fallback.

Depthwise convs are all over the reference zoo (PVTv2 MLP ``DWConv``
``binary_seg/lib/pvtv2.py:362``; EMCAD MSDC ``multiclass_seg/EMCAD/lib/
decoders.py:94-126``; MaxViT MbConv; MIST conv-attention).

What the Pallas kernel buys (measured on the v5e, fenced protocol):

* **Exactness.** XLA lowers f32 convolutions on TPU through bf16 passes by
  default — the grouped conv deviates ~3e-2 from the true f32 stencil on
  O(1) inputs.  This kernel accumulates in f32 in VMEM and matches a numpy
  reference to 0 ulps, without paying the ~3x cost of
  ``precision=HIGHEST`` on the whole model.  Use it where depthwise
  precision matters (parity-sensitive paths).
* **Not speed.** Honest finding: XLA's grouped conv already runs at HBM
  speed-of-light for most shapes here ((16,44,44,1024): 0.33 ms = ~770
  GB/s); only (16,88,88,512)-like shapes are ~2.5x off, and this kernel ties
  rather than beats XLA there (the 9-tap VMEM slicing costs what the XLA
  layout copy costs).  A fused dwconv+bias+GELU variant was also measured
  (PVTv2's exact MLP chain, polynomial erf since Mosaic lacks the
  primitive): it *loses* to XLA's pipeline (2.28 vs 1.71 ms at the stage-1
  shape — the erf temporaries force H-segmentation that defeats the fusion
  win).  Models therefore keep the XLA path by default.

Grid over (batch, channel-blocks) — the op is embarrassingly
channel-parallel; halos are materialized in-register per block, the output
written once.  ``depthwise_conv3x3`` falls back to
``lax.conv_general_dilated`` off-TPU or for channel counts that don't tile.
The backward pass reuses XLA's conv autodiff at
``precision=HIGHEST`` so gradients are exact-f32 like the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu importable only where Pallas TPU lowering exists
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _xla_dwconv(x, w, stride: int = 1, precision=None):
    """Reference path: ``lax`` grouped conv, NHWC, 'same' padding for k=3."""
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, w.reshape(3, 3, 1, c), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=precision,
    )


def _dw_kernel(x_ref, w_ref, o_ref):
    x = x_ref[0]                      # (H, W, cb)
    w = w_ref[...]                    # (3, 3, cb)
    h, width, cb = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((h, width, cb), jnp.float32)
    for di in range(3):
        for dj in range(3):
            tap = xp[di:di + h, dj:dj + width, :].astype(jnp.float32)
            acc = acc + tap * w[di, dj].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_cblock(h: int, w: int, c: int, itemsize: int) -> int | None:
    """Largest channel block (multiple of 128) keeping VMEM use sane."""
    for cb in (512, 256, 128):
        if c % cb:
            continue
        # double-buffered in + out blocks at the input itemsize, plus the
        # f32 padded copy and accumulator
        vmem = (2 * 2 * h * w * cb * itemsize) + 2 * (h * w * cb * 4)
        if vmem <= 12 * 1024 * 1024:
            return cb
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def depthwise_conv3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3, stride 1, 'same' padding, NHWC.

    ``x``: (N,H,W,C); ``w``: (3,3,C) per-channel taps (no bias — add it in
    the caller so XLA fuses it with whatever follows).
    """
    return _fwd_impl(x, w)


def _fwd_impl(x, w):
    n, h, width, c = x.shape
    cb = (_pick_cblock(h, width, c, x.dtype.itemsize)
          if _HAS_PLTPU else None)
    if cb is None or jax.default_backend() != "tpu":
        return _xla_dwconv(x, w)
    grid = (n, c // cb)
    out = pl.pallas_call(
        _dw_kernel,
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
    )(x, w)
    return out


def _vjp_fwd(x, w):
    return _fwd_impl(x, w), (x, w)


def _vjp_bwd(res, g):
    # precision=HIGHEST keeps the gradients exact-f32 like the forward —
    # otherwise XLA's bf16-pass conv autodiff would silently break the op's
    # exactness contract in training.  The cost is confined to this op's
    # backward, not the whole model.
    x, w = res
    _, vjp = jax.vjp(
        lambda a, b: _xla_dwconv(a, b, precision=lax.Precision.HIGHEST), x, w
    )
    return vjp(g)


depthwise_conv3x3.defvjp(_vjp_fwd, _vjp_bwd)
