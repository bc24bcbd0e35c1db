"""DSRA gating and reverse-attention ops (the PraNet family's signature compute).

Semantics (reference behavior, re-derived):

* DSRA gate (PraNet-V2 / all ``*_dual`` decoders): given a branch's foreground
  logits ``fg`` and the upsampled coarser-level fg/bg logits, compute
  ``fg + fg * softmax(crop_fg - crop_bg, axis=channel)`` (softmax variant) or
  ``fg + fg * (crop_fg - crop_bg)`` (linear variant).
  Reference: ``binary_seg/lib/pranet.py:365-368``, ``multiclass_seg/MERIT/lib/decoders.py:370``.
* Reverse attention (PraNet-V1): ``(1 - sigmoid(crop)) * feat`` with the 1-ch
  crop broadcast over feature channels. Reference: ``binary_seg/lib/PraNet_Res2Net.py:153-154``.

Both are element-wise (plus a tiny channel softmax), so under ``jit`` XLA fuses
them into the neighbouring convolutions — that fused XLA path is the default.
A Pallas TPU kernel (``dsra_gate_pallas``) is provided for the gate as a
standalone fused primitive (one HBM round-trip for the three operands) for use
where the op is *not* adjacent to a conv the compiler can fuse it into, e.g.
when gating full-resolution lateral maps at inference.

All tensors are NHWC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable only where Pallas TPU lowering exists
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _gate_math(fg, crop_fg, crop_bg, use_softmax):
    diff = crop_fg - crop_bg
    if use_softmax:
        gate = jax.nn.softmax(diff, axis=-1)
    else:
        gate = diff
    return fg + fg * gate


def dsra_gate(
    fg: jnp.ndarray,
    crop_fg: jnp.ndarray,
    crop_bg: jnp.ndarray,
    use_softmax: bool = True,
) -> jnp.ndarray:
    """Dual-supervised reverse-attention gate, XLA path (compiler-fused)."""
    return _gate_math(fg, crop_fg, crop_bg, use_softmax)


def reverse_attention(crop: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
    """PraNet-V1 reverse attention: ``(1 - sigmoid(crop)) * feat``.

    ``crop`` is (N,H,W,1) logits, ``feat`` (N,H,W,C); broadcast over C.
    """
    return (1.0 - jax.nn.sigmoid(crop)) * feat


# ---------------------------------------------------------------------------
# Pallas fused kernel for the gate
# ---------------------------------------------------------------------------


def _dsra_kernel(use_softmax: bool, fg_ref, cf_ref, cb_ref, out_ref):
    fg = fg_ref[...]
    diff = (cf_ref[...] - cb_ref[...]).astype(jnp.float32)
    if use_softmax:
        m = jnp.max(diff, axis=-1, keepdims=True)
        e = jnp.exp(diff - m)
        gate = e / jnp.sum(e, axis=-1, keepdims=True)
    else:
        gate = diff
    out_ref[...] = fg + fg * gate.astype(fg.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dsra_gate_pallas(fg, crop_fg, crop_bg, use_softmax=True):
    return _dsra_fwd_impl(fg, crop_fg, crop_bg, use_softmax)


def _dsra_fwd_impl(fg, crop_fg, crop_bg, use_softmax):
    if not _HAS_PLTPU:
        return _gate_math(fg, crop_fg, crop_bg, use_softmax)
    # off-TPU (tests, virtual CPU mesh) the kernel runs in interpreter mode
    interpret = jax.default_backend() != "tpu"
    n, h, w, c = fg.shape
    m = n * h * w
    fg2 = fg.reshape(m, c)
    cf2 = crop_fg.reshape(m, c)
    cb2 = crop_bg.reshape(m, c)
    bm = min(m, 4096)
    grid = (pl.cdiv(m, bm),)
    spec = pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_dsra_kernel, use_softmax),
        out_shape=jax.ShapeDtypeStruct((m, c), fg.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(fg2, cf2, cb2)
    return out.reshape(n, h, w, c)


def _dsra_vjp_fwd(fg, crop_fg, crop_bg, use_softmax):
    out = _dsra_fwd_impl(fg, crop_fg, crop_bg, use_softmax)
    return out, (fg, crop_fg, crop_bg)


def _dsra_vjp_bwd(use_softmax, res, g):
    fg, crop_fg, crop_bg = res
    # Backward through the (cheap, element-wise) math via XLA autodiff.
    _, vjp = jax.vjp(lambda a, b, c: _gate_math(a, b, c, use_softmax), fg, crop_fg, crop_bg)
    return vjp(g)


dsra_gate_pallas.defvjp(_dsra_vjp_fwd, _dsra_vjp_bwd)
