"""Row-major dot-form 3x3 conv for Res2Net's narrow split groups.

The Bottle2neck split convolutions (``binary_seg/lib/Res2Net_v1b.py:55-63``)
are 26/52-channel 3x3 convs.  XLA's TPU conv emitter handles such narrow
channel counts with its batch-in-sublanes strategy, which (a) runs ~7.5x off
the HBM roofline at the 88^2 layer-1 shape (measured 0.12 ms/conv for 1.5
GFLOP + 13 MB, round-5 profile) and (b) pulls every surrounding tensor into
a batch-minor {3,0,2,1} layout world — the row-major stream then pays
relayout fusions at each block boundary (~1.4 ms/iter at bs16).

This formulation keeps everything row-major: the three W-taps are
channel-concatenated shifted copies (one elementwise fusion), each H-tap is
one MXU ``dot_general`` against the column-stacked kernel slab, and the
H-shifts are pad+slice adds.  3 matmuls of (t, 3c)x(3c, c) — ~12 GF
physical at layer 1, MXU work XLA schedules well — instead of the slow
conv emitter, and no layout flip anywhere.

Exact in real arithmetic (same multiply-add set per output; only the
in-conv reduction order changes — the usual restructure contract, cf.
ops/stem.py).  Works in train too (it is a pure reformulation of the conv;
BatchNorm stays the module path), but it is gated to the eval/bf16 fast
path alongside the other restructures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_dot(x, k, padding, dilation=1):
    """Small-kernel stride-1 conv as row-major tap matmuls.

    x: (N, H, W, C); k: (kh, kw, C, Co) HWIO; padding: (ph, pw);
    ``dilation`` applies to both axes (the RFB branches use 3/5/7).
    Returns the conv exactly (real arithmetic): the kw W-taps are one
    channel-concatenated matmul per H-tap, H-taps are pad+slice adds.
    SAME-size outputs only (pad == dilation * (k - 1) / 2 per axis).
    """
    n, h, w, c = x.shape
    kh, kw, _, co = k.shape
    ph, pw = padding
    dt = x.dtype
    assert 2 * ph == dilation * (kh - 1) and 2 * pw == dilation * (kw - 1)
    if kw > 1:
        xp = jnp.pad(x, ((0, 0), (0, 0), (pw, pw), (0, 0)))
        x3 = jnp.concatenate(
            [xp[:, :, j * dilation:j * dilation + w] for j in range(kw)],
            axis=-1)
    else:
        x3 = x
    acc = None
    for i in range(kh):
        # (kw*C, Co) slab: W-taps stacked on the contracting axis
        kd = jnp.concatenate([k[i, j] for j in range(kw)],
                             axis=0).astype(dt)
        z = jax.lax.dot_general(x3, kd, (((3,), (0,)), ((), ())))
        if kh == 1:
            return z
        # out[r] += z_i[r + (i - (kh-1)/2) * dilation], zero outside
        zp = jnp.pad(z, ((0, 0), (ph, ph), (0, 0), (0, 0)))
        term = zp[:, i * dilation:i * dilation + h]
        acc = term if acc is None else acc + term
    return acc


def conv3x3_dot(x, k):
    """3x3 stride-1 pad-1 conv as three row-major tap matmuls (the
    Res2Net split-conv case of :func:`conv_dot`)."""
    return conv_dot(x, k, (1, 1))
