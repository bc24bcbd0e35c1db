"""Pooling ops with exact PyTorch semantics, on NHWC tensors.

Needed because the reference depends on torch pooling quirks:

* ``structure_loss`` boundary weighting: ``F.avg_pool2d(mask, 31, 1, 15)`` with
  the default ``count_include_pad=True`` (reference: ``binary_seg/MyTrain_med.py:21``).
* Res2Net v1b 'stage' blocks: ``nn.AvgPool2d(3, stride, 1)``
  (reference: ``binary_seg/lib/Res2Net_v1b.py:40``).
* Res2Net v1b downsample shortcut: ``nn.AvgPool2d(stride, stride,
  ceil_mode=True, count_include_pad=False)`` (``Res2Net_v1b.py:131-132``).
* Stem maxpool ``nn.MaxPool2d(3, 2, 1)`` (``Res2Net_v1b.py:112``).

All are expressed as ``lax.reduce_window`` so XLA lowers them to fused VPU
reductions.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def _pool_out_size(size: int, k: int, s: int, p: int, ceil_mode: bool) -> int:
    if ceil_mode:
        out = math.ceil((size + 2 * p - k) / s) + 1
        # torch: last window must start inside the (left-padded) input
        if (out - 1) * s >= size + p:
            out -= 1
        return out
    return (size + 2 * p - k) // s + 1


def avg_pool(
    x: jnp.ndarray,
    kernel_size: int | tuple[int, int],
    stride: int | tuple[int, int] | None = None,
    padding: int | tuple[int, int] = 0,
    count_include_pad: bool = True,
    ceil_mode: bool = False,
) -> jnp.ndarray:
    """``F.avg_pool2d`` on NHWC."""
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    if stride is None:
        sh, sw = kh, kw
    else:
        sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding

    n, h, w, c = x.shape
    oh = _pool_out_size(h, kh, sh, ph, ceil_mode)
    ow = _pool_out_size(w, kw, sw, pw, ceil_mode)
    # extra high-side padding so the window grid covers ceil-mode outputs
    eh = max((oh - 1) * sh + kh - h - 2 * ph, 0)
    ew = max((ow - 1) * sw + kw - w - 2 * pw, 0)
    pads = ((0, 0), (ph, ph + eh), (pw, pw + ew), (0, 0))

    dt = x.dtype
    ct = jnp.promote_types(dt, jnp.float32)
    xf = x.astype(ct)
    summed = lax.reduce_window(
        xf, 0.0, lax.add, (1, kh, kw, 1), (1, sh, sw, 1), pads
    )
    if count_include_pad:
        # torch divides by kh*kw even in user padding, but ceil-mode extra
        # padding never counts.
        if eh == 0 and ew == 0:
            div = float(kh * kw)
            out = summed / div
        else:
            ones = jnp.ones((1, h + 2 * ph, w + 2 * pw, 1), ct)
            cnt = lax.reduce_window(
                ones, 0.0, lax.add, (1, kh, kw, 1), (1, sh, sw, 1),
                ((0, 0), (0, eh), (0, ew), (0, 0)),
            )
            out = summed / cnt
    else:
        ones = jnp.ones((1, h, w, 1), ct)
        cnt = lax.reduce_window(
            ones, 0.0, lax.add, (1, kh, kw, 1), (1, sh, sw, 1),
            ((0, 0), (ph, ph + eh), (pw, pw + ew), (0, 0)),
        )
        out = summed / cnt
    return out.astype(dt)


def avg_pool_same(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Stride-1, 'same'-size average pool (``F.avg_pool2d(x, k, 1, k//2)``)."""
    return avg_pool(x, kernel_size, stride=1, padding=kernel_size // 2)


def max_pool(
    x: jnp.ndarray,
    kernel_size: int | tuple[int, int],
    stride: int | tuple[int, int] | None = None,
    padding: int | tuple[int, int] = 0,
) -> jnp.ndarray:
    """``F.max_pool2d`` on NHWC (floor mode)."""
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    if stride is None:
        sh, sw = kh, kw
    else:
        sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    # -inf (the true max identity) is required for JAX to recognise the
    # monoid and attach the select-and-scatter differentiation rule.
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg, lax.max, (1, kh, kw, 1), (1, sh, sw, 1),
        ((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )
