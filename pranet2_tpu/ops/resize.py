"""Bilinear resize with exact PyTorch ``F.interpolate`` semantics, as MXU matmuls.

The reference stack resizes constantly (lateral-map upsampling, multi-scale
training, crop pyramids) and mixes the two torch coordinate conventions:

* ``align_corners=True``  — partial-decoder upsample and the multi-scale train
  rescale (reference: ``binary_seg/lib/pranet.py:93``, ``binary_seg/MyTrain_med.py:72``)
* ``align_corners=False`` — every other ``F.interpolate(..., mode='bilinear')``
  (e.g. ``binary_seg/lib/pranet.py:201-205``)

Bilinear interpolation is linear in the input, so a (out, in) interpolation
matrix per spatial axis reproduces it exactly; the resize becomes two small
matmuls that ride the MXU instead of gather chains.  The matrices are built
with NumPy at trace time (static shapes), so XLA constant-folds them and the
backward pass is just the transposed matmuls.

All ops take NHWC arrays (TPU-native layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(src: int, dst: int, align_corners: bool) -> np.ndarray:
    """Dense (dst, src) 1-D bilinear interpolation matrix, torch semantics."""
    if dst == src:
        return np.eye(dst, dtype=np.float64)
    out = np.zeros((dst, src), dtype=np.float64)
    if align_corners:
        if dst == 1:
            coords = np.zeros((1,))
        else:
            coords = np.arange(dst) * (src - 1) / (dst - 1)
    else:
        scale = src / dst
        coords = np.maximum((np.arange(dst) + 0.5) * scale - 0.5, 0.0)
    i0 = np.clip(np.floor(coords).astype(np.int64), 0, src - 1)
    i1 = np.minimum(i0 + 1, src - 1)
    frac = coords - i0
    rows = np.arange(dst)
    np.add.at(out, (rows, i0), 1.0 - frac)
    np.add.at(out, (rows, i1), frac)
    return out  # f64; consumers cast to their compute dtype


def resize_bilinear(
    x: jnp.ndarray,
    size: tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize NHWC (or HWC / NHW1) tensor to ``size=(H, W)``, torch-bilinear.

    Exactly matches ``torch.nn.functional.interpolate(x, size, mode='bilinear',
    align_corners=...)`` (which the reference uses both by size and by exact
    integer ``scale_factor`` — identical coordinate maps for the shapes used).
    """
    h_out, w_out = size
    n, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x
    dt = x.dtype
    ct = jnp.promote_types(dt, jnp.float32)  # f32 min (bf16 -> f32, f64 stays)
    wh = jnp.asarray(_interp_matrix(h, h_out, align_corners), dtype=ct)
    ww = jnp.asarray(_interp_matrix(w, w_out, align_corners), dtype=ct)
    # (N,H,W,C): contract H then W. Compute in >=f32 for parity, cast back.
    # precision=highest: the interpolation weights must not be rounded to
    # bf16 on the MXU, or subpixel drift moves threshold-sweep metrics.
    y = jnp.einsum("ah,nhwc->nawc", wh, x.astype(ct),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("bw,nawc->nabc", ww, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(dt)


def upsample(x: jnp.ndarray, scale: float, align_corners: bool = False) -> jnp.ndarray:
    """``F.interpolate(x, scale_factor=scale)`` — output size floor(in * scale)."""
    n, h, w, c = x.shape
    return resize_bilinear(
        x, (int(h * scale), int(w * scale)), align_corners=align_corners
    )


def resize_bilinear_np(x: np.ndarray, size: tuple[int, int],
                       align_corners: bool = False) -> np.ndarray:
    """Host-side (numpy) torch-bilinear resize — same matrices as the jit op.

    For per-image native-size post-processing: a jitted resize would compile
    one executable per unique output shape (expensive over a device tunnel);
    on host these are two small matmuls.
    """
    h_out, w_out = size
    x = np.asarray(x)
    x = x.astype(np.promote_types(x.dtype, np.float32))
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    if (h, w) != (h_out, w_out):
        wh = _interp_matrix(h, h_out, align_corners).astype(x.dtype)
        ww = _interp_matrix(w, w_out, align_corners).astype(x.dtype)
        x = np.einsum("ah,nhwc->nawc", wh, x)
        x = np.einsum("bw,nawc->nabc", ww, x)
    return x[0] if squeeze else x


def upsample_nearest(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """torch ``nn.Upsample(scale_factor=k)`` (nearest, integer scale).

    out[i] = in[i // k] — an exact repeat along H and W.
    """
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)
