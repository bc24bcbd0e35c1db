"""Binary-segmentation losses (PraNet family), NHWC.

``structure_loss`` reproduces the reference V2 loss exactly
(``binary_seg/MyTrain_med.py:19-38``): boundary-emphasised weights from a
31x31 average pool, weighted BCE on fg and bg streams, weighted IoU on fg,
total ``wbce + wiou + 0.8 * wbce_bg`` averaged over (batch, class).

``structure_loss_v1`` is the classic PraNet-V1 loss (wBCE + wIoU, no bg
stream), kept for V1 training parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pranet2_tpu.ops import avg_pool_same


def bce_logits(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with logits (numerically stable)."""
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def _boundary_weight(mask: jnp.ndarray) -> jnp.ndarray:
    return 1.0 + 5.0 * jnp.abs(avg_pool_same(mask, 31) - mask)


def structure_loss(
    pred: jnp.ndarray,
    pred_bg: jnp.ndarray,
    mask_fg: jnp.ndarray,
    mask_bg: jnp.ndarray,
    weit: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """PraNet-V2 dual-supervised structure loss. All inputs (N,H,W,C) f32.

    ``weit`` may be precomputed (``_boundary_weight(mask_fg)``) and shared
    across the 4 lateral-map losses — see :func:`structure_loss_multi`.
    """
    ct = jnp.promote_types(pred.dtype, jnp.float32)
    pred = pred.astype(ct)
    pred_bg = pred_bg.astype(ct)
    mask_fg = mask_fg.astype(ct)
    mask_bg = mask_bg.astype(ct)

    if weit is None:
        weit = _boundary_weight(mask_fg)
    wsum = jnp.sum(weit, axis=(1, 2))

    wbce = jnp.sum(weit * bce_logits(pred, mask_fg), axis=(1, 2)) / wsum
    wbce2 = jnp.sum(weit * bce_logits(pred_bg, mask_bg), axis=(1, 2)) / wsum

    p = jax.nn.sigmoid(pred)
    inter = jnp.sum(p * mask_fg * weit, axis=(1, 2))
    union = jnp.sum((p + mask_fg) * weit, axis=(1, 2))
    wiou = 1.0 - (inter + 1.0) / (union - inter + 1.0)

    return jnp.mean(wbce + wiou + 0.8 * wbce2)


def structure_loss_multi(fg_maps, bg_maps, mask_fg, mask_bg):
    """Sum of structure losses over the 4 lateral-map pairs with the
    boundary weight computed once (identical math to 4 separate calls —
    the reference recomputes the 31x31 pool per loss, ``MyTrain_med.py:78-82``)."""
    mask_fg = mask_fg.astype(jnp.promote_types(mask_fg.dtype, jnp.float32))
    weit = _boundary_weight(mask_fg)
    return sum(
        structure_loss(f, b, mask_fg, mask_bg, weit=weit)
        for f, b in zip(fg_maps, bg_maps)
    )


def structure_loss_v1(pred: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """PraNet-V1 structure loss: weighted BCE + weighted IoU."""
    ct = jnp.promote_types(pred.dtype, jnp.float32)
    pred = pred.astype(ct)
    mask = mask.astype(ct)
    weit = _boundary_weight(mask)
    wsum = jnp.sum(weit, axis=(1, 2))
    wbce = jnp.sum(weit * bce_logits(pred, mask), axis=(1, 2)) / wsum
    p = jax.nn.sigmoid(pred)
    inter = jnp.sum(p * mask * weit, axis=(1, 2))
    union = jnp.sum((p + mask) * weit, axis=(1, 2))
    wiou = 1.0 - (inter + 1.0) / (union - inter + 1.0)
    return jnp.mean(wbce + wiou)
