"""Multi-class losses + MUTATION powerset supervision (MERIT/MIST/EMCAD).

Reference behavior (re-derived):
* ``DiceLoss``: softmax probs, per-class dice with smooth 1e-5 using
  ``2*sum(p*t) / (sum(p*p) + sum(t*t))`` over the *whole batch*, averaged over
  classes (``multiclass_seg/MERIT/utils/utils.py:106-143``).
* ``powerset``: all non-empty subsets of the 4 decoder stages; per subset the
  fg (and bg) logits are summed and supervised with
  ``0.5*CE + 0.7*Dice + 0.3*BCE(bg)`` (dual) or ``0.3*CE + 0.7*Dice``
  (single) (``multiclass_seg/MERIT/train_ACDC.py:243-300``).
* bg target = ``logical_not(one_hot(label))`` (``train_ACDC.py:57-66``).

The powerset is unrolled at trace time (15 subsets, static), each subset's
logit sum is formed once — XLA CSEs the shared partial sums.

Layout: logits are NHWC (class-last); integer labels are (N,H,W).
"""

from __future__ import annotations

import itertools
from collections.abc import Sequence

import jax
import jax.numpy as jnp

from pranet2_tpu.losses.binary import bce_logits


def powerset(seq: Sequence[int]) -> list[list[int]]:
    """All non-empty subsets, matching the reference's MUTATION enumeration."""
    out = []
    for r in range(1, len(seq) + 1):
        out.extend(list(c) for c in itertools.combinations(seq, r))
    return out


def one_hot_bg(labels: jnp.ndarray, num_classes: int,
               dtype=jnp.float32) -> jnp.ndarray:
    """Per-class background mask: ``1 - one_hot(label)``, (N,H,W,C)."""
    return 1.0 - jax.nn.one_hot(labels, num_classes, dtype=dtype)


def softmax_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy over all pixels (torch ``CrossEntropyLoss``)."""
    ct = jnp.promote_types(logits.dtype, jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(ct), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


def dice_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    softmax: bool = True,
) -> jnp.ndarray:
    """Reference DiceLoss: batch-global per-class squared-denominator dice."""
    ct = jnp.promote_types(logits.dtype, jnp.float32)
    x = logits.astype(ct)
    if softmax:
        x = jax.nn.softmax(x, axis=-1)
    target = jax.nn.one_hot(labels, num_classes, dtype=ct)
    smooth = 1e-5
    intersect = jnp.sum(x * target, axis=(0, 1, 2))
    z = jnp.sum(x * x, axis=(0, 1, 2))
    y = jnp.sum(target * target, axis=(0, 1, 2))
    dice = (2.0 * intersect + smooth) / (z + y + smooth)
    return jnp.mean(1.0 - dice)


def bce_with_logits(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean BCE-with-logits (torch ``BCEWithLogitsLoss`` default reduction)."""
    ct = jnp.promote_types(pred.dtype, jnp.float32)
    return jnp.mean(bce_logits(pred.astype(ct), target.astype(ct)))


def supervision_subsets(n_maps: int, supervision: str = "mutation"):
    """Stage-index subsets per supervision mode (``EMCAD/trainer.py:109-121``):
    'mutation' = non-empty powerset, 'deep_supervision' = singletons,
    'last_layer' = the finest map only."""
    if supervision == "mutation":
        return powerset(list(range(n_maps)))
    if supervision == "deep_supervision":
        return [[i] for i in range(n_maps)]
    if supervision == "last_layer":
        return [[n_maps - 1]]
    raise ValueError(f"unknown supervision {supervision!r}")


def mutation_loss(
    fg_maps: Sequence[jnp.ndarray],
    labels: jnp.ndarray,
    num_classes: int,
    bg_maps: Sequence[jnp.ndarray] | None = None,
    weights: tuple[float, float, float] = (0.5, 0.7, 0.3),
    single_weights: tuple[float, float] = (0.3, 0.7),
    supervision: str = "mutation",
) -> jnp.ndarray:
    """MUTATION powerset supervision over the 4 decoder-stage logit maps.

    ``fg_maps``/``bg_maps``: 4 NHWC logit maps at full label resolution.
    Dual mode when ``bg_maps`` is given; bg target derived from labels.

    TPU shape: instead of 15 sequential subset passes (the reference's Python
    loop, ``train_ACDC.py:263-284``), the subset sums are one (S,K) x
    (K,NHWC) matmul and every CE/Dice/BCE reduction is batched over the
    subset axis — one fused pass, identical math.
    """
    subsets = supervision_subsets(len(fg_maps), supervision)
    ct = jnp.promote_types(fg_maps[0].dtype, jnp.float32)
    sel = jnp.asarray(
        [[1.0 if i in s else 0.0 for i in range(len(fg_maps))]
         for s in subsets], dtype=ct)                   # (S, K) static 0/1

    fg = jnp.stack([m.astype(ct) for m in fg_maps])            # (K,N,H,W,C)
    # precision=HIGHEST: default-precision einsum rounds f32 operands to
    # bf16 on the MXU, breaking exact parity with the reference's direct
    # additions (K=4 contraction — cost is negligible)
    hi = jax.lax.Precision.HIGHEST
    iout = jnp.einsum("sk,k...->s...", sel, fg, precision=hi)  # (S,N,H,W,C)

    # batched CE over subsets
    logp = jax.nn.log_softmax(iout, axis=-1)
    lab = labels[None, ..., None].astype(jnp.int32)
    lab = jnp.broadcast_to(lab, (iout.shape[0],) + labels.shape + (1,))
    ce = -jnp.mean(jnp.take_along_axis(logp, lab, axis=-1), axis=(1, 2, 3, 4))

    # batched reference DiceLoss (batch-global, squared denominator)
    probs = jax.nn.softmax(iout, axis=-1)
    target = jax.nn.one_hot(labels, num_classes, dtype=ct)
    smooth = 1e-5
    intersect = jnp.einsum("snhwc,nhwc->sc", probs, target, precision=hi)
    z = jnp.sum(probs * probs, axis=(1, 2, 3))
    y = jnp.sum(target * target, axis=(0, 1, 2))
    dice = jnp.mean(1.0 - (2.0 * intersect + smooth) / (z + y[None] + smooth),
                    axis=-1)

    if bg_maps is not None:
        lc1, lc2, lc3 = weights
        bg = jnp.stack([m.astype(ct) for m in bg_maps])
        ibg = jnp.einsum("sk,k...->s...", sel, bg, precision=hi)
        bce = jnp.mean(
            bce_logits(ibg, one_hot_bg(labels, num_classes, ct)[None]),
            axis=(1, 2, 3, 4))
        per_subset = lc1 * ce + lc2 * dice + lc3 * bce
    else:
        lc1, lc2 = single_weights
        per_subset = lc1 * ce + lc2 * dice
    return jnp.sum(per_subset)
