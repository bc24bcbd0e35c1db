"""Auxiliary training utilities present in the reference's utils.

* ``poly_lr_schedule``: PolyLR (``EMCAD/utils/misc.py``; the ACDC trainer has
  the poly rule commented out — kept here for completeness).
* ``focal_loss``: FocalLoss2d equivalent (``EMCAD/utils/misc.py``, unused by
  the reference CLIs but part of its utils surface).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def poly_lr_schedule(base_lr: float, max_iters: int, power: float = 0.9):
    def fn(step):
        frac = jnp.clip(step / max_iters, 0.0, 1.0)
        return base_lr * (1.0 - frac) ** power

    return fn


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, gamma: float = 2.0,
               weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """Multi-class focal loss on NHWC logits / integer labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    p = jnp.exp(ll)
    w = (1.0 - p) ** gamma
    if weight is not None:
        w = w * weight[labels]
    return -jnp.mean(w * ll)
