"""Optimizers and LR schedules matching the reference recipes.

* Binary (PraNet-V2): Adam(1e-4), element-wise gradient clamp to +/-0.5,
  step LR decay ``lr * rate^(epoch // decay_epoch)``
  (``binary_seg/MyTrain_med.py:108-125``, ``binary_seg/utils/utils.py:7-23``).
* Multiclass (MERIT/MIST/EMCAD): AdamW(1e-4, wd 1e-4), constant LR
  (``multiclass_seg/MERIT/train_ACDC.py:192,307-308``).

Note the reference 'clip_gradient' is a value clamp, not a norm clip —
``optax.clip`` reproduces it exactly.
"""

from __future__ import annotations

import optax


def step_decay_schedule(
    base_lr: float, decay_rate: float, decay_epoch: int, steps_per_epoch: int
):
    """lr(step) = base * rate^(epoch // decay_epoch), epoch 1-based."""

    def fn(step):
        epoch = step // steps_per_epoch + 1
        return base_lr * decay_rate ** (epoch // decay_epoch)

    return fn


def make_optimizer(
    learning_rate,
    clip_value: float | None = 0.5,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    opt = (
        optax.adamw(learning_rate, weight_decay=weight_decay)
        if weight_decay
        else optax.adam(learning_rate)
    )
    if clip_value:
        return optax.chain(optax.clip(clip_value), opt)
    return opt
