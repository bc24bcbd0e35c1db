"""Multiclass train-step parity: MUTATION loss grads + AdamW vs torch.

The reference multiclass recipe (``multiclass_seg/EMCAD/trainer.py:100-140``,
``MERIT/train_ACDC.py:243-300``) is MUTATION powerset supervision
(0.5*CE + 0.7*Dice + 0.3*bg-BCE per subset) optimized with
AdamW(1e-4, wd 1e-4).  Model-forward parity is covered by the oracle suite
(eval mode); this file pins the *training semantics* in isolation, in f64:

1. loss value and gradients w.r.t. all 8 logit maps against a literal torch
   transcription of the reference loop — this also guards the vectorized
   (einsum-batched) implementation against the reference's sequential one;
2. one AdamW step: optax.adamw must reproduce torch.optim.AdamW exactly
   (decoupled weight decay, bias correction);
3. the two reduced supervision modes (deep_supervision / last_layer) and the
   single (non-dual) weighting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn.functional as F

from pranet2_tpu.losses import mutation_loss

pytestmark = pytest.mark.oracle

N_CLS = 4


@pytest.fixture()
def x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def torch_dice_loss(logits, target_idx, n_classes):
    """Reference DiceLoss (MERIT/utils/utils.py:106-143), softmax=True."""
    probs = torch.softmax(logits, dim=1)
    target = F.one_hot(target_idx.long(), n_classes).permute(0, 3, 1, 2)
    smooth = 1e-5
    loss = 0.0
    for i in range(n_classes):
        s, t = probs[:, i], target[:, i].to(logits.dtype)
        intersect = (s * t).sum()
        dice = (2 * intersect + smooth) / ((s * s).sum() + (t * t).sum()
                                           + smooth)
        loss = loss + (1 - dice)
    return loss / n_classes


def torch_mutation_loss(fg, bg, labels, subsets, weights=(0.5, 0.7, 0.3)):
    """Literal transcription of EMCAD/trainer.py:122-140 (dual branch)."""
    lc1, lc2, lc3 = weights
    bg_mask = 1.0 - F.one_hot(labels.long(), N_CLS).permute(0, 3, 1, 2).to(
        fg[0].dtype)
    loss = 0.0
    for s in subsets:
        iout = sum(fg[i] for i in s)
        ibg = sum(bg[i] for i in s)
        loss = loss + (
            lc1 * torch.nn.CrossEntropyLoss()(iout, labels.long())
            + lc2 * torch_dice_loss(iout, labels, N_CLS)
            + lc3 * torch.nn.BCEWithLogitsLoss()(ibg, bg_mask)
        )
    return loss


def _maps(seed, dtype=np.float64):
    rng = np.random.default_rng(seed)
    fg = [rng.standard_normal((2, 4, 24, 24)).astype(dtype) for _ in range(4)]
    bg = [rng.standard_normal((2, 4, 24, 24)).astype(dtype) for _ in range(4)]
    labels = rng.integers(0, N_CLS, (2, 24, 24))
    return fg, bg, labels


def _subsets(mode):
    from pranet2_tpu.losses.multiclass import supervision_subsets

    return supervision_subsets(4, mode)


@pytest.mark.parametrize("mode", ["mutation", "deep_supervision",
                                  "last_layer"])
def test_mutation_loss_and_grads_match_torch(x64, mode):
    fg_np, bg_np, labels = _maps(0)
    tfg = [torch.tensor(m, requires_grad=True) for m in fg_np]
    tbg = [torch.tensor(m, requires_grad=True) for m in bg_np]
    tl = torch.tensor(labels)
    loss_t = torch_mutation_loss(tfg, tbg, tl, _subsets(mode))
    loss_t.backward()

    jfg = [jnp.asarray(np.moveaxis(m, 1, -1)) for m in fg_np]
    jbg = [jnp.asarray(np.moveaxis(m, 1, -1)) for m in bg_np]
    jl = jnp.asarray(labels)

    def lf(jfg, jbg):
        return mutation_loss(jfg, jl, N_CLS, jbg, supervision=mode)

    loss_j, (gfg, gbg) = jax.value_and_grad(lf, argnums=(0, 1))(jfg, jbg)
    assert abs(float(loss_j) - float(loss_t)) < 1e-12 * max(
        1.0, abs(float(loss_t)))
    for tm, jm in list(zip(tfg, gfg)) + list(zip(tbg, gbg)):
        # maps outside the supervised subsets get no torch grad (None) and a
        # zero jax grad
        want = (tm.grad.numpy() if tm.grad is not None
                else np.zeros(tm.shape))
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(jm), -1, 1), want, atol=1e-14)


def test_single_mode_loss_and_grads(x64):
    fg_np, _, labels = _maps(1)
    tfg = [torch.tensor(m, requires_grad=True) for m in fg_np]
    tl = torch.tensor(labels)
    loss_t = 0.0
    for s in _subsets("mutation"):
        iout = sum(tfg[i] for i in s)
        loss_t = loss_t + (0.3 * torch.nn.CrossEntropyLoss()(iout, tl.long())
                           + 0.7 * torch_dice_loss(iout, tl, N_CLS))
    loss_t.backward()

    jfg = [jnp.asarray(np.moveaxis(m, 1, -1)) for m in fg_np]
    loss_j, gfg = jax.value_and_grad(
        lambda f: mutation_loss(f, jnp.asarray(labels), N_CLS))(jfg)
    assert abs(float(loss_j) - float(loss_t)) < 1e-12 * abs(float(loss_t))
    for tm, jm in zip(tfg, gfg):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(jm), -1, 1), tm.grad.numpy(), atol=1e-14)


def test_adamw_step_matches_torch(x64):
    """optax.adamw(1e-4, wd 1e-4) == torch.optim.AdamW over 3 steps."""
    rng = np.random.default_rng(2)
    p_np = rng.standard_normal((7, 5))
    t_p = torch.tensor(p_np.copy(), requires_grad=True)
    opt = torch.optim.AdamW([t_p], lr=1e-4, weight_decay=1e-4)

    j_p = jnp.asarray(p_np)
    tx = optax.adamw(1e-4, weight_decay=1e-4)
    state = tx.init(j_p)

    for step in range(3):
        g_np = rng.standard_normal((7, 5))
        opt.zero_grad()
        t_p.grad = torch.tensor(g_np)
        opt.step()
        upd, state = tx.update(jnp.asarray(g_np), state, j_p)
        j_p = optax.apply_updates(j_p, upd)
        np.testing.assert_allclose(np.asarray(j_p), t_p.detach().numpy(),
                                   atol=1e-15, err_msg=f"step {step}")
