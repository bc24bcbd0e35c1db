"""One-step training parity vs the reference torch train semantics.

Same weights, same batch: the reference binary train step
(``binary_seg/MyTrain_med.py:52-103`` — forward in train mode, 4 structure
losses summed, backward, per-element grad clamp ±0.5
(``binary_seg/utils/utils.py:7-17``), Adam(1e-4) step) against
``pranet2_tpu.train.binary.make_train_step``'s ingredients.  Catches what
forward parity can't: BN batch-stat/momentum/Bessel semantics, loss
reductions, clip semantics, Adam bias correction.

Both sides run in float64: train-mode BN renormalizes every layer, which
amplifies f32 reduction-ordering noise through ~50 layers into percent-level
grad differences at random init — f64 removes the conditioning noise so the
test asserts *semantic* equality at 1e-8, far tighter than any f32 bound.
An f32 loss-level check runs too (the production dtype).

Checks, in dependency order:
1. train-mode forward loss equality,
2. per-tensor gradients (converted through the same .pth key map, so the
   comparison is elementwise in flax layout),
3. BN running stats after the train-mode forward,
4. parameters after one clip+Adam step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn.functional as F

from oracle_shims import load_ref_module, neutralized_loading, to_numpy_sd
from pranet2_tpu.losses import structure_loss
from pranet2_tpu.models import get_model
from pranet2_tpu.train.optim import make_optimizer
from pranet2_tpu.utils.torch_convert import convert_state_dict, pranet_key_map

pytestmark = pytest.mark.oracle


@pytest.fixture()
def x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def torch_structure_loss(pred, pred_bg, mask_fg, mask_bg):
    """Transcription of binary_seg/MyTrain_med.py:19-38."""
    weit = 1 + 5 * torch.abs(
        F.avg_pool2d(mask_fg, kernel_size=31, stride=1, padding=15) - mask_fg
    )
    wbce = F.binary_cross_entropy_with_logits(pred, mask_fg, reduction="none")
    wbce = (weit * wbce).sum(dim=(2, 3)) / weit.sum(dim=(2, 3))
    wbce2 = F.binary_cross_entropy_with_logits(pred_bg, mask_bg,
                                               reduction="none")
    wbce2 = (weit * wbce2).sum(dim=(2, 3)) / weit.sum(dim=(2, 3))
    pred = torch.sigmoid(pred)
    inter = ((pred * mask_fg) * weit).sum(dim=(2, 3))
    union = ((pred + mask_fg) * weit).sum(dim=(2, 3))
    wiou = 1 - (inter + 1) / (union - inter + 1)
    return (wbce + wiou + 0.8 * wbce2).mean()


def _build_ref():
    mod = load_ref_module("binary_seg", "lib.pranet")
    torch.manual_seed(7)
    with neutralized_loading():
        ref = mod.PraNet_V2(num_class=1)
    ref.train()
    rng = np.random.default_rng(42)
    x = rng.standard_normal((2, 3, 64, 64), dtype=np.float32).astype(np.float64)
    gts = (rng.random((2, 1, 64, 64)) > 0.6).astype(np.float64)
    return ref.double(), x, gts


def _torch_step(ref, x, gts, lr=1e-4, clip=0.5):
    """Reference step: loss, raw grads (as a state_dict-shaped dict),
    and the post-(clip+Adam) state_dict."""
    opt = torch.optim.Adam(ref.parameters(), lr=lr)
    opt.zero_grad()
    tx, tg = torch.from_numpy(x), torch.from_numpy(gts)
    bg = 1 - tg
    outs = ref(tx)
    fg_maps, bg_maps = outs[:4], outs[4:]
    loss = sum(
        torch_structure_loss(f, b, tg, bg) for f, b in zip(fg_maps, bg_maps)
    )
    loss.backward()
    named = dict(ref.named_parameters())

    def grad_of(k, v):
        # modules not touched by forward (dead weights) get no grad in torch;
        # they are zero-grad in JAX, so compare against zeros
        if k in named:
            g = named[k].grad
            return (g.detach().numpy().copy() if g is not None
                    else np.zeros_like(v.detach().numpy()))
        return v.detach().numpy().copy()

    grads_sd = {k: grad_of(k, v) for k, v in ref.state_dict().items()}
    # clip_gradient (binary_seg/utils/utils.py:7-17): per-element clamp
    for p in ref.parameters():
        if p.grad is not None:
            p.grad.data.clamp_(-clip, clip)
    opt.step()
    return float(loss.detach()), grads_sd, to_numpy_sd(ref)


def _assert_tree_close(got, want, atol, rtol, what):
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    assert len(flat_g) == len(flat_w)
    for (pg, g), (pw, w) in zip(flat_g, flat_w):
        assert pg == pw
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=atol, rtol=rtol,
            err_msg=f"{what}: {jax.tree_util.keystr(pg)}")


def test_one_step_training_parity_f64(x64):
    ref, x, gts = _build_ref()
    key_map = pranet_key_map("v2", "res2net50")

    # snapshot initial weights BEFORE the torch step mutates them
    fvars = convert_state_dict(to_numpy_sd(ref), key_map)
    loss_t, grads_sd, sd_after = _torch_step(ref, x, gts)

    model = get_model("pranet_v2", num_class=1)
    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    gj = jnp.asarray(np.moveaxis(gts, 1, -1))
    bgj = 1.0 - gj

    def loss_fn(params):
        outs, upd = model.apply(
            {"params": params, "batch_stats": fvars["batch_stats"]},
            xj, True, mutable=["batch_stats"],
        )
        fg, bg = outs[:4], outs[4:]
        losses = [structure_loss(f, b, gj, bgj) for f, b in zip(fg, bg)]
        return sum(losses), upd["batch_stats"]

    (loss_j, new_stats), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(fvars["params"])

    # 1. loss
    assert abs(float(loss_j) - loss_t) <= 1e-9 * abs(loss_t), (
        float(loss_j), loss_t)

    # 2. per-tensor raw gradients, elementwise in flax layout
    grads_ref = convert_state_dict(grads_sd, key_map)["params"]
    _assert_tree_close(grads, grads_ref, atol=1e-8, rtol=1e-6, what="grad")

    # 3. BN running stats after the train-mode forward
    after = convert_state_dict(sd_after, key_map)
    _assert_tree_close(new_stats, after["batch_stats"],
                       atol=1e-10, rtol=1e-8, what="batch_stat")

    # 4. params after one clip+Adam step (optax.chain(clip, adam) must
    #    reproduce torch clip_gradient + torch.optim.Adam exactly)
    tx = make_optimizer(1e-4, clip_value=0.5)
    updates, _ = tx.update(grads, tx.init(fvars["params"]), fvars["params"])
    new_params = optax.apply_updates(fvars["params"], updates)
    # atol 5e-9 = 5e-5 x the lr-scaled update magnitude (grad-diff ~1e-10
    # can flip Adam's normalized direction on near-zero-grad elements)
    _assert_tree_close(new_params, after["params"],
                       atol=5e-9, rtol=1e-8, what="post-step param")


def test_one_step_loss_parity_f32():
    """The production-dtype check: f32 loss within 2e-5 relative (train-mode
    BN amplifies f32 reduction-ordering noise through ~50 layers)."""
    ref, x, gts = _build_ref()
    ref = ref.float()
    x, gts = x.astype(np.float32), gts.astype(np.float32)
    fvars = convert_state_dict(
        to_numpy_sd(ref), pranet_key_map("v2", "res2net50"))
    tg = torch.from_numpy(gts)
    with torch.no_grad():
        outs = ref(torch.from_numpy(x))
    loss_t = float(sum(
        torch_structure_loss(f, b, tg, 1 - tg)
        for f, b in zip(outs[:4], outs[4:])
    ))

    model = get_model("pranet_v2", num_class=1)
    jouts, _ = model.apply(
        fvars, jnp.asarray(np.moveaxis(x, 1, -1)), True,
        mutable=["batch_stats"],
    )
    gj = jnp.asarray(np.moveaxis(gts, 1, -1))
    loss_j = float(sum(
        structure_loss(f, b, gj, 1.0 - gj)
        for f, b in zip(jouts[:4], jouts[4:])
    ))
    assert abs(loss_j - loss_t) <= 2e-5 * abs(loss_t), (loss_j, loss_t)
