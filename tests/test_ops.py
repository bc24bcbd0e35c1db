"""Op-level parity tests vs torch CPU (the oracle for reference semantics)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pranet2_tpu.ops import (
    avg_pool,
    avg_pool_same,
    dsra_gate,
    max_pool,
    resize_bilinear,
    reverse_attention,
)
from pranet2_tpu.ops.dsra import dsra_gate_pallas
from pranet2_tpu.losses import structure_loss, structure_loss_v1
from pranet2_tpu.losses.multiclass import (
    dice_loss,
    mutation_loss,
    softmax_ce_loss,
    bce_with_logits,
)


def nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(np.asarray(x_nhwc), -1, 1).copy())


def nhwc(t_nchw):
    return np.moveaxis(t_nchw.numpy(), 1, -1)


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

RESIZE_CASES = [
    # (in_hw, out_hw, align) — the shapes the PraNet family actually uses
    ((44, 44), (352, 352), False),   # lateral map x8
    ((11, 11), (352, 352), False),   # lateral map x32
    ((44, 44), (11, 11), False),     # crop_4 = x0.25
    ((11, 11), (22, 22), False),     # crop_3 = x2
    ((11, 11), (22, 22), True),      # partial-decoder up2 (align_corners=True)
    ((352, 352), (264, 264), True),  # multi-scale train rate 0.75
    ((352, 352), (448, 448), True),  # multi-scale train rate 1.25
    ((44, 44), (88, 88), True),
    ((17, 23), (51, 69), False),     # non-square, non-divisible
    ((50, 40), (33, 29), False),     # downsample, ragged
    ((7, 7), (7, 7), True),          # identity
]


@pytest.mark.parametrize("in_hw,out_hw,align", RESIZE_CASES)
def test_resize_bilinear_matches_torch(rng, in_hw, out_hw, align):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    want = nhwc(
        F.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=align)
    )
    # f32 accumulation-order differences only; semantics are exact
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_resize_grad_is_finite(rng):
    x = jnp.asarray(rng.standard_normal((1, 11, 11, 1), dtype=np.float32))
    g = jax.grad(lambda t: jnp.sum(resize_bilinear(t, (44, 44)) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------


def test_avg_pool_31_same_matches_torch(rng):
    x = rng.random((2, 64, 64, 1), dtype=np.float32)
    got = np.asarray(avg_pool_same(jnp.asarray(x), 31))
    want = nhwc(F.avg_pool2d(nchw(x), kernel_size=31, stride=1, padding=15))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("hw", [(88, 88), (44, 44), (22, 22), (23, 37)])
def test_avg_pool_stage_matches_torch(rng, hw):
    # Bottle2neck 'stage' pool: k=3, stride=2, pad=1 (count_include_pad=True)
    x = rng.standard_normal((2, *hw, 4), dtype=np.float32)
    got = np.asarray(avg_pool(jnp.asarray(x), 3, 2, 1))
    want = nhwc(F.avg_pool2d(nchw(x), 3, 2, 1))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("hw", [(88, 88), (21, 33), (11, 11)])
def test_avg_pool_downsample_ceil_matches_torch(rng, hw):
    # Res2Net v1b downsample: k=2, s=2, ceil_mode=True, count_include_pad=False
    x = rng.standard_normal((2, *hw, 4), dtype=np.float32)
    got = np.asarray(
        avg_pool(jnp.asarray(x), 2, 2, 0, count_include_pad=False, ceil_mode=True)
    )
    want = nhwc(
        F.avg_pool2d(nchw(x), 2, 2, 0, ceil_mode=True, count_include_pad=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("hw", [(176, 176), (23, 37)])
def test_max_pool_matches_torch(rng, hw):
    x = rng.standard_normal((2, *hw, 4), dtype=np.float32)
    got = np.asarray(max_pool(jnp.asarray(x), 3, 2, 1))
    want = nhwc(F.max_pool2d(nchw(x), 3, 2, 1))
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------------------------
# DSRA gate / reverse attention
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("c,use_softmax", [(1, True), (1, False), (3, True), (9, True), (4, False)])
def test_dsra_gate_matches_torch(rng, c, use_softmax):
    fg = rng.standard_normal((2, 11, 11, c), dtype=np.float32)
    cf = rng.standard_normal((2, 11, 11, c), dtype=np.float32)
    cb = rng.standard_normal((2, 11, 11, c), dtype=np.float32)
    got = np.asarray(
        dsra_gate(jnp.asarray(fg), jnp.asarray(cf), jnp.asarray(cb), use_softmax)
    )
    tfg, tcf, tcb = nchw(fg), nchw(cf), nchw(cb)
    if use_softmax:
        want = tfg + tfg * torch.softmax(tcf - tcb, dim=1)
    else:
        want = tfg + tfg * (tcf - tcb)
    np.testing.assert_allclose(got, nhwc(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("use_softmax", [True, False])
def test_dsra_gate_pallas_matches_xla(rng, use_softmax):
    # On CPU the pallas path falls back to XLA; on TPU it runs the kernel.
    fg = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    cf = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    cb = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    got = dsra_gate_pallas(fg, cf, cb, use_softmax)
    want = dsra_gate(fg, cf, cb, use_softmax)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
    # gradients agree too
    g1 = jax.grad(lambda a: jnp.sum(dsra_gate_pallas(a, cf, cb, use_softmax) ** 2))(fg)
    g2 = jax.grad(lambda a: jnp.sum(dsra_gate(a, cf, cb, use_softmax) ** 2))(fg)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-4)


def test_reverse_attention_matches_torch(rng):
    crop = rng.standard_normal((2, 11, 11, 1), dtype=np.float32)
    feat = rng.standard_normal((2, 11, 11, 32), dtype=np.float32)
    got = np.asarray(reverse_attention(jnp.asarray(crop), jnp.asarray(feat)))
    want = (-1 * torch.sigmoid(nchw(crop)) + 1).expand(-1, 32, -1, -1).mul(nchw(feat))
    np.testing.assert_allclose(got, nhwc(want), atol=1e-5)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def torch_structure_loss(pred, pred_bg, mask_fg, mask_bg):
    weit = 1 + 5 * torch.abs(
        F.avg_pool2d(mask_fg, kernel_size=31, stride=1, padding=15) - mask_fg
    )
    wbce = F.binary_cross_entropy_with_logits(pred, mask_fg, reduction="none")
    wbce = (weit * wbce).sum(dim=(2, 3)) / weit.sum(dim=(2, 3))
    wbce2 = F.binary_cross_entropy_with_logits(pred_bg, mask_bg, reduction="none")
    wbce2 = (weit * wbce2).sum(dim=(2, 3)) / weit.sum(dim=(2, 3))
    pred = torch.sigmoid(pred)
    inter = ((pred * mask_fg) * weit).sum(dim=(2, 3))
    union = ((pred + mask_fg) * weit).sum(dim=(2, 3))
    wiou = 1 - (inter + 1) / (union - inter + 1)
    return (wbce + wiou + 0.8 * wbce2).mean()


def test_structure_loss_matches_torch(rng):
    pred = rng.standard_normal((4, 64, 64, 1), dtype=np.float32) * 3
    pred_bg = rng.standard_normal((4, 64, 64, 1), dtype=np.float32) * 3
    mask = (rng.random((4, 64, 64, 1)) > 0.7).astype(np.float32)
    got = float(
        structure_loss(
            jnp.asarray(pred), jnp.asarray(pred_bg), jnp.asarray(mask),
            jnp.asarray(1 - mask),
        )
    )
    want = float(
        torch_structure_loss(nchw(pred), nchw(pred_bg), nchw(mask), nchw(1 - mask))
    )
    assert abs(got - want) < 1e-4


def test_structure_loss_v1_finite_grad(rng):
    pred = jnp.asarray(rng.standard_normal((2, 64, 64, 1), dtype=np.float32))
    mask = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.5).astype(np.float32))
    val, g = jax.value_and_grad(lambda p: structure_loss_v1(p, mask))(pred)
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(g)))


def test_dice_and_ce_match_torch(rng):
    n_cls = 4
    logits = rng.standard_normal((2, 32, 32, n_cls), dtype=np.float32)
    labels = rng.integers(0, n_cls, (2, 32, 32))
    tl = nchw(logits)
    tlab = torch.from_numpy(labels)

    got_ce = float(softmax_ce_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want_ce = float(torch.nn.CrossEntropyLoss()(tl, tlab.long()))
    assert abs(got_ce - want_ce) < 1e-5

    # reference DiceLoss
    probs = torch.softmax(tl, dim=1)
    smooth = 1e-5
    loss = 0.0
    for i in range(n_cls):
        t = (tlab == i).float()
        s = probs[:, i]
        intersect = (s * t).sum()
        dice = (2 * intersect + smooth) / ((s * s).sum() + (t * t).sum() + smooth)
        loss += 1 - dice
    want_dice = float(loss / n_cls)
    got_dice = float(dice_loss(jnp.asarray(logits), jnp.asarray(labels), n_cls))
    assert abs(got_dice - want_dice) < 1e-5


def test_mutation_loss_runs_and_matches_manual(rng):
    n_cls = 4
    fg = [jnp.asarray(rng.standard_normal((1, 16, 16, n_cls), dtype=np.float32))
          for _ in range(4)]
    bg = [jnp.asarray(rng.standard_normal((1, 16, 16, n_cls), dtype=np.float32))
          for _ in range(4)]
    labels = jnp.asarray(rng.integers(0, n_cls, (1, 16, 16)))
    loss = float(mutation_loss(fg, labels, n_cls, bg))
    assert np.isfinite(loss)
    # single-supervision path
    loss_single = float(mutation_loss(fg, labels, n_cls))
    assert np.isfinite(loss_single)
    # 15 non-empty subsets of 4 stages
    from pranet2_tpu.losses import powerset

    assert len(powerset([0, 1, 2, 3])) == 15
