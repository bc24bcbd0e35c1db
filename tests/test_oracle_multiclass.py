"""Full-model oracle parity: multiclass families vs the reference torch code.

Same harness as test_oracle_binary.py: the actual reference torch models
(random init, eval mode) are the numeric oracle; their state_dict is
converted and the JAX forward must match elementwise.

Reference models: /root/reference/multiclass_seg/EMCAD/lib/networks.py:10
(EMCADNet), MERIT/lib/networks.py:733 (MERIT_Cascaded_dual),
MIST/lib/networks.py:39 (MIST_CAM).

MIST quirk: the reference calls ``F.dropout(x, p)`` without a training flag
(MIST/lib/MIST.py:231-242,264,292 — stochastic even in eval).  Our build
deliberately makes eval deterministic, so for the oracle run we patch
``F.dropout`` to identity on the torch side; this is exactly the deviation
recorded in models/mist.py and COMPONENTS.md.  Everything else (backbone,
conv-attention, wide-focus, DSRA heads) is compared at full strength.
"""

import contextlib

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from oracle_shims import (
    load_ref_module,
    nchw_to_nhwc,
    neutralized_loading,
    to_numpy_sd,
)
from pranet2_tpu.models import get_model
from pranet2_tpu.utils.torch_convert import (
    convert_state_dict,
    emcad_key_map,
    merit_key_map,
    mist_key_map,
    split_packed_mha,
)

pytestmark = pytest.mark.oracle

ATOL, RTOL = 5e-4, 5e-3


def _parity(ref_model, jax_model, key_map, x_nchw, n_maps, split_mha=False,
            atol=ATOL):
    ref_model.eval()
    with torch.no_grad():
        ref_outs = ref_model(torch.from_numpy(x_nchw))
    assert len(ref_outs) == n_maps

    sd = to_numpy_sd(ref_model)
    if split_mha:
        sd = split_packed_mha(sd)
    fvars = convert_state_dict(sd, key_map)
    x = jnp.asarray(np.moveaxis(x_nchw, 1, -1))
    jax_outs = jax_model.apply(fvars, x)
    assert len(jax_outs) == n_maps

    for i, (r, j) in enumerate(zip(ref_outs, jax_outs)):
        np.testing.assert_allclose(
            np.asarray(j), nchw_to_nhwc(r), atol=atol, rtol=RTOL,
            err_msg=f"map {i}",
        )


@pytest.mark.parametrize("dual,n_maps", [(True, 8), (False, 4)])
def test_emcad_pvt_oracle_parity(rng, dual, n_maps):
    mod = load_ref_module("multiclass_seg/EMCAD", "lib.networks")
    torch.manual_seed(0)
    with neutralized_loading():
        ref = mod.EMCADNet(num_classes=4, encoder="pvt_v2_b0",
                           activation="relu", pretrain=False, dual=dual)
    ours = get_model("emcad", num_classes=4, encoder="pvt_v2_b0",
                     activation="relu", dual=dual)
    x = rng.standard_normal((2, 3, 64, 64), dtype=np.float32)
    _parity(ref, ours, emcad_key_map("pvt_v2_b0"), x, n_maps)


def test_emcad_resnet_oracle_parity(rng):
    mod = load_ref_module("multiclass_seg/EMCAD", "lib.networks")
    torch.manual_seed(1)
    with neutralized_loading():
        ref = mod.EMCADNet(num_classes=4, encoder="resnet18",
                           activation="relu", pretrain=False, dual=True)
    ours = get_model("emcad", num_classes=4, encoder="resnet18",
                     activation="relu", dual=True)
    x = rng.standard_normal((2, 3, 64, 64), dtype=np.float32)
    _parity(ref, ours, emcad_key_map("resnet18"), x, 8)


def test_emcad_grayscale_stem_oracle_parity(rng):
    """1-channel (Synapse/ACDC production) path through the conv 1->3 stem."""
    mod = load_ref_module("multiclass_seg/EMCAD", "lib.networks")
    torch.manual_seed(2)
    with neutralized_loading():
        ref = mod.EMCADNet(num_classes=4, encoder="pvt_v2_b0",
                           activation="relu", pretrain=False, dual=True)
    ours = get_model("emcad", num_classes=4, encoder="pvt_v2_b0",
                     activation="relu", dual=True)
    x = rng.standard_normal((1, 1, 64, 64), dtype=np.float32)
    _parity(ref, ours, emcad_key_map("pvt_v2_b0"), x, 8)


def test_emcad_dataparallel_checkpoint_roundtrip(rng, tmp_path):
    """EMCAD saved through ``nn.DataParallel`` (exactly how the reference
    trainer wraps before ``torch.save`` — multiclass_seg/EMCAD/trainer.py:77)
    must convert identically to the bare model through the real ``.pth``
    path, including a ``{'state_dict': ...}`` container."""
    import jax

    from pranet2_tpu.utils.torch_convert import load_torch_state_dict

    mod = load_ref_module("multiclass_seg/EMCAD", "lib.networks")
    torch.manual_seed(7)
    with neutralized_loading():
        ref = mod.EMCADNet(num_classes=4, encoder="pvt_v2_b0",
                           activation="relu", pretrain=False, dual=True)
    ref.eval()
    path = tmp_path / "dp.pth"
    torch.save({"state_dict": torch.nn.DataParallel(ref).state_dict()}, path)

    km = emcad_key_map("pvt_v2_b0")
    got = convert_state_dict(load_torch_state_dict(str(path)), km)
    want = convert_state_dict(to_numpy_sd(ref), km)
    jax.tree.map(np.testing.assert_array_equal, got, want)


def test_merit_cascaded_dual_oracle_parity(rng):
    """MERIT tiny at the reference's real working sizes (256/224 internal).

    The heavy one: two MaxViT backbones, cascaded dual decoder, input
    re-gating, skip fusion — all composed.  Covers the MaxViT converter
    against real reference-fork code (round-1 gap)."""
    mod = load_ref_module("multiclass_seg/MERIT", "lib.networks")
    torch.manual_seed(3)
    with neutralized_loading():
        ref = mod.MERIT_Cascaded_dual(n_class=4, model_scale="tiny")
    ours = get_model("merit_cascaded", num_classes=4, model_scale="tiny",
                     dual=True)
    # the reference's scale_factor upsampling pins the input to img_size_s1
    x = rng.standard_normal((1, 3, 256, 256), dtype=np.float32)
    # window/grid attention reduction order differs more than convs do
    _parity(ref, ours, merit_key_map(), x, 8, atol=2e-3)


def test_mist_cam_dual_oracle_parity(rng):
    mod = load_ref_module("multiclass_seg/MIST", "lib.networks")
    torch.manual_seed(4)
    with neutralized_loading():
        ref = mod.MIST_CAM(n_class=4, model_scale="small", dual=True)
    ours = get_model("mist_cam", num_classes=4, dual=True)
    x = rng.standard_normal((1, 3, 256, 256), dtype=np.float32)
    with _deterministic_torch_dropout():
        _parity(ref, ours, mist_key_map(), x, 8, split_mha=True, atol=2e-3)


@contextlib.contextmanager
def _deterministic_torch_dropout():
    orig = torch.nn.functional.dropout
    torch.nn.functional.dropout = lambda x, *a, **k: x
    try:
        yield
    finally:
        torch.nn.functional.dropout = orig


# ---------------------------------------------------------------------------
# standalone MIST attention utilities (MIST.py:102-167)
# ---------------------------------------------------------------------------


def _conv_oihw(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def test_cbam_se_oracle_parity(rng):
    """ChannelAttentionCBAM / SEBlock / SpatialAttentionCBAM / CBAM parity
    vs the reference classes (no CLI uses them; module-surface parity)."""
    from pranet2_tpu.models.mist import (
        CBAM, ChannelAttentionCBAM, SEBlock, SpatialAttentionCBAM,
    )

    mod = load_ref_module("multiclass_seg/MIST", "lib.MIST")
    torch.manual_seed(11)
    x = rng.standard_normal((2, 32, 12, 12), dtype=np.float32)
    tx = torch.from_numpy(x)
    jx = jnp.asarray(np.moveaxis(x, 1, -1))

    ca = mod.ChannelAttentionCBAM(32).eval()
    with torch.no_grad():
        want = ca(tx)
    got = ChannelAttentionCBAM().apply(
        {"params": {"fc1": {"kernel": _conv_oihw(ca.fc1.weight)},
                    "fc2": {"kernel": _conv_oihw(ca.fc2.weight)}}}, jx)
    np.testing.assert_allclose(np.asarray(got), nchw_to_nhwc(want), atol=1e-6)

    se = mod.SEBlock(32).eval()
    with torch.no_grad():
        want = se(tx)
    lin0, lin2 = se.excitation[0], se.excitation[2]
    got = SEBlock().apply(
        {"params": {
            "excitation_0": {"kernel": jnp.asarray(lin0.weight.detach().numpy().T),
                             "bias": jnp.asarray(lin0.bias.detach().numpy())},
            "excitation_2": {"kernel": jnp.asarray(lin2.weight.detach().numpy().T),
                             "bias": jnp.asarray(lin2.bias.detach().numpy())},
        }}, jx)
    np.testing.assert_allclose(np.asarray(got), nchw_to_nhwc(want), atol=1e-5)

    sa = mod.SpatialAttentionCBAM(7).eval()
    with torch.no_grad():
        want = sa(tx)
    got = SpatialAttentionCBAM().apply(
        {"params": {"conv": {"kernel": _conv_oihw(sa.conv.weight)}}}, jx)
    np.testing.assert_allclose(np.asarray(got), nchw_to_nhwc(want), atol=1e-6)

    cb = mod.CBAM(32).eval()
    with torch.no_grad():
        want = cb(tx)
    got = CBAM().apply(
        {"params": {
            "channel_attention": {
                "fc1": {"kernel": _conv_oihw(cb.channel_attention.fc1.weight)},
                "fc2": {"kernel": _conv_oihw(cb.channel_attention.fc2.weight)},
            },
            "spatial_attention": {
                "conv": {"kernel": _conv_oihw(cb.spatial_attention.conv.weight)},
            },
        }}, jx)
    np.testing.assert_allclose(np.asarray(got), nchw_to_nhwc(want), atol=1e-5)


# ---------------------------------------------------------------------------
# single-backbone MaxViT zoo (networks.py:62-350)
# ---------------------------------------------------------------------------


def _maxvit_zoo_parity(ref, ours, x, n_maps, atol=2e-3):
    from pranet2_tpu.utils.torch_convert import maxvit_single_key_map

    _parity(ref, ours, maxvit_single_key_map(), x, n_maps, atol=atol)


def test_maxvit_seg_oracle_parity(rng):
    from pranet2_tpu.utils.torch_convert import (
        convert_state_dict, maxvit_single_key_map,
    )

    mod = load_ref_module("multiclass_seg/MERIT", "lib.networks")
    torch.manual_seed(6)
    with neutralized_loading():
        ref = mod.MaxViT(n_class=4, img_size=224, model_scale="tiny")
    ours = get_model("maxvit_seg", num_classes=4, img_size=224,
                     model_scale="tiny")
    x = rng.standard_normal((1, 1, 224, 224), dtype=np.float32)  # gray stem
    ref.eval()
    with torch.no_grad():
        want = ref(torch.from_numpy(x))  # single tensor, not a tuple
    fvars = convert_state_dict(to_numpy_sd(ref), maxvit_single_key_map())
    got = ours.apply(fvars, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.asarray(got), nchw_to_nhwc(want),
                               atol=2e-3, rtol=5e-3)


def test_maxvit4out_oracle_parity(rng):
    mod = load_ref_module("multiclass_seg/MERIT", "lib.networks")
    torch.manual_seed(7)
    with neutralized_loading():
        ref = mod.MaxViT4Out(n_class=4, img_size=224, model_scale="tiny")
    ours = get_model("maxvit4out", num_classes=4, img_size=224,
                     model_scale="tiny")
    x = rng.standard_normal((1, 3, 224, 224), dtype=np.float32)
    _maxvit_zoo_parity(ref, ours, x, 4)


def test_maxvit_cascade_oracle_parity(rng):
    mod = load_ref_module("multiclass_seg/MERIT", "lib.networks")
    torch.manual_seed(8)
    with neutralized_loading():
        ref = mod.MaxViT_CASCADE(n_class=4, img_size=224, model_scale="tiny")
    ours = get_model("maxvit_cascade", num_classes=4, img_size=224,
                     model_scale="tiny")
    x = rng.standard_normal((1, 3, 224, 224), dtype=np.float32)
    _maxvit_zoo_parity(ref, ours, x, 4)


def test_merit_parallel_dual_oracle_parity(rng):
    """MERIT_Parallel_dual (networks.py:514-614): two backbones at their own
    scales, shared dual decoder, summed maps."""
    mod = load_ref_module("multiclass_seg/MERIT", "lib.networks")
    torch.manual_seed(9)
    with neutralized_loading():
        ref = mod.MERIT_Parallel_dual(n_class=4, model_scale="tiny")
    ours = get_model("merit_parallel", num_classes=4, model_scale="tiny",
                     dual=True)
    x = rng.standard_normal((1, 3, 256, 256), dtype=np.float32)
    _parity(ref, ours, merit_key_map(), x, 8, atol=2e-3)


def test_mist_cam_single_oracle_parity(rng):
    """MIST_CAM non-dual path (networks.py:115-132): CASCADE-style heads."""
    mod = load_ref_module("multiclass_seg/MIST", "lib.networks")
    torch.manual_seed(10)
    with neutralized_loading():
        ref = mod.MIST_CAM(n_class=4, model_scale="small", dual=False)
    ours = get_model("mist_cam", num_classes=4, dual=False)
    x = rng.standard_normal((1, 3, 256, 256), dtype=np.float32)
    with _deterministic_torch_dropout():
        _parity(ref, ours, mist_key_map(), x, 4, split_mha=True, atol=2e-3)
