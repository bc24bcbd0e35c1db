"""Full-model oracle parity: binary-seg families vs the reference torch code.

The de-facto regression test of the reference repo is same-checkpoint
cross-framework metric parity (binary_seg/jittor/README.md:23-84).  These
tests do the stronger, runnable-here version: instantiate the *actual*
reference torch models (random init, eval mode), export their state_dict,
convert with pranet2_tpu.utils.torch_convert, and assert the JAX forward
matches the torch forward elementwise.  This validates converter + NHWC
architecture + resize semantics end-to-end for every binary family.

Reference models: /root/reference/binary_seg/lib/pranet.py:268 (PraNet_V2),
:129 (PVT_PraNet_V2); lib/PraNet_Res2Net.py:101 (PraNet), :188 (PVT_PraNet).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from oracle_shims import (
    load_ref_module,
    nchw_to_nhwc,
    neutralized_loading,
    to_numpy_sd,
)
from pranet2_tpu.models import get_model
from pranet2_tpu.utils.torch_convert import convert_state_dict, pranet_key_map
import pytest

pytestmark = pytest.mark.oracle

# f32 conv/reduction ordering differs between XLA:CPU and torch; a ~50-layer
# net accumulates a few 1e-4-scale absolute deviations on O(10) logits.
ATOL, RTOL = 5e-4, 5e-3


def _parity(ref_model, jax_model, key_map, x_nchw, n_maps):
    ref_model.eval()
    with torch.no_grad():
        ref_outs = ref_model(torch.from_numpy(x_nchw))
    assert len(ref_outs) == n_maps

    fvars = convert_state_dict(to_numpy_sd(ref_model), key_map)
    x = jnp.asarray(np.moveaxis(x_nchw, 1, -1))
    jax_outs = jax_model.apply(fvars, x)
    assert len(jax_outs) == n_maps

    for i, (r, j) in enumerate(zip(ref_outs, jax_outs)):
        np.testing.assert_allclose(
            np.asarray(j), nchw_to_nhwc(r), atol=ATOL, rtol=RTOL,
            err_msg=f"map {i}",
        )


def _input(rng, c, size=64):
    return rng.standard_normal((2, c, size, size), dtype=np.float32)


def test_pranet_v1_oracle_parity(rng):
    mod = load_ref_module("binary_seg", "lib.PraNet_Res2Net")
    torch.manual_seed(0)
    with neutralized_loading():
        ref = mod.PraNet(channel=32)
    _parity(ref, get_model("pranet_v1"), pranet_key_map("v1", "res2net50"),
            _input(rng, 3), 4)


def test_pvt_pranet_v1_oracle_parity(rng):
    mod = load_ref_module("binary_seg", "lib.PraNet_Res2Net")
    torch.manual_seed(1)
    with neutralized_loading():
        ref = mod.PVT_PraNet(channel=32)
    _parity(ref, get_model("pvt_pranet_v1"), pranet_key_map("v1", "pvt_v2_b2"),
            _input(rng, 3), 4)


def test_pranet_v2_oracle_parity(rng):
    mod = load_ref_module("binary_seg", "lib.pranet")
    torch.manual_seed(2)
    with neutralized_loading():
        ref = mod.PraNet_V2(channel=32, num_class=1)
    _parity(ref, get_model("pranet_v2", num_class=1),
            pranet_key_map("v2", "res2net50"), _input(rng, 3), 8)


def test_pvt_pranet_v2_oracle_parity(rng):
    mod = load_ref_module("binary_seg", "lib.pranet")
    torch.manual_seed(3)
    with neutralized_loading():
        ref = mod.PVT_PraNet_V2(num_class=1)
    _parity(ref, get_model("pvt_pranet_v2", num_class=1),
            pranet_key_map("v2", "pvt_v2_b2"), _input(rng, 3), 8)


def test_pvt_pranet_v2_grayscale_stem_oracle_parity(rng):
    """1-channel input exercises the conv 1→3 stem branch (pranet.py:190)."""
    mod = load_ref_module("binary_seg", "lib.pranet")
    torch.manual_seed(4)
    with neutralized_loading():
        ref = mod.PVT_PraNet_V2(num_class=1)
    _parity(ref, get_model("pvt_pranet_v2", num_class=1),
            pranet_key_map("v2", "pvt_v2_b2"), _input(rng, 1), 8)


def test_pranet_v2_dataparallel_checkpoint_roundtrip(rng, tmp_path):
    """A ``.pth`` saved from ``nn.DataParallel(model)`` (every key prefixed
    ``module.`` — how the reference's multi-GPU trainers save,
    multiclass_seg/EMCAD/trainer.py:77) must load+convert identically to the
    bare state_dict through the real disk path."""
    from pranet2_tpu.utils.torch_convert import load_torch_state_dict

    mod = load_ref_module("binary_seg", "lib.pranet")
    torch.manual_seed(6)
    with neutralized_loading():
        ref = mod.PraNet_V2(channel=32, num_class=1)
    ref.eval()
    path = tmp_path / "dp.pth"
    torch.save(torch.nn.DataParallel(ref).state_dict(), path)

    km = pranet_key_map("v2", "res2net50")
    got = convert_state_dict(load_torch_state_dict(str(path)), km)
    want = convert_state_dict(to_numpy_sd(ref), km)
    jax.tree.map(np.testing.assert_array_equal, got, want)

    # and the converted tree actually runs the model
    x = jnp.asarray(np.moveaxis(_input(rng, 3), 1, -1))
    outs = get_model("pranet_v2", num_class=1).apply(got, x)
    assert len(outs) == 8


def test_cranet_legacy_oracle_parity(rng):
    """Legacy 'CRANet' PraNet_ResNet (binary_seg/lib/PraNet_ResNet.py:102):
    PraNet-V1 heads over a plain ResNet-50 encoder."""
    mod = load_ref_module("binary_seg", "lib.PraNet_ResNet")
    mod.CRANet.initialize_weights = lambda self: None  # no ckpt downloads
    torch.manual_seed(5)
    with neutralized_loading():
        ref = mod.CRANet(channel=32)
    _parity(ref, get_model("pranet_v1_resnet"),
            pranet_key_map("v1", "resnet50"), _input(rng, 3), 4)
