"""Space-to-depth PVTv2 stage-1 patch embed (ops/patch_embed.py):
exactness vs the plain conv, param-tree invariance, full-backbone parity.
Reference behavior: ``binary_seg/lib/pvtv2.py:154`` (OverlapPatchEmbed,
7x7 stride-4 pad-3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pranet2_tpu.models.backbones.pvtv2 import PVT_CONFIGS, PVTv2


def test_s2d_patch_embed_matches_conv():
    from pranet2_tpu.ops.patch_embed import s2d_patch_embed

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((7, 7, 3, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, k, (4, 4), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = s2d_patch_embed(x, k, b, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pvtv2_pes2d_full_backbone_parity(dtype, monkeypatch):
    monkeypatch.setenv("PRANET2_FUSED", "pes2d")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3), np.float32))
    cfg = dict(PVT_CONFIGS["b0"], depths=(1, 1, 1, 1))
    base = PVTv2(**cfg, dtype=dtype, fused_mlp=False, fused_attn=False)
    v = base.init(jax.random.key(0), x)
    monkeypatch.setenv("PRANET2_NO_FUSED", "1")
    outs_a = PVTv2(**cfg, dtype=dtype, fused_mlp=False,
                   fused_attn=False).apply(v, x)
    monkeypatch.delenv("PRANET2_NO_FUSED")
    outs_b = PVTv2(**cfg, dtype=dtype, fused_mlp=False,
                   fused_attn=False).apply(v, x)
    tol = 1e-5 if dtype == jnp.float32 else 0.05
    for a, b in zip(outs_a, outs_b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < tol


def test_pvtv2_pes2d_param_tree_invariant(monkeypatch):
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    cfg = dict(PVT_CONFIGS["b0"], depths=(1, 1, 1, 1))
    monkeypatch.setenv("PRANET2_NO_FUSED", "1")
    v0 = PVTv2(**cfg, dtype=jnp.bfloat16).init(jax.random.key(0), x)
    monkeypatch.delenv("PRANET2_NO_FUSED")
    monkeypatch.setenv("PRANET2_FUSED", "pes2d")
    v1 = PVTv2(**cfg, dtype=jnp.bfloat16).init(jax.random.key(0), x)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert a.shape == b.shape
