"""Packed (space-to-depth) Res2Net layer-1: exactness + tree invariance.

The packed path (ops/res2_packed.py) is an exact restructure of layer 1
(reference ``binary_seg/lib/Res2Net_v1b.py:36-141``); these tests pin
(a) numerical parity against the module chain at f32 and bf16, (b)
checkpoint-layout invariance (the flag must not change the param tree),
(c) the stage-block pieces individually (avg pool, downsample), (d) the
train path is untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pranet2_tpu.models.backbones.res2net import Res2Net


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_l1_packed_matches_module_path(dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), np.float32))
    base = Res2Net(layers=(3, 1, 1, 1), dtype=dtype, s2d_stem=False,
                   l1_packed=False)
    packed = Res2Net(layers=(3, 1, 1, 1), dtype=dtype, s2d_stem=False,
                     l1_packed=True)
    v = base.init(jax.random.key(0), x)
    outs_a = base.apply(v, x)
    outs_b = packed.apply(v, x)
    # TPU f32 convs run through the MXU at bf16-tap precision by default,
    # so the two exact-in-real-arithmetic compositions round differently;
    # the strict 2e-5 f32 gate is a CPU property.  bf16 full-model parity
    # on-chip is gated by test_l1pack_full_model_bf16_tpu.
    on_tpu = jax.default_backend() == "tpu"
    tol = (2e-2 if on_tpu else 2e-5) if dtype == jnp.float32 else 0.05
    for a, b in zip(outs_a, outs_b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < tol


def test_l1_packed_with_nontrivial_bn_stats(rng):
    """Folded-BN parity with non-default running stats (the real case)."""
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    base = Res2Net(layers=(2, 1, 1, 1), s2d_stem=False, l1_packed=False)
    packed = Res2Net(layers=(2, 1, 1, 1), s2d_stem=False, l1_packed=True)
    v = base.init(jax.random.key(1), x)
    # run a train step to move the BN stats off their init values
    _, upd = base.apply(v, x, True, mutable=["batch_stats"])
    v = {**v, "batch_stats": upd["batch_stats"]}
    a = base.apply(v, x)
    b = packed.apply(v, x)
    for ai, bi in zip(a, b):
        np.testing.assert_allclose(np.asarray(ai), np.asarray(bi),
                                   atol=2e-4, rtol=2e-4)


def test_l1_packed_param_tree_invariant():
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v0 = Res2Net(layers=(2, 1, 1, 1), l1_packed=False).init(
        jax.random.key(0), x)
    v1 = Res2Net(layers=(2, 1, 1, 1), l1_packed=True).init(
        jax.random.key(0), x)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert a.shape == b.shape


def test_l1_packed_train_path_unchanged(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    m = Res2Net(layers=(1, 1, 1, 1), l1_packed=True)
    v = m.init(jax.random.key(0), x)
    _, upd = m.apply(v, x, True, mutable=["batch_stats"])
    m0 = Res2Net(layers=(1, 1, 1, 1), l1_packed=False)
    _, upd0 = m0.apply(v, x, True, mutable=["batch_stats"])
    for a, b in zip(jax.tree.leaves(upd), jax.tree.leaves(upd0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_avgpool3x3_s1_packed_matches_op(rng):
    from pranet2_tpu.ops import avg_pool
    from pranet2_tpu.ops.res2_packed import avgpool3x3_s1_q, pack2, unpack2

    x = jnp.asarray(rng.standard_normal((2, 10, 8, 5)), jnp.float32)
    want = avg_pool(x, 3, 1, 1)  # count_include_pad=True, like torch
    got = unpack2(avgpool3x3_s1_q(pack2(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_pack_unpack_roundtrip(rng):
    from pranet2_tpu.ops.res2_packed import pack2, unpack2

    x = jnp.asarray(rng.standard_normal((3, 6, 8, 7)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(unpack2(pack2(x))),
                                  np.asarray(x))


def test_grouped_stage_convs_match_module_path(monkeypatch):
    """Stage blocks' independent split convs as one feature-grouped conv
    (the 'gstage' component) vs the plain module chain, bf16."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), np.float32))
    m = Res2Net(layers=(2, 2, 1, 1), dtype=jnp.bfloat16)
    monkeypatch.setenv("PRANET2_NO_FUSED", "1")
    v = m.init(jax.random.key(0), x)
    outs_a = m.apply(v, x)
    monkeypatch.delenv("PRANET2_NO_FUSED")
    monkeypatch.setenv("PRANET2_FUSED", "gstage")
    outs_b = Res2Net(layers=(2, 2, 1, 1), dtype=jnp.bfloat16).apply(v, x)
    for a, b in zip(outs_a, outs_b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 0.05


def test_grouped_stage_param_tree_invariant(monkeypatch):
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    monkeypatch.setenv("PRANET2_NO_FUSED", "1")
    v0 = Res2Net(layers=(1, 1, 1, 1), dtype=jnp.bfloat16).init(
        jax.random.key(0), x)
    monkeypatch.delenv("PRANET2_NO_FUSED")
    monkeypatch.setenv("PRANET2_FUSED", "gstage")
    v1 = Res2Net(layers=(1, 1, 1, 1), dtype=jnp.bfloat16).init(
        jax.random.key(0), x)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert a.shape == b.shape


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_boundary_free_packed_matches_module_path(dtype):
    """s2d stem emitting packed + packed layer 1 + layer-2 stage block
    consuming packed (the v3 zero-relayout route) vs the module chain."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), np.float32))
    base = Res2Net(layers=(3, 4, 1, 1), dtype=dtype, s2d_stem=False,
                   l1_packed=False)
    packed = Res2Net(layers=(3, 4, 1, 1), dtype=dtype, s2d_stem=True,
                     l1_packed=True)
    v = base.init(jax.random.key(0), x)
    outs_a = base.apply(v, x)
    outs_b = packed.apply(v, x)
    on_tpu = jax.default_backend() == "tpu"
    tol = (2e-2 if on_tpu else 5e-5) if dtype == jnp.float32 else 0.05
    for a, b in zip(outs_a, outs_b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < tol


def test_stem_packed_out_is_pack2_of_unpacked(rng):
    from pranet2_tpu.ops.res2_block import fold_bn
    from pranet2_tpu.ops.res2_packed import pack2
    from pranet2_tpu.ops.stem import s2d_stem

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * 0.2, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * 0.1, jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 32, 64)) * 0.1, jnp.float32)
    fs = [fold_bn(jnp.ones((c,)), jnp.zeros((c,)),
                  jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
                  jnp.ones((c,)) + 0.5) for c in (32, 32, 64)]
    flat = s2d_stem(x, k1, *fs[0], k2, *fs[1], k3, *fs[2])
    packed = s2d_stem(x, k1, *fs[0], k2, *fs[1], k3, *fs[2],
                      packed_out=True)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(pack2(flat)),
                               atol=1e-6, rtol=1e-6)


def test_stage_s2_from_packed_pieces(rng):
    """conv3x3 stride-2 and both pools reading the packed grid vs the
    plain ops on the unpacked map."""
    import jax.lax as lax

    from pranet2_tpu.ops import avg_pool
    from pranet2_tpu.ops.res2_packed import (
        avgpool3x3_s2_from_packed, conv3x3_s2_from_packed, pack2, quad_mean,
    )

    x = jnp.asarray(rng.standard_normal((2, 12, 8, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 6)) * 0.2, jnp.float32)
    want = lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_s2_from_packed(pack2(x), k, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    want = avg_pool(x, 3, 2, 1)  # count_include_pad=True, like torch
    got = avgpool3x3_s2_from_packed(pack2(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)

    want = avg_pool(x, 2, 2, 0, count_include_pad=False, ceil_mode=True)
    got = quad_mean(pack2(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled parity on the chip")
def test_l1pack_full_model_bf16_tpu(rng, monkeypatch):
    """PraNet-V2 bf16 with s2d+l1pack vs the plain-XLA bf16 model on the
    chip at the benchmark shape."""
    from pranet2_tpu.models import get_model

    x = jnp.asarray(rng.standard_normal((2, 352, 352, 3)), jnp.float32)
    monkeypatch.setenv("PRANET2_FUSED", "s2d,l1pack")
    m = get_model("pranet_v2", num_class=1, dtype=jnp.bfloat16)
    v = jax.jit(m.init)(jax.random.key(0), x)
    fast = [np.asarray(o, np.float32) for o in jax.jit(m.apply)(v, x)]
    monkeypatch.setenv("PRANET2_NO_FUSED", "1")
    m2 = get_model("pranet_v2", num_class=1, dtype=jnp.bfloat16)
    plain = [np.asarray(o, np.float32) for o in jax.jit(m2.apply)(v, x)]
    for a, b in zip(fast, plain):
        scale = max(np.abs(b).max(), 1.0)
        assert np.abs(a - b).max() / scale < 0.08


def test_tailfuse_matches_module_path(monkeypatch):
    """conv3+BN3+residual+ReLU fused tail (the 'tailfuse' component) vs the
    plain module chain, bf16 (CPU exercises the wiring + fallback; the
    kernel body is pinned by tests/test_pallas_interpret.py)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), np.float32))
    m = Res2Net(layers=(2, 2, 1, 1), dtype=jnp.bfloat16)
    monkeypatch.setenv("PRANET2_NO_FUSED", "1")
    v = m.init(jax.random.key(0), x)
    outs_a = m.apply(v, x)
    monkeypatch.delenv("PRANET2_NO_FUSED")
    monkeypatch.setenv("PRANET2_FUSED", "tailfuse")
    outs_b = Res2Net(layers=(2, 2, 1, 1), dtype=jnp.bfloat16).apply(v, x)
    for a, b in zip(outs_a, outs_b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 0.05


def test_tailfuse_param_tree_invariant(monkeypatch):
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    monkeypatch.setenv("PRANET2_NO_FUSED", "1")
    v0 = Res2Net(layers=(1, 1, 1, 1), dtype=jnp.bfloat16).init(
        jax.random.key(0), x)
    monkeypatch.delenv("PRANET2_NO_FUSED")
    monkeypatch.setenv("PRANET2_FUSED", "tailfuse")
    v1 = Res2Net(layers=(1, 1, 1, 1), dtype=jnp.bfloat16).init(
        jax.random.key(0), x)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert a.shape == b.shape


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU kernel needs a TPU backend")
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_res2_tail_kernel_matches_reference_tpu(dtype):
    """Compiled fused_tail kernel == the XLA composition at a production
    layer-1 shape (88^2, 104 -> 256 ch)."""
    from pranet2_tpu.ops import res2_tail

    rng = np.random.default_rng(7)
    cin, cout = 104, 256
    mk = lambda s, sc=0.2: jnp.asarray(rng.standard_normal(s) * sc,
                                       np.float32)
    cc = jnp.asarray(rng.standard_normal((2, 88, 88, cin)), dtype)
    short = jnp.asarray(rng.standard_normal((2, 88, 88, cout)), dtype)
    args = (cc, short, jnp.asarray(mk((cin, cout))),
            jnp.asarray(mk((cout,)) + 1.0), jnp.asarray(mk((cout,))))
    got = jax.jit(res2_tail.fused_tail)(*args)
    want = jax.jit(res2_tail.reference_tail)(*args)
    a = np.asarray(got, np.float32)
    b = np.asarray(want, np.float32)
    tol = 1e-5 if dtype == jnp.float32 else 0.02
    assert np.abs(a - b).max() / max(np.abs(b).max(), 1e-6) < tol


def test_conv3x3_dot_exact():
    """Dot-form 3x3 conv == lax conv (f32, HIGHEST precision on both)."""
    from jax import lax

    from pranet2_tpu.ops.splitconv import conv3x3_dot

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 9, 7, 6)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 6, 5)) * 0.2, jnp.float32)
    got = conv3x3_dot(x, k)
    want = lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_splitmm_matches_module_path(monkeypatch):
    """Normal blocks' split convs in dot form (the 'splitmm' component) vs
    the plain module chain, bf16 — wiring + param-tree invariance."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), np.float32))
    m = Res2Net(layers=(2, 2, 1, 1), dtype=jnp.bfloat16)
    monkeypatch.setenv("PRANET2_NO_FUSED", "1")
    v = m.init(jax.random.key(0), x)
    outs_a = m.apply(v, x)
    monkeypatch.delenv("PRANET2_NO_FUSED")
    monkeypatch.setenv("PRANET2_FUSED", "splitmm")
    m2 = Res2Net(layers=(2, 2, 1, 1), dtype=jnp.bfloat16)
    v2 = m2.init(jax.random.key(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    outs_b = m2.apply(v, x)
    for a, b in zip(outs_a, outs_b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 0.05


@pytest.mark.parametrize("shape,pad,dil", [
    ((3, 3), (1, 1), 1), ((1, 3), (0, 1), 1), ((3, 1), (1, 0), 1),
    ((3, 3), (3, 3), 3), ((3, 3), (5, 5), 5), ((1, 7), (0, 3), 1),
])
def test_conv_dot_exact_shapes(shape, pad, dil):
    """conv_dot == lax conv for every decoder kernel geometry."""
    from jax import lax

    from pranet2_tpu.ops.splitconv import conv_dot

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 13, 11, 6)), jnp.float32)
    k = jnp.asarray(rng.standard_normal(shape + (6, 5)) * 0.2, jnp.float32)
    got = conv_dot(x, k, pad, dil)
    want = lax.conv_general_dilated(
        x, k, (1, 1), ((pad[0], pad[0]), (pad[1], pad[1])),
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_decdot_convbn_param_tree_and_parity(monkeypatch):
    """ConvBN's dot-form path (the 'decdot' component): same param tree
    and bf16-tolerance outputs vs the module conv."""
    from pranet2_tpu.nn import ConvBN

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32), np.float32))
    m = ConvBN(32, 3, padding=3, dilation=3, dtype=jnp.bfloat16)
    monkeypatch.setenv("PRANET2_NO_FUSED", "1")
    v = m.init(jax.random.key(0), x)
    a = m.apply(v, x)
    monkeypatch.delenv("PRANET2_NO_FUSED")
    monkeypatch.setenv("PRANET2_FUSED", "decdot")
    v2 = ConvBN(32, 3, padding=3, dilation=3, dtype=jnp.bfloat16).init(
        jax.random.key(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    b = ConvBN(32, 3, padding=3, dilation=3, dtype=jnp.bfloat16).apply(v, x)
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 0.03
