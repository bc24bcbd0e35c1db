"""Space-to-depth stem + fused Bottle2neck: parity and param-tree tests.

The s2d stem (ops/stem.py) is an exact restructure of the v1b deep stem
(reference ``binary_seg/lib/Res2Net_v1b.py:101-112``); these tests pin (a)
numerical parity against the module chain, (b) checkpoint-layout
invariance (the fused/s2d flags must not change the param tree, or the
``.pth`` converter breaks), (c) the fused Bottle2neck fallback parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pranet2_tpu.models.backbones.res2net import Res2Net


def _init_apply(model, x, rngs=0):
    v = model.init(jax.random.key(rngs), x)
    return v, model.apply(v, x)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_s2d_stem_matches_module_path(dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), np.float32))
    base = Res2Net(layers=(1, 1, 1, 1), dtype=dtype, s2d_stem=False)
    s2d = Res2Net(layers=(1, 1, 1, 1), dtype=dtype, s2d_stem=True)
    v = base.init(jax.random.key(0), x)
    outs_a = base.apply(v, x)
    outs_b = s2d.apply(v, x)
    tol = 1e-5 if dtype == jnp.float32 else 0.05
    for a, b in zip(outs_a, outs_b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < tol


def test_s2d_stem_param_tree_invariant():
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v0 = Res2Net(layers=(1, 1, 1, 1), s2d_stem=False).init(jax.random.key(0), x)
    v1 = Res2Net(layers=(1, 1, 1, 1), s2d_stem=True).init(jax.random.key(0), x)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert a.shape == b.shape


def test_fused_bottle2neck_param_tree_invariant():
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v0 = Res2Net(layers=(2, 1, 1, 1), fused=False).init(jax.random.key(0), x)
    v1 = Res2Net(layers=(2, 1, 1, 1), fused=True).init(jax.random.key(0), x)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert a.shape == b.shape


def test_fused_bottle2neck_fallback_parity():
    # off-TPU the fused path routes through reference_bottle2neck; it must
    # match the module chain at the compute dtype's resolution
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), np.float32))
    base = Res2Net(layers=(2, 1, 1, 1), dtype=jnp.bfloat16, fused=False,
                   s2d_stem=False)
    fused = Res2Net(layers=(2, 1, 1, 1), dtype=jnp.bfloat16, fused=True,
                    s2d_stem=False)
    v = base.init(jax.random.key(0), x)
    outs_a = base.apply(v, x)
    outs_b = fused.apply(v, x)
    for a, b in zip(outs_a, outs_b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 0.06


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU kernel needs a TPU backend")
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_s2dmax_kernel_matches_reference_tpu(dtype):
    """Compiled s2dmax maxpool kernel == the XLA 9-shifted-slice max,
    bit-exact (max is order-preserving; the kernel computes in f32 and
    casts back).  Shape = the production PraNet-V2 352^2 grid."""
    from pranet2_tpu.ops import stem

    rng = np.random.default_rng(3)
    co = 64
    z = jnp.asarray(rng.standard_normal((2, 88, 88, 4 * co), np.float32),
                    dtype)
    got = jax.jit(lambda v: stem._maxpool_s2d_pallas(v, co))(z)
    rows = ((1, 1), (0, 0), (0, 1))
    want = None
    for dr, a in rows:
        for dc, b in rows:
            term = stem._shifted(z[..., (a * 2 + b) * co:][..., :co], dr, dc)
            want = term if want is None else jnp.maximum(want, term)
    want = jax.jit(lambda v: v)(want)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_s2d_train_path_unchanged():
    # train=True must take the module path (batch stats of the unpacked
    # intermediates) regardless of the s2d flag
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), np.float32))
    m = Res2Net(layers=(1, 1, 1, 1), s2d_stem=True)
    v = m.init(jax.random.key(0), x)
    out, upd = m.apply(v, x, True, mutable=["batch_stats"])
    m0 = Res2Net(layers=(1, 1, 1, 1), s2d_stem=False)
    out0, upd0 = m0.apply(v, x, True, mutable=["batch_stats"])
    for a, b in zip(jax.tree.leaves(upd), jax.tree.leaves(upd0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
