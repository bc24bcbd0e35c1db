"""MaxViT backbone + MERIT/MIST model tests (tiny shapes for CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pranet2_tpu.models import get_model


def n_params(v):
    return sum(p.size for p in jax.tree.leaves(v["params"]))


def test_maxvit_param_counts():
    from pranet2_tpu.models.backbones.maxvit import maxvit

    m = maxvit("maxvit_rmlp_small_rw_224")
    v = jax.eval_shape(m.init, jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    # timm maxvit_rmlp_small_rw_224 = 64.90M incl. 0.77M classifier
    assert abs(n_params(v) / 1e6 - 64.13) < 0.02
    m2 = maxvit("maxxvit_rmlp_small_rw_256")
    v2 = jax.eval_shape(m2.init, jax.random.key(0), jnp.zeros((1, 256, 256, 3)))
    # timm maxxvit_rmlp_small_rw_256 = 66.01M incl. 0.77M classifier
    assert abs(n_params(v2) / 1e6 - 65.24) < 0.02


def test_maxvit_stage_shapes_and_partitions(rng):
    from pranet2_tpu.models.backbones.maxvit import (
        grid_partition,
        grid_reverse,
        maxvit,
        window_partition,
        window_reverse,
    )

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4), dtype=np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 16, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(window_reverse(w, 4, (16, 16))),
                                  np.asarray(x))
    g = grid_partition(x, 4)
    assert g.shape == (2 * 16, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(grid_reverse(g, 4, (16, 16))),
                                  np.asarray(x))
    # grid partition strides: window [0,0] of grid == x[:, ::4, ::4]
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(x[0, ::4, ::4]))

    m = maxvit("maxvit_rmlp_tiny_rw_256")
    v = jax.jit(m.init)(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    f = jax.jit(m.apply)(v, jnp.zeros((1, 64, 64, 3)))
    assert [t.shape[1:] for t in f] == [
        (16, 16, 64), (8, 8, 128), (4, 4, 256), (2, 2, 512)
    ]


def test_relpos_mlp_bias_shape():
    from pranet2_tpu.models.backbones.maxvit import RelPosMlp, _rel_index

    idx = _rel_index(4)
    assert idx.shape == (16, 16)
    assert idx.max() == 48  # (2*4-1)^2 - 1
    assert idx[0, 0] == idx[5, 5]  # same relative offset -> same table entry
    m = RelPosMlp(window=4, num_heads=3)
    v = m.init(jax.random.key(0))
    bias = m.apply(v)
    assert bias.shape == (3, 16, 16)
    # symmetry: bias(i,j) uses coord -(coord(j,i))... table lookup consistency
    b = np.asarray(bias)
    assert np.isfinite(b).all()


@pytest.mark.parametrize("dual,n_out", [(True, 8), (False, 4)])
def test_merit_cascaded_contract(dual, n_out):
    m = get_model("merit_cascaded", num_classes=4, model_scale="tiny",
                  dual=dual, img_size_s1=(64, 64), img_size_s2=(32, 32))
    x = jnp.zeros((1, 64, 64, 1))
    v = jax.jit(m.init)(jax.random.key(0), x)
    outs = jax.jit(m.apply)(v, x)
    assert len(outs) == n_out
    assert all(o.shape == (1, 64, 64, 4) for o in outs)


def test_merit_parallel_contract():
    m = get_model("merit_parallel", num_classes=4, model_scale="tiny",
                  dual=True, img_size_s1=(64, 64), img_size_s2=(32, 32))
    x = jnp.zeros((1, 48, 48, 3))  # odd input size exercises resize paths
    v = jax.jit(m.init)(jax.random.key(0), x)
    outs = jax.jit(m.apply)(v, x)
    assert len(outs) == 8 and outs[0].shape == (1, 48, 48, 4)


@pytest.mark.parametrize("dual,n_out", [(True, 8), (False, 4)])
def test_mist_cam_contract(dual, n_out):
    m = get_model("mist_cam", num_classes=4, dual=dual, img_size_s1=(64, 64))
    x = jnp.zeros((1, 64, 64, 1))
    v = jax.jit(m.init)(jax.random.key(0), x)
    outs = jax.jit(m.apply)(v, x)
    assert len(outs) == n_out
    assert all(o.shape == (1, 64, 64, 4) for o in outs)


def test_merit_train_grads_flow(rng):
    from pranet2_tpu.losses import mutation_loss

    m = get_model("merit_cascaded", num_classes=4, model_scale="tiny",
                  dual=True, img_size_s1=(64, 64), img_size_s2=(32, 32))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 1), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (2, 64, 64)))
    v = jax.jit(m.init)(jax.random.key(0), x)

    def loss_fn(params):
        outs, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        return mutation_loss(list(outs[:4]), labels, 4, list(outs[4:]))

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(v["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gnorm > 0


def test_maxvit_drop_path(rng):
    """Stochastic depth (maxxvit_4out.py:1611,1636): rate 0 = identity knob;
    rate > 0 is per-sample stochastic in train, inert in eval."""
    from pranet2_tpu.models.backbones.maxvit import MaxxVit

    kw = dict(embed_dim=(32, 64, 96, 128), depths=(1, 1, 1, 1),
              stem_width=(16, 32), conv_type="mbconv", init_values=1e-6)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    m0 = MaxxVit(**kw, drop_path_rate=0.0)
    variables = m0.init(jax.random.key(0), x)
    md = MaxxVit(**kw, drop_path_rate=0.5)
    # eval: drop-path inert (same params — it has none; allclose because the
    # two module configs compile to different executables/fusions)
    out_eval = md.apply(variables, x)
    out0_eval = m0.apply(variables, x)
    for a, b in zip(out_eval, out0_eval):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def train_out(model, seed):
        outs, _ = model.apply(
            variables, x, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(seed)},
        )
        return np.asarray(outs[-1])

    # rate 0 across rngs: only the RelPosMlp's own 0.125 dropout moves
    # (tiny); rate .5 drops whole residual branches (order-1 changes)
    small = np.abs(train_out(m0, 1) - train_out(m0, 2)).max()
    big = np.abs(train_out(md, 1) - train_out(md, 2)).max()
    assert big > 0.05, big
    assert big > 10 * small, (big, small)
    # fixed rng: bitwise reproducible (same executable)
    np.testing.assert_array_equal(train_out(md, 1), train_out(md, 1))


def test_maxvit_seg_contract(rng):
    """Plain MaxViT single-map model (networks.py:62-107)."""
    m = get_model("maxvit_seg", num_classes=4, img_size=224,
                  model_scale="tiny")
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 1), dtype=np.float32))
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 64, 64, 4)
