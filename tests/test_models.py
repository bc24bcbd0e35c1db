"""Model-level structural tests: shapes, param counts, gradient flow.

Param counts are checked against the published torch model sizes — the same
invariant the reference smoke-__main__s rely on (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pranet2_tpu.models import get_model, list_models


def n_params(variables):
    return sum(p.size for p in jax.tree.leaves(variables["params"]))


def test_registry_lists_binary_models():
    avail = list_models()
    for name in ("pranet_v1", "pranet_v2", "pvt_pranet_v1", "pvt_pranet_v2"):
        assert name in avail


def test_res2net_param_count_and_shapes():
    from pranet2_tpu.models.backbones.res2net import Res2Net

    bb = Res2Net()
    v = jax.jit(bb.init)(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    # torch res2net50_v1b_26w_4s = 25.72M incl. 2.05M fc -> 23.67M features
    assert abs(n_params(v) / 1e6 - 23.669) < 0.01
    f = jax.jit(bb.apply)(v, jnp.zeros((1, 352, 352, 3)))
    assert [t.shape for t in f] == [
        (1, 88, 88, 256), (1, 44, 44, 512), (1, 22, 22, 1024), (1, 11, 11, 2048)
    ]


def test_pvtv2_param_count_and_shapes():
    from pranet2_tpu.models.backbones.pvtv2 import pvt_v2

    bb = pvt_v2("b2")
    v = jax.jit(bb.init)(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    # torch pvt_v2_b2 = 25.36M incl. 0.51M head -> 24.85M backbone
    assert abs(n_params(v) / 1e6 - 24.850) < 0.01
    f = jax.jit(bb.apply)(v, jnp.zeros((1, 352, 352, 3)))
    assert [t.shape[1:] for t in f] == [
        (88, 88, 64), (44, 44, 128), (22, 22, 320), (11, 11, 512)
    ]


@pytest.mark.parametrize("name,n_out", [("pranet_v1", 4), ("pranet_v2", 8)])
def test_pranet_output_contract(name, n_out):
    m = get_model(name) if n_out == 4 else get_model(name, num_class=1)
    x = jnp.zeros((2, 64, 64, 3))
    v = jax.jit(m.init)(jax.random.key(0), x)
    outs = jax.jit(m.apply)(v, x)
    assert len(outs) == n_out
    for o in outs:
        assert o.shape == (2, 64, 64, 1)


def test_pranet_v2_grayscale_stem():
    m = get_model("pranet_v2", num_class=1)
    x = jnp.zeros((1, 64, 64, 1))
    v = jax.jit(m.init)(jax.random.key(0), x)
    assert "stem_conv" in v["params"]
    outs = jax.jit(m.apply)(v, x)
    assert outs[0].shape == (1, 64, 64, 1)


def test_pranet_v2_train_step_updates_stats_and_grads(rng):
    from pranet2_tpu.losses import structure_loss

    m = get_model("pranet_v2", num_class=1)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    gts = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.5).astype(np.float32))
    v = jax.jit(m.init)(jax.random.key(0), x)

    def loss_fn(params):
        outs, updates = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, True, mutable=["batch_stats"],
        )
        fg, bg = outs[:4], outs[4:]
        loss = sum(
            structure_loss(f, b, gts, 1 - gts) for f, b in zip(fg, bg)
        )
        return loss, updates

    (loss, updates), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(v["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gnorm > 0
    # batch stats changed
    old = v["batch_stats"]["backbone"]["bn1"]["mean"]
    new = updates["batch_stats"]["backbone"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_pranet_v2_pallas_gate_equivalent(rng):
    m1 = get_model("pranet_v2", num_class=1)
    m2 = get_model("pranet_v2", num_class=1, use_pallas_gate=True)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3), dtype=np.float32))
    v = jax.jit(m1.init)(jax.random.key(0), x)
    o1 = jax.jit(m1.apply)(v, x)
    o2 = jax.jit(m2.apply)(v, x)
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pvt_pranet_v2_constructs():
    m = get_model("pvt_pranet_v2", num_class=1)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(m.init)(jax.random.key(0), x)
    outs = jax.jit(m.apply)(v, x)
    assert len(outs) == 8 and outs[0].shape == (1, 64, 64, 1)
