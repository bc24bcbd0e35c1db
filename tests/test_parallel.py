"""Sharded-execution equivalence tests over the virtual 8-device mesh.

The TPU analogue of the reference's SyncBN distributed-equivalence suite
(``binary_seg/lib/nn/modules/tests/test_sync_batchnorm.py``): a data-parallel
step over 8 devices must produce the same loss, gradients, and BN statistics
as the same global batch on one device — GSPMD's global-batch BN *is* SyncBN.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pranet2_tpu.losses import structure_loss
from pranet2_tpu.models import get_model
from pranet2_tpu.parallel import batch_sharding, make_mesh, replicated_sharding


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


@pytest.fixture(scope="module")
def small_model_and_batch():
    rng = np.random.default_rng(0)
    model = get_model("pranet_v2", num_class=1)
    images = rng.standard_normal((8, 64, 64, 3), dtype=np.float32)
    gts = (rng.random((8, 64, 64, 1)) > 0.5).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.asarray(images))
    return model, variables, images, gts


def _loss_and_grads(model, variables, images, gts):
    def loss_fn(params):
        outs, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            images, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0)},
        )
        loss = sum(
            structure_loss(f, b, gts, 1.0 - gts)
            for f, b in zip(outs[:4], outs[4:])
        )
        return loss, updates["batch_stats"]

    return jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        variables["params"]
    )


def test_sharded_step_equals_single_device(small_model_and_batch):
    model, variables, images, gts = small_model_and_batch

    # single-device reference (global batch on device 0)
    d0 = jax.devices()[0]
    (loss_ref, stats_ref), grads_ref = _loss_and_grads(
        model,
        jax.device_put(variables, d0),
        jax.device_put(jnp.asarray(images), d0),
        jax.device_put(jnp.asarray(gts), d0),
    )

    # 8-way data parallel
    mesh = make_mesh()
    shard = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    (loss_dp, stats_dp), grads_dp = _loss_and_grads(
        model,
        jax.device_put(variables, rep),
        jax.device_put(jnp.asarray(images), shard),
        jax.device_put(jnp.asarray(gts), shard),
    )

    assert abs(float(loss_ref) - float(loss_dp)) < 1e-4
    # gradients identical (all-reduce vs local compute)
    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
    # BN batch statistics computed over the GLOBAL batch (SyncBN semantics)
    a = np.asarray(jax.tree.leaves(stats_ref)[0])
    b = np.asarray(jax.tree.leaves(stats_dp)[0])
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def _merit_loss_and_grads(model, variables, images, labels, device_or_sharding):
    from pranet2_tpu.losses import mutation_loss

    params = jax.device_put(variables["params"], device_or_sharding[0])
    rest = {k: jax.device_put(v, device_or_sharding[0])
            for k, v in variables.items() if k != "params"}
    images = jax.device_put(jnp.asarray(images), device_or_sharding[1])
    labels = jax.device_put(jnp.asarray(labels), device_or_sharding[1])

    def loss_fn(p):
        out = model.apply(
            {"params": p, **rest}, images, True,
            mutable=list(rest.keys()),
            rngs={"dropout": jax.random.key(7)},
        )
        o = out[0] if isinstance(out, tuple) else out
        return mutation_loss(o[:4], labels, 4, o[4:])

    return jax.jit(jax.value_and_grad(loss_fn))(params)


def test_sharded_merit_train_step_equals_single_device():
    """8-device DP MERIT (attention family) step == single-device step.

    The attention-family analogue of the SyncBN equivalence above
    (reference bar: binary_seg/lib/nn/modules/tests/test_sync_batchnorm.py:
    79-107): MaxViT window/grid attention, LayerNorm, dropout/drop-path
    RNGs and the MUTATION powerset loss must produce the same loss and
    gradients whether the global batch lives on one device or is split
    across the mesh (dropout masks are keyed on the global batch shape, so
    GSPMD generates identical masks under either sharding)."""
    from pranet2_tpu.models import get_model

    rng = np.random.default_rng(1)
    asize = 64  # MaxViT floor: window/grid size = img//32
    model = get_model("merit_cascaded", num_classes=4, dual=True,
                      model_scale="dryrun",
                      img_size_s1=(asize, asize),
                      img_size_s2=(asize // 2, asize // 2))
    images = rng.standard_normal((8, 32, 32, 1), dtype=np.float32)
    labels = rng.integers(0, 4, (8, 32, 32))
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.key(3), jnp.zeros((2, 32, 32, 1)), True)

    d0 = jax.devices()[0]
    loss_ref, grads_ref = _merit_loss_and_grads(
        model, variables, images, labels, (d0, d0))

    mesh = make_mesh()
    loss_dp, grads_dp = _merit_loss_and_grads(
        model, variables, images, labels,
        (replicated_sharding(mesh), batch_sharding(mesh)))

    assert abs(float(loss_ref) - float(loss_dp)) < 1e-4
    for a, b in zip(jax.tree.leaves(grads_ref), jax.tree.leaves(grads_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_batch_sharding_layout():
    mesh = make_mesh()
    x = jax.device_put(np.zeros((8, 4, 4, 3), np.float32),
                       batch_sharding(mesh))
    # each device holds exactly one batch element
    assert len(x.addressable_shards) == 8
    assert all(s.data.shape == (1, 4, 4, 3) for s in x.addressable_shards)
