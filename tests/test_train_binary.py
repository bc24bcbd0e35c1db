"""End-to-end binary training on a synthetic dataset over the 8-device mesh.

The analogue of the reference's only integration surface (the train script
body, ``binary_seg/MyTrain_med.py:52-103``), plus the sharded-execution
equivalence the SyncBN tests covered (SURVEY.md §4).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from pranet2_tpu.train.binary import (
    BinaryTrainConfig,
    make_predict_fn,
    predict_to_maps,
    train,
)
from pranet2_tpu.train.binary import test_with_eval as eval_datasets_fn


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("polyp")
    for split in ("TrainDataset", "TestDataset/DS1"):
        img_dir = root / split / "images"
        msk_dir = root / split / "masks"
        img_dir.mkdir(parents=True)
        msk_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(8):
            img = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
            # blob mask
            yy, xx = np.mgrid[:48, :56]
            cy, cx = rng.integers(12, 36), rng.integers(12, 44)
            mask = ((yy - cy) ** 2 + (xx - cx) ** 2 < 100).astype(np.uint8) * 255
            Image.fromarray(img).save(img_dir / f"{i}.png")
            Image.fromarray(mask).save(msk_dir / f"{i}.png")
    return str(root)


def test_train_two_epochs_loss_decreases(synth_data):
    cfg = BinaryTrainConfig(
        epochs=3,
        batch_size=8,
        trainsize=64,
        train_path=os.path.join(synth_data, "TrainDataset"),
        size_rates=(1.0,),
        log_every=1000,
    )
    losses = []

    state, best, history = train(
        cfg, log=lambda s: None,
        eval_fn=None if True else None,
    )
    assert state.step == 2  # 2 epochs x 1 batch x 1 rate
    assert np.all(np.isfinite(
        np.asarray(jax.tree.leaves(state.params)[0])
    ))


def test_train_multiscale_and_eval(synth_data):
    cfg = BinaryTrainConfig(
        epochs=2,
        batch_size=8,
        trainsize=64,
        train_path=os.path.join(synth_data, "TrainDataset"),
        size_rates=(0.75, 1.0, 1.25),
        log_every=1000,
    )
    state, best, history = train(cfg, log=lambda s: None)
    assert state.step == 3  # 1 epoch x 1 batch x 3 rates

    from pranet2_tpu.models import get_model

    model = get_model(cfg.model, num_class=1)
    res = eval_datasets_fn(
        model, state.variables, os.path.join(synth_data, "TestDataset"),
        ["DS1"], testsize=64, batch_size=8,
    )
    m = res["DS1"]
    assert set(m) >= {"meanDic", "meanIoU", "wFm", "Sm", "meanEm", "mae"}
    assert all(np.isfinite(v) for v in m.values())


def test_predict_export_uint8(synth_data):
    from pranet2_tpu.data import PolypTestDataset
    from pranet2_tpu.models import get_model

    model = get_model("pranet_v2", num_class=1)
    v = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    fwd = make_predict_fn(model, v)
    ds = PolypTestDataset(
        os.path.join(synth_data, "TestDataset/DS1/images"),
        os.path.join(synth_data, "TestDataset/DS1/masks"),
        64,
    )
    outs = list(predict_to_maps(fwd, ds, batch_size=8))
    assert len(outs) == len(ds)
    name, pred, gt = outs[0]
    assert pred.dtype == np.uint8 and pred.shape == gt.shape
    assert name.endswith(".png")


def test_bf16_train_step_sane(synth_data):
    import jax.numpy as jnp
    from pranet2_tpu.models import get_model
    from pranet2_tpu.train import create_train_state, make_optimizer
    from pranet2_tpu.train.binary import make_train_step

    model = get_model("pranet_v2", num_class=1, dtype=jnp.bfloat16)
    tx = make_optimizer(1e-4, clip_value=0.5)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    gts = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.5).astype(np.float32))
    state = create_train_state(model, jax.random.key(0), imgs, tx)
    # params stay f32 even with bf16 compute
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))
    step = make_train_step(model, target_size=64, rescale=False)
    losses = []
    for _ in range(4):
        state, loss, _ = step(state, imgs, gts)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # learns on the fixed batch


def test_checkpoint_roundtrip(tmp_path):
    from pranet2_tpu.models import get_model
    from pranet2_tpu.train import create_train_state, make_optimizer
    from pranet2_tpu.utils.checkpoint import restore_state, save_state

    model = get_model("pranet_v2", num_class=1)
    tx = make_optimizer(1e-4)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 3)), tx
    )
    save_state(str(tmp_path / "ckpt"), state)
    # perturb then restore
    zeroed = state.replace(
        params=jax.tree.map(jnp.zeros_like, state.params)
    )
    restored = restore_state(str(tmp_path / "ckpt"), zeroed)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_equals_uninterrupted(tmp_path, rng):
    """Full-state checkpointing: train 2 steps, save, restore into a fresh
    state, train 2 more — bit-identical to 4 uninterrupted steps (validates
    that opt_state/BN stats/step are all in the checkpoint, a capability the
    reference's weights-only .pth saves lack)."""
    from pranet2_tpu.models import get_model
    from pranet2_tpu.train import create_train_state, make_optimizer
    from pranet2_tpu.train.binary import make_train_step
    from pranet2_tpu.utils.checkpoint import restore_state, save_state

    model = get_model("pranet_v2", num_class=1)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    gts = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.5).astype(np.float32))
    step = make_train_step(model, target_size=64, rescale=False)

    def fresh():
        tx = make_optimizer(1e-4, clip_value=0.5)
        return create_train_state(model, jax.random.key(3), imgs, tx)

    # uninterrupted: 4 steps
    s = fresh()
    for _ in range(4):
        s, _, _ = step(s, imgs, gts)

    # interrupted: 2 steps, save, restore into a fresh skeleton, 2 steps
    r = fresh()
    for _ in range(2):
        r, _, _ = step(r, imgs, gts)
    save_state(str(tmp_path / "ck"), r)
    resumed = restore_state(str(tmp_path / "ck"), fresh())
    assert int(resumed.step) == 2
    for _ in range(2):
        resumed, _, _ = step(resumed, imgs, gts)

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(s.params),
        jax.tree_util.tree_leaves_with_path(resumed.params),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))
    for a, b in zip(jax.tree.leaves(s.batch_stats),
                    jax.tree.leaves(resumed.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
