"""Multiclass stack tests: EMCAD training, volumetric metrics, datasets."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pranet2_tpu.data import RandomGenerator, RandomGeneratorACDC, SynapseDataset
from pranet2_tpu.data.volumes import remap_synapse_labels
from pranet2_tpu.evalx.volumetric import (
    assd,
    calculate_metric_percase,
    dice_coefficient,
    hd95,
    jaccard,
)


# ---------------------------------------------------------------------------
# volumetric metrics
# ---------------------------------------------------------------------------


def brute_surface_distances(a, b):
    """Independent O(n^2) oracle for surface distances."""
    from scipy import ndimage

    fp = ndimage.generate_binary_structure(a.ndim, 1)
    ab = a ^ ndimage.binary_erosion(a, fp)
    bb = b ^ ndimage.binary_erosion(b, fp)
    pa = np.argwhere(ab).astype(np.float64)
    pb = np.argwhere(bb).astype(np.float64)
    d = np.sqrt(((pa[:, None, :] - pb[None, :, :]) ** 2).sum(-1))
    return d.min(axis=1)


def test_surface_metrics_match_bruteforce(rng):
    a = np.zeros((24, 24, 8), bool)
    b = np.zeros((24, 24, 8), bool)
    a[4:16, 4:16, 2:6] = True
    b[6:20, 5:17, 3:7] = True
    d_ab = brute_surface_distances(a, b)
    d_ba = brute_surface_distances(b, a)
    # medpy convention: percentile of the combined two-direction distribution
    want_hd95 = np.percentile(np.hstack((d_ab, d_ba)), 95)
    want_assd = np.mean((d_ab.mean(), d_ba.mean()))
    assert abs(hd95(a, b) - want_hd95) < 1e-9
    assert abs(assd(a, b) - want_assd) < 1e-9


def test_dice_jaccard_and_conventions():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[2:6, 2:6] = True
    b[4:8, 4:8] = True
    inter, na, nb = 4, 16, 16
    assert abs(dice_coefficient(a, b) - 2 * inter / (na + nb)) < 1e-12
    assert abs(jaccard(a, b) - inter / (na + nb - inter)) < 1e-12
    # empty-mask conventions
    assert calculate_metric_percase(a, np.zeros_like(b)) == (1.0, 0.0, 1.0, 0.0)
    assert calculate_metric_percase(np.zeros_like(a), b) == (0.0, 0.0, 0.0, 0.0)
    d, h, j, s = calculate_metric_percase(a, a)
    assert d == 1.0 and j == 1.0 and h == 0.0 and s == 0.0


# ---------------------------------------------------------------------------
# datasets + augmentation
# ---------------------------------------------------------------------------


def test_synapse_label_remap():
    lab = np.arange(14).reshape(2, 7)
    out = remap_synapse_labels(lab)
    assert set(np.unique(out)) <= set(range(9))
    assert out[1, 4] == 5  # 11 -> 5
    assert out[0, 5] == 0  # 5 -> 0


@pytest.fixture(scope="module")
def synth_synapse(tmp_path_factory):
    root = tmp_path_factory.mktemp("synapse")
    data_dir = root / "train_npz"
    lists = root / "lists"
    data_dir.mkdir()
    lists.mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(6):
        name = f"case{i:04d}_slice{i:03d}"
        img = rng.random((40, 40)).astype(np.float32)
        lab = rng.integers(0, 14, (40, 40)).astype(np.int64)
        np.savez(data_dir / f"{name}.npz", image=img, label=lab)
        names.append(name)
    (lists / "train.txt").write_text("\n".join(names) + "\n")
    return str(data_dir), str(lists)


def test_synapse_dataset_and_augment(synth_synapse):
    data_dir, lists = synth_synapse
    ds = SynapseDataset(data_dir, lists, "train", nclass=9,
                        transform=RandomGenerator((32, 32), seed=0))
    assert len(ds) == 6
    img, lab = ds[0]
    assert img.shape == (32, 32, 1) and img.dtype == np.float32
    assert lab.shape == (32, 32) and lab.dtype == np.int32
    assert lab.max() <= 8


def test_acdc_augment_bbox_crop():
    aug = RandomGeneratorACDC((16, 16), seed=1)
    img = np.full((20, 20), -1.0, np.float32)
    img[5:15, 5:15] = 1.0
    lab = np.zeros((20, 20), np.int64)
    lab[8:12, 8:12] = 2
    out_img, out_lab = aug(img, lab)
    assert out_img.shape == (16, 16) and out_lab.shape == (16, 16)
    assert (out_lab == 2).any()  # label survived crop+zoom


def test_supervision_subsets():
    from pranet2_tpu.losses.multiclass import supervision_subsets

    assert len(supervision_subsets(4, "mutation")) == 15
    assert supervision_subsets(4, "deep_supervision") == [[0], [1], [2], [3]]
    assert supervision_subsets(4, "last_layer") == [[3]]
    with pytest.raises(ValueError):
        supervision_subsets(4, "bogus")


def test_mutation_loss_supervision_modes(rng):
    from pranet2_tpu.losses.multiclass import mutation_loss

    fg = [jnp.asarray(rng.standard_normal((1, 8, 8, 3), dtype=np.float32))
          for _ in range(4)]
    bg = [jnp.asarray(rng.standard_normal((1, 8, 8, 3), dtype=np.float32))
          for _ in range(4)]
    lbl = jnp.asarray(rng.integers(0, 3, (1, 8, 8)))
    lm = float(mutation_loss(fg, lbl, 3, bg, supervision="mutation"))
    ld = float(mutation_loss(fg, lbl, 3, bg, supervision="deep_supervision"))
    ll = float(mutation_loss(fg, lbl, 3, bg, supervision="last_layer"))
    assert lm > ld > ll > 0  # 15 vs 4 vs 1 subset terms


# ---------------------------------------------------------------------------
# EMCAD end-to-end slice
# ---------------------------------------------------------------------------


def test_emcad_train_step_and_volume_inference(rng):
    from pranet2_tpu.models import get_model
    from pranet2_tpu.train.multiclass import (
        MulticlassTrainConfig,
        make_multiclass_train_step,
        make_slice_predictor,
        test_volumes,
    )
    from pranet2_tpu.train import create_train_state, make_optimizer

    cfg = MulticlassTrainConfig(num_classes=4, batch_size=2, img_size=32,
                                max_epochs=1)
    model = get_model("emcad", num_classes=4, encoder="pvt_v2_b0", dual=True)
    tx = make_optimizer(cfg.lr, clip_value=None, weight_decay=cfg.weight_decay)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 32, 32, 1)), tx
    )
    step = make_multiclass_train_step(model, cfg)
    images = jnp.asarray(rng.standard_normal((2, 32, 32, 1), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (2, 32, 32)))
    state, loss1 = step(state, images, labels)
    state, loss2 = step(state, images, labels)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)  # overfits a fixed batch

    # volume inference over a ragged-depth volume with host zoom
    class VolDS:
        def __len__(self):
            return 1

        def case_name(self, i):
            return "case0"

        def __getitem__(self, i):
            vol = np.random.default_rng(1).random((5, 40, 44)).astype(np.float32)
            lab = np.zeros((5, 40, 44), np.int32)
            lab[:, 10:20, 10:20] = 1
            return vol, lab

    metrics, names = test_volumes(
        model, state.variables, VolDS(), 4, patch_size=(32, 32),
        mode="fg_minus_bg", chunk=4,
    )
    assert metrics.shape == (1, 3, 4)
    assert names == ["case0"]
    # fg_only mode also runs
    m2, _ = test_volumes(model, state.variables, VolDS(), 4,
                         patch_size=(32, 32), mode="fg_only", chunk=4)
    assert m2.shape == (1, 3, 4)
