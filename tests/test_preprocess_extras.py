"""Preprocessing + training-extras tests."""

import numpy as np
import jax.numpy as jnp
from PIL import Image

from pranet2_tpu.data.preprocess import (
    export_synapse_case,
    preprocess_ct_volume,
    random_split,
    tif_to_png,
)
from pranet2_tpu.train.extras import focal_loss, poly_lr_schedule


def test_tif_to_png(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(src / "a.tif")
    Image.fromarray(np.ones((8, 8), np.uint8)).save(src / "b.tif")
    assert tif_to_png(str(src), str(dst)) == 2
    assert sorted(p.name for p in dst.iterdir()) == ["a.png", "b.png"]


def test_random_split_deterministic():
    names = [f"img{i}" for i in range(100)]
    tr1, te1 = random_split(names, n_train=70, seed=1)
    tr2, te2 = random_split(names, n_train=70, seed=1)
    assert tr1 == tr2 and te1 == te2
    assert len(tr1) == 70 and len(te1) == 30
    assert set(tr1) | set(te1) == set(names)


def test_ct_preprocess_and_export(tmp_path):
    vol = np.linspace(-500, 500, 4 * 6 * 6).reshape(4, 6, 6)
    out = preprocess_ct_volume(vol)
    assert out.min() == 0.0 and out.max() == 1.0
    assert out.dtype == np.float32

    lab = np.zeros((4, 6, 6), np.int64)
    names = export_synapse_case(vol, lab, "case01", str(tmp_path / "train"),
                                "train")
    assert len(names) == 4
    d = np.load(tmp_path / "train" / "case01_slice000.npz")
    assert d["image"].shape == (6, 6)

    names = export_synapse_case(vol, lab, "case01", str(tmp_path / "test"),
                                "test")
    import h5py

    with h5py.File(tmp_path / "test" / "case01.npy.h5") as f:
        assert f["image"].shape == (4, 6, 6)


def test_poly_lr_and_focal_loss(rng):
    sched = poly_lr_schedule(1e-3, 100)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    assert float(sched(100)) == 0.0
    assert float(sched(50)) < 1e-3

    logits = jnp.asarray(rng.standard_normal((2, 8, 8, 4), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 4, (2, 8, 8)))
    l = float(focal_loss(logits, labels))
    assert np.isfinite(l) and l > 0
