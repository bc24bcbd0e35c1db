"""Golden end-to-end prediction parity vs the reference inference pipeline.

On synthetic polyp-style images, run (a) the reference's exact inference
path — actual torch PraNet_V2, test_dataset preprocessing, MyTest_med.py
postprocessing (bilinear resize to GT size align_corners=False -> sigmoid ->
min-max -> uint8 PNG; MyTest_med.py:97-113) — and (b) our cli/test_binary.py
on the same images with the same .pth weights.  The exported maps must agree
pixel-wise (<=1 uint8 step) and score identically under the metric suite.

Also validates evalx.binary_metrics directly against the reference's
eval_functions.py kernels (StructureMeasure / original_WFb / Fmeasure_calu /
EnhancedMeasure; eval.py:95-148 sweep semantics) on the same maps.
"""

import os
import sys

import numpy as np
import pytest
import torch
from PIL import Image
from scipy.ndimage import gaussian_filter

from oracle_shims import REF, load_ref_module, neutralized_loading

pytestmark = pytest.mark.golden

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
SIZES = [(384, 288), (500, 374), (352, 352), (420, 320), (256, 312)]


def _make_golden_dataset(root, rng):
    img_dir = os.path.join(root, "Golden", "images")
    gt_dir = os.path.join(root, "Golden", "masks")
    os.makedirs(img_dir)
    os.makedirs(gt_dir)
    for k, (h, w) in enumerate(SIZES):
        field = gaussian_filter(rng.standard_normal((h, w, 3)), sigma=9, axes=(0, 1))
        field = (field - field.min()) / (field.max() - field.min() + 1e-9)
        Image.fromarray((field * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"img_{k}.jpg"), quality=95)
        blob = gaussian_filter(rng.standard_normal((h, w)), sigma=15)
        mask = (blob > np.quantile(blob, 0.8)).astype(np.uint8) * 255
        Image.fromarray(mask).save(os.path.join(gt_dir, f"img_{k}.png"))
    return os.path.join(root, "Golden")


def _reference_predict(ref_model, ds_dir, out_dir, testsize=352):
    """MyTest_med.py:91-113 + test_dataset (dataloader.py:172-208) semantics."""
    import torch.nn.functional as F

    os.makedirs(out_dir, exist_ok=True)
    img_dir, gt_dir = os.path.join(ds_dir, "images"), os.path.join(ds_dir, "masks")
    ref_model.eval()
    for fname in sorted(os.listdir(img_dir)):
        img = Image.open(os.path.join(img_dir, fname)).convert("RGB")
        img = img.resize((testsize, testsize), Image.BILINEAR)
        x = np.asarray(img, np.float32) / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        x = torch.from_numpy(np.moveaxis(x, -1, 0)[None].copy())
        gt_name = fname.rsplit(".", 1)[0] + ".png"
        gt = np.asarray(
            Image.open(os.path.join(gt_dir, gt_name)).convert("L"), np.float32)
        with torch.no_grad():
            r2, r3, r4, r5, *_bg = ref_model(x)
            res = r2 + r3 + r4 + r5
            res = F.interpolate(res, size=gt.shape, mode="bilinear",
                                align_corners=False)
            res = res.sigmoid().numpy().squeeze()
        res = (res - res.min()) / (res.max() - res.min() + 1e-8)
        Image.fromarray((res * 255).astype(np.uint8)).save(
            os.path.join(out_dir, gt_name))


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    """Synthetic dataset + reference predictions + our CLI predictions."""
    rng = np.random.default_rng(42)
    root = str(tmp_path_factory.mktemp("golden"))
    ds_dir = _make_golden_dataset(root, rng)

    mod = load_ref_module("binary_seg", "lib.pranet")
    torch.manual_seed(7)
    with neutralized_loading():
        ref = mod.PraNet_V2(channel=32, num_class=1)
    ckpt = os.path.join(root, "ref.pth")
    torch.save(ref.state_dict(), ckpt)

    ref_out = os.path.join(root, "ref_results")
    _reference_predict(ref, ds_dir, ref_out)

    jax_root = os.path.join(root, "jax_results")
    from pranet2_tpu.cli import test_binary

    argv = ["test_binary", "--model", "pranet_v2", "--checkpoint", ckpt,
            "--data_root", root, "--datasets", "Golden",
            "--save_root", jax_root, "--batchsize", "4"]
    old_argv = sys.argv
    sys.argv = argv
    try:
        test_binary.main()
    finally:
        sys.argv = old_argv
    return root, ds_dir, ref_out, os.path.join(jax_root, "pranet_v2", "Golden")


def test_golden_map_pixel_parity(golden):
    _, _, ref_out, jax_out = golden
    names = sorted(os.listdir(ref_out))
    assert names and names == sorted(os.listdir(jax_out))
    for name in names:
        r = np.asarray(Image.open(os.path.join(ref_out, name)), np.int16)
        j = np.asarray(Image.open(os.path.join(jax_out, name)), np.int16)
        assert r.shape == j.shape
        diff = np.abs(r - j)
        # min-max normalization + uint8 cast leave at most off-by-one pixels
        assert diff.max() <= 1, f"{name}: max uint8 diff {diff.max()}"
        assert (diff > 0).mean() < 0.01, f"{name}: {(diff > 0).mean():.2%} pixels differ"


def test_golden_metric_parity(golden):
    """Both exports score the same under the full metric suite."""
    from pranet2_tpu.evalx.binary_metrics import (
        aggregate_dataset_metrics,
        binary_image_metrics,
    )

    _, ds_dir, ref_out, jax_out = golden
    gt_dir = os.path.join(ds_dir, "masks")

    def score(pred_dir):
        per = []
        for name in sorted(os.listdir(pred_dir)):
            pred = np.asarray(Image.open(os.path.join(pred_dir, name)))
            gt = np.asarray(Image.open(os.path.join(gt_dir, name)))
            per.append(binary_image_metrics(pred, gt))
        return aggregate_dataset_metrics(per)

    ref_m, jax_m = score(ref_out), score(jax_out)
    for k in ref_m:
        assert abs(ref_m[k] - jax_m[k]) < 2e-3, (k, ref_m[k], jax_m[k])


def test_metrics_match_reference_kernels(golden):
    """evalx.binary_metrics == the reference eval_functions.py kernels."""
    from pranet2_tpu.evalx.binary_metrics import binary_image_metrics

    for key in [k for k in sys.modules if k == "utils" or k.startswith("utils.")]:
        del sys.modules[key]
    sys.path.insert(0, f"{REF}/binary_seg")
    try:
        from utils import eval_functions as ef
    finally:
        sys.path.remove(f"{REF}/binary_seg")

    _, ds_dir, ref_out, _ = golden
    gt_dir = os.path.join(ds_dir, "masks")
    thresholds = np.linspace(1, 0, 256)  # eval.py:77

    for name in sorted(os.listdir(ref_out)):
        pred = np.asarray(Image.open(os.path.join(ref_out, name)),
                          np.float64) / 255.0
        gt = (np.asarray(Image.open(os.path.join(gt_dir, name)),
                         np.float64) > 0.5).astype(np.float64)
        ours = binary_image_metrics(pred, gt)

        np.testing.assert_allclose(ours["Sm"], ef.StructureMeasure(pred, gt),
                                   atol=1e-9, err_msg=name)
        np.testing.assert_allclose(ours["wFm"], ef.original_WFb(pred, gt),
                                   atol=1e-9, err_msg=name)
        np.testing.assert_allclose(ours["mae"], np.mean(np.abs(gt - pred)),
                                   atol=1e-12)

        want = {k: np.zeros(256) for k in ("Pr", "Rec", "Spe", "Dic", "Fm", "IoU", "Em")}
        for j, t in enumerate(thresholds):
            (want["Pr"][j], want["Rec"][j], want["Spe"][j], want["Dic"][j],
             want["Fm"][j], want["IoU"][j]) = ef.Fmeasure_calu(pred, gt, t)
            bi = np.zeros_like(pred)
            bi[pred >= t] = 1
            want["Em"][j] = ef.EnhancedMeasure(bi, gt)
        for k in ("Rec", "Spe", "Dic", "Fm", "IoU", "Em"):
            np.testing.assert_allclose(ours[k], want[k], atol=1e-8,
                                       err_msg=f"{name}:{k}")


# ---------------------------------------------------------------------------
# V1 golden (different map selection: res2 only, MyTest_med.py:97-101)
# ---------------------------------------------------------------------------


def test_golden_v1_pixel_parity(tmp_path):
    import torch.nn.functional as F

    rng = np.random.default_rng(7)
    root = str(tmp_path)
    ds_dir = _make_golden_dataset(root, rng)

    mod = load_ref_module("binary_seg", "lib.PraNet_Res2Net")
    torch.manual_seed(9)
    with neutralized_loading():
        ref = mod.PraNet(channel=32)
    ckpt = os.path.join(root, "ref_v1.pth")
    torch.save(ref.state_dict(), ckpt)

    # reference path: V1 loads strict and uses res2 only
    ref.eval()
    ref_out = os.path.join(root, "ref_results")
    os.makedirs(ref_out)
    img_dir, gt_dir = os.path.join(ds_dir, "images"), os.path.join(ds_dir, "masks")
    for fname in sorted(os.listdir(img_dir)):
        img = Image.open(os.path.join(img_dir, fname)).convert("RGB")
        img = img.resize((352, 352), Image.BILINEAR)
        x = (np.asarray(img, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        x = torch.from_numpy(np.moveaxis(x, -1, 0)[None].copy())
        gt_name = fname.rsplit(".", 1)[0] + ".png"
        gt = np.asarray(Image.open(os.path.join(gt_dir, gt_name)).convert("L"),
                        np.float32)
        with torch.no_grad():
            _res5, _res4, _res3, res2 = ref(x)
            res = F.interpolate(res2, size=gt.shape, mode="bilinear",
                                align_corners=False).sigmoid().numpy().squeeze()
        res = (res - res.min()) / (res.max() - res.min() + 1e-8)
        Image.fromarray((res * 255).astype(np.uint8)).save(
            os.path.join(ref_out, gt_name))

    jax_root = os.path.join(root, "jax_results")
    from pranet2_tpu.cli import test_binary

    argv = ["test_binary", "--model", "pranet_v1", "--checkpoint", ckpt,
            "--data_root", root, "--datasets", "Golden",
            "--save_root", jax_root, "--batchsize", "4"]
    old_argv = sys.argv
    sys.argv = argv
    try:
        test_binary.main()
    finally:
        sys.argv = old_argv
    jax_out = os.path.join(jax_root, "pranet_v1", "Golden")

    names = sorted(os.listdir(ref_out))
    assert names and names == sorted(os.listdir(jax_out))
    for name in names:
        r = np.asarray(Image.open(os.path.join(ref_out, name)), np.int16)
        j = np.asarray(Image.open(os.path.join(jax_out, name)), np.int16)
        diff = np.abs(r - j)
        assert diff.max() <= 1, f"{name}: max uint8 diff {diff.max()}"
        assert (diff > 0).mean() < 0.01, name
