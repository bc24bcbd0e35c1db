"""CLI smoke tests: arg parsing + end-to-end eval_binary on synthetic PNGs."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image


def test_eval_binary_end_to_end(tmp_path):
    # build gt + near-perfect predictions
    rng = np.random.default_rng(0)
    (tmp_path / "preds" / "DS1").mkdir(parents=True)
    (tmp_path / "gt" / "DS1" / "masks").mkdir(parents=True)
    for i in range(3):
        gt = (rng.random((40, 50)) > 0.6).astype(np.uint8) * 255
        Image.fromarray(gt).save(tmp_path / "gt" / "DS1" / "masks" / f"{i}.png")
        Image.fromarray(gt).save(tmp_path / "preds" / "DS1" / f"{i}.png")

    from pranet2_tpu.cli.eval_binary import evaluate_pred_dirs

    rows = evaluate_pred_dirs(
        str(tmp_path / "preds"), str(tmp_path / "gt"), ["DS1"],
        ["meanDic", "meanIoU", "wFm", "Sm", "meanEm", "mae"],
        result_path=str(tmp_path / "out"),
    )
    assert rows[0][0] == "DS1"
    # perfect predictions: wFm == Sm == 1, mae == 0, maxDic reachable
    metrics = dict(zip(["meanDic", "meanIoU", "wFm", "Sm", "meanEm", "mae"],
                       rows[0][1:]))
    assert metrics["wFm"] > 0.999 and metrics["Sm"] > 0.999
    assert metrics["mae"] < 1e-9
    assert os.path.isfile(tmp_path / "out" / "result_DS1.csv")


@pytest.mark.parametrize("mod", [
    "pranet2_tpu.cli.train_binary",
    "pranet2_tpu.cli.test_binary",
    "pranet2_tpu.cli.eval_binary",
    "pranet2_tpu.cli.train_multiclass",
    "pranet2_tpu.cli.test_multiclass",
])
def test_cli_help(mod):
    out = subprocess.run(
        [sys.executable, "-m", mod, "--help"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "usage" in out.stdout.lower()
