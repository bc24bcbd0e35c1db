"""CLI smoke tests: arg parsing + end-to-end eval_binary on synthetic PNGs."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image


def _cpu_env(**extra):
    """Subprocess env that really runs on CPU in this image.

    ``JAX_PLATFORMS=cpu`` alone is not enough: the image's sitecustomize
    (on PYTHONPATH at ``.axon_site``) re-exports JAX_PLATFORMS=axon at
    interpreter startup, and with the TPU tunnel down the axon backend
    init blocks for ~10 min per subprocess.  Stripping that path makes
    the CLI tests hermetic regardless of tunnel state.
    """
    env = {**os.environ, "JAX_PLATFORMS": "cpu", **extra}
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p)
    return env


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


def test_eval_binary_tolerates_name_drift(tmp_path, capsys):
    """A stray/missing file or a .jpg/.png extension mismatch must not kill
    the sweep — the reference name-maps .jpg->.png (binary_seg/eval.py) and
    the CLI here reports unpaired files per-file and scores the rest."""
    rng = np.random.default_rng(1)
    (tmp_path / "preds" / "DS1").mkdir(parents=True)
    (tmp_path / "gt" / "DS1" / "masks").mkdir(parents=True)
    for i in range(3):
        gt = (rng.random((32, 32)) > 0.5).astype(np.uint8) * 255
        Image.fromarray(gt).save(tmp_path / "gt" / "DS1" / "masks" / f"{i}.png")
        # extension drift: predictions saved as .jpg-named PNGs
        Image.fromarray(gt).save(
            tmp_path / "preds" / "DS1" / f"{i}.jpg", format="PNG")
    # one extra prediction without GT, one GT without prediction
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(
        tmp_path / "preds" / "DS1" / "stray.png")
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(
        tmp_path / "gt" / "DS1" / "masks" / "missing.png")

    from pranet2_tpu.cli.eval_binary import evaluate_pred_dirs

    rows = evaluate_pred_dirs(
        str(tmp_path / "preds"), str(tmp_path / "gt"), ["DS1"],
        ["meanDic", "mae"])
    err = capsys.readouterr().err
    assert "stray.png" in err and "missing.png" in err
    assert rows[0][0] == "DS1"
    assert dict(zip(["meanDic", "mae"], rows[0][1:]))["mae"] < 1e-9


def test_reproduce_baseline_mini_dataset(tmp_path, capsys, monkeypatch):
    """reproduce_baseline on a synthetic mini TestDataset + orbax checkpoint:
    the day-one BASELINE.md command must produce the metric table with no
    extra code (VERDICT: one-command reproduction)."""
    import jax
    import jax.numpy as jnp

    from pranet2_tpu.cli import reproduce_baseline as rb
    from pranet2_tpu.models import get_model
    from pranet2_tpu.utils.checkpoint import save_params

    rng = np.random.default_rng(0)
    data = tmp_path / "TestDataset"
    for i, ds in enumerate(["CVC-300"]):
        (data / ds / "images").mkdir(parents=True)
        (data / ds / "masks").mkdir(parents=True)
        for j in range(2):
            img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
            m = (rng.random((40, 48)) > 0.5).astype(np.uint8) * 255
            Image.fromarray(img).save(data / ds / "images" / f"{j}.png")
            Image.fromarray(m).save(data / ds / "masks" / f"{j}.png")

    model = get_model("pranet_v2", num_class=1)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    ckpts = tmp_path / "ckpts"
    save_params(str(ckpts / "pranet_v2"), dict(variables))

    expect = tmp_path / "expect.json"
    expect.write_text('{"pranet_v2": {"CVC-300": 50.0}}')
    monkeypatch.setattr(sys, "argv", [
        "reproduce_baseline", "--data_root", str(data),
        "--ckpt_dir", str(ckpts), "--models", "pranet_v2",
        "--datasets", "CVC-300", "--testsize", "64", "--batchsize", "2",
        "--save_root", str(tmp_path / "results"), "--precision", "default",
        "--expect_json", str(expect), "--tol_pp", "100",
    ])
    rb.main()
    out = capsys.readouterr().out
    assert "pranet_v2/CVC-300: 2 maps" in out, out
    # table row with all 6 metrics present and parseable
    row = [l for l in out.splitlines()
           if l.startswith("pranet_v2") and "CVC-300" in l]
    assert row, out
    vals = row[0].split()[2:]
    assert len(vals) == 6 and all(float(v) == float(v) for v in vals)
    assert (tmp_path / "results" / "pranet_v2" / "CVC-300" / "0.png").exists()
    # the automatic parity verdict ran and passed at the wide tolerance
    assert "parity verdict: PASS" in out, out

    # FAIL branch end-to-end (VERDICT r4 #8): an unmeetable expectation at
    # a tight tolerance must print FAIL and exit nonzero — the behavior the
    # one-command parity claim rests on the day real data appears
    expect.write_text('{"pranet_v2": {"CVC-300": 99.9}}')
    monkeypatch.setattr(sys, "argv", [
        "reproduce_baseline", "--data_root", str(data),
        "--ckpt_dir", str(ckpts), "--models", "pranet_v2",
        "--datasets", "CVC-300", "--testsize", "64", "--batchsize", "2",
        "--save_root", str(tmp_path / "results"), "--precision", "default",
        "--expect_json", str(expect), "--tol_pp", "0.1",
    ])
    with pytest.raises(SystemExit) as ei:
        rb.main()
    assert ei.value.code == 1
    out = capsys.readouterr().out
    assert "parity verdict: FAIL" in out, out


def test_reproduce_baseline_verdict_rows():
    """--expect verdict logic: PASS/FAIL at the tolerance, n/a when no
    published number exists (CVC-ColonDB, BASELINE.md §targets)."""
    from pranet2_tpu.cli.reproduce_baseline import verdict_rows

    metrics = ["meanDic", "mae"]
    rows = [
        ["pranet_v2", "CVC-300", 0.8985, 0.01],       # +0.02pp vs 89.83
        ["pranet_v2", "Kvasir", 0.8990, 0.01],        # -0.80pp vs 90.70
        ["pranet_v2", "CVC-ColonDB", 0.85, 0.01],     # no published row
    ]
    from pranet2_tpu.cli.reproduce_baseline import EXPECTED_MDICE

    vrows, ok = verdict_rows(rows, metrics, EXPECTED_MDICE, tol_pp=0.4)
    assert not ok
    by_ds = {r[1]: r for r in vrows}
    assert by_ds["CVC-300"][-1] == "PASS"
    assert by_ds["Kvasir"][-1] == "FAIL"
    assert by_ds["CVC-ColonDB"][-1] == "n/a"
    # all four released models carry expectations for the 4 scored sets
    assert all(len(v) == 4 for v in EXPECTED_MDICE.values())
    _, ok2 = verdict_rows(rows[:1], metrics, EXPECTED_MDICE, tol_pp=0.4)
    assert ok2


def test_find_checkpoint_layouts(tmp_path):
    from pranet2_tpu.cli.reproduce_baseline import find_checkpoint

    (tmp_path / "RES-V2.pth").write_bytes(b"x")
    assert find_checkpoint(str(tmp_path), "pranet_v2").endswith("RES-V2.pth")
    (tmp_path / "PVT-PraNet-V2").mkdir()
    (tmp_path / "PVT-PraNet-V2" / "PVT-V2.pth").write_bytes(b"x")
    assert find_checkpoint(str(tmp_path), "pvt_pranet_v2").endswith(
        os.path.join("PVT-PraNet-V2", "PVT-V2.pth"))
    assert find_checkpoint(str(tmp_path), "pranet_v1") is None


@pytest.mark.parametrize("mod", [
    "pranet2_tpu.cli.train_binary",
    "pranet2_tpu.cli.test_binary",
    "pranet2_tpu.cli.eval_binary",
    "pranet2_tpu.cli.train_multiclass",
    "pranet2_tpu.cli.test_multiclass",
    "pranet2_tpu.cli.reproduce_baseline",
])
def test_cli_help(mod):
    out = subprocess.run(
        [sys.executable, "-m", mod, "--help"],
        capture_output=True, text=True, timeout=120,
        env=_cpu_env(),
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "usage" in out.stdout.lower()


# ---------------------------------------------------------------------------
# train-CLI execution tests (tiny synthetic data, 2 epochs)
# ---------------------------------------------------------------------------

_ENV = _cpu_env(XLA_FLAGS="--xla_force_host_platform_device_count=1")


def _make_polyp_tree(root, n_train=4, n_test=2, size=64):
    rng = np.random.default_rng(0)
    for sub in ["TrainDataset/images", "TrainDataset/masks",
                "TestDataset/DS1/images", "TestDataset/DS1/masks"]:
        (root / sub).mkdir(parents=True)
    for i in range(n_train):
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        m = (rng.random((size, size)) > 0.5).astype(np.uint8) * 255
        Image.fromarray(img).save(root / "TrainDataset/images" / f"{i}.png")
        Image.fromarray(m).save(root / "TrainDataset/masks" / f"{i}.png")
    for i in range(n_test):
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        m = (rng.random((size, size)) > 0.5).astype(np.uint8) * 255
        Image.fromarray(img).save(root / "TestDataset/DS1/images" / f"{i}.png")
        Image.fromarray(m).save(root / "TestDataset/DS1/masks" / f"{i}.png")


@pytest.mark.slow
def test_train_binary_cli_end_to_end(tmp_path):
    """2-epoch run of the train CLI: snapshots + best + last must appear
    (MyTrain_med.py recipe: snapshot per --snapshot_every, best by eval)."""
    _make_polyp_tree(tmp_path)
    r = subprocess.run(
        [sys.executable, "-m", "pranet2_tpu.cli.train_binary",
         "--model", "pranet_v2", "--epoch", "3", "--batchsize", "2",
         "--trainsize", "64", "--snapshot_every", "1",
         "--train_path", "TrainDataset", "--test_root", "TestDataset",
         "--eval_datasets", "DS1", "--train_save", "t1"],
        capture_output=True, text=True, timeout=1500, env=_ENV,
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    snap = tmp_path / "snapshots" / "t1"
    for want in ["epoch_1", "epoch_2", "last", "best"]:
        assert (snap / want).exists(), f"{want} missing: {list(snap.iterdir()) if snap.exists() else 'no dir'}"


@pytest.mark.slow
def test_train_multiclass_cli_end_to_end(tmp_path):
    """2-epoch EMCAD/Synapse run of the multiclass train CLI."""
    rng = np.random.default_rng(0)
    data = tmp_path / "train_npz"
    lists = tmp_path / "lists"
    data.mkdir(), lists.mkdir()
    names = []
    for i in range(4):
        name = f"case{i:04d}_slice{i:03d}"
        np.savez(data / f"{name}.npz",
                 image=rng.random((40, 40)).astype(np.float32),
                 label=rng.integers(0, 14, (40, 40)).astype(np.int64))
        names.append(name)
    (lists / "train.txt").write_text("\n".join(names) + "\n")
    r = subprocess.run(
        [sys.executable, "-m", "pranet2_tpu.cli.train_multiclass",
         "--model", "emcad", "--encoder", "pvt_v2_b0", "--dataset", "synapse",
         "--root_path", str(data), "--list_dir", str(lists),
         "--max_epochs", "2", "--batch_size", "2", "--img_size", "64",
         "--save_dir", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=1500, env=_ENV,
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert (tmp_path / "out" / "last").exists()
