"""Golden end-to-end volumetric inference parity vs the reference pipeline.

Runs the reference's actual ``test_single_volume`` (the slice loop with
scipy ``zoom(order=3)`` resize in / ``zoom(order=0)`` out, softmax+argmax,
and the per-family dual-map quirk) against our ``train.multiclass
.test_volumes`` with the same converted weights on the same synthetic
ragged volumes.  Both families' quirks are exercised:

* MERIT semantics (``MERIT/utils/utils.py:195-200``): dual output is
  ``sum(P_fg[i] - P_bg[i])``  -> our ``mode='fg_minus_bg'``;
* EMCAD/MIST test semantics (``EMCAD/utils/utils.py:184-190``): dual output
  sums fg only -> our ``mode='fg_only'``.

The medpy readout on the reference side is shimmed with
``pranet2_tpu.evalx.volumetric`` (oracle_shims) — not circular for this
test's purpose: the metric is just the readout of the *prediction volumes*,
whose pipeline (zoom/argmax/slice handling) is what differs between the two
implementations; the metric implementation itself is property-tested against
an independent medpy transcription elsewhere.
"""

import contextlib

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from oracle_shims import load_ref_module, neutralized_loading, to_numpy_sd
from pranet2_tpu.models import get_model
from pranet2_tpu.train.multiclass import test_volumes as run_test_volumes
from pranet2_tpu.utils.torch_convert import convert_state_dict, emcad_key_map

pytestmark = pytest.mark.golden

N_CLS = 4
PATCH = 64


@contextlib.contextmanager
def cpu_cuda():
    """Reference eval code hard-codes ``.cuda()``; make it a no-op."""
    t_cuda, m_cuda = torch.Tensor.cuda, torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda, torch.nn.Module.cuda = t_cuda, m_cuda


class _ListDataset:
    def __init__(self, vols):
        self.vols = vols

    def __len__(self):
        return len(self.vols)

    def __getitem__(self, i):
        return self.vols[i]

    def case_name(self, i):
        return f"case{i}"


@pytest.fixture(scope="module")
def setup():
    mod = load_ref_module("multiclass_seg/EMCAD", "lib.networks")
    torch.manual_seed(3)
    with neutralized_loading():
        ref = mod.EMCADNet(num_classes=N_CLS, encoder="pvt_v2_b0",
                           activation="relu", pretrain=False, dual=True)
    ref.eval()
    ours = get_model("emcad", num_classes=N_CLS, encoder="pvt_v2_b0",
                     activation="relu", dual=True)
    fvars = convert_state_dict(to_numpy_sd(ref), emcad_key_map("pvt_v2_b0"))

    rng = np.random.default_rng(11)
    vols = []
    for d, h, w in [(4, 40, 52), (3, 64, 64)]:  # ragged + exact-patch-size
        img = rng.random((d, h, w)).astype(np.float32)
        lab = rng.integers(0, N_CLS, (d, h, w)).astype(np.int64)
        vols.append((img, lab))
    return ref, ours, fvars, vols


def _reference_metrics(ref, vols, which: str):
    utils = load_ref_module(f"multiclass_seg/{which}", "utils.utils")
    rows = []
    with cpu_cuda():
        for img, lab in vols:
            m = utils.test_single_volume(
                torch.from_numpy(img)[None], torch.from_numpy(lab)[None],
                ref, classes=N_CLS, patch_size=[PATCH, PATCH], use_dual=True)
            rows.append(m)
    return np.asarray(rows, np.float64)


def test_cli_disk_format_parity(setup, tmp_path, capsys, monkeypatch):
    """The full day-one seam: synthetic Synapse volumes written as real
    ``.npy.h5`` files + ``lists/test_vol.txt``, the reference model saved as
    a **DataParallel** ``.pth``, then (a) the reference's actual
    ``Synapse_dataset`` + ``test_single_volume`` slice pipeline
    (``EMCAD/test_synapse.py:92-113``, ``utils/dataset_synapse.py:50-77``)
    vs (b) our ``cli/test_multiclass.py`` driven through its argv interface
    on the same files.  Per-case and per-class Dice/HD95 must agree."""
    import re
    import sys

    ref, ours, fvars, vols = setup

    # ---- write the disk formats the reference ships ----
    import h5py

    vol_dir = tmp_path / "vols"
    list_dir = tmp_path / "lists"
    vol_dir.mkdir()
    list_dir.mkdir()
    names = []
    for i, (img, lab) in enumerate(vols):
        name = f"case{i:04d}"
        names.append(name)
        with h5py.File(vol_dir / f"{name}.npy.h5", "w") as f:
            f.create_dataset("image", data=img)
            f.create_dataset("label", data=lab)
    (list_dir / "test_vol.txt").write_text("\n".join(names) + "\n")
    pth = tmp_path / "dp.pth"
    torch.save(torch.nn.DataParallel(ref).state_dict(), pth)

    # ---- reference pipeline over the same files ----
    ds_mod = load_ref_module("multiclass_seg/EMCAD", "utils.dataset_synapse")
    utils = load_ref_module("multiclass_seg/EMCAD", "utils.utils")
    db = ds_mod.Synapse_dataset(base_dir=str(vol_dir), list_dir=str(list_dir),
                                split="test_vol", nclass=N_CLS)
    want_rows = []
    with cpu_cuda():
        for idx in range(len(db)):
            sample = db[idx]
            img, lab = sample["image"], sample["label"]
            m = utils.test_single_volume(
                torch.from_numpy(np.asarray(img))[None],
                torch.from_numpy(np.asarray(lab))[None],
                ref, classes=N_CLS, patch_size=[PATCH, PATCH], use_dual=True)
            want_rows.append(m)
    want = np.asarray(want_rows, np.float64)  # (cases, classes-1, 4)

    # ---- our CLI on the same .pth + h5 + lists ----
    from pranet2_tpu.cli import test_multiclass as cli

    monkeypatch.setattr(sys, "argv", [
        "test_multiclass", "--model", "emcad", "--encoder", "pvt_v2_b0",
        "--activation_mscb", "relu", "--dataset", "synapse",
        "--num_classes", str(N_CLS), "--img_size", str(PATCH),
        "--volume_path", str(vol_dir), "--list_dir", str(list_dir),
        "--checkpoint", str(pth), "--mode", "fg_only",
    ])
    cli.main()
    out = capsys.readouterr().out

    got_case = {
        m.group(1): (float(m.group(2)), float(m.group(3)))
        for m in re.finditer(
            r"^(case\d+): mean_dice ([\d.]+) mean_hd95 ([\d.]+)", out, re.M)
    }
    assert set(got_case) == set(names), out
    for i, name in enumerate(names):
        np.testing.assert_allclose(
            got_case[name], [want[i, :, 0].mean(), want[i, :, 1].mean()],
            atol=5e-3, err_msg=f"{name}\n{out}")
    m = re.search(r"^mean dice ([\d.]+) mean hd95 ([\d.]+)", out, re.M)
    assert m, out
    np.testing.assert_allclose(
        [float(m.group(1)), float(m.group(2))],
        [want[:, :, 0].mean(axis=0).mean(), want[:, :, 1].mean(axis=0).mean()],
        atol=5e-3)


@pytest.mark.parametrize("which,mode", [("MERIT", "fg_minus_bg"),
                                        ("EMCAD", "fg_only")])
def test_volume_pipeline_parity(setup, which, mode):
    ref, ours, fvars, vols = setup
    want = _reference_metrics(ref, vols, which)
    got, names = run_test_volumes(
        ours, fvars, _ListDataset(vols), N_CLS,
        patch_size=(PATCH, PATCH), mode=mode)
    assert got.shape == want.shape, (got.shape, want.shape)
    # the prediction volumes must agree voxel-wise up to f32 argmax ties;
    # at random init a handful of flips is possible — metrics must agree to
    # well under a percent of dice
    np.testing.assert_allclose(got, want, atol=5e-3,
                               err_msg=f"{which}/{mode}")


def test_cli_acdc_disk_format_parity(setup, tmp_path, capsys, monkeypatch):
    """The ACDC analogue of the Synapse disk test: volumes as the ACDC
    release's per-volume ``.npz`` (keys img/label, list entries carry the
    extension — ``MERIT/utils/dataset_ACDC.py:104-116``), the MERIT test
    pipeline (``MERIT/utils/utils.py:172-206``, dual combine = fg - bg) vs
    our ``cli/test_multiclass.py --dataset acdc --mode fg_minus_bg`` driven
    through argv on the same files."""
    import re
    import sys

    ref, ours, fvars, vols = setup

    vol_dir = tmp_path / "acdc"
    list_dir = tmp_path / "lists"
    vol_dir.mkdir()
    list_dir.mkdir()
    names = []
    for i, (img, lab) in enumerate(vols):
        name = f"case{i:03d}_volume_ES.npz"
        names.append(name)
        np.savez(vol_dir / name, img=img, label=lab)
    (list_dir / "test.txt").write_text("\n".join(names) + "\n")
    pth = tmp_path / "plain.pth"
    torch.save(ref.state_dict(), pth)

    # ---- the reference's MERIT slice pipeline (fg - bg combine) ----
    want = _reference_metrics(ref, vols, "MERIT")  # (cases, classes-1, 4)

    # ---- our CLI on the same .npz + lists ----
    from pranet2_tpu.cli import test_multiclass as cli

    monkeypatch.setattr(sys, "argv", [
        "test_multiclass", "--model", "emcad", "--encoder", "pvt_v2_b0",
        "--activation_mscb", "relu", "--dataset", "acdc",
        "--num_classes", str(N_CLS), "--img_size", str(PATCH),
        "--volume_path", str(vol_dir), "--list_dir", str(list_dir),
        "--checkpoint", str(pth), "--mode", "fg_minus_bg",
    ])
    cli.main()
    out = capsys.readouterr().out

    got_case = {
        m.group(1): (float(m.group(2)), float(m.group(3)))
        for m in re.finditer(
            r"^(\S+\.npz): mean_dice ([\d.]+) mean_hd95 ([\d.]+)", out, re.M)
    }
    assert set(got_case) == set(names), out
    for i, name in enumerate(names):
        np.testing.assert_allclose(
            got_case[name], [want[i, :, 0].mean(), want[i, :, 1].mean()],
            atol=5e-3, err_msg=f"{name}\n{out}")
