"""Property tests: evalx.volumetric vs an independent medpy-faithful oracle.

medpy 0.5.2 (the library the reference's published numbers used,
``multiclass_seg/MERIT/utils/utils.py:146-158``) is not installed in this
image, so the oracle below is a fresh, independent transcription of
``medpy.metric.binary``'s algorithm semantics:

* ``__surface_distances(result, reference, voxelspacing, connectivity=1)``:
  border voxels via ``a ^ binary_erosion(a, generate_binary_structure(ndim,
  connectivity), iterations=1)`` (scipy default border_value=0, so
  array-edge voxels count as border), then the exact Euclidean distance
  transform of the *complement of the reference border*, sampled at the
  result's border voxels.
* ``dc`` = 2|A∩B| / (|A|+|B|);  ``jc`` = |A∩B| / |A∪B|.
* ``hd95`` = 95th percentile of the **hstacked** two-direction distance
  distribution (not the max of per-direction percentiles).
* ``assd`` = mean of the two directed average surface distances.

The oracle is deliberately written as a separate code path (no shared
helpers with ``pranet2_tpu.evalx.volumetric``) so the property test detects
convention drift in either copy.
"""

from __future__ import annotations

import numpy as np
import pytest
from scipy.ndimage import (
    binary_erosion,
    distance_transform_edt,
    generate_binary_structure,
)

from pranet2_tpu.evalx import volumetric as V

pytestmark = pytest.mark.slow


# ----------------------------------------------------------------- oracle --
def _medpy_surface_distances(result, reference, voxelspacing=None,
                             connectivity=1):
    result = np.atleast_1d(result.astype(bool))
    reference = np.atleast_1d(reference.astype(bool))
    footprint = generate_binary_structure(result.ndim, connectivity)
    assert np.count_nonzero(result), "oracle: empty result mask"
    assert np.count_nonzero(reference), "oracle: empty reference mask"
    result_border = result ^ binary_erosion(
        result, structure=footprint, iterations=1)
    reference_border = reference ^ binary_erosion(
        reference, structure=footprint, iterations=1)
    dt = distance_transform_edt(~reference_border, sampling=voxelspacing)
    return dt[result_border]


def medpy_dc(result, reference):
    result = np.atleast_1d(result.astype(bool))
    reference = np.atleast_1d(reference.astype(bool))
    intersection = np.count_nonzero(result & reference)
    denom = float(np.count_nonzero(result) + np.count_nonzero(reference))
    return 2.0 * intersection / denom if denom else 0.0


def medpy_jc(result, reference):
    result = np.atleast_1d(result.astype(bool))
    reference = np.atleast_1d(reference.astype(bool))
    union = float(np.count_nonzero(result | reference))
    return np.count_nonzero(result & reference) / union if union else 0.0


def medpy_hd95(result, reference, voxelspacing=None):
    hd1 = _medpy_surface_distances(result, reference, voxelspacing)
    hd2 = _medpy_surface_distances(reference, result, voxelspacing)
    return float(np.percentile(np.hstack((hd1, hd2)), 95))


def medpy_assd(result, reference, voxelspacing=None):
    asd1 = _medpy_surface_distances(result, reference, voxelspacing).mean()
    asd2 = _medpy_surface_distances(reference, result, voxelspacing).mean()
    return float(np.mean((asd1, asd2)))


# ------------------------------------------------------------ mask makers --
def _random_blob(rng, shape, p_seed=0.02, iters=3):
    """Connected-ish random mask: seeds dilated a few times."""
    from scipy.ndimage import binary_dilation
    m = rng.random(shape) < p_seed
    if not m.any():
        m.flat[rng.integers(m.size)] = True
    return binary_dilation(m, iterations=iters)


def _random_masks(seed):
    rng = np.random.default_rng(seed)
    ndim = int(rng.integers(2, 4))  # 2D and 3D volumes
    shape = tuple(int(rng.integers(8, 28)) for _ in range(ndim))
    pred = _random_blob(rng, shape, iters=int(rng.integers(1, 4)))
    kind = rng.integers(3)
    if kind == 0:  # independent
        gt = _random_blob(rng, shape, iters=int(rng.integers(1, 4)))
    elif kind == 1:  # noisy copy of pred (high-overlap regime)
        gt = pred ^ (rng.random(shape) < 0.05)
        if not gt.any():
            gt = pred.copy()
    else:  # shifted copy (systematic surface offset)
        gt = np.roll(pred, shift=int(rng.integers(1, 4)), axis=0)
    return pred, gt


# -------------------------------------------------------------- the tests --
@pytest.mark.parametrize("seed", range(120))
def test_metrics_match_medpy(seed):
    pred, gt = _random_masks(seed)
    assert np.isclose(V.dice_coefficient(pred, gt), medpy_dc(pred, gt))
    assert np.isclose(V.jaccard(pred, gt), medpy_jc(pred, gt))
    assert np.isclose(V.hd95(pred, gt), medpy_hd95(pred, gt))
    assert np.isclose(V.assd(pred, gt), medpy_assd(pred, gt))


@pytest.mark.parametrize("seed", range(20))
def test_metrics_match_medpy_voxelspacing(seed):
    rng = np.random.default_rng(1000 + seed)
    pred, gt = _random_masks(3000 + seed)
    spacing = tuple(float(s) for s in rng.uniform(0.5, 3.0, pred.ndim))
    assert np.isclose(V.hd95(pred, gt, spacing),
                      medpy_hd95(pred, gt, spacing))
    assert np.isclose(V.assd(pred, gt, spacing),
                      medpy_assd(pred, gt, spacing))


def test_calculate_metric_percase_conventions():
    # Reference conventions (MERIT/utils/utils.py:146-158).
    rng = np.random.default_rng(0)
    pred = _random_blob(rng, (16, 16, 16))
    gt = _random_blob(rng, (16, 16, 16))
    d, h, j, a = V.calculate_metric_percase(pred.astype(np.int64),
                                            gt.astype(np.int64))
    assert np.isclose(d, medpy_dc(pred, gt))
    assert np.isclose(h, medpy_hd95(pred, gt))
    assert np.isclose(j, medpy_jc(pred, gt))
    assert np.isclose(a, medpy_assd(pred, gt))
    zeros = np.zeros((8, 8, 8), np.int64)
    assert V.calculate_metric_percase(pred.astype(np.int64), zeros) == (
        1.0, 0.0, 1.0, 0.0)
    assert V.calculate_metric_percase(zeros, gt.astype(np.int64)) == (
        0.0, 0.0, 0.0, 0.0)
    assert V.calculate_metric_percase(zeros, zeros) == (0.0, 0.0, 0.0, 0.0)


def test_single_voxel_and_full_masks():
    # Edge regimes where border/erosion conventions matter most.
    one = np.zeros((9, 9), bool); one[4, 4] = True
    full = np.ones((9, 9), bool)
    for a, b in [(one, full), (full, one), (one, one), (full, full)]:
        assert np.isclose(V.hd95(a, b), medpy_hd95(a, b))
        assert np.isclose(V.assd(a, b), medpy_assd(a, b))
