"""RAM-cache pipeline tests (CachedDataset / AugmentedView)."""

import numpy as np

from pranet2_tpu.data import AugmentedView, CachedDataset


class _CountingDS:
    def __init__(self, n=12):
        self.n = n
        self.calls = 0

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.calls += 1
        return np.full((4, 4), float(i), np.float32), np.full((4, 4), i, np.int32)


def test_cached_dataset_single_decode():
    ds = _CountingDS()
    cds = CachedDataset(ds, num_procs=1)  # in-process so calls are visible
    assert ds.calls == 12
    for _ in range(3):
        for i in range(len(cds)):
            img, lab = cds[i]
            assert img[0, 0] == float(i)
    assert ds.calls == 12  # no re-decode


def test_cached_dataset_multiprocess_matches():
    ds = _CountingDS(16)
    a = CachedDataset(_CountingDS(16), num_procs=1)
    b = CachedDataset(_CountingDS(16), num_procs=4)
    for i in range(16):
        np.testing.assert_array_equal(a[i][0], b[i][0])
        np.testing.assert_array_equal(a[i][1], b[i][1])


def test_augmented_view_random_per_access():
    from pranet2_tpu.data import RandomGenerator

    raw = CachedDataset(_CountingDS(4), num_procs=1)
    aug = RandomGenerator((4, 4), seed=0)

    def adapter(image, label):
        img, lab = aug(image, label)
        return img[..., None], lab

    view = AugmentedView(raw, adapter)
    assert len(view) == 4
    img, lab = view[1]
    assert img.shape == (4, 4, 1) and lab.shape == (4, 4)
