from pranet2_tpu.data.polyp import OdgtDataset, PolypDataset, PolypTestDataset
from pranet2_tpu.data.loader import (
    AugmentedView,
    BatchLoader,
    CachedDataset,
    DevicePrefetcher,
)
from pranet2_tpu.data.volumes import (
    ACDCDataset,
    RandomGenerator,
    RandomGeneratorACDC,
    SynapseDataset,
    remap_synapse_labels,
)

__all__ = [
    "AugmentedView",
    "CachedDataset",
    "OdgtDataset",
    "PolypDataset",
    "PolypTestDataset",
    "BatchLoader",
    "DevicePrefetcher",
    "ACDCDataset",
    "RandomGenerator",
    "RandomGeneratorACDC",
    "SynapseDataset",
    "remap_synapse_labels",
]
