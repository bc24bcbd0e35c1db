from pranet2_tpu.data.polyp import PolypDataset, PolypTestDataset
from pranet2_tpu.data.loader import BatchLoader, DevicePrefetcher

__all__ = ["PolypDataset", "PolypTestDataset", "BatchLoader", "DevicePrefetcher"]
