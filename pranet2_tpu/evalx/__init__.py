from pranet2_tpu.evalx.binary_metrics import (
    BINARY_METRIC_NAMES,
    binary_image_metrics,
    aggregate_dataset_metrics,
)

__all__ = [
    "BINARY_METRIC_NAMES",
    "binary_image_metrics",
    "aggregate_dataset_metrics",
]

try:
    from pranet2_tpu.evalx.volumetric import calculate_metric_percase  # noqa: F401

    __all__.append("calculate_metric_percase")
except ImportError:  # pragma: no cover
    pass
