from pranet2_tpu.ops.resize import resize_bilinear, upsample, upsample_nearest
from pranet2_tpu.ops.dsra import dsra_gate, reverse_attention
from pranet2_tpu.ops.pooling import avg_pool_same, max_pool, avg_pool
from pranet2_tpu.ops.dwconv import depthwise_conv3x3

__all__ = [
    "resize_bilinear",
    "upsample",
    "upsample_nearest",
    "dsra_gate",
    "reverse_attention",
    "avg_pool_same",
    "avg_pool",
    "max_pool",
    "depthwise_conv3x3",
]
