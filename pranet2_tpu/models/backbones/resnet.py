"""torchvision-style ResNet backbone (flax, NHWC) — EMCAD encoder option.

Behavioral spec re-derived from ``multiclass_seg/EMCAD/lib/resnet.py``:
7x7/2 stem + maxpool, BasicBlock (18/34) or Bottleneck (50/101/152) stages,
1x1-conv downsample shortcuts, returns the 4 stage feature maps.
Names mirror torch paths for the ``.pth`` converter.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pranet2_tpu.nn import torch_bn

from pranet2_tpu.ops import max_pool

_LAYERS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


class _Block(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    kind: str = "basic"  # 'basic' | 'bottleneck'
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype

        def conv(f, k, s, name, pad=0):
            return nn.Conv(f, (k, k), strides=(s, s),
                           padding=((pad, pad), (pad, pad)), use_bias=False,
                           dtype=dt, param_dtype=jnp.float32, name=name)

        def bn(name):
            return torch_bn(train, dt, name)

        residual = x
        if self.kind == "basic":
            out = nn.relu(bn("bn1")(conv(self.planes, 3, self.stride, "conv1", 1)(x)))
            out = bn("bn2")(conv(self.planes, 3, 1, "conv2", 1)(out))
            out_ch = self.planes
        else:
            out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, "conv1")(x)))
            out = nn.relu(bn("bn2")(conv(self.planes, 3, self.stride, "conv2", 1)(out)))
            out = bn("bn3")(conv(self.planes * 4, 1, 1, "conv3")(out))
            out_ch = self.planes * 4
        if self.has_downsample:
            residual = bn("downsample_1")(
                conv(out_ch, 1, self.stride, "downsample_0")(x)
            )
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """Returns the 4-stage NHWC feature pyramid (strides 4/8/16/32)."""

    kind: str = "bottleneck"
    layers: tuple[int, ...] = (3, 4, 6, 3)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=dt, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = torch_bn(train, dt, "bn1")(x)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1)

        expansion = 1 if self.kind == "basic" else 4
        feats = []
        inplanes = 64
        for li, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers), start=1
        ):
            stride = 1 if li == 1 else 2
            for bi in range(blocks):
                if bi == 0:
                    has_ds = stride != 1 or inplanes != planes * expansion
                    x = _Block(planes, stride, has_ds, self.kind, dt,
                               name=f"layer{li}_{bi}")(x, train)
                    inplanes = planes * expansion
                else:
                    x = _Block(planes, 1, False, self.kind, dt,
                               name=f"layer{li}_{bi}")(x, train)
            feats.append(x)
        return tuple(feats)


def resnet(variant: str = "resnet50", dtype=None) -> ResNet:
    kind, layers = _LAYERS[variant]
    return ResNet(kind=kind, layers=layers, dtype=dtype)
