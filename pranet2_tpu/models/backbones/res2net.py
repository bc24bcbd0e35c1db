"""Res2Net-v1b backbone (NHWC, flax) — the PraNet encoder.

Behavioral spec (re-derived from ``binary_seg/lib/Res2Net_v1b.py``):
* Bottle2neck: 1x1 expand to ``width*scale`` channels, split into ``scale``
  groups of ``width``; groups 0..scale-2 go through 3x3 conv+BN+ReLU with a
  running-sum feed ('normal' blocks) or independently ('stage' blocks); the
  last group passes through ('normal') or is 3x3/stride avg-pooled ('stage');
  concat, 1x1 project x4, residual add, ReLU.  width = floor(planes*26/64),
  scale = 4.
* v1b deep stem: three 3x3 convs (3->32->32->64, first stride 2) + BN + ReLU,
  then 3x3/2 maxpool.
* v1b downsample shortcut: stride/stride avg-pool (ceil_mode,
  count_include_pad=False) then 1x1 conv + BN.

Module names mirror the torch attribute paths ('.' -> '_') so the ``.pth``
converter is a rename + OIHW->HWIO transpose.

TPU notes: the per-group 3x3 convs have width 26/52/104/208 channels — small,
but each is still a dense conv the MXU handles well; groups are unrolled at
trace time (scale is static) and XLA overlaps them.  All tensors NHWC.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from pranet2_tpu.nn import torch_bn

from pranet2_tpu.ops import avg_pool, max_pool


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    stype: str = "normal"  # 'normal' | 'stage'
    base_width: int = 26
    scale: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        expansion = 4

        def conv(feats, k, s, name, pad=0):
            return nn.Conv(
                feats, (k, k), strides=(s, s),
                padding=((pad, pad), (pad, pad)), use_bias=False,
                dtype=dt, param_dtype=jnp.float32, name=name,
            )

        def bn(name):
            return torch_bn(train, dt, name,)

        out = nn.relu(bn("bn1")(conv(width * self.scale, 1, 1, "conv1")(x)))

        nums = 1 if self.scale == 1 else self.scale - 1
        spx = [out[..., i * width:(i + 1) * width] for i in range(self.scale)]
        parts = []
        sp = None
        for i in range(nums):
            sp = spx[i] if (i == 0 or self.stype == "stage") else sp + spx[i]
            sp = conv(width, 3, self.stride, f"convs_{i}", pad=1)(sp)
            sp = nn.relu(bn(f"bns_{i}")(sp))
            parts.append(sp)
        if self.scale != 1:
            if self.stype == "normal":
                parts.append(spx[-1])
            else:  # 'stage': 3x3/stride avg pool on the passthrough group
                parts.append(avg_pool(spx[-1], 3, self.stride, 1))
        out = jnp.concatenate(parts, axis=-1)

        out = bn("bn3")(conv(self.planes * expansion, 1, 1, "conv3")(out))

        if self.has_downsample:
            # v1b: avgpool(stride, ceil, count_include_pad=False) -> 1x1 -> BN
            short = x
            if self.stride != 1:
                short = avg_pool(short, self.stride, self.stride, 0,
                                 count_include_pad=False, ceil_mode=True)
            short = conv(self.planes * expansion, 1, 1, "downsample_1")(short)
            short = bn("downsample_2")(short)
        else:
            short = x
        return nn.relu(out + short)


class Res2Net(nn.Module):
    """Res2Net-v1b feature-pyramid backbone.

    ``__call__`` returns (x1, x2, x3, x4) at strides 4/8/16/32 with channels
    256/512/1024/2048, exactly the stages PraNet consumes.
    """

    layers: tuple[int, ...] = (3, 4, 6, 3)
    base_width: int = 26
    scale: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype

        def conv(feats, k, s, name, pad=0):
            return nn.Conv(
                feats, (k, k), strides=(s, s),
                padding=((pad, pad), (pad, pad)), use_bias=False,
                dtype=dt, param_dtype=jnp.float32, name=name,
            )

        def bn(name):
            return torch_bn(train, dt, name,)

        # deep stem: torch names conv1.{0,1,3,4,6} + bn1
        x = nn.relu(bn("conv1_1")(conv(32, 3, 2, "conv1_0", pad=1)(x)))
        x = nn.relu(bn("conv1_4")(conv(32, 3, 1, "conv1_3", pad=1)(x)))
        x = conv(64, 3, 1, "conv1_6", pad=1)(x)
        x = nn.relu(bn("bn1")(x))
        x = max_pool(x, 3, 2, 1)

        feats = []
        inplanes = 64
        for li, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers), start=1
        ):
            stride = 1 if li == 1 else 2
            for bi in range(blocks):
                if bi == 0:
                    has_ds = stride != 1 or inplanes != planes * 4
                    x = Bottle2neck(
                        planes, stride, has_ds, "stage",
                        self.base_width, self.scale, dt,
                        name=f"layer{li}_{bi}",
                    )(x, train)
                    inplanes = planes * 4
                else:
                    x = Bottle2neck(
                        planes, 1, False, "normal",
                        self.base_width, self.scale, dt,
                        name=f"layer{li}_{bi}",
                    )(x, train)
            feats.append(x)
        return tuple(feats)


def res2net50_v1b(dtype=None) -> Res2Net:
    return Res2Net(layers=(3, 4, 6, 3), dtype=dtype)


def res2net101_v1b(dtype=None) -> Res2Net:
    return Res2Net(layers=(3, 4, 23, 3), dtype=dtype)
