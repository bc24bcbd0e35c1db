"""MERIT: multi-scale MaxViT dual-backbone cascaded segmentation (+DSRA dual).

Behavioral spec re-derived from ``multiclass_seg/MERIT/lib/networks.py``:

* Two MaxViT backbones — one trained at 256 (window 8), one at 224 (window 7);
  'small' scale = maxvit_rmlp_small_rw_224 + maxxvit_rmlp_small_rw_256,
  'tiny' = maxvit_tiny_rw_224 + maxvit_rmlp_tiny_rw_256 (``:30-60``).
* Cascaded (``:616-733`` single, ``:733-860`` dual): backbone1 on the input
  resized to 256 -> shared CASCADE decoder -> maps; the finest decoder
  feature produces a sigmoid feedback map that *gates the input image*;
  backbone2 runs at 224 on the gated input; stage features of pass 1 are
  resized and added as skips; second decoder pass; per-level maps from both
  passes are upsampled and summed.  Branch order flips when H % 14 == 0
  (``:785,822``).
* Parallel (``:514-614``): both backbones see the raw input at their scales;
  shared dual decoder; maps summed.
* Dual decoders emit fg/bg maps directly; single variants apply shared
  ``out_head`` 1x1 convs to decoder features.

The reference instantiates `img_size_s1=(256,256)`, `img_size_s2=(224,224)`
for both ACDC and Synapse training.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pranet2_tpu.nn import torch_bn

from pranet2_tpu.models.backbones.maxvit import MAXVIT_CONFIGS, MaxxVit
from pranet2_tpu.models.decoders import CascadeAdd, CascadeAddDual, CascadeCat
from pranet2_tpu.models.registry import register_model
from pranet2_tpu.ops import resize_bilinear

_SCALE_CHANNELS = {
    "tiny": (512, 256, 128, 64),
    "small": (768, 384, 192, 96),
    # compile-budget-bound sharding dry runs only (see maxvit_dryrun)
    "dryrun": (128, 64, 32, 32),
}
_SCALE_BACKBONES = {
    # (for img 256, for img 224) — reference load_pretrained_weights
    # (``MERIT/lib/networks.py:30-60``: tiny-224 uses maxvit_tiny_rw_224
    #  with a learned rel-pos table, not the MLP variant)
    "tiny": ("maxvit_rmlp_tiny_rw_256", "maxvit_tiny_rw_224"),
    "small": ("maxxvit_rmlp_small_rw_256", "maxvit_rmlp_small_rw_224"),
    "dryrun": ("maxvit_dryrun", "maxvit_dryrun"),
}


class _GrayStem(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(3, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_conv")(x)
        x = torch_bn(train, self.dtype, "stem_bn")(x)
        return nn.relu(x)


class MERITCascaded(nn.Module):
    """MERIT cascaded; ``dual=True`` -> 8 fg/bg maps, else 4 maps."""

    num_classes: int = 4
    model_scale: str = "small"
    img_size_s1: tuple[int, int] = (256, 256)
    img_size_s2: tuple[int, int] = (224, 224)
    decoder_aggregation: str = "additive"
    dual: bool = True
    use_softmax: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        nc = self.num_classes
        if x.shape[-1] == 1:
            x = _GrayStem(dt, name="gray")(x, train)
        n, h, w, _ = x.shape

        bb256_name, bb224_name = _SCALE_BACKBONES[self.model_scale]
        backbone1 = MaxxVit(**MAXVIT_CONFIGS[bb256_name], dtype=dt,
                            name="backbone1")
        backbone2 = MaxxVit(**MAXVIT_CONFIGS[bb224_name], dtype=dt,
                            name="backbone2")
        channels = _SCALE_CHANNELS[self.model_scale]
        if self.dual:
            decoder = CascadeAddDual(channels, nc, self.use_softmax, dt,
                                     name="decoder")
        elif self.decoder_aggregation == "additive":
            decoder = CascadeAdd(channels, dt, name="decoder")
        else:
            decoder = CascadeCat(channels, dt, name="decoder")

        # branch flip: H % 14 == 0 swaps which backbone sees which scale
        flip = (h % 14) == 0
        first_bb, second_bb = (backbone2, backbone1) if flip else (backbone1, backbone2)

        out_heads = None
        if not self.dual:
            out_heads = [
                nn.Conv(nc, (1, 1), dtype=dt, param_dtype=jnp.float32,
                        name=f"out_head{i + 1}")
                for i in range(4)
            ]

        f1 = first_bb(
            resize_bilinear(x, self.img_size_s1), train
        )
        outs1 = decoder(f1[3], [f1[2], f1[1], f1[0]], train)

        if self.dual:
            maps1 = outs1[:8]
            x14_o = outs1[8]
        else:
            feats1 = outs1
            maps1 = [h(f) for h, f in zip(out_heads, feats1)]
            x14_o = feats1[3]

        p14_in = nn.Conv(1, (1, 1), dtype=dt, param_dtype=jnp.float32,
                         name="out_head4_in")(x14_o)
        p14_in = nn.sigmoid(p14_in)

        maps1 = [resize_bilinear(m, (h, w)) for m in maps1]
        p14_in = resize_bilinear(p14_in, (h, w))
        x_in = x * p14_in

        f2 = second_bb(resize_bilinear(x_in, self.img_size_s2), train)
        skips = [
            resize_bilinear(f1[i], (f2[i].shape[1], f2[i].shape[2]))
            for i in range(4)
        ]
        fsum = [f2[i] + skips[i] for i in range(4)]
        outs2 = decoder(fsum[3], [fsum[2], fsum[1], fsum[0]], train)

        if self.dual:
            maps2 = outs2[:8]
        else:
            maps2 = [h(f) for h, f in zip(out_heads, outs2)]
        maps2 = [resize_bilinear(m, (h, w)) for m in maps2]
        return tuple(a + b for a, b in zip(maps1, maps2))


class MERITParallel(nn.Module):
    """MERIT parallel: both backbones on the raw input, shared decoder, sum."""

    num_classes: int = 4
    model_scale: str = "small"
    img_size_s1: tuple[int, int] = (256, 256)
    img_size_s2: tuple[int, int] = (224, 224)
    dual: bool = True
    use_softmax: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        nc = self.num_classes
        if x.shape[-1] == 1:
            x = _GrayStem(dt, name="gray")(x, train)
        n, h, w, _ = x.shape

        bb256_name, bb224_name = _SCALE_BACKBONES[self.model_scale]
        backbone1 = MaxxVit(**MAXVIT_CONFIGS[bb256_name], dtype=dt,
                            name="backbone1")
        backbone2 = MaxxVit(**MAXVIT_CONFIGS[bb224_name], dtype=dt,
                            name="backbone2")
        channels = _SCALE_CHANNELS[self.model_scale]
        if self.dual:
            decoder = CascadeAddDual(channels, nc, self.use_softmax, dt,
                                     name="decoder")
        else:
            decoder = CascadeAdd(channels, dt, name="decoder")

        f1 = backbone1(resize_bilinear(x, self.img_size_s1), train)
        f2 = backbone2(resize_bilinear(x, self.img_size_s2), train)
        outs1 = decoder(f1[3], [f1[2], f1[1], f1[0]], train)
        outs2 = decoder(f2[3], [f2[2], f2[1], f2[0]], train)

        if self.dual:
            maps1, maps2 = outs1[:8], outs2[:8]
        else:
            out_heads = [
                nn.Conv(nc, (1, 1), dtype=dt, param_dtype=jnp.float32,
                        name=f"out_head{i + 1}")
                for i in range(4)
            ]
            maps1 = [h(f) for h, f in zip(out_heads, outs1)]
            maps2 = [h(f) for h, f in zip(out_heads, outs2)]
        maps1 = [resize_bilinear(m, (h, w)) for m in maps1]
        maps2 = [resize_bilinear(m, (h, w)) for m in maps2]
        return tuple(a + b for a, b in zip(maps1, maps2))


class MaxViTSeg(nn.Module):
    """Plain MaxViT segmentation head: stage-4 feature -> 1x1 head -> x32
    upsample, one map (``MERIT/lib/networks.py:62-107`` — the zoo's minimal
    member; no reference CLI wires it)."""

    num_classes: int = 1
    img_size: int = 224
    model_scale: str = "small"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        if x.shape[-1] == 1:
            x = _GrayStem(dt, name="gray")(x, train)
        n, h, w, _ = x.shape
        bb256, bb224 = _SCALE_BACKBONES[self.model_scale]
        name = bb224 if self.img_size == 224 else bb256
        f = MaxxVit(**MAXVIT_CONFIGS[name], dtype=dt, name="backbone")(x, train)
        p = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                    param_dtype=jnp.float32, name="out_head")(f[3])
        return resize_bilinear(p, (h, w))


class MaxViT4Out(nn.Module):
    """Single backbone + 4 direct prediction heads, no decoder
    (``MERIT/lib/networks.py:164-220``)."""

    num_classes: int = 1
    img_size: int = 224
    model_scale: str = "small"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        nc = self.num_classes
        if x.shape[-1] == 1:
            x = _GrayStem(dt, name="gray")(x, train)
        n, h, w, _ = x.shape
        bb256, bb224 = _SCALE_BACKBONES[self.model_scale]
        name = bb224 if self.img_size == 224 else bb256
        f = MaxxVit(**MAXVIT_CONFIGS[name], dtype=dt, name="backbone")(x, train)
        maps = []
        for i, feat in enumerate((f[3], f[2], f[1], f[0]), start=1):
            p = nn.Conv(nc, (1, 1), dtype=dt, param_dtype=jnp.float32,
                        name=f"out_head{i}")(feat)
            maps.append(resize_bilinear(p, (h, w)))
        return tuple(maps)  # p1 (coarse) .. p4 (fine)


class MaxViTCascade(nn.Module):
    """Single backbone + CASCADE decoder + heads
    (``MERIT/lib/networks.py:287-350``)."""

    num_classes: int = 1
    img_size: int = 224
    model_scale: str = "small"
    decoder_aggregation: str = "additive"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        nc = self.num_classes
        if x.shape[-1] == 1:
            x = _GrayStem(dt, name="gray")(x, train)
        n, h, w, _ = x.shape
        bb256, bb224 = _SCALE_BACKBONES[self.model_scale]
        name = bb224 if self.img_size == 224 else bb256
        f = MaxxVit(**MAXVIT_CONFIGS[name], dtype=dt, name="backbone")(x, train)
        channels = _SCALE_CHANNELS[self.model_scale]
        if self.decoder_aggregation == "additive":
            dec = CascadeAdd(channels, dt, name="decoder")
        else:
            dec = CascadeCat(channels, dt, name="decoder")
        feats = dec(f[3], [f[2], f[1], f[0]], train)
        maps = []
        for i, feat in enumerate(feats, start=1):
            p = nn.Conv(nc, (1, 1), dtype=dt, param_dtype=jnp.float32,
                        name=f"out_head{i}")(feat)
            maps.append(resize_bilinear(p, (h, w)))
        return tuple(maps)


@register_model("maxvit_seg")
def _maxvit_seg(**kw):
    return MaxViTSeg(**kw)


@register_model("maxvit4out")
def _maxvit4out(**kw):
    return MaxViT4Out(**kw)


@register_model("maxvit_cascade")
def _maxvit_cascade(**kw):
    return MaxViTCascade(**kw)


@register_model("merit_cascaded")
def _merit_cascaded(**kw):
    return MERITCascaded(**kw)


@register_model("merit_parallel")
def _merit_parallel(**kw):
    return MERITParallel(**kw)
