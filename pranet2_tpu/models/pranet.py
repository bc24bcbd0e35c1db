"""PraNet-V1 (reverse attention) and PraNet-V2 (DSRA) — binary polyp models.

Behavioral spec re-derived from ``binary_seg/lib/PraNet_Res2Net.py`` (V1) and
``binary_seg/lib/pranet.py`` (V2):

* Encoder stages 2-4 -> three RFBs (->32ch) -> cascaded partial decoder ->
  coarse map(s) at 1/8 scale.
* V1: three reverse-attention branches refine coarse-to-fine:
  ``feat * (1 - sigmoid(crop))`` -> conv trunk -> 1ch residual added to crop.
  Returns 4 maps (coarse-first), all upsampled to input size.
* V2 (DSRA): partial decoder emits fg *and* bg coarse maps; each branch runs
  its conv trunk directly on the backbone stage, emits fg/bg heads, and gates
  fg with ``fg += fg * softmax(crop_fg - crop_bg)``.  Returns 8 maps
  (4 fg fine-first, then 4 bg).
* All lateral upsampling is bilinear align_corners=False; the decoder's
  internal x2 upsamples are align_corners=True.
* 1-channel inputs pass through a 1x1 conv+BN+ReLU stem to 3 channels
  (V2 only, ``pranet.py:139-143``).

TPU design: NHWC; the whole forward is one jittable function of static shape,
so XLA fuses RA gates into the adjacent convs; bf16 compute is enabled by
constructing with ``dtype=jnp.bfloat16`` (params/BN stats stay f32).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pranet2_tpu.models.backbones.res2net import Res2Net
from pranet2_tpu.models.registry import register_model
from pranet2_tpu.nn import RFB, ConvBN, PartialDecoder, torch_bn
from pranet2_tpu.ops import dsra_gate, resize_bilinear, reverse_attention
from pranet2_tpu.ops.dsra import dsra_gate_pallas


def _make_backbone(kind: str, dtype):
    """Construct the named backbone as submodule 'backbone' (call in compact)."""
    if kind == "res2net50":
        return (
            Res2Net(layers=(3, 4, 6, 3), dtype=dtype, name="backbone"),
            (512, 1024, 2048),
        )
    if kind == "pvt_v2_b2":
        from pranet2_tpu.models.backbones.pvtv2 import PVTv2, PVT_CONFIGS

        return (
            PVTv2(**PVT_CONFIGS["b2"], dtype=dtype, name="backbone"),
            (128, 320, 512),
        )
    if kind == "resnet50":
        from pranet2_tpu.models.backbones.resnet import ResNet

        return (
            ResNet(kind="bottleneck", layers=(3, 4, 6, 3), dtype=dtype,
                   name="backbone"),
            (512, 1024, 2048),
        )
    raise ValueError(f"unknown backbone {kind!r}")


class _RABranch(nn.Module):
    """V1 reverse-attention branch: trunk convs -> 1ch residual."""

    mid: int
    n_convs: int
    ksize: int
    head_ksize: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        kp = self.ksize // 2
        x = ConvBN(self.mid, 1, dtype=dt, name="conv1")(x, train)
        for i in range(2, 2 + self.n_convs):
            x = nn.relu(
                ConvBN(self.mid, self.ksize, padding=kp, dtype=dt,
                       name=f"conv{i}")(x, train)
            )
        hp = self.head_ksize // 2
        return ConvBN(1, self.head_ksize, padding=hp, dtype=dt,
                      name=f"conv{2 + self.n_convs}")(x, train)


class _DSRABranch(nn.Module):
    """V2 DSRA branch: trunk convs on the raw stage -> fg/bg heads."""

    mid: int
    n_convs: int
    ksize: int
    head_ksize: int
    num_class: int
    head_idx: int  # torch naming: convN_fg / convN_bg
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        kp = self.ksize // 2
        x = ConvBN(self.mid, 1, dtype=dt, name="conv1")(x, train)
        for i in range(2, 2 + self.n_convs):
            x = nn.relu(
                ConvBN(self.mid, self.ksize, padding=kp, dtype=dt,
                       name=f"conv{i}")(x, train)
            )
        hp = self.head_ksize // 2
        fg = ConvBN(self.num_class, self.head_ksize, padding=hp, dtype=dt,
                    name=f"conv{self.head_idx}_fg")(x, train)
        bg = ConvBN(self.num_class, self.head_ksize, padding=hp, dtype=dt,
                    name=f"conv{self.head_idx}_bg")(x, train)
        return fg, bg


class PraNetV1(nn.Module):
    """PraNet-V1. Returns (map5, map4, map3, map2) at input resolution."""

    backbone: str = "res2net50"
    channel: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        n, h, w, _ = x.shape
        bb, (c2, c3, c4) = _make_backbone(self.backbone, dt)
        _, x2, x3, x4 = bb(x, train)

        x2_rfb = RFB(self.channel, dt, name="rfb2_1")(x2, train)
        x3_rfb = RFB(self.channel, dt, name="rfb3_1")(x3, train)
        x4_rfb = RFB(self.channel, dt, name="rfb4_1")(x4, train)

        ra5_feat = PartialDecoder(self.channel, None, dt, name="agg1")(
            x4_rfb, x3_rfb, x2_rfb, train
        )
        lateral_map_5 = resize_bilinear(ra5_feat, (h, w))

        # branch 4 (1/32)
        h32, w32 = x4.shape[1], x4.shape[2]
        crop_4 = resize_bilinear(ra5_feat, (h32, w32))
        f = reverse_attention(crop_4, x4)
        ra4_feat = _RABranch(256, 3, 5, 1, dt, name="ra4")(f, train)
        x_4 = ra4_feat + crop_4
        lateral_map_4 = resize_bilinear(x_4, (h, w))

        # branch 3 (1/16)
        h16, w16 = x3.shape[1], x3.shape[2]
        crop_3 = resize_bilinear(x_4, (h16, w16))
        f = reverse_attention(crop_3, x3)
        ra3_feat = _RABranch(64, 2, 3, 3, dt, name="ra3")(f, train)
        x_3 = ra3_feat + crop_3
        lateral_map_3 = resize_bilinear(x_3, (h, w))

        # branch 2 (1/8)
        h8, w8 = x2.shape[1], x2.shape[2]
        crop_2 = resize_bilinear(x_3, (h8, w8))
        f = reverse_attention(crop_2, x2)
        ra2_feat = _RABranch(64, 2, 3, 3, dt, name="ra2")(f, train)
        x_2 = ra2_feat + crop_2
        lateral_map_2 = resize_bilinear(x_2, (h, w))

        return lateral_map_5, lateral_map_4, lateral_map_3, lateral_map_2


class PraNetV2(nn.Module):
    """PraNet-V2 (DSRA). Returns 8 maps: fg(1/8, 1/16, 1/32, coarse) then bg.

    Output order matches the reference: (map2_fg, map3_fg, map4_fg, map5_fg,
    map2_bg, map3_bg, map4_bg, map5_bg), all at input resolution.
    """

    backbone: str = "res2net50"
    channel: int = 32
    num_class: int = 1
    use_softmax: bool = True
    use_pallas_gate: bool = False  # route DSRA gates through the fused kernel
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        nc = self.num_class
        gate = dsra_gate_pallas if self.use_pallas_gate else dsra_gate
        if x.shape[-1] == 1:
            # grayscale stem: 1x1 conv -> BN -> ReLU to 3 channels
            x = nn.Conv(3, (1, 1), dtype=dt, param_dtype=jnp.float32,
                        name="stem_conv")(x)
            x = torch_bn(train, dt, "stem_bn")(x)
            x = nn.relu(x)
        n, h, w, _ = x.shape
        bb, (c2, c3, c4) = _make_backbone(self.backbone, dt)
        _, x2, x3, x4 = bb(x, train)

        x2_rfb = RFB(self.channel, dt, name="rfb2_1")(x2, train)
        x3_rfb = RFB(self.channel, dt, name="rfb3_1")(x3, train)
        x4_rfb = RFB(self.channel, dt, name="rfb4_1")(x4, train)

        ra5_fg, ra5_bg = PartialDecoder(self.channel, nc, dt, name="agg1")(
            x4_rfb, x3_rfb, x2_rfb, train
        )
        map5_fg = resize_bilinear(ra5_fg, (h, w))
        map5_bg = resize_bilinear(ra5_bg, (h, w))

        # ---- DSRA3 on stage 4 (1/32) ----
        h32, w32 = x4.shape[1], x4.shape[2]
        crop4_fg = resize_bilinear(ra5_fg, (h32, w32))
        crop4_bg = resize_bilinear(ra5_bg, (h32, w32))
        ra4_fg, ra4_bg = _DSRABranch(256, 3, 5, 1, nc, 5, dt, name="ra4")(
            x4, train
        )
        ra4_fg = gate(ra4_fg, crop4_fg, crop4_bg, self.use_softmax)
        map4_fg = resize_bilinear(ra4_fg, (h, w))
        map4_bg = resize_bilinear(ra4_bg, (h, w))

        # ---- DSRA2 on stage 3 (1/16) ----
        h16, w16 = x3.shape[1], x3.shape[2]
        crop3_fg = resize_bilinear(ra4_fg, (h16, w16))
        crop3_bg = resize_bilinear(ra4_bg, (h16, w16))
        ra3_fg, ra3_bg = _DSRABranch(64, 2, 3, 3, nc, 4, dt, name="ra3")(
            x3, train
        )
        ra3_fg = gate(ra3_fg, crop3_fg, crop3_bg, self.use_softmax)
        map3_fg = resize_bilinear(ra3_fg, (h, w))
        map3_bg = resize_bilinear(ra3_bg, (h, w))

        # ---- DSRA1 on stage 2 (1/8) ----
        h8, w8 = x2.shape[1], x2.shape[2]
        crop2_fg = resize_bilinear(ra3_fg, (h8, w8))
        crop2_bg = resize_bilinear(ra3_bg, (h8, w8))
        ra2_fg, ra2_bg = _DSRABranch(64, 2, 3, 3, nc, 4, dt, name="ra2")(
            x2, train
        )
        ra2_fg = gate(ra2_fg, crop2_fg, crop2_bg, self.use_softmax)
        map2_fg = resize_bilinear(ra2_fg, (h, w))
        map2_bg = resize_bilinear(ra2_bg, (h, w))

        return (map2_fg, map3_fg, map4_fg, map5_fg,
                map2_bg, map3_bg, map4_bg, map5_bg)


@register_model("pranet_v1")
def _pranet_v1(**kw):
    return PraNetV1(backbone="res2net50", **kw)


@register_model("pvt_pranet_v1")
def _pvt_pranet_v1(**kw):
    return PraNetV1(backbone="pvt_v2_b2", **kw)


@register_model("pranet_v1_resnet")
def _pranet_v1_resnet(**kw):
    """Legacy 'CRANet' (``binary_seg/lib/PraNet_ResNet.py:102``): PraNet-V1
    over a plain torchvision-style ResNet-50 — identical RFB/decoder/RA heads,
    only the encoder differs.  Not wired to any reference CLI; kept for
    checkpoint compatibility."""
    return PraNetV1(backbone="resnet50", **kw)


@register_model("pranet_v2")
def _pranet_v2(**kw):
    return PraNetV2(backbone="res2net50", **kw)


@register_model("pvt_pranet_v2")
def _pvt_pranet_v2(**kw):
    return PraNetV2(backbone="pvt_v2_b2", **kw)
