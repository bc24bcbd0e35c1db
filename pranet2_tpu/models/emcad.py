"""EMCAD: efficient multi-scale convolutional-attention decoder (+ DSRA dual).

Behavioral spec re-derived from ``multiclass_seg/EMCAD/lib/decoders.py`` and
``lib/networks.py``:

* MSCB: inverted-residual — pointwise expand (xEF) -> parallel depthwise convs
  k in kernel_sizes (summed) -> channel shuffle by gcd(expanded, out) ->
  pointwise project, skip (1x1-projected if channel mismatch) when stride 1.
* EUCB: nearest x2 upsample -> depthwise 3x3 + BN + act -> (identity) channel
  shuffle -> pointwise conv.
* LGAG: grouped-conv attention gate ``x * sigmoid(psi(relu(Wg g + Wx x)))``.
* CAB x SAB: channel (avg+max MLP) and spatial (7x7 on [mean,max]) attention.
* Decoder: per level CAB*SAB -> MSCB, EUCB upsample, LGAG-gated skip add.
* ``EMCADDual`` adds per-level fg/bg ConvBN heads and the DSRA softmax-
  difference gate between levels (``decoders.py:407-526``); maps are then
  upsampled x32/16/8/4 to input size (``networks.py:114-125``).
* Encoder zoo: pvt_v2_b0..b5 / resnet18..152 (``networks.py:25-68``),
  grayscale 1->3 stem.

TPU notes: depthwise convs use ``feature_group_count``; the channel shuffle
is a reshape/transpose XLA folds into the surrounding layout; adaptive pools
at 1x1 output are plain means/maxes over (H, W).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from pranet2_tpu.models.backbones.pvtv2 import PVT_CONFIGS, PVTv2
from pranet2_tpu.models.registry import register_model
from pranet2_tpu.nn import ConvBN, torch_bn
from pranet2_tpu.ops import dsra_gate, resize_bilinear, upsample_nearest


def _act(name: str):
    return {
        "relu": nn.relu,
        "relu6": lambda x: jnp.minimum(nn.relu(x), 6.0),
        "gelu": nn.gelu,
        "leakyrelu": lambda x: nn.leaky_relu(x, 0.2),
        "hswish": nn.hard_swish,
    }[name]


def _gcd(a, b):
    return math.gcd(a, b)


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """NHWC channel shuffle: interleave ``groups`` channel groups."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


class MSCB(nn.Module):
    """Multi-scale (inverted-residual) convolution block."""

    out_channels: int
    stride: int = 1
    kernel_sizes: tuple[int, ...] = (1, 3, 5)
    expansion_factor: int = 2
    dw_parallel: bool = True
    add: bool = True
    activation: str = "relu6"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        act = _act(self.activation)
        in_ch = x.shape[-1]
        ex = in_ch * self.expansion_factor

        def conv(f, k, s, name, pad=0, groups=1, bias=False):
            return nn.Conv(f, (k, k), strides=(s, s),
                           padding=((pad, pad), (pad, pad)),
                           feature_group_count=groups, use_bias=bias,
                           dtype=dt, param_dtype=jnp.float32, name=name)

        def bn(name):
            return torch_bn(train, dt, name)

        p = act(bn("pconv1_bn")(conv(ex, 1, 1, "pconv1")(x)))

        outs = []
        cur = p
        for i, k in enumerate(self.kernel_sizes):
            dw = conv(ex, k, self.stride, f"dwconv{i}", pad=k // 2, groups=ex)(cur)
            dw = act(bn(f"dwconv{i}_bn")(dw))
            outs.append(dw)
            if not self.dw_parallel:
                cur = cur + dw

        if self.add:
            d = sum(outs)
            combined = ex
        else:
            d = jnp.concatenate(outs, axis=-1)
            combined = ex * len(self.kernel_sizes)
        d = channel_shuffle(d, _gcd(combined, self.out_channels))
        out = bn("pconv2_bn")(conv(self.out_channels, 1, 1, "pconv2")(d))

        if self.stride == 1:
            if in_ch != self.out_channels:
                x = conv(self.out_channels, 1, 1, "conv1x1")(x)
            return x + out
        return out


class EUCB(nn.Module):
    """Efficient up-convolution: nearest x2 -> depthwise 3x3 -> pointwise."""

    out_channels: int
    kernel_size: int = 3
    activation: str = "relu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        in_ch = x.shape[-1]
        k = self.kernel_size
        x = upsample_nearest(x, 2)
        x = nn.Conv(in_ch, (k, k), padding=((k // 2, k // 2), (k // 2, k // 2)),
                    feature_group_count=in_ch, use_bias=False, dtype=dt,
                    param_dtype=jnp.float32, name="up_dwc")(x)
        x = torch_bn(train, dt, "up_dwc_bn")(x)
        x = _act(self.activation)(x)
        # channel_shuffle(x, in_channels) with 1 channel/group == identity
        x = nn.Conv(self.out_channels, (1, 1), use_bias=True, dtype=dt,
                    param_dtype=jnp.float32, name="pwc")(x)
        return x


class LGAG(nn.Module):
    """Large-kernel grouped attention gate."""

    f_int: int
    kernel_size: int = 3
    groups: int = 1
    activation: str = "relu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        dt = self.dtype
        k = self.kernel_size
        groups = 1 if k == 1 else self.groups

        def branch(t, name):
            t = nn.Conv(self.f_int, (k, k),
                        padding=((k // 2, k // 2), (k // 2, k // 2)),
                        feature_group_count=groups, use_bias=True, dtype=dt,
                        param_dtype=jnp.float32, name=name)(t)
            return torch_bn(train, dt, f"{name}_bn")(t)

        psi = _act(self.activation)(branch(g, "W_g") + branch(x, "W_x"))
        psi = nn.Conv(1, (1, 1), use_bias=True, dtype=dt,
                      param_dtype=jnp.float32, name="psi")(psi)
        psi = torch_bn(train, dt, "psi_bn")(psi)
        return x * nn.sigmoid(psi)


class CAB(nn.Module):
    """Channel attention (shared MLP over global avg+max pools)."""

    ratio: int = 16
    activation: str = "relu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        c = x.shape[-1]
        ratio = min(self.ratio, c)
        red = c // ratio
        fc1 = nn.Conv(red, (1, 1), use_bias=False, dtype=dt,
                      param_dtype=jnp.float32, name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=dt,
                      param_dtype=jnp.float32, name="fc2")
        act = _act(self.activation)
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        return nn.sigmoid(fc2(act(fc1(avg))) + fc2(act(fc1(mx))))


class SAB(nn.Module):
    """Spatial attention: 7x7 conv on [channel-mean, channel-max]."""

    kernel_size: int = 7
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        s = jnp.concatenate(
            [jnp.mean(x, axis=-1, keepdims=True),
             jnp.max(x, axis=-1, keepdims=True)], axis=-1
        )
        s = nn.Conv(1, (k, k), padding=((k // 2, k // 2), (k // 2, k // 2)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(s)
        return nn.sigmoid(s)


class EMCADDecoder(nn.Module):
    """4-level decoder; ``num_class`` set -> dual DSRA heads (8 maps)."""

    channels: tuple[int, ...]  # deepest-first, e.g. (512, 320, 128, 64)
    kernel_sizes: tuple[int, ...] = (1, 3, 5)
    expansion_factor: int = 2
    dw_parallel: bool = True
    add: bool = True
    lgag_ks: int = 3
    activation: str = "relu6"
    num_class: int | None = None
    use_softmax: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        ch = self.channels
        dt = self.dtype
        nc = self.num_class

        def mscb(i):
            return MSCB(ch[4 - i], 1, self.kernel_sizes,
                        self.expansion_factor, self.dw_parallel, self.add,
                        self.activation, dt, name=f"mscb{i}")

        def head(i, kind):
            ks = 1 if i == 4 else 3
            return ConvBN(nc, ks, padding=ks // 2, dtype=dt,
                          name=f"ConvBlock{i}_{kind}")

        sab = SAB(dtype=dt, name="sab")

        # level 4 (deepest)
        d4 = CAB(dtype=dt, name="cab4")(x) * x
        d4 = sab(d4) * d4
        d4 = mscb(4)(d4, train)

        outs_feat = [d4]
        fg_maps, bg_maps = [], []
        if nc is not None:
            d4_fg = head(4, "fg")(d4, train)
            d4_bg = head(4, "bg")(d4, train)
            fg_maps.append(d4_fg)
            bg_maps.append(d4_bg)

        d = d4
        prev_fg, prev_bg = (fg_maps[-1], bg_maps[-1]) if nc is not None else (None, None)
        for lvl, skip in zip((3, 2, 1), skips):
            d_up = EUCB(ch[4 - lvl], 3, "relu", dt, name=f"eucb{lvl}")(d, train)
            if nc is not None:
                hw = (d_up.shape[1], d_up.shape[2])
                up_fg = resize_bilinear(prev_fg, hw)
                up_bg = resize_bilinear(prev_bg, hw)
            gate = LGAG(ch[4 - lvl] // 2, self.lgag_ks, ch[4 - lvl] // 2,
                        "relu", dt, name=f"lgag{lvl}")(d_up, skip, train)
            d = d_up + gate
            d = CAB(dtype=dt, name=f"cab{lvl}")(d) * d
            d = sab(d) * d
            d = mscb(lvl)(d, train)
            outs_feat.append(d)
            if nc is not None:
                d_fg = head(lvl, "fg")(d, train)
                d_bg = head(lvl, "bg")(d, train)
                d_fg = dsra_gate(d_fg, up_fg, up_bg, self.use_softmax)
                fg_maps.append(d_fg)
                bg_maps.append(d_bg)
                prev_fg, prev_bg = d_fg, d_bg

        if nc is None:
            return outs_feat  # [d4, d3, d2, d1]
        return fg_maps + bg_maps  # [d4..d1 fg, d4..d1 bg]


_PVT_CHANNELS = {
    "pvt_v2_b0": (256, 160, 64, 32),
    "pvt_v2_b1": (512, 320, 128, 64),
    "pvt_v2_b2": (512, 320, 128, 64),
    "pvt_v2_b3": (512, 320, 128, 64),
    "pvt_v2_b4": (512, 320, 128, 64),
    "pvt_v2_b5": (512, 320, 128, 64),
}
_RESNET_CHANNELS = {
    "resnet18": (512, 256, 128, 64),
    "resnet34": (512, 256, 128, 64),
    "resnet50": (2048, 1024, 512, 256),
    "resnet101": (2048, 1024, 512, 256),
    "resnet152": (2048, 1024, 512, 256),
}


class EMCADNet(nn.Module):
    """Full EMCAD network (``networks.py:10-142``). Dual -> 8 full-res maps."""

    num_classes: int = 9
    encoder: str = "pvt_v2_b2"
    kernel_sizes: tuple[int, ...] = (1, 3, 5)
    expansion_factor: int = 2
    dw_parallel: bool = True
    add: bool = True
    lgag_ks: int = 3
    activation: str = "relu6"
    dual: bool = True
    use_softmax: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        if x.shape[-1] == 1:
            x = nn.Conv(3, (1, 1), dtype=dt, param_dtype=jnp.float32,
                        name="stem_conv")(x)
            x = torch_bn(train, dt, "stem_bn")(x)
            x = nn.relu(x)
        n, h, w, _ = x.shape

        if self.encoder.startswith("pvt_v2"):
            bb = PVTv2(**PVT_CONFIGS[self.encoder[-2:]], dtype=dt,
                       name="backbone")
            channels = _PVT_CHANNELS[self.encoder]
        else:
            from pranet2_tpu.models.backbones.resnet import _LAYERS, ResNet

            kind, layers = _LAYERS[self.encoder]
            bb = ResNet(kind=kind, layers=layers, dtype=dt, name="backbone")
            channels = _RESNET_CHANNELS[self.encoder]
        x1, x2, x3, x4 = bb(x, train)

        dec = EMCADDecoder(
            channels, self.kernel_sizes, self.expansion_factor,
            self.dw_parallel, self.add, self.lgag_ks, self.activation,
            self.num_classes if self.dual else None, self.use_softmax, dt,
            name="decoder",
        )
        outs = dec(x4, [x3, x2, x1], train)

        if self.dual:
            fg, bg = outs[:4], outs[4:]
            maps = [resize_bilinear(m, (h, w)) for m in fg + bg]
            return tuple(maps)  # p11..p14 fg (coarse->fine), then bg

        heads = []
        for i, (d, c) in enumerate(zip(outs, channels)):
            p = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                        param_dtype=jnp.float32, name=f"out_head{4 - i}")(d)
            heads.append(resize_bilinear(p, (h, w)))
        return tuple(heads)  # p4..p1 (coarse->fine)


@register_model("emcad")
def _emcad(**kw):
    return EMCADNet(**kw)
