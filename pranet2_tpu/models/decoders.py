"""CASCADE decoder family (MERIT/MIST) — attention-gated UNet-style cascade.

Behavioral spec re-derived from ``multiclass_seg/MERIT/lib/decoders.py``:
* conv_block: 2 x (3x3 conv(bias) + BN + ReLU).
* up_conv: nearest x2 + 3x3 conv(bias) + BN + ReLU.
* Attention_block: additive attention gate ``x * sigmoid(BN(psi(relu(Wg g + Wx x))))``.
* ChannelAttention (ratio 16, shared conv MLP over global avg+max pools) x
  SpatialAttention (7x7 conv over [mean,max]).
* ``CascadeAdd`` (``:202-287``): per level up_conv, gated skip, additive
  aggregation, CA*SA, conv_block; returns the 4 decoder features.
* ``CascadeCat`` (``:121-199``): concatenation aggregation variant.
* ``CascadeAddDual`` (``:289-431``): adds per-level fg/bg ConvBN heads and the
  DSRA softmax-difference gate; returns 8 maps + the finest feature.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pranet2_tpu.nn import ConvBN, torch_bn
from pranet2_tpu.ops import dsra_gate, resize_bilinear, upsample_nearest


class ConvBlock(nn.Module):
    """2 x (3x3 conv + BN + ReLU)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        for i in (0, 3):  # torch Sequential indices 0/1 and 3/4
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=True, dtype=dt, param_dtype=jnp.float32,
                        name=f"conv{i}")(x)
            x = torch_bn(train, dt, f"bn{i + 1}")(x)
            x = nn.relu(x)
        return x


class UpConv(nn.Module):
    """nearest x2 + 3x3 conv + BN + ReLU."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample_nearest(x, 2)
        x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        x = torch_bn(train, self.dtype, "bn")(x)
        return nn.relu(x)


class AttentionGate(nn.Module):
    """Additive attention gate (``Attention_block``)."""

    f_int: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        dt = self.dtype

        def branch(t, name):
            t = nn.Conv(self.f_int, (1, 1), use_bias=True, dtype=dt,
                        param_dtype=jnp.float32, name=name)(t)
            return torch_bn(train, dt, f"{name}_bn")(t)

        psi = nn.relu(branch(g, "W_g") + branch(x, "W_x"))
        psi = nn.Conv(1, (1, 1), use_bias=True, dtype=dt,
                      param_dtype=jnp.float32, name="psi")(psi)
        psi = torch_bn(train, dt, "psi_bn")(psi)
        return x * nn.sigmoid(psi)


class ChannelAttention(nn.Module):
    """avg+max pooled shared conv-MLP, ratio 16 (no bias)."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        c = x.shape[-1]
        fc1 = nn.Conv(c // 16, (1, 1), use_bias=False, dtype=dt,
                      param_dtype=jnp.float32, name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=dt,
                      param_dtype=jnp.float32, name="fc2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        return nn.sigmoid(fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx))))


class SpatialAttention(nn.Module):
    """7x7 conv over [channel-mean, channel-max] (no bias)."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        s = jnp.concatenate(
            [jnp.mean(x, axis=-1, keepdims=True),
             jnp.max(x, axis=-1, keepdims=True)], axis=-1
        )
        s = nn.Conv(1, (7, 7), padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(s)
        return nn.sigmoid(s)


class CascadeAdd(nn.Module):
    """Additive CASCADE. Returns (d4, d3, d2, d1) features."""

    channels: tuple[int, ...]  # deepest-first, e.g. (768, 384, 192, 96)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        ch = self.channels
        dt = self.dtype
        sa = SpatialAttention(dt, name="SA")

        d4 = nn.Conv(ch[0], (1, 1), use_bias=True, dtype=dt,
                     param_dtype=jnp.float32, name="Conv_1x1")(x)
        d4 = ChannelAttention(dt, name="CA4")(d4) * d4
        d4 = sa(d4) * d4
        d4 = ConvBlock(ch[0], dt, name="ConvBlock4")(d4, train)

        outs = [d4]
        d = d4
        f_ints = (ch[2], ch[3], ch[3] // 2)
        for lvl, skip, f_int in zip((3, 2, 1), skips, f_ints):
            d = UpConv(ch[4 - lvl], dt, name=f"Up{lvl}")(d, train)
            g = AttentionGate(f_int, dt, name=f"AG{lvl}")(d, skip, train)
            d = d + g
            d = ChannelAttention(dt, name=f"CA{lvl}")(d) * d
            d = sa(d) * d
            d = ConvBlock(ch[4 - lvl], dt, name=f"ConvBlock{lvl}")(d, train)
            outs.append(d)
        return tuple(outs)  # d4, d3, d2, d1


class CascadeCat(nn.Module):
    """Concatenation CASCADE. Returns (d4, d3, d2, d1) features."""

    channels: tuple[int, ...]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        ch = self.channels
        dt = self.dtype
        sa = SpatialAttention(dt, name="SA")

        d4 = nn.Conv(ch[0], (1, 1), use_bias=True, dtype=dt,
                     param_dtype=jnp.float32, name="Conv_1x1")(x)
        d4 = ChannelAttention(dt, name="CA4")(d4) * d4
        d4 = sa(d4) * d4
        d4 = ConvBlock(ch[0], dt, name="ConvBlock4")(d4, train)

        outs = [d4]
        d = d4
        f_ints = (ch[2], ch[3], ch[3] // 2)
        for lvl, skip, f_int in zip((3, 2, 1), skips, f_ints):
            d = UpConv(ch[4 - lvl], dt, name=f"Up{lvl}")(d, train)
            g = AttentionGate(f_int, dt, name=f"AG{lvl}")(d, skip, train)
            d = jnp.concatenate([g, d], axis=-1)
            d = ChannelAttention(dt, name=f"CA{lvl}")(d) * d
            d = sa(d) * d
            d = ConvBlock(ch[4 - lvl], dt, name=f"ConvBlock{lvl}")(d, train)
            outs.append(d)
        return tuple(outs)


class CascadeAddDual(nn.Module):
    """DSRA-grafted additive CASCADE (``CASCADE_Add_dual``).

    Returns (d4_fg, d3_fg, d2_fg, d1_fg, d4_bg, d3_bg, d2_bg, d1_bg, d1).
    """

    channels: tuple[int, ...]
    num_class: int
    use_softmax: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        ch = self.channels
        nc = self.num_class
        dt = self.dtype
        sa = SpatialAttention(dt, name="SA")

        def head(lvl, kind):
            ks = 1 if lvl == 4 else 3
            return ConvBN(nc, ks, padding=ks // 2, dtype=dt,
                          name=f"ConvBlock{lvl}_{kind}")

        d4 = nn.Conv(ch[0], (1, 1), use_bias=True, dtype=dt,
                     param_dtype=jnp.float32, name="Conv_1x1")(x)
        d4 = ChannelAttention(dt, name="CA4")(d4) * d4
        d4 = sa(d4) * d4
        d4 = ConvBlock(ch[0], dt, name="ConvBlock4")(d4, train)
        d4_fg = head(4, "fg")(d4, train)
        d4_bg = head(4, "bg")(d4, train)

        fg_maps, bg_maps = [d4_fg], [d4_bg]
        d = d4
        prev_fg, prev_bg = d4_fg, d4_bg
        f_ints = (ch[2], ch[3], ch[3] // 2)
        for lvl, skip, f_int in zip((3, 2, 1), skips, f_ints):
            d = UpConv(ch[4 - lvl], dt, name=f"Up{lvl}")(d, train)
            hw = (d.shape[1], d.shape[2])
            up_fg = resize_bilinear(prev_fg, hw)
            up_bg = resize_bilinear(prev_bg, hw)
            g = AttentionGate(f_int, dt, name=f"AG{lvl}")(d, skip, train)
            d = d + g
            d = ChannelAttention(dt, name=f"CA{lvl}")(d) * d
            d = sa(d) * d
            d = ConvBlock(ch[4 - lvl], dt, name=f"ConvBlock{lvl}")(d, train)
            d_fg = head(lvl, "fg")(d, train)
            d_bg = head(lvl, "bg")(d, train)
            d_fg = dsra_gate(d_fg, up_fg, up_bg, self.use_softmax)
            fg_maps.append(d_fg)
            bg_maps.append(d_bg)
            prev_fg, prev_bg = d_fg, d_bg
        return tuple(fg_maps) + tuple(bg_maps) + (d,)
