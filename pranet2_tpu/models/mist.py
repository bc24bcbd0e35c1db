"""MIST: MaxxViT encoder + convolutional-transformer CAM decoder (+DSRA dual).

Behavioral spec re-derived from ``multiclass_seg/MIST/lib/MIST.py`` and
``lib/networks.py``:

* Encoder: single ``maxxvit_rmlp_small_rw_256`` backbone at 256
  (``networks.py:28-37,100``).
* CAM decoder: bottleneck block on stage-4 (768 -> 1536, maxpool /2) then 4
  decoder blocks (LN -> nearest x2 -> conv -> concat skip -> conv -> dropout
  -> conv-transformer) with filters [1536, 768, 384, 192, 96] and heads
  [16, 12, 8, 4, 2] (``MIST.py:368-412``).
* Conv-transformer: depthwise-conv q/k/v projections (+ReLU +LN) into a
  standard MHA (with its own packed in/out projections), a 3x3 conv on the
  attention output added to the input, then LN + 'wide-focus' dilated conv
  stack (d1/d2/d3, GELU) with residual (``MIST.py:24-243``).
* Dual (DSRA) graft: per-level fg/bg 1x1 heads + softmax-difference gating,
  8 maps upsampled x32/16/8/4 (``MIST.py:400-451``, ``networks.py:102-114``).

Note: the reference calls ``F.dropout`` without ``training=self.training``
(``MIST.py:232-242,264``), so its *eval* pass is stochastic.  Here dropout is
active only in training — the deterministic interpretation.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pranet2_tpu.nn import torch_bn

from pranet2_tpu.models.backbones.maxvit import MAXVIT_CONFIGS, MaxxVit
from pranet2_tpu.models.registry import register_model
from pranet2_tpu.ops import dsra_gate, max_pool, resize_bilinear, upsample_nearest


def _gelu(x):
    return nn.gelu(x, approximate=False)


class _ConvAttention(nn.Module):
    """Depthwise-conv-projected MHA (``MIST.py:24-99``)."""

    channels: int
    num_heads: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dt = self.dtype
        c = self.channels

        def proj(t, name):
            t = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                        use_bias=True, dtype=dt, param_dtype=jnp.float32,
                        name=f"conv_{name}")(t)
            t = nn.relu(t)
            return nn.LayerNorm(epsilon=1e-5, dtype=dt,
                                param_dtype=jnp.float32,
                                name=f"layernorm_{name}")(t)

        n, h, w, _ = x.shape
        q = proj(x, "q").reshape(n, h * w, c)
        k = proj(x, "k").reshape(n, h * w, c)
        v = proj(x, "v").reshape(n, h * w, c)

        # torch nn.MultiheadAttention: packed qkv in-proj + out-proj
        hd = c // self.num_heads
        q = nn.Dense(c, use_bias=True, dtype=dt, param_dtype=jnp.float32,
                     name="in_proj_q")(q)
        k = nn.Dense(c, use_bias=True, dtype=dt, param_dtype=jnp.float32,
                     name="in_proj_k")(k)
        v = nn.Dense(c, use_bias=True, dtype=dt, param_dtype=jnp.float32,
                     name="in_proj_v")(v)
        q = q.reshape(n, h * w, self.num_heads, hd)
        k = k.reshape(n, h * w, self.num_heads, hd)
        v = v.reshape(n, h * w, self.num_heads, hd)
        o = jax.nn.dot_product_attention(q, k, v)
        o = o.reshape(n, h * w, c)
        o = nn.Dense(c, use_bias=True, dtype=dt, param_dtype=jnp.float32,
                     name="out_proj")(o)
        return o.reshape(n, h, w, c)


class _WideFocus(nn.Module):
    """Dilated 'wide-focus' conv stack (``MIST.py:214-243``)."""

    channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dt = self.dtype
        c = self.channels

        def conv(name, dilation=1):
            return nn.Conv(c, (3, 3), padding="SAME",
                           kernel_dilation=(dilation, dilation), use_bias=True,
                           dtype=dt, param_dtype=jnp.float32, name=name)

        drop = nn.Dropout(0.1, deterministic=deterministic)
        x1 = drop(_gelu(conv("conv1")(x)))
        x2 = drop(_gelu(conv("conv2", 2)(x)))
        x3 = drop(_gelu(conv("conv3", 3)(x)))
        out = conv("conv4")(x1 + x2 + x3)
        return drop(_gelu(out))


class _Transformer(nn.Module):
    channels: int
    num_heads: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dt = self.dtype
        a = _ConvAttention(self.channels, self.num_heads, dt,
                           name="attention_output")(x, deterministic)
        a = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=True,
                    dtype=dt, param_dtype=jnp.float32, name="conv1")(a)
        x2 = a + x
        y = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32,
                         name="layernorm")(x2)
        y = _WideFocus(self.channels, dt, name="wide_focus")(y, deterministic)
        return x2 + y


class _Bottleneck(nn.Module):
    """'bottleneck' encoder block: LN -> 2 convs -> dropout -> maxpool -> trans."""

    out_channels: int
    num_heads: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dt = self.dtype
        y = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32,
                         name="layernorm")(x)
        y = nn.relu(nn.Conv(self.out_channels, (3, 3), padding="SAME",
                            use_bias=True, dtype=dt, param_dtype=jnp.float32,
                            name="conv1")(y))
        y = nn.relu(nn.Conv(self.out_channels, (3, 3), padding="SAME",
                            use_bias=True, dtype=dt, param_dtype=jnp.float32,
                            name="conv2")(y))
        y = nn.Dropout(0.3, deterministic=deterministic)(y)
        y = max_pool(y, 2, 2, 0)
        return _Transformer(self.out_channels, self.num_heads, dt,
                            name="trans")(y, deterministic)


class _DecoderBlock(nn.Module):
    """LN -> nearest x2 -> conv -> concat skip -> conv -> dropout -> trans."""

    out_channels: int
    num_heads: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, skip, deterministic: bool = True):
        dt = self.dtype
        y = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32,
                         name="layernorm")(x)
        y = upsample_nearest(y, 2)
        y = nn.relu(nn.Conv(self.out_channels, (3, 3), padding="SAME",
                            use_bias=True, dtype=dt, param_dtype=jnp.float32,
                            name="conv1")(y))
        y = jnp.concatenate([skip, y], axis=-1)
        y = nn.relu(nn.Conv(self.out_channels, (3, 3), padding="SAME",
                            use_bias=True, dtype=dt, param_dtype=jnp.float32,
                            name="conv2")(y))
        y = nn.Dropout(0.3, deterministic=deterministic)(y)
        return _Transformer(self.out_channels, self.num_heads, dt,
                            name="trans")(y, deterministic)


class CAMDecoder(nn.Module):
    """CAM decoder; dual when ``num_class`` is set (``MIST.py:368-468``)."""

    channels: tuple[int, ...] = (768, 384, 192, 96)  # deepest-first
    num_class: int | None = None
    use_softmax: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, skip1, skip2, skip3, skip4, train: bool = False):
        dt = self.dtype
        det = not train
        heads = (16, 12, 8, 4, 2)
        f = (self.channels[0] * 2,) + tuple(self.channels)  # (1536,768,384,192,96)

        x = _Bottleneck(f[0], heads[0], dt, name="block_5")(skip4, det)
        d4 = _DecoderBlock(f[1], heads[1], dt, name="block_6")(x, skip4, det)

        if self.num_class is None:
            d3 = _DecoderBlock(f[2], heads[2], dt, name="block_7")(d4, skip3, det)
            d2 = _DecoderBlock(f[3], heads[3], dt, name="block_8")(d3, skip2, det)
            d1 = _DecoderBlock(f[4], heads[4], dt, name="block_9")(d2, skip1, det)
            return d4, d3, d2, d1

        nc = self.num_class

        def head(i, kind):
            return nn.Conv(nc, (1, 1), use_bias=True, dtype=dt,
                           param_dtype=jnp.float32, name=f"out_head{i}_{kind}")

        d4_fg, d4_bg = head(1, "fg")(d4), head(1, "bg")(d4)
        fg, bg = [d4_fg], [d4_bg]
        d = d4
        prev_fg, prev_bg = d4_fg, d4_bg
        for i, (blk, skip) in enumerate(
            zip(("block_7", "block_8", "block_9"), (skip3, skip2, skip1)),
            start=2,
        ):
            d = _DecoderBlock(f[i], heads[i], dt, name=blk)(d, skip, det)
            hw = (d.shape[1], d.shape[2])
            up_fg = resize_bilinear(prev_fg, hw)
            up_bg = resize_bilinear(prev_bg, hw)
            d_fg, d_bg = head(i, "fg")(d), head(i, "bg")(d)
            d_fg = dsra_gate(d_fg, up_fg, up_bg, self.use_softmax)
            fg.append(d_fg)
            bg.append(d_bg)
            prev_fg, prev_bg = d_fg, d_bg
        return tuple(fg) + tuple(bg)


class MISTCAM(nn.Module):
    """Full MIST network (``networks.py:39-132``)."""

    num_classes: int = 9
    img_size_s1: tuple[int, int] = (256, 256)
    model_scale: str = "small"
    dual: bool = True
    use_softmax: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        nc = self.num_classes
        if x.shape[-1] == 1:
            x = nn.Conv(3, (1, 1), dtype=dt, param_dtype=jnp.float32,
                        name="stem_conv")(x)
            x = torch_bn(train, dt, "stem_bn")(x)
            x = nn.relu(x)
        n, h, w, _ = x.shape

        bb = MaxxVit(**MAXVIT_CONFIGS["maxxvit_rmlp_small_rw_256"], dtype=dt,
                     name="backbone1")
        f1 = bb(resize_bilinear(x, self.img_size_s1), train)
        channels = (768, 384, 192, 96)

        if self.dual:
            outs = CAMDecoder(channels, nc, self.use_softmax, dt,
                              name="decoder")(f1[0], f1[1], f1[2], f1[3], train)
            return tuple(resize_bilinear(m, (h, w)) for m in outs)

        d4, d3, d2, d1 = CAMDecoder(channels, None, True, dt, name="decoder")(
            f1[0], f1[1], f1[2], f1[3], train
        )
        maps = []
        for i, d in enumerate((d4, d3, d2, d1), start=1):
            p = nn.Conv(nc, (1, 1), dtype=dt, param_dtype=jnp.float32,
                        name=f"out_head{i}")(d)
            maps.append(resize_bilinear(p, (h, w)))
        return tuple(maps)


@register_model("mist_cam")
def _mist_cam(**kw):
    return MISTCAM(**kw)


# ---------------------------------------------------------------------------
# standalone attention utilities shipped with the reference MIST module
# (``multiclass_seg/MIST/lib/MIST.py:102-167``).  No reference CLI uses them,
# but they are part of the module's public surface, so they live here with
# oracle parity tests.  (The FCT1/FCT2 decoder assemblies at MIST.py:469-579
# are de-scoped — see COMPONENTS.md: they are unreachable dead code in the
# reference itself.)
# ---------------------------------------------------------------------------


class ChannelAttentionCBAM(nn.Module):
    """avg+max pooled MLP channel gate (``MIST.py:102-118``); returns the
    sigmoid gate (caller multiplies)."""

    reduction_ratio: int = 16
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        c = x.shape[-1]
        fc1 = nn.Conv(c // self.reduction_ratio, (1, 1), use_bias=False,
                      dtype=dt, param_dtype=jnp.float32, name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=dt,
                      param_dtype=jnp.float32, name="fc2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        return nn.sigmoid(fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx))))


class SEBlock(nn.Module):
    """Squeeze-and-excitation (``MIST.py:121-136``); returns gated ``x``."""

    reduction_ratio: int = 16
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(c // self.reduction_ratio, dtype=dt,
                     param_dtype=jnp.float32, name="excitation_0")(y)
        y = nn.relu(y)
        y = nn.Dense(c, dtype=dt, param_dtype=jnp.float32,
                     name="excitation_2")(y)
        return x * nn.sigmoid(y)[:, None, None, :]


class SpatialAttentionCBAM(nn.Module):
    """7x7 conv over [mean, max] channel stats (``MIST.py:139-154``);
    returns the sigmoid gate."""

    kernel_size: int = 7
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        assert self.kernel_size in (3, 7)
        p = 3 if self.kernel_size == 7 else 1
        stats = jnp.concatenate(
            [jnp.mean(x, axis=-1, keepdims=True),
             jnp.max(x, axis=-1, keepdims=True)], axis=-1)
        k = self.kernel_size
        out = nn.Conv(1, (k, k), padding=((p, p), (p, p)), use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv")(stats)
        return nn.sigmoid(out)


class CBAM(nn.Module):
    """``x*channel_gate + x*spatial_gate`` (``MIST.py:157-167``).

    The reference ctor also builds an ``SE`` member that forward never uses;
    the converter ignores those dead weights (like Block_decoder.conv3)."""

    reduction_ratio: int = 16
    kernel_size: int = 7
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        ca = ChannelAttentionCBAM(self.reduction_ratio, self.dtype,
                                  name="channel_attention")(x)
        sa = SpatialAttentionCBAM(self.kernel_size, self.dtype,
                                  name="spatial_attention")(x)
        return x * ca + x * sa
