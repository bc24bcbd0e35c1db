"""MaxViT / MaxxViT backbone (flax, NHWC) — MERIT/MIST encoder.

Behavioral spec re-derived from the reference's vendored timm fork
(``multiclass_seg/MERIT/lib/maxxvit_4out.py``).  Only the pieces the 4 used
variants exercise are implemented — they are all ``block_type=('M',)*4``
(MaxxVitBlock = conv block + window attention + grid attention), so the
CoAtNet 'T'/'PM' paths are not needed:

* Stem: 3x3/2 conv -> norm+act -> 3x3/1 conv (``maxxvit_4out.py:1555-1592``).
* MbConvBlock ('rw' config): pre-BatchNorm (no act) -> 1x1 expand (4x of
  *input*) + BN+SiLU -> depthwise 3x3 (stride here) + BN+SiLU -> SE
  (rd = mid/16, SiLU) -> 1x1 project (no bias); shortcut = avg-pool2 +
  1x1(no bias) when striding (``:959-1047``).
* ConvNeXtBlock (maxxvit '_next' config): depthwise 7x7 (stride) + bias ->
  LayerNorm -> 1x1 MLP (GELU) -> LayerScale(1e-6); shortcut avg-pool2 + 1x1
  (``:1050-1124``).
* PartitionAttentionCl: LN -> window/grid partition -> MHSA (head dim 32,
  qkv bias, rel-pos MLP bias) -> reverse -> LayerScale -> +res, then LN ->
  MLP(4x, GELU) -> LayerScale -> +res (``:1171-1233``).
* Window/grid partition: contiguous windows vs strided grid of size
  ``img_size // 32`` (``:1126-1160``, ``cfg_window_size :1590-1595``).
* RelPosMlp ('cr' mode): sign(d)*log1p(|d|) coords -> MLP(2->512->heads,
  ReLU, dropout .125) -> gather to (heads, N, N) bias
  (``models_timm/vision_transformer_relpos.py:70-195``).
* Final LayerNorm on the last stage only; returns all 4 stage features
  (``maxxvit_4out.py:1709-1725``).

Variants (``maxxvit_4out.py:593-650``):
  maxvit_rmlp_tiny_rw_256   dims (64,128,256,512)  mbconv, ls=None
  maxvit_rmlp_small_rw_224  dims (96,192,384,768)  mbconv, ls=1e-6
  maxvit_rmlp_small_rw_256  same as _224 (window from input size)
  maxxvit_rmlp_small_rw_256 dims (96,192,384,768)  convnext, ls=1e-6, stem 48/96

TPU notes: NHWC throughout, so torch's 'channels-first LayerNorm2d' is a
plain LayerNorm over the last axis here; partitions are reshape/transpose
pairs XLA fuses into the attention layout; the rel-pos bias table is computed
once per call and constant-folded at inference.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from pranet2_tpu.nn import drop_path, torch_bn


def _silu(x):
    return nn.silu(x)


def _gelu(x):
    return nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# conv blocks
# ---------------------------------------------------------------------------


class _SE(nn.Module):
    rd_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_channels, (1, 1), use_bias=True, dtype=dt,
                    param_dtype=jnp.float32, name="fc1")(s)
        s = _silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=dt,
                    param_dtype=jnp.float32, name="fc2")(s)
        return x * nn.sigmoid(s)


def _avg_pool2(x):
    # AvgPool2d(kernel=stride=2); odd sizes: torch floor-mode drops the tail
    n, h, w, c = x.shape
    x = x[:, : h - h % 2, : w - w % 2, :]
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


class _Downsample(nn.Module):
    """avg-pool2 + optional 1x1 expand (``Downsample2d``, pool_type 'avg2')."""

    out_channels: int
    bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = _avg_pool2(x)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), use_bias=self.bias,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="expand")(x)
        return x


class MbConv(nn.Module):
    """'rw'-config MBConv (expand from input chs, no output bias, SE 1/16)."""

    out_channels: int
    stride: int = 1
    dtype: jnp.dtype | None = None
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        in_ch = x.shape[-1]
        mid = in_ch * 4

        def bn(name):
            return torch_bn(train, dt, name)

        shortcut = x
        if self.stride == 2:
            shortcut = _Downsample(self.out_channels, bias=False, dtype=dt,
                                   name="shortcut")(x)
        x = bn("pre_norm")(x)  # pre_norm_act=False: no activation
        x = nn.Conv(mid, (1, 1), use_bias=False, dtype=dt,
                    param_dtype=jnp.float32, name="conv1_1x1")(x)
        x = _silu(bn("norm1")(x))
        x = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=mid,
                    use_bias=False, dtype=dt, param_dtype=jnp.float32,
                    name="conv2_kxk")(x)
        x = _silu(bn("norm2")(x))
        x = _SE(int(mid / 16), dtype=dt, name="se")(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=dt,
                    param_dtype=jnp.float32, name="conv3_1x1")(x)
        if train and self.drop_path > 0:
            x = drop_path(x, self.drop_path, False, self.make_rng("dropout"))
        return x + shortcut


class ConvNeXtBlock(nn.Module):
    """'_next'-config ConvNeXt: dw 7x7 -> LN -> 1x1 MLP -> LayerScale."""

    out_channels: int
    stride: int = 1
    init_values: float = 1e-6
    dtype: jnp.dtype | None = None
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        in_ch = x.shape[-1]
        if self.stride == 2:
            shortcut = _Downsample(self.out_channels, bias=True, dtype=dt,
                                   name="shortcut")(x)
        elif in_ch != self.out_channels:
            shortcut = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                               dtype=dt, param_dtype=jnp.float32,
                               name="shortcut")(x)
        else:
            shortcut = x
        # depthwise 7x7 conv carries the stride ('dw' stride mode); note the
        # depthwise conv maps in_ch -> out_ch (torch depthwise=True semantics
        # require out % in == 0; all variants keep in == out except stage
        # starts where torch uses ch multiplier 1... in these cfgs stage
        # starts change channels, torch create_conv2d(depthwise=True) uses
        # groups=out_chs only if in==out else groups=in
        x = nn.Conv(self.out_channels, (7, 7),
                    strides=(self.stride, self.stride),
                    padding=((3, 3), (3, 3)),
                    feature_group_count=in_ch, use_bias=True, dtype=dt,
                    param_dtype=jnp.float32, name="conv_dw")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=dt, param_dtype=jnp.float32,
                         name="norm")(x)
        h = int(4.0 * self.out_channels)
        x = nn.Conv(h, (1, 1), use_bias=True, dtype=dt,
                    param_dtype=jnp.float32, name="mlp_fc1")(x)
        x = _gelu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=True, dtype=dt,
                    param_dtype=jnp.float32, name="mlp_fc2")(x)
        gamma = self.param("ls_gamma", nn.initializers.constant(self.init_values),
                           (self.out_channels,), jnp.float32)
        x = x * gamma
        if train and self.drop_path > 0:
            x = drop_path(x, self.drop_path, False, self.make_rng("dropout"))
        return x + shortcut


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def _rel_log_coords(win: int) -> np.ndarray:
    """'cr'-mode log coords: sign(d) * ln(1+|d|), (2W-1, 2W-1, 2) f32."""
    r = np.arange(-(win - 1), win, dtype=np.float64)
    h, w = np.meshgrid(r, r, indexing="ij")
    table = np.stack([h, w], axis=-1)
    return (np.sign(table) * np.log1p(np.abs(table))).astype(np.float32)


def _rel_index(win: int) -> np.ndarray:
    """(N, N) index into the flattened (2W-1)^2 table (swin convention)."""
    coords = np.stack(np.meshgrid(np.arange(win), np.arange(win),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    return ((rel[0] + win - 1) * (2 * win - 1) + (rel[1] + win - 1)).astype(np.int32)


class RelPosMlp(nn.Module):
    """'cr'-mode rel-pos bias MLP (2 -> hidden -> heads, ReLU, dropout .125)."""

    window: int
    num_heads: int
    hidden_dim: int = 512
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, deterministic: bool = True):
        coords = jnp.asarray(_rel_log_coords(self.window))  # (2W-1,2W-1,2)
        h = nn.Dense(self.hidden_dim, use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(coords)
        h = nn.relu(h)
        h = nn.Dropout(0.125, deterministic=deterministic)(h)
        h = nn.Dense(self.num_heads, use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(h)
        flat = h.reshape(-1, self.num_heads)
        idx = jnp.asarray(_rel_index(self.window))
        bias = flat[idx.reshape(-1)].reshape(
            self.window ** 2, self.window ** 2, self.num_heads
        )
        return jnp.transpose(bias, (2, 0, 1))  # (heads, N, N)


class RelPosBias(nn.Module):
    """Learned relative-position bias table ('bias' mode, swin-style)."""

    window: int
    num_heads: int

    @nn.compact
    def __call__(self, deterministic: bool = True):
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads), jnp.float32,
        )
        idx = jnp.asarray(_rel_index(self.window))
        bias = table[idx.reshape(-1)].reshape(
            self.window ** 2, self.window ** 2, self.num_heads
        )
        return jnp.transpose(bias, (2, 0, 1))


class AttentionCl(nn.Module):
    """Channels-last MHSA with rel-pos bias (head dim 32, qkv bias)."""

    dim: int
    window: int
    dtype: jnp.dtype | None = None
    rel_pos_type: str = "mlp"  # 'mlp' | 'bias'

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (B*, w, w, C)
        dt = self.dtype
        dim_head = 32
        nh = self.dim // dim_head
        shape = x.shape
        n = shape[-3] * shape[-2]
        x = x.reshape(-1, n, self.dim)
        qkv = nn.Dense(3 * self.dim, use_bias=True, dtype=dt,
                       param_dtype=jnp.float32, name="qkv")(x)
        q, k, v = jnp.split(
            qkv.reshape(-1, n, nh, 3 * dim_head), 3, axis=-1
        )
        if self.rel_pos_type == "mlp":
            bias = RelPosMlp(self.window, nh, dtype=dt, name="rel_pos")(
                deterministic
            )
        else:
            bias = RelPosBias(self.window, nh, name="rel_pos")(deterministic)
        # jax.nn.dot_product_attention bias: broadcastable to (B, heads, N, N)
        o = jax.nn.dot_product_attention(q, k, v, bias=bias[None])
        o = o.reshape(-1, n, self.dim)
        o = nn.Dense(self.dim, use_bias=True, dtype=dt,
                     param_dtype=jnp.float32, name="proj")(o)
        return o.reshape(shape)


def window_partition(x, win: int):
    n, h, w, c = x.shape
    x = x.reshape(n, h // win, win, w // win, win, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, win, win, c)


def window_reverse(x, win: int, hw):
    h, w = hw
    c = x.shape[-1]
    x = x.reshape(-1, h // win, w // win, win, win, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, h, w, c)


def grid_partition(x, grid: int):
    n, h, w, c = x.shape
    x = x.reshape(n, grid, h // grid, grid, w // grid, c)
    return jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(-1, grid, grid, c)


def grid_reverse(x, grid: int, hw):
    h, w = hw
    c = x.shape[-1]
    x = x.reshape(-1, h // grid, w // grid, grid, grid, c)
    return jnp.transpose(x, (0, 3, 1, 4, 2, 5)).reshape(-1, h, w, c)


class PartitionAttention(nn.Module):
    """LN -> partition -> attn -> reverse -> LS -> +res; LN -> MLP -> LS -> +res."""

    dim: int
    window: int
    partition_type: str = "block"  # 'block' | 'grid'
    init_values: float | None = None
    dtype: jnp.dtype | None = None
    rel_pos_type: str = "mlp"
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dt = self.dtype
        hw = (x.shape[1], x.shape[2])
        dp_rngs = None
        if not deterministic and self.drop_path > 0:
            dp_rngs = jax.random.split(self.make_rng("dropout"))

        def ls(t, name):
            if self.init_values is None:
                return t
            gamma = self.param(name, nn.initializers.constant(self.init_values),
                               (self.dim,), jnp.float32)
            return t * gamma

        y = nn.LayerNorm(epsilon=1e-6, dtype=dt, param_dtype=jnp.float32,
                         name="norm1")(x)
        if self.partition_type == "block":
            p = window_partition(y, self.window)
        else:
            p = grid_partition(y, self.window)
        p = AttentionCl(self.dim, self.window, dt, self.rel_pos_type,
                        name="attn")(p, deterministic)
        if self.partition_type == "block":
            y = window_reverse(p, self.window, hw)
        else:
            y = grid_reverse(p, self.window, hw)
        y = ls(y, "ls1_gamma")
        if dp_rngs is not None:
            y = drop_path(y, self.drop_path, False, dp_rngs[0])
        x = x + y

        y = nn.LayerNorm(epsilon=1e-6, dtype=dt, param_dtype=jnp.float32,
                         name="norm2")(x)
        y = nn.Dense(int(self.dim * 4), use_bias=True, dtype=dt,
                     param_dtype=jnp.float32, name="mlp_fc1")(y)
        y = _gelu(y)
        y = nn.Dense(self.dim, use_bias=True, dtype=dt,
                     param_dtype=jnp.float32, name="mlp_fc2")(y)
        y = ls(y, "ls2_gamma")
        if dp_rngs is not None:
            y = drop_path(y, self.drop_path, False, dp_rngs[1])
        return x + y


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


class MaxxVitBlock(nn.Module):
    dim: int
    stride: int
    window: int
    conv_type: str  # 'mbconv' | 'convnext'
    init_values: float | None
    dtype: jnp.dtype | None = None
    rel_pos_type: str = "mlp"
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        dp = self.drop_path
        if self.conv_type == "mbconv":
            x = MbConv(self.dim, self.stride, dt, dp, name="conv")(x, train)
        else:
            x = ConvNeXtBlock(self.dim, self.stride, 1e-6, dt, dp,
                              name="conv")(x, train)
        det = not train
        x = PartitionAttention(self.dim, self.window, "block",
                               self.init_values, dt, self.rel_pos_type, dp,
                               name="attn_block")(x, det)
        x = PartitionAttention(self.dim, self.window, "grid",
                               self.init_values, dt, self.rel_pos_type, dp,
                               name="attn_grid")(x, det)
        return x


MAXVIT_CONFIGS = {
    "maxvit_tiny_rw_224": dict(
        embed_dim=(64, 128, 256, 512), depths=(2, 2, 5, 2),
        stem_width=(32, 64), conv_type="mbconv", init_values=None,
        stem_norm="bn_silu", rel_pos_type="bias",
    ),
    "maxvit_rmlp_tiny_rw_256": dict(
        embed_dim=(64, 128, 256, 512), depths=(2, 2, 5, 2),
        stem_width=(32, 64), conv_type="mbconv", init_values=None,
        stem_norm="bn_silu",
    ),
    "maxvit_rmlp_small_rw_224": dict(
        embed_dim=(96, 192, 384, 768), depths=(2, 2, 5, 2),
        stem_width=(32, 64), conv_type="mbconv", init_values=1e-6,
        stem_norm="bn_silu",
    ),
    "maxvit_rmlp_small_rw_256": dict(
        embed_dim=(96, 192, 384, 768), depths=(2, 2, 5, 2),
        stem_width=(32, 64), conv_type="mbconv", init_values=1e-6,
        stem_norm="bn_silu",
    ),
    "maxxvit_rmlp_small_rw_256": dict(
        embed_dim=(96, 192, 384, 768), depths=(2, 2, 5, 2),
        stem_width=(48, 96), conv_type="convnext", init_values=1e-6,
        stem_norm="ln_gelu",
    ),
    # Minimal config for sharding dry runs / compile-budget-bound smoke
    # tests: one block per stage exercises every op class the real variants
    # trace (MbConv, window+grid PartitionAttention with rel-pos MLP,
    # stochastic depth, stage-end LayerNorm) at ~1/10 the XLA compile cost.
    # Not a reference variant; never used for checkpoints or benchmarks.
    "maxvit_dryrun": dict(
        embed_dim=(32, 32, 64, 128), depths=(1, 1, 1, 1),
        stem_width=(8, 16), conv_type="mbconv", init_values=None,
        stem_norm="bn_silu",
    ),
}


class MaxxVit(nn.Module):
    """4-stage feature backbone; window/grid size = input_size // 32."""

    embed_dim: tuple[int, ...] = (96, 192, 384, 768)
    depths: tuple[int, ...] = (2, 2, 5, 2)
    stem_width: tuple[int, int] = (32, 64)
    conv_type: str = "mbconv"
    init_values: float | None = 1e-6
    stem_norm: str = "bn_silu"
    rel_pos_type: str = "mlp"
    drop_path_rate: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        img = x.shape[1]
        window = img // 32
        # stochastic-depth ramp over all blocks (timm linspace convention,
        # maxxvit_4out.py:1611,1636; rate 0 in every reference config)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        # stem
        # timm 'rw' stems create their convs via create_conv2d (bias-free);
        # verified against the reference fork's state_dict (no stem.*.bias).
        x = nn.Conv(self.stem_width[0], (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=dt,
                    param_dtype=jnp.float32, name="stem_conv1")(x)
        if self.stem_norm == "bn_silu":
            x = torch_bn(train, dt, "stem_norm1")(x)
            x = _silu(x)
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=dt, param_dtype=jnp.float32,
                             name="stem_norm1")(x)
            x = _gelu(x)
        x = nn.Conv(self.stem_width[1], (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=dt, param_dtype=jnp.float32,
                    name="stem_conv2")(x)

        feats = []
        cur = 0
        for si, (dim, depth) in enumerate(zip(self.embed_dim, self.depths)):
            for bi in range(depth):
                x = MaxxVitBlock(
                    dim, 2 if bi == 0 else 1, window, self.conv_type,
                    self.init_values, dt, self.rel_pos_type, dpr[cur + bi],
                    name=f"stages_{si}_blocks_{bi}",
                )(x, train)
            cur += depth
            feats.append(x)
        # final norm on last stage only ('layernorm2d' == LN over C in NHWC)
        feats[-1] = nn.LayerNorm(epsilon=1e-6, dtype=dt,
                                 param_dtype=jnp.float32, name="norm")(feats[-1])
        return tuple(feats)


def maxvit(variant: str, dtype=None, drop_path_rate: float = 0.0) -> MaxxVit:
    return MaxxVit(**MAXVIT_CONFIGS[variant], dtype=dtype,
                   drop_path_rate=drop_path_rate)
