"""Shared flax.linen building blocks (NHWC, bf16-capable).

One implementation of each block the reference duplicates (~5 copies of
``BasicConv2d``, 2 of decoders, …).  Naming mirrors the torch attribute paths
so the ``.pth`` → pytree converter (`pranet2_tpu.utils.torch_convert`) is a
mechanical rename.

BatchNorm notes: the reference models instantiate plain ``nn.BatchNorm2d``
(momentum 0.1, eps 1e-5) — SURVEY.md §7 hard-part (c).  Under ``jit`` over a
data-sharded mesh, batch statistics are computed over the *global* batch (XLA
inserts the cross-replica reductions), which subsumes the reference's entire
SyncBN/thread-pipe subsystem (``binary_seg/lib/nn/``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pranet2_tpu.ops import resize_bilinear



class TorchBatchNorm(nn.Module):
    """BatchNorm with exact ``torch.nn.BatchNorm2d`` semantics.

    Differs from ``flax.linen.BatchNorm`` in one way that matters for
    train-from-scratch parity: torch updates ``running_var`` with the
    **unbiased** (Bessel-corrected, n/(n-1)) batch variance while normalizing
    with the biased one; flax uses the biased variance for both.  Variable
    names/collections match flax BatchNorm ('scale'/'bias' params,
    'mean'/'var' batch_stats) so the ``.pth`` converter is unaffected.
    Stats are computed in f32 regardless of compute dtype.
    """

    use_running_average: bool
    momentum: float = 0.9          # keep-rate == 1 - torch momentum (0.1)
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (feat,),
            jnp.float32)
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (feat,),
            jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size // feat
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
        dtype = self.dtype or x.dtype
        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(dtype)
        return (x.astype(dtype) - mean.astype(dtype)) * mul + bias.astype(dtype)


def torch_bn(train: bool, dtype=None, name: str = "bn") -> TorchBatchNorm:
    """torch-semantics BatchNorm2d constructor (momentum 0.1 torch == 0.9
    flax, eps 1e-5, f32 params) — the single definition every model uses."""
    return TorchBatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )

def drop_path(x, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Per-sample stochastic depth (timm ``DropPath``, scale_by_keep=True).

    Identity at rate 0 or in eval; otherwise zeroes whole samples with
    probability ``rate`` and rescales survivors by 1/keep
    (reference: the vendored fork's drop-path knobs,
    ``multiclass_seg/MERIT/lib/maxxvit_4out.py:1611,1636``).
    """
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep, 0.0)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class BatchNorm(nn.Module):
    """torch-semantics BatchNorm2d (momentum 0.1 torch == 0.9 flax, eps 1e-5)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return TorchBatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            name="bn",
        )(x)


class _ConvKernelParams(nn.Module):
    """Declares a flax-Conv-shaped kernel param without computing (the
    holder pattern — same tree path/shape as ``nn.Conv(name=...)``)."""

    shape: tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class ConvBN(nn.Module):
    """conv(bias=False) + BN, **no** activation in the call (torch ``BasicConv2d``).

    Callers wrap with ``nn.relu`` explicitly, matching the reference's
    ``F.relu(self.ra4_conv2(x))`` pattern.
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    stride: int = 1
    padding: int | tuple[int, int] = 0
    dilation: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        from pranet2_tpu.ops._pallas import component_enabled

        # Narrow decoder convs (RFB 32-ch branches, DSRA 64-ch chains) as
        # row-major dot-form taps (ops/splitconv.conv_dot): XLA's
        # batch-in-sublanes conv emitter is far off roofline at these
        # widths and flips the decoder stream into a batch-minor layout
        # world.  Exact restructure; SAME-size stride-1 only; same param
        # tree (flax Conv's kernel at the same path).
        dot_ok = (self.stride == 1 and max(kh, kw) > 1
                  and self.features <= 64
                  and 2 * ph == self.dilation * (kh - 1)
                  and 2 * pw == self.dilation * (kw - 1)
                  and component_enabled("decdot",
                                        self.dtype == jnp.bfloat16))
        if dot_ok:
            from pranet2_tpu.ops.splitconv import conv_dot

            # same tree path as the flax Conv: <this>/conv/kernel
            k = _ConvKernelParams((kh, kw, x.shape[-1], self.features),
                                  name="conv")()
            dt = self.dtype or x.dtype
            x = conv_dot(x.astype(dt), k.astype(dt), (ph, pw),
                         self.dilation)
        else:
            x = nn.Conv(
                self.features,
                (kh, kw),
                strides=(self.stride, self.stride),
                padding=((ph, ph), (pw, pw)),
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        return x


class ConvBNReLU(nn.Module):
    """3x3 conv + BN + ReLU (torch ``conv3x3_bn_relu``)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(
            self.features, 3, self.stride, 1, dtype=self.dtype, name="cb"
        )(x, train)
        return nn.relu(x)


class RFB(nn.Module):
    """Receptive-field block — 4 multi-scale branches, concat-fuse + residual.

    Reference behavior: ``binary_seg/lib/pranet.py:46-83`` (branch k uses
    1xk/kx1 separable convs then a 3x3 with dilation k for k in {3,5,7}).
    """

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features
        dt = self.dtype

        def seq(x, layers):
            for l in layers:
                x = l(x, train)
            return x

        x0 = ConvBN(c, 1, dtype=dt, name="branch0_0")(x, train)
        x1 = seq(x, [
            ConvBN(c, 1, dtype=dt, name="branch1_0"),
            ConvBN(c, (1, 3), padding=(0, 1), dtype=dt, name="branch1_1"),
            ConvBN(c, (3, 1), padding=(1, 0), dtype=dt, name="branch1_2"),
            ConvBN(c, 3, padding=3, dilation=3, dtype=dt, name="branch1_3"),
        ])
        x2 = seq(x, [
            ConvBN(c, 1, dtype=dt, name="branch2_0"),
            ConvBN(c, (1, 5), padding=(0, 2), dtype=dt, name="branch2_1"),
            ConvBN(c, (5, 1), padding=(2, 0), dtype=dt, name="branch2_2"),
            ConvBN(c, 3, padding=5, dilation=5, dtype=dt, name="branch2_3"),
        ])
        x3 = seq(x, [
            ConvBN(c, 1, dtype=dt, name="branch3_0"),
            ConvBN(c, (1, 7), padding=(0, 3), dtype=dt, name="branch3_1"),
            ConvBN(c, (7, 1), padding=(3, 0), dtype=dt, name="branch3_2"),
            ConvBN(c, 3, padding=7, dilation=7, dtype=dt, name="branch3_3"),
        ])
        x_cat = ConvBN(c, 3, padding=1, dtype=dt, name="conv_cat")(
            jnp.concatenate([x0, x1, x2, x3], axis=-1), train
        )
        res = ConvBN(c, 1, dtype=dt, name="conv_res")(x, train)
        return nn.relu(x_cat + res)


class PartialDecoder(nn.Module):
    """Cascaded partial decoder (GCPD-style aggregation of 3 RFB maps).

    ``num_class is None`` → V1 single-head (``PraNet_Res2Net.py:64-98``);
    otherwise V2 dual fg/bg heads (``pranet.py:86-125``).  Takes the 3 maps
    deepest-first: x1 = 1/32 scale, x2 = 1/16, x3 = 1/8.  All internal
    upsamples are x2 bilinear **align_corners=True** (``pranet.py:93``).
    """

    channel: int
    num_class: int | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool = False):
        c, dt = self.channel, self.dtype

        def up2(t):
            n, h, w, _ = t.shape
            return resize_bilinear(t, (2 * h, 2 * w), align_corners=True)

        cu1 = ConvBN(c, 3, padding=1, dtype=dt, name="conv_upsample1")
        cu2 = ConvBN(c, 3, padding=1, dtype=dt, name="conv_upsample2")
        cu3 = ConvBN(c, 3, padding=1, dtype=dt, name="conv_upsample3")
        cu4 = ConvBN(c, 3, padding=1, dtype=dt, name="conv_upsample4")
        cu5 = ConvBN(2 * c, 3, padding=1, dtype=dt, name="conv_upsample5")

        x1_1 = x1
        x2_1 = cu1(up2(x1), train) * x2
        x3_1 = cu2(up2(up2(x1)), train) * cu3(up2(x2), train) * x3

        x2_2 = jnp.concatenate([x2_1, cu4(up2(x1_1), train)], axis=-1)
        x2_2 = ConvBN(2 * c, 3, padding=1, dtype=dt, name="conv_concat2")(x2_2, train)

        x3_2 = jnp.concatenate([x3_1, cu5(up2(x2_2), train)], axis=-1)
        x3_2 = ConvBN(3 * c, 3, padding=1, dtype=dt, name="conv_concat3")(x3_2, train)

        x = ConvBN(3 * c, 3, padding=1, dtype=dt, name="conv4")(x3_2, train)
        if self.num_class is None:
            return nn.Conv(1, (1, 1), dtype=dt, param_dtype=jnp.float32,
                           name="conv5")(x)
        fg = nn.Conv(self.num_class, (1, 1), dtype=dt, param_dtype=jnp.float32,
                     name="conv5_fg")(x)
        bg = nn.Conv(self.num_class, (1, 1), dtype=dt, param_dtype=jnp.float32,
                     name="conv5_bg")(x)
        return fg, bg
