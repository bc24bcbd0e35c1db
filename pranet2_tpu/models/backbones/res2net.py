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


class _ConvParams(nn.Module):
    """Declares flax-Conv-shaped params at this scope without computing."""

    features: int
    kernel: int = 1

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, in_features, self.features),
            jnp.float32)
        return k


class _BNParams(nn.Module):
    """Declares TorchBatchNorm's param/batch_stats tree without computing."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                             None, (features,), jnp.float32)
        var = self.variable("batch_stats", "var", nn.initializers.ones,
                            None, (features,), jnp.float32)
        return scale, bias, mean.value, var.value


class _Bottle2neckParams(nn.Module):
    """Declares one Bottle2neck's full param tree (same child names as the
    module path) and returns folded-BN tensors for the packed layer-1 path
    (ops/res2_packed.py).  Eval-only by construction (BN folding)."""

    planes: int
    has_downsample: bool = False
    base_width: int = 26
    scale: int = 4

    @nn.compact
    def __call__(self, cin: int):
        from pranet2_tpu.ops.res2_block import fold_bn

        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        p = {}
        k1 = _ConvParams(width * self.scale, 1, name="conv1")(cin)
        p["w1"] = k1.reshape(cin, width * self.scale)
        p["f1"] = fold_bn(*_BNParams(name="bn1")(width * self.scale))
        p["kd"], p["fd"] = [], []
        for i in range(self.scale - 1):
            p["kd"].append(_ConvParams(width, 3, name=f"convs_{i}")(width))
            p["fd"].append(fold_bn(*_BNParams(name=f"bns_{i}")(width)))
        k3 = _ConvParams(self.planes * 4, 1, name="conv3")(width * self.scale)
        p["w3"] = k3.reshape(width * self.scale, self.planes * 4)
        p["f3"] = fold_bn(*_BNParams(name="bn3")(self.planes * 4))
        if self.has_downsample:
            kd = _ConvParams(self.planes * 4, 1, name="downsample_1")(cin)
            p["wdown"] = kd.reshape(cin, self.planes * 4)
            p["fdown"] = fold_bn(
                *_BNParams(name="downsample_2")(self.planes * 4))
        return p


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    stype: str = "normal"  # 'normal' | 'stage'
    base_width: int = 26
    scale: int = 4
    dtype: jnp.dtype | None = None
    fused: bool = False  # whole-block Pallas kernel (ops/res2_block.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        expansion = 4

        if (self.fused and not train and self.stype == "normal"
                and self.stride == 1 and not self.has_downsample
                and self.scale == 4):
            # One-pass kernel: same param tree as the module path below
            # (holders declare identical names/shapes/collections), narrow
            # split tensors never touch HBM.  Eval only: BN folded from
            # running stats.
            from pranet2_tpu.ops.res2_block import fold_bn, fused_bottle2neck

            k1 = _ConvParams(width * 4, 1, name="conv1")(x.shape[-1])
            s1, b1, m1, v1 = _BNParams(name="bn1")(width * 4)
            kd, sd, td = [], [], []
            for i in range(3):
                k = _ConvParams(width, 3, name=f"convs_{i}")(width)
                s, b, m, v = _BNParams(name=f"bns_{i}")(width)
                fs, ft = fold_bn(s, b, m, v)
                kd.append(k.reshape(3, 3 * width, width))
                sd.append(fs)
                td.append(ft)
            k3 = _ConvParams(self.planes * expansion, 1,
                             name="conv3")(width * 4)
            s3, b3, m3, v3 = _BNParams(name="bn3")(self.planes * expansion)
            fs1, ft1 = fold_bn(s1, b1, m1, v1)
            fs3, ft3 = fold_bn(s3, b3, m3, v3)
            return fused_bottle2neck(
                x, k1.reshape(x.shape[-1], width * 4), fs1, ft1,
                jnp.stack(kd), jnp.stack(sd), jnp.stack(td),
                k3.reshape(4, width, self.planes * expansion), fs3, ft3)

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
        from pranet2_tpu.ops._pallas import component_enabled

        if (self.stype == "stage" and not train and self.scale == 4
                and width <= 52
                and component_enabled("gstage", dt == jnp.bfloat16)):
            # A stage block's split convs are INDEPENDENT (no running-sum
            # feed, res2net.py:185), so they run as ONE conv over the
            # contiguous 3*width slice with a BLOCK-DIAGONAL dense kernel:
            # one lane-padded 3w-channel pass instead of three w-channel
            # passes (w=26 pads 4.9x at layer 1, w=52 2.5x).  Dense-with-
            # zeros, NOT feature_group_count: XLA's TPU grouped-conv
            # lowering measured catastrophic here (bs16 headline 1878.7 ->
            # 1484.3 img/s), while the 3x MAC inflation of the zero blocks
            # is ~0.1 ms of MXU at these widths.  Wider stages (104/208)
            # pad only 1.23x — not worth the FLOPs, hence width <= 52.
            # Same param tree via holders; eval-only (folded BN).
            import jax.lax as lax

            from pranet2_tpu.ops.res2_block import fold_bn

            cdt = dt or jnp.float32
            fs = [fold_bn(*_BNParams(name=f"bns_{i}")(width))
                  for i in range(3)]
            kg = jnp.zeros((3, 3, 3 * width, 3 * width), jnp.float32)
            for i in range(3):
                k = _ConvParams(width, 3, name=f"convs_{i}")(width)
                kg = kg.at[:, :, i * width:(i + 1) * width,
                           i * width:(i + 1) * width].set(k)
            y = lax.conv_general_dilated(
                out[..., :3 * width].astype(cdt), kg.astype(cdt),
                (self.stride, self.stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            s = jnp.concatenate([f[0] for f in fs])
            t = jnp.concatenate([f[1] for f in fs])
            y = jnp.maximum(y.astype(jnp.float32) * s + t, 0.0).astype(cdt)
            out = jnp.concatenate(
                [y, avg_pool(spx[-1], 3, self.stride, 1)], axis=-1)
        else:
            # narrow split convs as row-major dot-form taps (ops/splitconv):
            # XLA's batch-in-sublanes conv emitter is ~7.5x off roofline at
            # these widths AND flips the surrounding stream into a
            # batch-minor layout world (~1.4 ms/iter of relayout fusions at
            # bs16, round-5 profile).  Exact restructure; stride-1 only.
            splitmm = (self.stride == 1 and width <= 52
                       and component_enabled("splitmm", dt == jnp.bfloat16))
            parts = []
            sp = None
            for i in range(nums):
                sp = (spx[i] if (i == 0 or self.stype == "stage")
                      else sp + spx[i])
                if splitmm:
                    from pranet2_tpu.ops.splitconv import conv3x3_dot

                    kd = _ConvParams(width, 3, name=f"convs_{i}")(
                        sp.shape[-1])
                    sp = conv3x3_dot(sp.astype(dt or sp.dtype),
                                     kd.astype(dt or kd.dtype))
                else:
                    sp = conv(width, 3, self.stride, f"convs_{i}", pad=1)(sp)
                sp = nn.relu(bn(f"bns_{i}")(sp))
                parts.append(sp)
            if self.scale != 1:
                if self.stype == "normal":
                    parts.append(spx[-1])
                else:  # 'stage': 3x3/stride avg pool on the passthrough
                    parts.append(avg_pool(spx[-1], 3, self.stride, 1))
            out = jnp.concatenate(parts, axis=-1)

        cout = self.planes * expansion
        tailfuse = (not train
                    and component_enabled("tailfuse", dt == jnp.bfloat16))

        if self.has_downsample:
            # v1b: avgpool(stride, ceil, count_include_pad=False) -> 1x1 -> BN
            short = x
            if self.stride != 1:
                short = avg_pool(short, self.stride, self.stride, 0,
                                 count_include_pad=False, ceil_mode=True)
            short = conv(cout, 1, 1, "downsample_1")(short)
            short = bn("downsample_2")(short)
        else:
            short = x

        if tailfuse:
            # conv3 (1x1) + folded BN3 + residual + ReLU in one Pallas pass
            # (ops/res2_tail.py): the XLA composition writes conv3's output
            # to HBM and re-reads it (plus the shortcut) in a separate
            # elementwise fusion — the round-4 profile's ~1.3 ms residue.
            # Same param tree via holders; eval-only (folded BN).
            from pranet2_tpu.ops.res2_block import fold_bn
            from pranet2_tpu.ops.res2_tail import fused_tail

            k3 = _ConvParams(cout, 1, name="conv3")(out.shape[-1])
            s3, t3 = fold_bn(*_BNParams(name="bn3")(cout))
            return fused_tail(out, short,
                              k3.reshape(out.shape[-1], cout), s3, t3)

        out = bn("bn3")(conv(cout, 1, 1, "conv3")(out))
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
    # fuse stride-1 'normal' Bottle2necks into single Pallas passes
    # (ops/res2_block.py).  Default OFF — a measured negative result: the
    # 26/52-wide split groups force either 128-lane zero padding (5x MXU
    # waste; kernel 2.0 ms/block at layer-1 vs XLA's ~0.75) or unaligned
    # lane slices Mosaic scalarizes (compile did not finish in 9 min).
    # Kept for shapes where it ties/wins (width>=104 synthetic chains) and
    # as the starting point for a channel-major rewrite.  None = env auto
    # (PRANET2_FUSED="res2block" opts in).
    fused: bool | None = None
    # space-to-depth stem (ops/stem.py): exact restructure of the v1b deep
    # stem into dense-channel convs.  None = auto: on for the bf16 eval
    # speed path.
    s2d_stem: bool | None = None
    # space-to-depth layer 1 (ops/res2_packed.py): run all three 88x88
    # Bottle2necks on the 2x2 packed grid so the 26-wide split tensors pad
    # 1.23x instead of 4.9x.  None = env auto (PRANET2_FUSED="l1pack" opts
    # in; default OFF until measured on-chip).  Eval-only (folded BN).
    l1_packed: bool | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        from pranet2_tpu.ops._pallas import component_enabled

        fused = self.fused
        if fused is None:
            fused = component_enabled("res2block", dt == jnp.bfloat16)
        s2d = self.s2d_stem
        if s2d is None:
            s2d = component_enabled("s2d", dt == jnp.bfloat16)
        l1pack = self.l1_packed
        if l1pack is None:
            l1pack = component_enabled("l1pack", dt == jnp.bfloat16)

        def conv(feats, k, s, name, pad=0):
            return nn.Conv(
                feats, (k, k), strides=(s, s),
                padding=((pad, pad), (pad, pad)), use_bias=False,
                dtype=dt, param_dtype=jnp.float32, name=name,
            )

        def bn(name):
            return torch_bn(train, dt, name,)

        # deep stem: torch names conv1.{0,1,3,4,6} + bn1
        stem_packed = False
        if s2d and not train and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
            # exact space-to-depth restructure (ops/stem.py): dense-channel
            # convs instead of lane-padded 32/64-wide maps.  Same param
            # tree via holders; eval-only (BN folded from running stats).
            from pranet2_tpu.ops.res2_block import fold_bn
            from pranet2_tpu.ops.stem import s2d_stem

            # boundary-free packed layer 1: the stem emits its maxpool
            # output already 2x2-packed (zero relayout), layer 1 runs
            # packed, and layer 2's stage block consumes packed directly.
            stem_packed = (l1pack and self.scale == 4
                           and len(self.layers) >= 2
                           and x.shape[1] % 8 == 0 and x.shape[2] % 8 == 0)
            k1 = _ConvParams(32, 3, name="conv1_0")(x.shape[-1])
            f1 = fold_bn(*_BNParams(name="conv1_1")(32))
            k2 = _ConvParams(32, 3, name="conv1_3")(32)
            f2 = fold_bn(*_BNParams(name="conv1_4")(32))
            k3 = _ConvParams(64, 3, name="conv1_6")(32)
            f3 = fold_bn(*_BNParams(name="bn1")(64))
            # s2d_stem computes at x.dtype — cast to the model compute
            # dtype first (the module path gets this from nn.Conv's
            # dtype=dt).  Without it the raw f32 input made the whole
            # stem run f32: every 88^2 intermediate at 2x bytes, 22 f32
            # stem tensors in the bf16 program (round-4 profile).
            if dt is not None:
                x = x.astype(dt)
            x = s2d_stem(x, k1, *f1, k2, *f2, k3, *f3,
                         packed_out=stem_packed)
        else:
            x = nn.relu(bn("conv1_1")(conv(32, 3, 2, "conv1_0", pad=1)(x)))
            x = nn.relu(bn("conv1_4")(conv(32, 3, 1, "conv1_3", pad=1)(x)))
            x = conv(64, 3, 1, "conv1_6", pad=1)(x)
            x = nn.relu(bn("bn1")(x))
            x = max_pool(x, 3, 2, 1)

        feats = []
        inplanes = 64
        x_packed = None
        for li, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers), start=1
        ):
            stride = 1 if li == 1 else 2
            if li == 1 and (stem_packed or (
                    l1pack and not train and self.scale == 4
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)):
                from pranet2_tpu.ops.res2_packed import (
                    bottle2neck_q, pack2, unpack2,
                )

                cdt = dt or jnp.float32
                # stem_packed: x is already the packed stem output
                xp = x if stem_packed else pack2(x)
                for bi in range(blocks):
                    has_ds = bi == 0 and inplanes != planes * 4
                    p = _Bottle2neckParams(
                        planes, has_ds, self.base_width, self.scale,
                        name=f"layer{li}_{bi}")(xp.shape[-1] // 4)
                    xp = bottle2neck_q(
                        xp, p, cdt, stype="stage" if bi == 0 else "normal")
                if stem_packed:
                    # layer 2's stage block consumes xp directly; the
                    # unpacked feats[0] below is for the 4-tuple API only
                    # (PraNet never reads stage 1, so jit DCEs the unpack)
                    x_packed = xp
                x = unpack2(xp)
                inplanes = planes * 4
                feats.append(x)
                continue
            first_bi = 0
            if li == 2 and x_packed is not None:
                from pranet2_tpu.ops.res2_packed import (
                    bottle2neck_stage_s2_from_packed,
                )

                p = _Bottle2neckParams(
                    planes, True, self.base_width, self.scale,
                    name=f"layer{li}_0")(x_packed.shape[-1] // 4)
                x = bottle2neck_stage_s2_from_packed(
                    x_packed, p, dt or jnp.float32)
                inplanes = planes * 4
                first_bi = 1
            for bi in range(first_bi, blocks):
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
                        self.base_width, self.scale, dt, fused,
                        name=f"layer{li}_{bi}",
                    )(x, train)
            feats.append(x)
        return tuple(feats)


def res2net50_v1b(dtype=None) -> Res2Net:
    return Res2Net(layers=(3, 4, 6, 3), dtype=dtype)


def res2net101_v1b(dtype=None) -> Res2Net:
    return Res2Net(layers=(3, 4, 23, 3), dtype=dtype)
