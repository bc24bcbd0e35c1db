"""PVTv2 backbone (flax, NHWC) — pyramid ViT with spatial-reduction attention.

Behavioral spec re-derived from ``binary_seg/lib/pvtv2.py``:
* 4 stages; each = OverlapPatchEmbed (7x7/4 first, then 3x3/2) -> N blocks ->
  LayerNorm -> NHWC feature map.
* Block = LN -> SRA attention -> residual, LN -> MLP(DWConv) -> residual,
  with stochastic depth (linear ramp to ``drop_path_rate``).
* SRA: queries from all tokens; K/V from a ``sr_ratio``-strided conv
  downsample + LN (identity at stage 4).  This is the reference's answer to
  long-context: shrink KV instead of sharding it (SURVEY.md §5).
* MLP: fc1 -> 3x3 depthwise conv (on the 2-D map) -> GELU -> fc2.
* Variants b0-b5 (dims/depths/heads per ``pvtv2.py:387-436``); LN eps 1e-6.

TPU notes: attention shapes are modest (stage-1 at 352^2 input: 7744 q x 121
kv) — a single dense dot_product_attention per stage is MXU-friendly; no
flash/ring machinery is warranted.  Everything is static-shape; drop-path
randomness comes from the flax 'dropout' RNG collection in training.

Layout: the whole backbone stays in **image form** (b, h, w, c) — LayerNorm
and Dense apply to the trailing channel axis of the 4-D map directly, and
only the small per-head attention tensors are flattened to (b, n, heads, hd).
The reference's token view (b, n, c) is mathematically identical (reshape is
layout-only), but on TPU flattening (b,h,w,c) <-> (b,n,c) changes the tiled
physical layout, and XLA materializes a relayout copy of every ratio-8 MLP
tensor around the depthwise conv (measured: stage-1's (16,88,88,512) dwconv
ran at ~260 GB/s vs ~770 for copy-free shapes).  Keeping image form
end-to-end removes those copies; oracle parity tests confirm numerics are
unchanged (tests/test_oracle_binary.py PVT variants).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pranet2_tpu.nn import drop_path as _drop_path

PVT_CONFIGS = {
    "b0": dict(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2),
               num_heads=(1, 2, 5, 8), mlp_ratios=(8, 8, 4, 4)),
    "b1": dict(embed_dims=(64, 128, 320, 512), depths=(2, 2, 2, 2),
               num_heads=(1, 2, 5, 8), mlp_ratios=(8, 8, 4, 4)),
    "b2": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 6, 3),
               num_heads=(1, 2, 5, 8), mlp_ratios=(8, 8, 4, 4)),
    "b3": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 18, 3),
               num_heads=(1, 2, 5, 8), mlp_ratios=(8, 8, 4, 4)),
    "b4": dict(embed_dims=(64, 128, 320, 512), depths=(3, 8, 27, 3),
               num_heads=(1, 2, 5, 8), mlp_ratios=(8, 8, 4, 4)),
    "b5": dict(embed_dims=(64, 128, 320, 512), depths=(3, 6, 40, 3),
               num_heads=(1, 2, 5, 8), mlp_ratios=(4, 4, 4, 4)),
}

_SR_RATIOS = (8, 4, 2, 1)


class _DenseParams(nn.Module):
    """Declares Dense-shaped params at this scope without computing."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k, b


class _DWConvParams(nn.Module):
    """Declares depthwise-3x3-Conv-shaped params (flax Conv layout)."""

    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, 1, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k, b


class _MlpParams(nn.Module):
    """Declares _Mlp's exact param tree (fc1/dwconv/fc2) without computing.

    Used by the fused-kernel path so both paths share one checkpoint
    layout; initializers match flax Dense/Conv defaults.
    """

    hidden: int
    out: int

    @nn.compact
    def __call__(self, in_features: int):
        w1, b1 = _DenseParams(self.hidden, name="fc1")(in_features)
        dwk, dwb = _DWConvParams(self.hidden, name="dwconv")()
        w2, b2 = _DenseParams(self.out, name="fc2")(self.hidden)
        return w1, b1, dwk, dwb, w2, b2


class _LNParams(nn.Module):
    """Declares LayerNorm-shaped params (scale/bias) without computing."""

    @nn.compact
    def __call__(self, features: int):
        s = self.param("scale", nn.initializers.ones_init(),
                       (features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (features,), jnp.float32)
        return s, b


class _Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        # x: (b, h, w, c) — fc1/fc2 act on the channel axis; the depthwise
        # conv consumes the map natively (no token flatten/unflatten).
        dt = self.dtype
        x = nn.Dense(self.hidden, dtype=dt, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.hidden, dtype=dt,
                    param_dtype=jnp.float32, name="dwconv")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, dtype=dt, param_dtype=jnp.float32,
                     name="fc2")(x)
        return x


class _SRAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        b, h, w, c = x.shape
        n = h * w
        dt = self.dtype
        nh = self.num_heads
        hd = c // nh
        q = nn.Dense(c, use_bias=True, dtype=dt, param_dtype=jnp.float32,
                     name="q")(x)
        if self.sr_ratio > 1:
            kv_in = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            padding="VALID", dtype=dt,
                            param_dtype=jnp.float32, name="sr")(x)
            kv_in = nn.LayerNorm(epsilon=1e-5, dtype=dt,
                                 param_dtype=jnp.float32, name="norm")(kv_in)
        else:
            kv_in = x
        kv = nn.Dense(2 * c, use_bias=True, dtype=dt, param_dtype=jnp.float32,
                      name="kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        # only the narrow per-head tensors take the token view
        q = q.reshape(b, n, nh, hd)
        k = k.reshape(b, -1, nh, hd)
        v = v.reshape(b, -1, nh, hd)
        # jax.nn.dot_product_attention: (B, T, N, H) layout, scale 1/sqrt(hd)
        o = jax.nn.dot_product_attention(q, k, v)
        o = o.reshape(b, h, w, c)
        return nn.Dense(c, dtype=dt, param_dtype=jnp.float32, name="proj")(o)


class _ConvBiasParams(nn.Module):
    """Declares flax Conv (kernel+bias) params without computing."""

    features: int
    kernel: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, in_features, self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,), jnp.float32)
        return k, b


class _SRAttnParams(nn.Module):
    """Declares the norm1+_SRAttention child tree (q/sr/norm/kv/proj) and
    returns the kernel-layout tensors ``fused_sra_block``/``fused_pvt_block``
    take.  Same names/shapes as the module path — one checkpoint layout."""

    dim: int
    num_heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self):
        c, nh, sr = self.dim, self.num_heads, self.sr_ratio
        hd = c // nh
        wq, bq = _DenseParams(c, name="q")(c)
        wp, bp = _DenseParams(c, name="proj")(c)
        if sr > 1:
            ksr, bsr = _ConvBiasParams(c, sr, name="sr")(c)
            wsr = ksr.reshape(sr * sr * c, c)
            lks, lkb = _LNParams(name="norm")(c)
        else:
            wsr = jnp.zeros((1, c), jnp.float32)
            bsr = jnp.zeros((c,), jnp.float32)
            lks = jnp.ones((c,), jnp.float32)
            lkb = jnp.zeros((c,), jnp.float32)
        wkv, bkv = _DenseParams(2 * c, name="kv")(c)
        return (wq.reshape(c, nh, hd).transpose(1, 0, 2), bq.reshape(nh, hd),
                wsr, bsr, lks, lkb, wkv, bkv, wp, bp)


class _FusedSRAttention(nn.Module):
    """Same param tree as norm1+_SRAttention, fused-kernel compute.

    The whole attention half — LN1, the sr-conv K/V path (non-overlapping
    patch conv as aligned reshapes + one dot), kv LN/dense, q, softmax
    attention, proj, residual — runs in one per-image Pallas pass
    (``ops/pvt_attn.fused_sra_block``).  v1 left the K/V path in XLA,
    which cost a duplicated LN reduce and layout copies at every
    XLA<->Pallas boundary.
    """

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, lns1, lnb1, ln1_stats=None):
        import os

        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        sr = self.sr_ratio
        wq, bq = _DenseParams(c, name="q")(c)
        wp, bp = _DenseParams(c, name="proj")(c)
        if sr > 1:
            ksr, bsr = _ConvBiasParams(c, sr, name="sr")(c)
            wsr = ksr.reshape(sr * sr * c, c)
            lks, lkb = _LNParams(name="norm")(c)
        else:
            wsr = jnp.zeros((1, c), jnp.float32)
            bsr = jnp.zeros((c,), jnp.float32)
            lks = jnp.ones((c,), jnp.float32)
            lkb = jnp.zeros((c,), jnp.float32)
        wkv, bkv = _DenseParams(2 * c, name="kv")(c)
        wq_k = wq.reshape(c, nh, hd).transpose(1, 0, 2)
        bq_k = bq.reshape(nh, hd)
        # Routing (trace time): 'v1' everywhere, 'v2' everywhere, or
        # 'auto:<max_sr>' = the whole-half v2 kernel for stages with
        # sr <= max_sr (small maps whose per-image working set is tiny and
        # whose XLA kv path is proportionally large), v1 elsewhere.  The
        # round-3/4 global v2-vs-v1 ablation (v2 loses, 1,293.8 vs
        # 1,329.1) never tried per-stage routing.
        impl = os.environ.get("PVT_ATTN_IMPL", "v1")
        if impl.startswith("auto"):
            max_sr = int(impl.split(":")[1]) if ":" in impl else 1
            impl = "v2" if sr <= max_sr else "v1"
        if impl == "v1":
            # v1 routing (default, trace-time knob): the tiny K/V path
            # (sr conv + LN + kv dense) runs in XLA; LN1, q, softmax
            # attention, proj and the residual go through the v1 kernel.
            # Same param tensors, so the checkpoint layout is unchanged.
            # v1 measured faster than the whole-half v2 kernel at every
            # combination tried (977.7 vs 957.5 alone, 1329.1 vs 1293.8
            # with the fused MLP — tools/exp_pvt_matrix.py, round 3);
            # PVT_ATTN_IMPL=v2 opts into the whole-half kernel.
            from pranet2_tpu.ops.pvt_attn import fused_sra_attention

            dt = self.dtype
            xf = x.astype(jnp.float32)
            if ln1_stats is None:
                mu = jnp.mean(xf, axis=-1, keepdims=True)
                var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
                rstd = jax.lax.rsqrt(var + 1e-6)
            else:
                # per-token stats emitted by the previous block's fused
                # MLP kernel (bit-identical to recomputing them from x):
                # this LN becomes a pure elementwise fusion, no reduce
                mu, rstd = ln1_stats[0][..., None], ln1_stats[1][..., None]
            y = (xf - mu) * rstd * lns1 + lnb1
            y = y.astype(x.dtype)
            if sr > 1:
                kv_in = jax.lax.conv_general_dilated(
                    y.astype(dt or y.dtype),
                    ksr.astype(dt or ksr.dtype), (sr, sr), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + bsr.astype(dt or bsr.dtype)
                kf = kv_in.astype(jnp.float32)
                kmu = jnp.mean(kf, axis=-1, keepdims=True)
                kvar = jnp.mean(kf * kf, axis=-1, keepdims=True) - kmu * kmu
                kv_in = ((kf - kmu) * jax.lax.rsqrt(kvar + 1e-5) * lks
                         + lkb).astype(y.dtype)
            else:
                kv_in = y
            kv = (jnp.einsum("nhwc,cd->nhwd", kv_in.astype(dt or kv_in.dtype),
                             wkv.astype(dt or wkv.dtype))
                  + bkv.astype(dt or bkv.dtype))
            k, v = jnp.split(kv, 2, axis=-1)
            tkv = k.shape[1] * k.shape[2]
            kt = k.reshape(b, tkv, nh, hd).transpose(0, 2, 3, 1)
            v = v.reshape(b, tkv, nh, hd).transpose(0, 2, 1, 3)
            return fused_sra_attention(x, lns1, lnb1, wq_k, bq_k, kt, v,
                                       wp, bp, 1e-6)
        from pranet2_tpu.ops.pvt_attn import fused_sra_block

        return fused_sra_block(
            x, lns1, lnb1, wq_k, bq_k, wsr, bsr, lks, lkb, wkv, bkv, wp, bp,
            sr, nh, 1e-6)


class _Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int
    sr_ratio: int
    drop_path: float = 0.0
    dtype: jnp.dtype | None = None
    fused_mlp: bool = False
    fused_attn: bool = False
    fused_block: bool = False  # whole-block kernel (ops/pvt_block.py)

    @nn.compact
    def __call__(self, x, deterministic=True, final_ln=None,
                 ln1_stats=None, emit_stats=False):
        """Returns ``(out, stats)`` where ``stats`` is the (mu, rstd) of
        ``out`` when ``emit_stats`` (fused-MLP eval path) else None;
        ``ln1_stats`` is the previous block's emission, consumed by the
        fused attention's XLA K/V-path LN."""
        dt = self.dtype
        rng = None
        if not deterministic and self.drop_path > 0:
            rng = self.make_rng("dropout")
            rng1, rng2 = jax.random.split(rng)
        if self.fused_block and deterministic:
            # attention AND MLP halves in one per-image Pallas pass —
            # the residual stream and the 8x hidden never touch HBM
            from pranet2_tpu.ops.pvt_block import fused_pvt_block

            lns1, lnb1 = _LNParams(name="norm1")(self.dim)
            ap = _SRAttnParams(self.dim, self.num_heads, self.sr_ratio,
                               name="attn")()
            lns2, lnb2 = _LNParams(name="norm2")(self.dim)
            w1, b1, dwk, dwb, w2, b2 = _MlpParams(
                self.dim * self.mlp_ratio, self.dim,
                name="mlp")(self.dim)
            return fused_pvt_block(
                x, lns1, lnb1, *ap, lns2, lnb2, w1, b1, dwk[:, :, 0, :],
                dwb, w2, b2, self.sr_ratio, self.num_heads, 1e-6, 1e-6), None
        if self.fused_attn:
            # fused in train too (VERDICT r3 #5): the kernel's custom VJP
            # recomputes through the XLA reference; stochastic depth is
            # recovered OUTSIDE the kernel (branch = out - x, one bf16
            # rounding) so train semantics match the module chain.
            lns1, lnb1 = _LNParams(name="norm1")(self.dim)
            o = _FusedSRAttention(self.dim, self.num_heads, self.sr_ratio,
                                  dt, name="attn")(
                x, lns1, lnb1, ln1_stats if rng is None else None)
            if rng is not None:
                x = x + _drop_path(o - x, self.drop_path, deterministic,
                                   rng1)
            else:
                x = o
        else:
            y = nn.LayerNorm(epsilon=1e-6, dtype=dt, param_dtype=jnp.float32,
                             name="norm1")(x)
            y = _SRAttention(self.dim, self.num_heads, self.sr_ratio, dt,
                             name="attn")(y, deterministic)
            if rng is not None:
                y = _drop_path(y, self.drop_path, deterministic, rng1)
            x = x + y
        if self.fused_mlp:
            # one-pass Pallas kernel: x + fc2(gelu(dw(fc1(LN(x))))) — same
            # param tree as the module path (see ops/pvt_mlp.py).  When
            # final_ln=(scale, bias) is passed (last block of a stage, eval)
            # the stage-end LayerNorm runs in the kernel epilogue.
            from pranet2_tpu.ops.pvt_mlp import (fused_mlp_block,
                                                 fused_mlp_block_final_ln,
                                                 fused_mlp_block_stats)

            lns, lnb = _LNParams(name="norm2")(self.dim)
            w1, b1, dwk, dwb, w2, b2 = _MlpParams(
                self.dim * self.mlp_ratio, self.dim,
                name="mlp")(self.dim)
            if final_ln is not None and rng is None:
                return fused_mlp_block_final_ln(
                    x, lns, lnb, w1, b1, dwk[:, :, 0, :], dwb, w2, b2,
                    final_ln[0], final_ln[1], 1e-6, 1e-6), None
            if emit_stats and rng is None:
                o, mu, rstd = fused_mlp_block_stats(
                    x, lns, lnb, w1, b1, dwk[:, :, 0, :], dwb, w2, b2,
                    1e-6, 1e-6)
                return o, (mu, rstd)
            o = fused_mlp_block(x, lns, lnb, w1, b1, dwk[:, :, 0, :],
                                dwb, w2, b2, 1e-6)
            if rng is not None:
                o = x + _drop_path(o - x, self.drop_path, deterministic,
                                   rng2)
            return o, None
        y = nn.LayerNorm(epsilon=1e-6, dtype=dt, param_dtype=jnp.float32,
                         name="norm2")(x)
        y = _Mlp(self.dim * self.mlp_ratio, self.dim, dt,
                 name="mlp")(y, deterministic)
        if rng is not None:
            y = _drop_path(y, self.drop_path, deterministic, rng2)
        return x + y, None


class PVTv2(nn.Module):
    """Returns the 4-stage NHWC feature pyramid (strides 4/8/16/32)."""

    embed_dims: tuple[int, ...] = (64, 128, 320, 512)
    depths: tuple[int, ...] = (3, 4, 6, 3)
    num_heads: tuple[int, ...] = (1, 2, 5, 8)
    mlp_ratios: tuple[int, ...] = (8, 8, 4, 4)
    drop_path_rate: float = 0.1
    dtype: jnp.dtype | None = None
    # fuse each block's LN+MLP / LN+attention chains into single Pallas
    # passes (ops/pvt_mlp.py, ops/pvt_attn.py).  None = auto: fused on the
    # bf16 speed path, reference module chain for f32 parity paths.
    # fused_block (ops/pvt_block.py) runs BOTH halves in one per-image
    # pass and takes precedence; None = env auto (PRANET2_FUSED=blockfuse
    # opts in — default OFF until measured on-chip).
    # Per-stage tuple overrides allowed.
    fused_mlp: bool | tuple[bool, ...] | None = None
    fused_attn: bool | tuple[bool, ...] | None = None
    fused_block: bool | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        import os

        from pranet2_tpu.ops._pallas import component_enabled

        deterministic = not train
        # Training defaults to the plain-XLA module chain: fused-vs-unfused
        # bf16 train steps measured equal within noise (BENCH_TABLE train
        # table), and the round-5 residual-saving VJP prototype measured a
        # negative (110.4 vs 108.4 ms/step despite 7.5% fewer bytes) — the
        # kernels' saved traffic does not buy train time on this chip, so
        # training is XLA-only unless the caller opts in (explicit
        # fused_mlp/fused_attn args, or an explicit PRANET2_FUSED env —
        # which the train-parity TPU test uses).
        auto_train_ok = deterministic or os.environ.get(
            "PRANET2_FUSED") is not None
        fused = self.fused_mlp
        if fused is None:
            fused = (component_enabled("mlp", dt == jnp.bfloat16)
                     and auto_train_ok)
        fused = (fused,) * 4 if isinstance(fused, bool) else tuple(fused)
        fattn = self.fused_attn
        if fattn is None:
            fattn = (component_enabled("attn", dt == jnp.bfloat16)
                     and auto_train_ok)
        fattn = (fattn,) * 4 if isinstance(fattn, bool) else tuple(fattn)
        fblock = self.fused_block
        if fblock is None:
            fblock = component_enabled("blockfuse", dt == jnp.bfloat16)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        cur = 0
        outs = []
        for si in range(4):
            dim = self.embed_dims[si]
            if si == 0:
                patch, stride, pad = 7, 4, 3
            else:
                patch, stride, pad = 3, 2, 1
            if (si == 0 and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
                    and component_enabled("pes2d", dt == jnp.bfloat16)):
                # exact space-to-depth restructure of the Cin=3 stride-4
                # embed (ops/patch_embed.py) — same param tree
                from pranet2_tpu.ops.patch_embed import s2d_patch_embed

                k, bias = _ConvBiasParams(dim, patch,
                                          name=f"patch_embed{si + 1}_proj")(
                    x.shape[-1])
                x = s2d_patch_embed(x, k, bias, dt)
            else:
                x = nn.Conv(dim, (patch, patch), strides=(stride, stride),
                            padding=((pad, pad), (pad, pad)), dtype=dt,
                            param_dtype=jnp.float32,
                            name=f"patch_embed{si + 1}_proj")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=dt, param_dtype=jnp.float32,
                             name=f"patch_embed{si + 1}_norm")(x)
            # stage-end LN folds into the last fused MLP kernel's epilogue
            # (eval): the standalone LN costs a full read+lane-reduce+write
            # pass over the stage tensor.  Params stay at the same tree path
            # (norm{si+1}) either way — checkpoint layout is unchanged.
            fold_ln = fused[si] and deterministic and not fblock
            # LN-stats fold (eval): each non-last fused MLP emits the
            # (mu, rstd) of its output; the next block's fused attention
            # applies its XLA K/V-path LN1 without a reduce pass.
            stats = None
            for bi in range(self.depths[si]):
                last = bi == self.depths[si] - 1
                fln = None
                if fold_ln and last:
                    fln = _LNParams(name=f"norm{si + 1}")(dim)
                emit = (not last and fused[si] and fattn[si]
                        and deterministic and not fblock
                        and component_enabled("lnstats",
                                              dt == jnp.bfloat16))
                x, stats = _Block(
                    dim, self.num_heads[si], self.mlp_ratios[si],
                    _SR_RATIOS[si], dpr[cur + bi], dt,
                    fused_mlp=fused[si], fused_attn=fattn[si],
                    fused_block=fblock,
                    name=f"block{si + 1}_{bi}")(x, deterministic,
                                                final_ln=fln,
                                                ln1_stats=stats,
                                                emit_stats=emit)
            cur += self.depths[si]
            if not fold_ln:
                x = nn.LayerNorm(epsilon=1e-6, dtype=dt,
                                 param_dtype=jnp.float32,
                                 name=f"norm{si + 1}")(x)
            outs.append(x)
        return tuple(outs)


def pvt_v2(variant: str = "b2", dtype=None) -> PVTv2:
    return PVTv2(**PVT_CONFIGS[variant], dtype=dtype)
