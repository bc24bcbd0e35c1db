"""Fused PVTv2 MLP block — Pallas TPU kernel for ``x + MLP(LN(x))``.

The PVTv2 transformer block's MLP half (``binary_seg/lib/pvtv2.py:14-30,
205-210``) is ``x + fc2(GELU(dwconv3x3(fc1(LN(x)))))``.  Composed from XLA
ops this chain makes ~7 full HBM round-trips per block — and the ratio-8
hidden tensors (e.g. (16,88,88,512) at 352^2 stage 1) are 8x the residual
stream, so the chain moves ~900 MB per block instance at bs16.  Worse,
XLA's grouped-depthwise emitter on those shapes is VPU/permute-bound at
~150-200 GB/s (measured, v5e).

This kernel computes the whole block in ONE pass over x: LayerNorm, fc1
(MXU), the depthwise 3x3 (VPU, entirely in VMEM), exact-erf GELU, fc2
(MXU), and the residual add — reading x once (plus two cheap halo-row
re-reads) and writing the output once.

Halo handling: grid is (N, H/h_t); x is passed three times with clamped
index maps (previous / current / next row-tile) and the kernel assembles
``h_t + 2`` rows.  The depthwise conv's zero padding applies to the fc1
*output* (the reference pads after fc1), so at image borders the kernel
zeroes the halo rows of the hidden tensor — not of x — which reproduces
``F.pad``-within-``nn.Conv`` semantics exactly.

The op carries a custom VJP that recomputes via the plain-XLA reference
composition, so ``jax.grad`` through an inference-mode model still works;
training paths use the unfused module directly.

Intended for the bf16 inference path (auto-enabled there by
``PVTv2(fold_dwconv=None)``); numerics match the unfused bf16 program to
bf16 resolution (see tests/test_pvt_mlp_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu importable only where Pallas TPU lowering exists
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

import os

def _taps_lowp() -> bool:
    """Tap-accumulation dtype knob, read at trace time so one ablation
    process can sweep it (each variant builds a fresh jit).

    Default is f32: bf16 taps measured ~1.6x on isolated stage-1/2 blocks
    but are a large FULL-MODEL regression (PVT-PraNet-V2 352^2 bs16:
    761 vs 1,180 img/s, tools/exp_pvt_matrix.py, round 3) — the extra
    casts/layouts around the rolls evidently dominate outside the
    microbenchmark.  PVT_MLP_TAPS=lowp opts back in for re-checks."""
    return os.environ.get("PVT_MLP_TAPS", "f32") == "lowp"


def _fc1_per_tap() -> bool:
    """fc1 strategy knob (trace time).  Default computes fc1 ONCE and
    builds the three W-tap copies by sublane-rolling the hidden tensor
    (shift-then-matmul == matmul-then-shift, so the taps are bit-identical
    either way).  The per-tap form runs fc1 three times — at stage 1 that
    is 3x16.3 GF of (lane-padded) MXU per block, and the round-5 profile
    showed the MLP kernels MXU-bound (stage-1 block 0.77 ms vs a 0.16 ms
    traffic bound).  PVT_MLP_FC1=per_tap opts back into the old form for
    A/B re-checks (it trades 2 wide hidden rolls for 2 extra matmuls —
    the right call only if sublane rolls outprice the MXU, which they
    don't at these shapes on v5e: see BENCH_TABLE round-5)."""
    return os.environ.get("PVT_MLP_FC1", "once") == "per_tap"


def _gelu_lowp() -> bool:
    """GELU lane-width knob (trace time).  PVT_MLP_GELU=bf16 computes the
    erf polynomial on packed bf16 lanes while tap accumulation stays at
    the PVT_MLP_TAPS dtype.

    Measured NEGATIVE on v5e (round-4 exp_pvt_matrix, PVT bs16 full model:
    1,153 vs 1,324 img/s f32) — same story as bf16 taps: this chip's VPU
    has no packed-bf16 arithmetic win, so narrowing elementwise dtypes just
    adds converts.  Default stays f32; knob kept for re-checks on chips
    where bf16 VPU packing is real."""
    return os.environ.get("PVT_MLP_GELU", "f32") == "bf16"


# odd-polynomial erf(x/sqrt(2)) = x * P(x^2) on [-3.5, 3.5], x-weighted
# LSQ fit, degree 5 in x^2 (max erf err 8.9e-4; tail saturation err
# 4.7e-4 beyond the clip -- both well under bf16 resolution).  No
# exp/transcendental: Mosaic has no erf primitive and the A&S exp-based
# rational costs ~2x the VPU time of this Horner chain (measured).  The
# GELU poly is the fused MLP kernel's largest VPU term (~24 ops/elem at
# the old degree 8 = ~3.6 ms/iter at bs16), so degree is minimized.
_ERF_COEF = (
    0.79677470225491, -0.13004687058013398, 0.017675043414989475,
    -0.0015805384199393212, 8.08939954863686e-05, -1.7651197891844647e-06,
)


def _gelu_erf(x):
    """Exact-erf GELU via polynomial erf; |err| < 2e-3 absolute (bf16 path)."""
    xc = jnp.clip(x, -3.5, 3.5)
    u = xc * xc
    p = jnp.full_like(u, _ERF_COEF[-1])
    for coef in _ERF_COEF[-2::-1]:
        p = p * u + coef
    return 0.5 * x * (1.0 + xc * p)


def _kernel(xp_ref, xc_ref, xn_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
            dwk_ref, dwb_ref, w2_ref, b2_ref, *rest, eps: float,
            final_eps: float | None = None, save_acc: bool = False,
            stats_eps: float | None = None):
    oacc_ref = mu_ref = rstd_ref = None
    if final_eps is None:
        if save_acc:
            # residual-saving VJP mode: second output carries the
            # pre-GELU hidden (post-dwconv+bias) for the backward pass
            o_ref, oacc_ref = rest
        elif stats_eps is not None:
            # LN-stats fold: also emit the per-token (mu, rstd) of the
            # block OUTPUT so the NEXT block's XLA LN1 skips its reduce
            # pass (stats from the cast output == what XLA would compute)
            o_ref, mu_ref, rstd_ref = rest
        else:
            (o_ref,) = rest
        lnsf_ref = lnbf_ref = None
    else:
        # stage-end LayerNorm folded into the epilogue: two extra (d,)
        # param refs ahead of the output ref
        lnsf_ref, lnbf_ref, o_ref = rest
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    xc = xc_ref[0]                                   # (h_t, W, D)
    ht, w, d = xc.shape
    # xp/xn are single-row halo blocks (the previous tile's last row / the
    # next tile's first row), not full tiles: each grid step reads its own
    # rows once plus two rows, so x is read ~1x from HBM, not 3x.
    top = jnp.where(i == 0, jnp.zeros_like(xc[:1]), xp_ref[0])
    bot = jnp.where(i == nh - 1, jnp.zeros_like(xc[:1]), xn_ref[0])
    xh = jnp.concatenate([top, xc, bot], axis=0)      # (h_t+2, W, D)

    # LayerNorm over channels, f32 stats (flax fast-variance form)
    xf = xh.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * lax.rsqrt(var + eps)
    y = y * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)

    # The depthwise 3x3 needs W-shifted copies of the hidden tensor.
    # Sublane shifts on the (rows, C) hidden are the kernel's dominant
    # cost when done directly (measured 0.62 of 1.11 ms at stage 2,
    # tools/exp_mlp_kernel.py) — so shift the 8x-narrower POST-LN input
    # instead and run fc1 once per W-tap column: shift-then-matmul ==
    # matmul-then-shift, at 1/8 the realign bytes.  The shifted copies
    # wrap across flattened (H,W) row boundaries; those wrapped rows are
    # exactly the dwconv's zero-pad positions and are re-zeroed (post
    # bias — the reference pads fc1's *output*, bias included) by the
    # row masks below.  All 9 tap reads are then H-slices of an aligned
    # tensor, which cost ~0.01 ms each (free dim, no realign).
    c = w1_ref.shape[-1]
    r = (ht + 2) * w
    y2 = y.reshape(r, d)          # rolls stay f32: Mosaic rotate is 32-bit
    yb = y2.astype(xc.dtype)
    w1 = w1_ref[...]
    b1 = b1_ref[...].astype(jnp.float32)
    dwk = dwk_ref[...].astype(jnp.float32)            # (3, 3, C)

    rows = lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    border = ((rows < w) & (i == 0)) | ((rows >= (ht + 1) * w) & (i == nh - 1))
    wpos = rows - (rows // w) * w                     # rows % W

    # Tap accumulation + GELU are the kernel's dominant VPU cost on the
    # 8x-wide hidden tensor.  bf16 taps pack 2 lanes per f32 ALU op and
    # measured ~1.6x on isolated stage-1/2 blocks, but regress the FULL
    # model by 1.55x (see _taps_lowp) — default is f32 taps.
    tdt = xc.dtype if _taps_lowp() else jnp.float32
    acc = jnp.zeros((ht, w, c), tdt)
    dwk_t = dwk.astype(tdt)
    per_tap = _fc1_per_tap()
    if not per_tap:
        # fc1 ONCE; W-tap copies are sublane rolls of the hidden (matmul
        # is per-row, so roll-then-fc1 == fc1-then-roll bit-for-bit, and
        # the destination-row masks below are unchanged)
        z_all = jnp.dot(yb, w1, preferred_element_type=jnp.float32) + b1
    for dj in range(3):
        if dj == 0:   # left tap: z[h, w-1] = fc1(y rolled down one row)
            invalid = border | (wpos == 0)
            if per_tap:
                ys = pltpu.roll(y2, 1, axis=0).astype(xc.dtype)
            else:
                zs = pltpu.roll(z_all, 1, axis=0)
        elif dj == 2:  # right tap
            invalid = border | (wpos == w - 1)
            if per_tap:
                ys = pltpu.roll(y2, r - 1, axis=0).astype(xc.dtype)
            else:
                zs = pltpu.roll(z_all, r - 1, axis=0)
        else:
            invalid = border
            if per_tap:
                ys = yb
            else:
                zs = z_all
        if per_tap:
            zs = jnp.dot(ys, w1, preferred_element_type=jnp.float32) + b1
        z = jnp.where(invalid, 0.0, zs).reshape(ht + 2, w, c)
        for di in range(3):
            # convert per H-slice: no second full-size hidden copy in VMEM
            acc = acc + z[di:di + ht].astype(tdt) * dwk_t[di, dj]
    acc = acc + dwb_ref[...].astype(tdt)
    if oacc_ref is not None:
        oacc_ref[0] = acc.astype(oacc_ref.dtype)

    # GELU on packed bf16 lanes (taps stay f32): the erf polynomial is
    # ~10 VPU ops on the 8x-wide hidden — halving its lane width is the
    # cheapest remaining in-kernel cut.  PVT_MLP_GELU=bf16 opts in; the
    # downcast costs one rounding at values the erf clip already bounds.
    if _gelu_lowp():
        g = _gelu_erf(acc.astype(xc.dtype))
    else:
        g = _gelu_erf(acc)

    out = jnp.dot(g.reshape(ht * w, c).astype(xc.dtype), w2_ref[...],
                  preferred_element_type=jnp.float32)
    out = out + b2_ref[...].astype(jnp.float32)
    if final_eps is None:
        ob = xc + out.reshape(ht, w, d).astype(o_ref.dtype)
        o_ref[0] = ob
        if mu_ref is not None:
            obf = ob.astype(jnp.float32)
            mu = jnp.mean(obf, axis=-1)
            var = jnp.mean(obf * obf, axis=-1) - mu * mu
            mu_ref[0] = mu
            rstd_ref[0] = lax.rsqrt(var + stats_eps)
        return
    # ---- stage-end LayerNorm epilogue (per-token over d; free in VMEM) --
    # The standalone LN otherwise costs a full read + lane-dim reduce +
    # write pass over the stage tensor (measured ~0.3 ms/iter at stage 1,
    # 352^2 bs16 — the convert_reduce fusions in the round-4 profile).
    of = xc.astype(jnp.float32) + out.reshape(ht, w, d)
    mu = jnp.mean(of, axis=-1, keepdims=True)
    var = jnp.mean(of * of, axis=-1, keepdims=True) - mu * mu
    y = (of - mu) * lax.rsqrt(var + final_eps)
    y = y * lnsf_ref[...].astype(jnp.float32) + \
        lnbf_ref[...].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_ht(h: int, w: int, c: int) -> int | None:
    """Largest row-tile with per-hidden-block f32 footprint <= 8 MB.

    Round-5 on-chip sweep (full PVT-PraNet-V2 bs16, same session): the
    original 3 MB budget (stage-1 ht=11) = 1,412.1 img/s, 8 MB (stage-1
    ht=22) = 1,438.7 — fewer grid steps amortize per-step overhead and
    halo rows.  ~3.3 live hidden-sized buffers at 8 MB stay under the
    kernel's 32 MB vmem limit; a 20 MB budget (whole-image stage-1 tiles)
    exceeds it and fails to compile."""
    budget = 8 * 1024 * 1024
    for ht in (h, 44, 32, 22, 16, 11, 8, 4, 2, 1):
        if ht <= h and h % ht == 0 and (ht + 2) * w * c * 4 <= budget:
            return ht
    return None


def _pick_ht_stats(h: int, w: int, c: int) -> int | None:
    """Row-tile for the stats-emitting kernel: must be a multiple of 8 (or
    the full height) so the (1, ht, w) f32 stats blocks satisfy Mosaic's
    block-shape rule.  Stage 1 (88) tiles at 8; stages 2-4 (44/22/11) have
    no 8-multiple divisors and run full-height (their hidden blocks are
    small; the 64 MB stats-mode vmem limit covers stage 2's 8.3 MB).
    Stage-1 full-height (the only larger Mosaic-legal tile) measured a
    clear on-chip loss — PVT bs16 1,447.0 -> 1,316.4, ~53 MB of live
    hidden buffers defeat the pipeline — so 8 stays."""
    for ht in (32, 24, 16, 8):
        if h % ht == 0 and (ht + 2) * w * c * 4 <= 8 * 1024 * 1024:
            return ht
    if (h + 2) * w * c * 4 <= 16 * 1024 * 1024:
        return h
    return None


def reference_mlp_block(x, lns, lnb, w1, b1, dwk, dwb, w2, b2,
                        *, eps: float = 1e-6):
    """Plain-XLA composition (fallback + VJP recompute path).

    Matches the flax module chain numerically on the dtypes it is used
    with; params arrive f32, compute dtype follows x (bf16 on the speed
    path).
    """
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * lax.rsqrt(var + eps)
    y = (y * lns + lnb).astype(dt)
    y = jax.lax.dot_general(
        y, w1.astype(dt), dimension_numbers=(((3,), (0,)), ((), ()))
    ) + b1.astype(dt)
    c = w1.shape[-1]
    y = lax.conv_general_dilated(
        y, dwk.reshape(3, 3, 1, c).astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    ) + dwb.astype(dt)
    y = nn_gelu_exact(y)
    y = jax.lax.dot_general(
        y, w2.astype(dt), dimension_numbers=(((3,), (0,)), ((), ()))
    ) + b2.astype(dt)
    return x + y


def nn_gelu_exact(x):
    import flax.linen as nn

    return nn.gelu(x, approximate=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_mlp_block(x, lns, lnb, w1, b1, dwk, dwb, w2, b2,
                    eps: float = 1e-6):
    """``x + fc2(gelu(dwconv3x3(fc1(LN(x)))))`` — one fused pass.

    x: (N, H, W, D); w1: (D, C); dwk: (3, 3, C); w2: (C, D).  Falls back
    to the XLA composition off-TPU or for shapes the kernel can't tile.
    """
    return _impl(x, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps)


def _impl(x, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps,
          lnsf=None, lnbf=None, final_eps=None, save_acc=False,
          stats_eps=None):
    from pranet2_tpu.ops._pallas import interpret_mode, use_kernel

    n, h, w, d = x.shape
    c = w1.shape[-1]
    ht = _pick_ht(h, w, c) if _HAS_PLTPU else None
    if stats_eps is not None and ht is not None and not interpret_mode():
        # the (1, ht, w) stats output blocks need ht % 8 == 0 or ht == h
        # (Mosaic block-shape rule); fall back to the plain kernel + XLA
        # stats when no such tile fits
        ht = _pick_ht_stats(h, w, c)
        if ht is None:
            out = _impl(x, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps)
            return (out, *reference_ln_stats(out, stats_eps))
    if ht is None or not use_kernel(_HAS_PLTPU):
        if save_acc:
            return reference_mlp_block_with_acc(
                x, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps=eps)
        out = reference_mlp_block(x, lns, lnb, w1, b1, dwk, dwb, w2, b2,
                                  eps=eps)
        if stats_eps is not None:
            return out, *reference_ln_stats(out, stats_eps)
        if final_eps is not None:
            out = reference_final_ln(out, lnsf, lnbf, final_eps)
        return out
    dt = x.dtype
    grid = (n, h // ht)
    wspec = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (0,) * len(shape), memory_space=pltpu.VMEM)
    # single-row halo blocks: previous tile's LAST row / next tile's FIRST
    # row (row-index units because the block is one row tall), clamped at
    # the edges where the kernel masks them to zero.  A full-tile halo
    # spec read x ~3x from HBM per block (VERDICT r4 / ADVICE r4 pattern,
    # same fix as stem._maxpool_s2d_pallas).
    in_specs = [
        pl.BlockSpec((1, 1, w, d),
                     lambda ni, hi: (ni, jnp.maximum(hi * ht - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ht, w, d), lambda ni, hi: (ni, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w, d),
                     lambda ni, hi: (ni, jnp.minimum(hi * ht + ht, h - 1),
                                     0, 0),
                     memory_space=pltpu.VMEM),
        wspec((d,)), wspec((d,)),
        wspec((d, c)), wspec((c,)),
        wspec((3, 3, c)), wspec((c,)),
        wspec((c, d)), wspec((d,)),
    ]
    args = [x, x, x, lns, lnb, w1.astype(dt), b1, dwk, dwb,
            w2.astype(dt), b2]
    if final_eps is not None:
        in_specs += [wspec((d,)), wspec((d,))]
        args += [lnsf, lnbf]
    out_shape = jax.ShapeDtypeStruct((n, h, w, d), dt)
    out_specs = pl.BlockSpec((1, ht, w, d), lambda ni, hi: (ni, hi, 0, 0),
                             memory_space=pltpu.VMEM)
    if save_acc:
        out_shape = (out_shape, jax.ShapeDtypeStruct((n, h, w, c), dt))
        out_specs = (out_specs,
                     pl.BlockSpec((1, ht, w, c),
                                  lambda ni, hi: (ni, hi, 0, 0),
                                  memory_space=pltpu.VMEM))
    elif stats_eps is not None:
        sspec = pl.BlockSpec((1, ht, w), lambda ni, hi: (ni, hi, 0),
                             memory_space=pltpu.VMEM)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n, h, w), jnp.float32),
                     jax.ShapeDtypeStruct((n, h, w), jnp.float32))
        out_specs = (out_specs, sspec, sspec)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, final_eps=final_eps,
                          save_acc=save_acc, stats_eps=stats_eps),
        out_shape=out_shape,
        # default scoped-vmem limit is 16M; the bf16-tap variant peaks a few
        # hundred KB over it at the stage-2 shape (v5e has far more VMEM);
        # stats mode runs stages 2-4 full-height (see _pick_ht_stats)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(64 if stats_eps is not None else 32)
            * 1024 * 1024),
        interpret=interpret_mode(),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
    )(*args)


def reference_ln_stats(x, eps):
    """Per-token LayerNorm statistics of ``x`` — (mu, rstd), f32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1)
    var = jnp.mean(xf * xf, axis=-1) - mu * mu
    return mu, lax.rsqrt(var + eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_mlp_block_stats(x, lns, lnb, w1, b1, dwk, dwb, w2, b2,
                          eps: float = 1e-6, stats_eps: float = 1e-6):
    """The MLP block plus the per-token LN statistics of its OUTPUT —
    ``(out, mu, rstd)``.  The next transformer block's XLA-side LN1 (the
    K/V path's) then applies ``(out - mu) * rstd * lns + lnb`` as a pure
    elementwise fusion instead of paying its own lane-dim reduce pass over
    the map (the convert_reduce residue of the round-5 profile).  Stats
    are computed from the CAST output in-kernel, so they are bit-identical
    to what XLA would recompute from the block's output tensor."""
    return _impl(x, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps,
                 stats_eps=stats_eps)


def _vjp_fwd_stats(x, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps, stats_eps):
    out = _impl(x, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps,
                stats_eps=stats_eps)
    return out, (x, lns, lnb, w1, b1, dwk, dwb, w2, b2)


def _vjp_bwd_stats(eps, stats_eps, res, g):
    def ref(*a):
        o = reference_mlp_block(*a, eps=eps)
        return (o, *reference_ln_stats(o, stats_eps))

    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


fused_mlp_block_stats.defvjp(_vjp_fwd_stats, _vjp_bwd_stats)


def reference_final_ln(x, lns, lnb, eps):
    """Plain-XLA stage-end LayerNorm (fallback + VJP recompute path)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * lax.rsqrt(var + eps)
    return (y * lns + lnb).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_mlp_block_final_ln(x, lns, lnb, w1, b1, dwk, dwb, w2, b2,
                             lnsf, lnbf, eps: float = 1e-6,
                             final_eps: float = 1e-6):
    """``LN_f(x + fc2(gelu(dwconv3x3(fc1(LN(x))))))`` — the last MLP block
    of a PVTv2 stage with the stage-end LayerNorm (``pvtv2.py norm{1-4}``,
    reference ``binary_seg/lib/pvtv2.py forward_features``) folded into the
    kernel epilogue, saving the standalone LN's full read+reduce+write pass
    over the stage tensor."""
    return _impl(x, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps,
                 lnsf, lnbf, final_eps)


def _vjp_fwd_ln(x, lns, lnb, w1, b1, dwk, dwb, w2, b2, lnsf, lnbf,
                eps, final_eps):
    out = _impl(x, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps,
                lnsf, lnbf, final_eps)
    return out, (x, lns, lnb, w1, b1, dwk, dwb, w2, b2, lnsf, lnbf)


def _vjp_bwd_ln(eps, final_eps, res, g):
    _, vjp = jax.vjp(
        lambda *a: reference_final_ln(
            reference_mlp_block(*a[:9], eps=eps), a[9], a[10], final_eps),
        *res)
    return vjp(g)


fused_mlp_block_final_ln.defvjp(_vjp_fwd_ln, _vjp_bwd_ln)


def _bwd_saved() -> bool:
    """Backward strategy knob (trace time) for ``fused_mlp_block`` under
    autodiff.  ``saved`` (the residual-saving VJP, VERDICT r4 #6): the
    forward kernel emits the pre-GELU hidden as a second output and the
    backward is a hand-composed chain of sub-VJPs — LN and fc1 forwards
    are recomputed (narrow / one matmul; both are needed as conv/fc1
    grad residuals anyway), the dwconv's grads come from a vjp whose
    unused primal forward XLA dead-code-eliminates, and GELU/fc2 forward
    never re-run.  vs ``recompute``: jax.vjp through the whole XLA
    reference composition, re-materializing the 8x hidden ~3 extra times.

    Measured on-chip (round 5, PVT-PraNet-V2 bs16 bf16 fused train step):
    saved = 110.41 ms/step at 52.7 GB/step vs recompute = 108.35 at
    57.0 GB — the saved mode moves 7.5% fewer bytes but is ~2% SLOWER
    (the kernel's extra hidden-sized output serializes against the rest
    of the step).  Default is therefore ``recompute``; the prototype
    stays for re-checks (grad parity pinned by
    tests/test_pvt_mlp_fused.py::test_saved_vjp_matches_recompute_vjp).
    """
    return os.environ.get("PVT_MLP_BWD", "recompute") == "saved"


def reference_mlp_block_with_acc(x, lns, lnb, w1, b1, dwk, dwb, w2, b2,
                                 *, eps: float = 1e-6):
    """Reference composition that also returns the pre-GELU hidden
    (post-dwconv+bias) — the off-TPU counterpart of the kernel's
    ``save_acc`` mode."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * lax.rsqrt(var + eps)
    y = (y * lns + lnb).astype(dt)
    z = jax.lax.dot_general(
        y, w1.astype(dt), dimension_numbers=(((3,), (0,)), ((), ()))
    ) + b1.astype(dt)
    c = w1.shape[-1]
    acc = lax.conv_general_dilated(
        z, dwk.reshape(3, 3, 1, c).astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    ) + dwb.astype(dt)
    g = nn_gelu_exact(acc)
    out = jax.lax.dot_general(
        g, w2.astype(dt), dimension_numbers=(((3,), (0,)), ((), ()))
    ) + b2.astype(dt)
    return x + out, acc


def _vjp_fwd(x, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps):
    if _bwd_saved():
        out, accb = _impl(x, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps,
                          save_acc=True)
        return out, (x, lns, lnb, w1, b1, dwk, dwb, w2, b2, accb)
    out = _impl(x, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps)
    return out, (x, lns, lnb, w1, b1, dwk, dwb, w2, b2, None)


def _vjp_bwd(eps, res, g):
    *prims, accb = res
    if accb is None:
        _, vjp = jax.vjp(
            lambda *a: reference_mlp_block(*a, eps=eps), *prims)
        return vjp(g)
    x, lns, lnb, w1, b1, dwk, dwb, w2, b2 = prims
    dt = x.dtype
    c = w1.shape[-1]

    # LN forward (narrow, needed as the fc1-grad residual) with its vjp
    def ln_fn(x, lns, lnb):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
        return ((xf - mu) * lax.rsqrt(var + eps) * lns + lnb).astype(dt)

    y, vjp_ln = jax.vjp(ln_fn, x, lns, lnb)

    # fc1 forward (one matmul; z is the dwconv-grad residual) with vjp
    def fc1_fn(y, w1, b1):
        return lax.dot_general(
            y, w1.astype(dt), dimension_numbers=(((3,), (0,)), ((), ()))
        ) + b1.astype(dt)

    z, vjp_fc1 = jax.vjp(fc1_fn, y, w1, b1)

    # tail grads from the SAVED acc: gelu forward runs once (its output
    # is the dw2 residual), fc2's forward never re-runs
    gf, vjp_gelu = jax.vjp(nn_gelu_exact, accb)
    m = gf.shape[0] * gf.shape[1] * gf.shape[2]
    dw2 = lax.dot_general(
        gf.reshape(m, c), g.reshape(m, -1),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2 = g.astype(jnp.float32).sum((0, 1, 2))
    dgf = lax.dot_general(
        g, w2.astype(dt), dimension_numbers=(((3,), (1,)), ((), ())))
    (dacc,) = vjp_gelu(dgf)

    # dwconv grads WITHOUT its forward: the vjp's unused primal output is
    # dead-code-eliminated under jit (conv grads need only (z, dwk))
    def conv_fn(z, dwk, dwb):
        return lax.conv_general_dilated(
            z, dwk.reshape(3, 3, 1, c).astype(dt), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        ) + dwb.astype(dt)

    _, vjp_conv = jax.vjp(conv_fn, z, dwk, dwb)
    dz, ddwk, ddwb = vjp_conv(dacc)
    dy, dw1, db1 = vjp_fc1(dz)
    dx_ln, dlns, dlnb = vjp_ln(dy)
    return (dx_ln + g, dlns, dlnb, dw1, db1, ddwk, ddwb, dw2, db2)


fused_mlp_block.defvjp(_vjp_fwd, _vjp_bwd)
