"""Fused PVTv2 SRA attention — Pallas TPU kernel for ``x + proj(attn(LN(x)))``.

The attention half of a PVTv2 block (``binary_seg/lib/pvtv2.py:33-101,
203-204``) composed from XLA ops costs ~3.5 ms/iter at 352^2 bs16: f32
softmax tensors (16,7744,121) round-trip HBM, the per-head reshapes
materialize relayout copies, and every LayerNorm is a separate
convert+reduce fusion.  This kernel computes LN1, the per-head q
projection, scores, softmax, the PV product, the output projection and
the residual add in one pass over x.

The K/V path (sr-ratio strided conv + LN + kv dense — tokens shrink by
sr^2, so it is ~1% of the flops) stays in XLA and is passed in as
per-head ``kT`` (nh, hd, Tkv) and ``v`` (nh, Tkv, hd); LN1 is computed
twice (once here, once feeding the XLA kv path) — cheaper than a second
HBM round trip of x.

Grid is (N, H/ht): rows of q are independent (attention is global only
through the precomputed KV), so tiles need no halo.  Softmax follows
``jax.nn.dot_product_attention`` semantics: f32 logits, scale 1/sqrt(hd)
applied to q, max-subtracted exp, division after the PV matmul.

Carries a custom VJP that recomputes via the plain-XLA composition (the
module path), so autodiff works; training uses the module path directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, kt_ref, v_ref,
            wp_ref, bp_ref, o_ref, *, eps: float):
    xc = x_ref[0]                                  # (ht, W, D)
    ht, w, d = xc.shape
    t = ht * w
    nh = wq_ref.shape[0]
    hd = wq_ref.shape[-1]
    scale = 1.0 / (hd ** 0.5)

    xf = xc.astype(jnp.float32).reshape(t, d)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * lax.rsqrt(var + eps)
    y = y * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    yb = y.astype(xc.dtype)

    outs = []
    for h in range(nh):
        q = jnp.dot(yb, wq_ref[h], preferred_element_type=jnp.float32)
        q = (q + bq_ref[h].astype(jnp.float32)) * scale
        s = jnp.dot(q.astype(xc.dtype), kt_ref[0, h],
                    preferred_element_type=jnp.float32)   # (t, tkv)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        den = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(xc.dtype), v_ref[0, h],
                    preferred_element_type=jnp.float32)   # (t, hd)
        outs.append(o / den)
    oc = outs[0] if nh == 1 else jnp.concatenate(outs, axis=-1)

    out = jnp.dot(oc.astype(xc.dtype), wp_ref[...],
                  preferred_element_type=jnp.float32)
    out = out + bp_ref[...].astype(jnp.float32)
    o_ref[0] = xc + out.reshape(ht, w, d).astype(o_ref.dtype)


def _pick_ht(h: int, w: int, tkv: int) -> int | None:
    """Largest row-tile keeping the f32 score block under ~2 MB."""
    budget = 2 * 1024 * 1024
    for ht in (h, 44, 32, 22, 16, 11, 8, 4, 2, 1):
        if ht <= h and h % ht == 0 and ht * w * tkv * 4 <= budget:
            return ht
    return None


def reference_sra_attention(x, lns, lnb, wq, bq, kt, v, wp, bp,
                            *, eps: float = 1e-6):
    """Plain-XLA composition (fallback + VJP recompute path)."""
    n, h, w, d = x.shape
    nh, _, hd = wq.shape
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = ((xf - mu) * lax.rsqrt(var + eps) * lns + lnb).astype(dt)
    y = y.reshape(n, h * w, d)
    q = jnp.einsum("ntd,hdk->nhtk", y, wq.astype(dt)) + bq[None, :, None, :]
    q = q * (1.0 / (hd ** 0.5))
    s = jnp.einsum("nhtk,nhkv->nhtv", q.astype(dt), kt.astype(dt),
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("nhtv,nhvk->nhtk", p.astype(dt), v.astype(dt),
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(n, h * w, nh * hd)
    out = jnp.dot(o.astype(dt), wp.astype(dt)) + bp
    return x + out.reshape(n, h, w, d).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_sra_attention(x, lns, lnb, wq, bq, kt, v, wp, bp,
                        eps: float = 1e-6):
    """``x + proj(attention(LN(x), kv))`` — one fused pass.

    x: (N, H, W, D); wq: (nh, D, hd); bq: (nh, hd); kt: (N, nh, hd, Tkv);
    v: (N, nh, Tkv, hd); wp: (D, D).  Falls back to the XLA composition
    off-TPU or for untileable shapes.
    """
    return _impl(x, lns, lnb, wq, bq, kt, v, wp, bp, eps)


def _impl(x, lns, lnb, wq, bq, kt, v, wp, bp, eps):
    from pranet2_tpu.ops._pallas import interpret_mode, use_kernel

    n, h, w, d = x.shape
    nh, _, hd = wq.shape
    tkv = kt.shape[-1]
    ht = _pick_ht(h, w, tkv) if _HAS_PLTPU else None
    if ht is None or not use_kernel(_HAS_PLTPU):
        return reference_sra_attention(x, lns, lnb, wq, bq, kt, v, wp, bp,
                                       eps=eps)
    dt = x.dtype
    grid = (n, h // ht)
    wspec = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (0,) * len(shape), memory_space=pltpu.VMEM)
    ispec = lambda shape: pl.BlockSpec(
        shape, lambda ni, hi: (ni,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, h, w, d), dt),
        interpret=interpret_mode(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ht, w, d), lambda ni, hi: (ni, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec((d,)), wspec((d,)),
            wspec((nh, d, hd)), wspec((nh, hd)),
            ispec((1, nh, hd, tkv)), ispec((1, nh, tkv, hd)),
            wspec((d, d)), wspec((d,)),
        ],
        out_specs=pl.BlockSpec((1, ht, w, d), lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, lns, lnb, wq.astype(dt), bq, kt.astype(dt), v.astype(dt),
      wp.astype(dt), bp)


def _vjp_fwd(x, lns, lnb, wq, bq, kt, v, wp, bp, eps):
    out = _impl(x, lns, lnb, wq, bq, kt, v, wp, bp, eps)
    return out, (x, lns, lnb, wq, bq, kt, v, wp, bp)


def _vjp_bwd(eps, res, g):
    _, vjp = jax.vjp(lambda *a: reference_sra_attention(*a, eps=eps), *res)
    return vjp(g)


fused_sra_attention.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# v2: whole attention half in one kernel, K/V path included.
#
# v1 leaves the sr-conv + LN + kv dense in XLA; at 352^2 bs16 that costs a
# duplicated LayerNorm per block (f32 stat reduce over the full map), a
# layout copy feeding the strided sr conv, and {3,2,1,0}<->{3,0,2,1} relayout
# copies at every XLA<->Pallas boundary (~0.9 ms/iter total, measured).
# Because the sr conv is non-overlapping (kernel == stride), its patches are
# free reshapes of LN1's output: rows split (h/sr, sr), lanes regroup
# (w*d) -> (w/sr, sr*d), concat over the sr row-offsets -- every piece
# 128-lane aligned for the b2 stage shapes.  So the whole block fits in one
# grid-(N,) pass with the image resident in VMEM.
# ---------------------------------------------------------------------------


def _attend(y, xc, wq, bq, k, v, wp, bp, nh, out_dtype):
    """Shared q/softmax/PV/proj/residual tail on one image's tokens."""
    t, d = y.shape
    hd = d // nh
    scale = 1.0 / (hd ** 0.5)
    outs = []
    for h in range(nh):
        q = jnp.dot(y, wq[h], preferred_element_type=jnp.float32)
        q = (q + bq[h].astype(jnp.float32)) * scale
        kh = k[:, h * hd:(h + 1) * hd]
        s = lax.dot_general(q.astype(y.dtype), kh,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (t, tkv)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        den = jnp.sum(p, axis=-1, keepdims=True)
        vh = v[:, h * hd:(h + 1) * hd]
        o = jnp.dot(p.astype(y.dtype), vh,
                    preferred_element_type=jnp.float32)
        outs.append(o / den)
    oc = outs[0] if nh == 1 else jnp.concatenate(outs, axis=-1)
    out = jnp.dot(oc.astype(y.dtype), wp,
                  preferred_element_type=jnp.float32)
    out = out + bp[...].astype(jnp.float32)
    return (xc.reshape(t, d).astype(jnp.float32) + out).astype(out_dtype)


def _ln(xf, s, b, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    return (xf - mu) * lax.rsqrt(var + eps) * s.astype(jnp.float32) \
        + b.astype(jnp.float32)


def _kernel_v2(x_ref, y_ref, p_ref, wq_ref, bq_ref, wsr_ref, bsr_ref,
               lks_ref, lkb_ref, wkv_ref, bkv_ref, wp_ref, bp_ref, o_ref, *,
               sr: int, nh: int):
    xc = x_ref[0]                                   # (H, W, D)
    h, w, d = xc.shape
    t = h * w
    yb = y_ref[0].reshape(t, d)                     # LN1(x), from XLA

    if sr > 1:
        kvi = jnp.dot(p_ref[0], wsr_ref[...],
                      preferred_element_type=jnp.float32)
        kvi = kvi + bsr_ref[...].astype(jnp.float32)
        kvi = _ln(kvi, lks_ref[...], lkb_ref[...], 1e-5).astype(xc.dtype)
    else:
        kvi = yb
    kv = jnp.dot(kvi, wkv_ref[...], preferred_element_type=jnp.float32)
    kv = (kv + bkv_ref[...].astype(jnp.float32)).astype(xc.dtype)
    k, v = kv[:, :d], kv[:, d:]

    out = _attend(yb, xc, wq_ref[...], bq_ref[...], k, v, wp_ref[...],
                  bp_ref[...], nh, o_ref.dtype)
    o_ref[0] = out.reshape(h, w, d)


def reference_sra_block(x, lns, lnb, wq, bq, wsr, bsr, lks, lkb, wkv, bkv,
                        wp, bp, *, sr: int, nh: int, eps: float = 1e-6):
    """Plain-XLA composition of the whole attention half (fallback + VJP)."""
    n, h, w, d = x.shape
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = ((xf - mu) * lax.rsqrt(var + eps) * lns + lnb).astype(dt)
    if sr > 1:
        kvi = lax.conv_general_dilated(
            y, wsr.reshape(sr, sr, d, d).astype(dt), (sr, sr), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bsr.astype(dt)
        kf = kvi.astype(jnp.float32)
        mu2 = jnp.mean(kf, axis=-1, keepdims=True)
        var2 = jnp.mean(kf * kf, axis=-1, keepdims=True) - mu2 * mu2
        kvi = ((kf - mu2) * lax.rsqrt(var2 + 1e-5) * lks + lkb).astype(dt)
        kvi = kvi.reshape(n, -1, d)
    else:
        kvi = y.reshape(n, h * w, d)
    kv = jnp.dot(kvi, wkv.astype(dt)) + bkv.astype(dt)
    k, v = kv[..., :d], kv[..., d:]
    hd = d // nh
    tkv = k.shape[1]
    kt = k.reshape(n, tkv, nh, hd).transpose(0, 2, 3, 1)
    vv = v.reshape(n, tkv, nh, hd).transpose(0, 2, 1, 3)
    return reference_sra_attention(
        x, lns, lnb, wq, bq, kt, vv, wp, bp, eps=eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def fused_sra_block(x, lns, lnb, wq, bq, wsr, bsr, lks, lkb, wkv, bkv,
                    wp, bp, sr: int, nh: int, eps: float = 1e-6):
    """``x + proj(attn(LN(x), kv(LN(sr_conv(LN(x))))))`` — one pass/image.

    x: (N, H, W, D); wq: (nh, D, hd); wsr: (sr*sr*D, D) [the (sr,sr,D,D)
    HWIO conv kernel flattened]; wkv: (D, 2D); wp: (D, D).  H, W must be
    divisible by sr.  LN1 and the non-overlapping-patch extraction run in
    XLA (reshape/transpose Mosaic cannot express in-kernel); the sr dot,
    kv LN/dense, q, softmax attention, proj and residual run in one
    per-image Pallas pass.  Falls back to the XLA composition off-TPU.
    """
    return _impl_v2(x, lns, lnb, wq, bq, wsr, bsr, lks, lkb, wkv, bkv,
                    wp, bp, sr, nh, eps)


def _vmem_estimate_v2(h, w, d, sr):
    """Rough per-image VMEM working set (bytes) of _kernel_v2.

    bf16 x/y/patches/out blocks plus the f32 q/s/p/o/proj/residual
    intermediates of ``_attend`` (t*d and t*tkv tensors dominate).
    """
    t = h * w
    tkv = t // (sr * sr)
    return t * (d * 22 + tkv * 12) + tkv * sr * sr * d * 2


# the chip has 128M VMEM; leave headroom for Mosaic's own scratch
_VMEM_BUDGET_V2 = 100 * 1024 * 1024


def _impl_v2(x, lns, lnb, wq, bq, wsr, bsr, lks, lkb, wkv, bkv, wp, bp,
             sr, nh, eps):
    from pranet2_tpu.ops._pallas import interpret_mode, use_kernel

    n, h, w, d = x.shape
    shapes_ok = (sr == 1 or (h % sr == 0 and w % sr == 0)) \
        and _vmem_estimate_v2(h, w, d, sr) <= _VMEM_BUDGET_V2
    if not (use_kernel(_HAS_PLTPU) and shapes_ok):
        return reference_sra_block(x, lns, lnb, wq, bq, wsr, bsr, lks, lkb,
                                   wkv, bkv, wp, bp, sr=sr, nh=nh, eps=eps)
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = ((xf - mu) * lax.rsqrt(var + eps) * lns + lnb).astype(dt)
    if sr > 1:
        tkv = (h // sr) * (w // sr)
        patches = y.reshape(n, h // sr, sr, w // sr, sr, d)
        patches = patches.transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(n, tkv, sr * sr * d)
    else:
        tkv = h * w
        patches = y.reshape(n, tkv, d)
    args = (x, y, patches, wq.astype(dt), bq, wsr.astype(dt), bsr, lks, lkb,
            wkv.astype(dt), bkv, wp.astype(dt), bp)
    wspec = lambda a: pl.BlockSpec(a.shape, lambda ni: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_v2, sr=sr, nh=nh),
        out_shape=jax.ShapeDtypeStruct((n, h, w, d), dt),
        # whole-image working set: stage-1 (88x88) peaks ~22M, well over the
        # 16M default scoped-vmem limit; the guard above bounds it to budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret_mode(),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, d), lambda ni: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, d), lambda ni: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tkv, patches.shape[-1]),
                         lambda ni: (ni, 0, 0), memory_space=pltpu.VMEM),
        ] + [wspec(a) for a in args[3:]],
        out_specs=pl.BlockSpec((1, h, w, d), lambda ni: (ni, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(*args)


def _vjp_fwd_v2(x, lns, lnb, wq, bq, wsr, bsr, lks, lkb, wkv, bkv, wp, bp,
                sr, nh, eps):
    out = _impl_v2(x, lns, lnb, wq, bq, wsr, bsr, lks, lkb, wkv, bkv,
                   wp, bp, sr, nh, eps)
    return out, (x, lns, lnb, wq, bq, wsr, bsr, lks, lkb, wkv, bkv, wp, bp)


def _vjp_bwd_v2(sr, nh, eps, res, g):
    _, vjp = jax.vjp(
        lambda *a: reference_sra_block(*a, sr=sr, nh=nh, eps=eps), *res)
    return vjp(g)


fused_sra_block.defvjp(_vjp_fwd_v2, _vjp_bwd_v2)
