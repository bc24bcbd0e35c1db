"""Fused PVTv2 transformer block — attention AND MLP halves in one pass.

v2 (``pvt_attn.fused_sra_block``) + the tiled MLP kernel
(``pvt_mlp.fused_mlp_block``) still cost ~8 residual-stream HBM transfers
per block (each kernel reads its input and writes its output, the MLP with
halo re-reads).  This kernel computes the ENTIRE block per image —

    h = x + proj(attn(LN1(x), kv(LN(sr(LN1(x))))))
    o = h + fc2(gelu(dwconv3x3(fc1(LN2(h)))))

— with ``h`` and the 8x-wide hidden tensor never leaving VMEM: reads
x / LN1(x) / sr-patches, writes o.  ~4 transfers, half of v2+MLP.

The MLP half is the whole-image specialization of ``pvt_mlp._kernel``
(same shift-before-fc1 taps, same erf-GELU polynomial, same bf16 tap
accumulation): with the full image resident there are no halo tiles —
the two dwconv pad rows are zero rows appended around ``h``, whose fc1
outputs the border mask zeroes exactly like the reference's
pad-after-fc1.  Feasible now that the VMEM budget is 112 MB (stage-1
peak ~50 MB/image; the guard below falls back per-shape).

Reference composition = ``reference_sra_block`` then
``reference_mlp_block`` (fallback off-TPU + custom-VJP recompute).
Reference chain: ``binary_seg/lib/pvtv2.py:35-90,205-210``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

from pranet2_tpu.ops.pvt_attn import (
    _attend,
    _ln,
    reference_sra_block,
)
from pranet2_tpu.ops.pvt_mlp import _gelu_erf, _taps_lowp, reference_mlp_block


def _mlp_half(hmap, lns, lnb, w1, b1, dwk, dwb, w2, b2, eps, out_dtype):
    """Whole-image ``h + fc2(gelu(dw(fc1(LN2(h)))))`` on VMEM values.

    Same tap algebra as ``pvt_mlp._kernel`` with the image as the single
    tile: the two halo rows are zeros (their fc1 rows are masked off, so
    their LN garbage never propagates — pad-after-fc1 semantics).
    """
    ht, w, d = hmap.shape
    dt = hmap.dtype
    zrow = jnp.zeros((1, w, d), dt)
    xh = jnp.concatenate([zrow, hmap, zrow], axis=0)

    xf = xh.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * lax.rsqrt(var + eps)
    y = y * lns.astype(jnp.float32) + lnb.astype(jnp.float32)

    c = w1.shape[-1]
    r = (ht + 2) * w
    y2 = y.reshape(r, d)
    yb = y2.astype(dt)
    b1f = b1.astype(jnp.float32)

    rows = lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    border = (rows < w) | (rows >= (ht + 1) * w)
    wpos = rows - (rows // w) * w

    tdt = dt if _taps_lowp() else jnp.float32
    acc = jnp.zeros((ht, w, c), tdt)
    dwk_t = dwk.astype(tdt)
    for dj in range(3):
        if dj == 0:
            ys = pltpu.roll(y2, 1, axis=0).astype(dt)
            invalid = border | (wpos == 0)
        elif dj == 2:
            ys = pltpu.roll(y2, r - 1, axis=0).astype(dt)
            invalid = border | (wpos == w - 1)
        else:
            ys = yb
            invalid = border
        z = jnp.dot(ys, w1, preferred_element_type=jnp.float32) + b1f
        z = jnp.where(invalid, 0.0, z).reshape(ht + 2, w, c)
        for di in range(3):
            acc = acc + z[di:di + ht].astype(tdt) * dwk_t[di, dj]
    acc = acc + dwb.astype(tdt)

    g = _gelu_erf(acc)
    out = jnp.dot(g.reshape(ht * w, c).astype(dt), w2,
                  preferred_element_type=jnp.float32)
    out = out + b2.astype(jnp.float32)
    return (hmap + out.reshape(ht, w, d).astype(dt)).astype(out_dtype)


def _kernel_v3(x_ref, y_ref, p_ref, wq_ref, bq_ref, wsr_ref, bsr_ref,
               lks_ref, lkb_ref, wkv_ref, bkv_ref, wp_ref, bp_ref,
               l2s_ref, l2b_ref, w1_ref, b1_ref, dwk_ref, dwb_ref,
               w2_ref, b2_ref, o_ref, *, sr: int, nh: int, eps2: float):
    xc = x_ref[0]                                   # (H, W, D)
    h, w, d = xc.shape
    t = h * w
    yb = y_ref[0].reshape(t, d)

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

    hmap = _attend(yb, xc, wq_ref[...], bq_ref[...], k, v, wp_ref[...],
                   bp_ref[...], nh, xc.dtype).reshape(h, w, d)
    o_ref[0] = _mlp_half(hmap, l2s_ref[...], l2b_ref[...], w1_ref[...],
                         b1_ref[...], dwk_ref[...], dwb_ref[...],
                         w2_ref[...], b2_ref[...], eps2, o_ref.dtype)


def reference_pvt_block(x, lns1, lnb1, wq, bq, wsr, bsr, lks, lkb, wkv, bkv,
                        wp, bp, lns2, lnb2, w1, b1, dwk, dwb, w2, b2, *,
                        sr: int, nh: int, eps1: float = 1e-6,
                        eps2: float = 1e-6):
    """Plain-XLA composition of the whole block (fallback + VJP)."""
    h = reference_sra_block(x, lns1, lnb1, wq, bq, wsr, bsr, lks, lkb,
                            wkv, bkv, wp, bp, sr=sr, nh=nh, eps=eps1)
    return reference_mlp_block(h, lns2, lnb2, w1, b1, dwk, dwb, w2, b2,
                               eps=eps2)


def _vmem_estimate_v3(h, w, d, c, sr):
    """Rough per-image VMEM peak: attn intermediates + the f32 hidden."""
    t = h * w
    tkv = t // (sr * sr)
    attn = t * (d * 22 + tkv * 12) + tkv * sr * sr * d * 2
    mlp = (t + 2 * w) * (d * 8 + c * 6)  # y2 f32 + one z f32 + acc bf16
    return max(attn, mlp) + t * d * 6    # + h/out residency


_VMEM_BUDGET_V3 = 100 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(21, 22, 23, 24))
def fused_pvt_block(x, lns1, lnb1, wq, bq, wsr, bsr, lks, lkb, wkv, bkv,
                    wp, bp, lns2, lnb2, w1, b1, dwk, dwb, w2, b2,
                    sr: int, nh: int, eps1: float = 1e-6,
                    eps2: float = 1e-6):
    """One per-image pass over the whole PVTv2 transformer block.

    Same parameter conventions as ``fused_sra_block`` + ``fused_mlp_block``;
    LN1 and the sr-patch extraction run in XLA (reshape constraints), the
    rest stays in VMEM.  Falls back to the chained XLA composition off-TPU
    or for shapes over the VMEM budget.
    """
    return _impl_v3(x, lns1, lnb1, wq, bq, wsr, bsr, lks, lkb, wkv, bkv,
                    wp, bp, lns2, lnb2, w1, b1, dwk, dwb, w2, b2,
                    sr, nh, eps1, eps2)


def _impl_v3(x, lns1, lnb1, wq, bq, wsr, bsr, lks, lkb, wkv, bkv, wp, bp,
             lns2, lnb2, w1, b1, dwk, dwb, w2, b2, sr, nh, eps1, eps2):
    from pranet2_tpu.ops._pallas import interpret_mode, use_kernel

    n, h, w, d = x.shape
    c = w1.shape[-1]
    shapes_ok = (sr == 1 or (h % sr == 0 and w % sr == 0)) \
        and _vmem_estimate_v3(h, w, d, c, sr) <= _VMEM_BUDGET_V3
    if not (use_kernel(_HAS_PLTPU) and shapes_ok):
        return reference_pvt_block(
            x, lns1, lnb1, wq, bq, wsr, bsr, lks, lkb, wkv, bkv, wp, bp,
            lns2, lnb2, w1, b1, dwk, dwb, w2, b2, sr=sr, nh=nh,
            eps1=eps1, eps2=eps2)
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = ((xf - mu) * lax.rsqrt(var + eps1) * lns1 + lnb1).astype(dt)
    if sr > 1:
        tkv = (h // sr) * (w // sr)
        patches = y.reshape(n, h // sr, sr, w // sr, sr, d)
        patches = patches.transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(n, tkv, sr * sr * d)
    else:
        tkv = h * w
        patches = y.reshape(n, tkv, d)
    args = (x, y, patches, wq.astype(dt), bq, wsr.astype(dt), bsr, lks, lkb,
            wkv.astype(dt), bkv, wp.astype(dt), bp, lns2, lnb2,
            w1.astype(dt), b1, dwk, dwb, w2.astype(dt), b2)
    wspec = lambda a: pl.BlockSpec(a.shape, lambda ni: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_v3, sr=sr, nh=nh, eps2=eps2),
        out_shape=jax.ShapeDtypeStruct((n, h, w, d), dt),
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


def _vjp_fwd_v3(x, lns1, lnb1, wq, bq, wsr, bsr, lks, lkb, wkv, bkv, wp, bp,
                lns2, lnb2, w1, b1, dwk, dwb, w2, b2, sr, nh, eps1, eps2):
    out = _impl_v3(x, lns1, lnb1, wq, bq, wsr, bsr, lks, lkb, wkv, bkv,
                   wp, bp, lns2, lnb2, w1, b1, dwk, dwb, w2, b2,
                   sr, nh, eps1, eps2)
    return out, (x, lns1, lnb1, wq, bq, wsr, bsr, lks, lkb, wkv, bkv, wp,
                 bp, lns2, lnb2, w1, b1, dwk, dwb, w2, b2)


def _vjp_bwd_v3(sr, nh, eps1, eps2, res, g):
    _, vjp = jax.vjp(
        lambda *a: reference_pvt_block(*a, sr=sr, nh=nh, eps1=eps1,
                                       eps2=eps2), *res)
    return vjp(g)


fused_pvt_block.defvjp(_vjp_fwd_v3, _vjp_bwd_v3)
