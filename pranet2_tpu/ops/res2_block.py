"""Fused Res2Net Bottle2neck — Pallas TPU kernel for the whole residual block.

A 'normal' (stride-1, no-downsample) Bottle2neck
(``binary_seg/lib/Res2Net_v1b.py:36-96``) is
``relu(bn3(conv3(cat(sp0, sp1, sp2, spx3))) + x)`` where
``sp_i = relu(bn_i(conv3x3_i(spx_i + sp_{i-1})))`` over 4 splits of
``relu(bn1(conv1x1(x)))``.  Composed from XLA ops the split groups are
26/52/104/208 channels wide — every one of those tensors is lane-padded to
128 in HBM (a 26-channel (16,88,88,26) map occupies 4.9x its logical bytes),
so layer-1/2 blocks run at a fraction of the chip's effective bandwidth
(measured: the nine 26-ch convs alone are ~1.1 ms/iter at 352^2 bs16).

This kernel reads x once (plus halo re-reads on the tiled layer-1 shape),
computes the 1x1 expand, the three sequential 3x3 convs, the concat, the
1x1 project, folded inference BatchNorms, the residual add and both ReLUs
entirely in VMEM, and writes the output once.  BN is folded to per-channel
scale/shift computed from running stats outside the kernel (eval semantics;
the training path uses the unfused module).

3x3 convs use the W-tap-concat form: Z = [shift_left(v), v, shift_right(v)]
(invalid shifted columns zeroed == zero padding), then one MXU pass per
H-tap ``di`` with the (3*width, width) stacked kernel slab, H-taps applied
as row-rolls of the partial product with wrapped rows masked (== zero
padding at image borders).

Halo tiles (grid (N, H/ht)) pass x three times with clamped index maps
(pvt_mlp.py pattern); rows outside the image are re-zeroed after every
BN+ReLU stage because a folded BN maps 0 -> relu(shift) != 0.

Carries a custom VJP that recomputes via the XLA reference composition so
autodiff through an inference-mode model works; training uses the module
path directly.
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

_SCALE = 4  # reference res2net50_v1b_26w_4s: scale=4 everywhere


def _conv3x3(v, wd, wpos, w_cols, m):
    """One 3x3 dense conv on flattened (H*W) rows.

    v: (m, GP) bf16 input rows, lane-aligned group (padded lanes zero);
    wd: (3, 3*GP, GP) per-H-tap stacked [left; center; right] kernels;
    wpos: (m, 1) column index.  Returns f32 (m, GP) pre-BN conv output
    with zero-pad semantics (wrapped W-shifts and H-rolls masked).
    """
    # Mosaic rotate is 32-bit only: roll in f32, cast back for the MXU
    vf = v.astype(jnp.float32)
    left = jnp.where(wpos == 0, 0.0, pltpu.roll(vf, 1, axis=0)).astype(v.dtype)
    right = jnp.where(wpos == w_cols - 1, 0.0,
                      pltpu.roll(vf, m - 1, axis=0)).astype(v.dtype)
    z = jnp.concatenate([left, v, right], axis=-1)
    acc = jnp.dot(z, wd[1], preferred_element_type=jnp.float32)
    top = pltpu.roll(jnp.dot(z, wd[0], preferred_element_type=jnp.float32),
                     w_cols, axis=0)
    bot = pltpu.roll(jnp.dot(z, wd[2], preferred_element_type=jnp.float32),
                     m - w_cols, axis=0)
    rows = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    acc = acc + jnp.where(rows < w_cols, 0.0, top)
    acc = acc + jnp.where(rows >= m - w_cols, 0.0, bot)
    return acc


def _body(xh, invalid, p, gp, w_cols, out_lo, out_hi, o_ref):
    """Shared block body, 128-lane-aligned split groups.

    xh: (R, W, Cin) bf16; invalid: (R*W,1) bool rows outside the image
    (halo tiles) or None; gp: lane-aligned group stride (width padded to a
    multiple of 128 — unaligned slices/concats scalarize on the VPU, a
    measured 10-50x slowdown); out rows [out_lo, out_hi).
    """
    r, wc, cin = xh.shape
    m = r * wc
    dt = xh.dtype
    xf = xh.reshape(m, cin)

    u = jnp.dot(xf, p["w1"], preferred_element_type=jnp.float32)
    u = jnp.maximum(u * p["s1"] + p["t1"], 0.0)
    if invalid is not None:
        u = jnp.where(invalid, 0.0, u)
    u = u.astype(dt)

    wpos = lax.broadcasted_iota(jnp.int32, (m, 1), 0) % wc

    sps = []
    sp = None
    for i in range(_SCALE - 1):
        vin = u[:, i * gp:(i + 1) * gp]
        if i > 0:
            vin = (vin + sp).astype(dt)
        acc = _conv3x3(vin, p["wd"][i], wpos, w_cols, m)
        sp = jnp.maximum(acc * p["sd"][i] + p["td"][i], 0.0)
        if invalid is not None:
            sp = jnp.where(invalid, 0.0, sp)
        sp = sp.astype(dt)
        sps.append(sp)
    sps.append(u[:, 3 * gp:4 * gp])

    lo, hi = out_lo * w_cols, out_hi * w_cols
    psum = None
    for g in range(_SCALE):
        part = jnp.dot(sps[g][lo:hi], p["w3"][g],
                       preferred_element_type=jnp.float32)
        psum = part if psum is None else psum + part
    res = xf[lo:hi].astype(jnp.float32)
    out = jnp.maximum(psum * p["s3"] + p["t3"] + res, 0.0)
    o_ref[0] = out.reshape(out_hi - out_lo, wc, -1).astype(o_ref.dtype)


def _kernel_full(x_ref, w1, s1, t1, wd, sd, td, w3, s3, t3, o_ref, *,
                 gp: int):
    xh = x_ref[0]
    p = dict(w1=w1[...], s1=s1[...], t1=t1[...],
             wd=wd[...], sd=sd[...], td=td[...],
             w3=w3[...], s3=s3[...], t3=t3[...])
    _body(xh, None, p, gp, xh.shape[1], 0, xh.shape[0], o_ref)


def _kernel_halo(xp_ref, xc_ref, xn_ref, w1, s1, t1, wd, sd, td, w3, s3, t3,
                 o_ref, *, gp: int, halo: int):
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    xc = xc_ref[0]
    ht, wc, _ = xc.shape
    xh = jnp.concatenate(
        [xp_ref[0, ht - halo:], xc, xn_ref[0, :halo]], axis=0)
    r = ht + 2 * halo
    rows = lax.broadcasted_iota(jnp.int32, (r * wc, 1), 0)
    invalid = (((rows < halo * wc) & (i == 0))
               | ((rows >= (r - halo) * wc) & (i == nh - 1)))
    p = dict(w1=w1[...], s1=s1[...], t1=t1[...],
             wd=wd[...], sd=sd[...], td=td[...],
             w3=w3[...], s3=s3[...], t3=t3[...])
    _body(xh, invalid, p, gp, wc, halo, halo + ht, o_ref)


def reference_bottle2neck(x, w1, s1, t1, wd, sd, td, w3, s3, t3):
    """Plain-XLA composition (fallback + VJP recompute path)."""
    dt = x.dtype
    width = wd.shape[-1]

    def bnr(v, s, t):
        return jnp.maximum(v.astype(jnp.float32) * s + t, 0.0).astype(dt)

    u = bnr(jnp.dot(x, w1.astype(dt)), s1, t1)
    sps = []
    sp = None
    for i in range(_SCALE - 1):
        vin = u[..., i * width:(i + 1) * width]
        if i > 0:
            vin = vin + sp
        # wd[i][di] is (3*width, width) = concat over dj of HWIO k[di, dj]
        k = wd[i].reshape(3, 3, width, width)  # (di, dj, in, out) == HWIO
        conv = lax.conv_general_dilated(
            vin.astype(dt), k.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        sp = bnr(conv, sd[i], td[i])
        sps.append(sp)
    sps.append(u[..., 3 * width:])
    cat = jnp.concatenate(sps, axis=-1)
    w3f = w3.reshape(4 * width, -1)
    proj = jnp.dot(cat, w3f.astype(dt)).astype(jnp.float32)
    out = jnp.maximum(proj * s3 + t3 + x.astype(jnp.float32), 0.0)
    return out.astype(dt)


def _pick_ht(h: int, w: int, cin: int) -> int | None:
    """Full image if the working set is small; else a halo-tiled row count."""
    # rough f32-equivalent working set of the full-image body
    m = h * w
    width128 = 128  # lane-padded narrow buffers
    work = m * (cin * 2 + 4 * width128 * 2 + 3 * width128 * 2
                + 2 * width128 * 4 + cin * 4 + cin * 2)
    if work <= 10 * 1024 * 1024:
        return h
    for ht in (11, 8, 4, 2):  # ht=22 at layer-1 widths exceeds 16M VMEM
        if h % ht == 0:
            return ht
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_bottle2neck(x, w1, s1, t1, wd, sd, td, w3, s3, t3):
    """Whole 'normal' Bottle2neck in one fused pass (inference, folded BN).

    x: (N, H, W, Cin); w1: (Cin, 4*width); wd: (3, 3, 3*width, width)
    [conv_i, H-tap di, stacked W-taps, out]; w3: (4, width, Cout);
    s*/t*: folded BN scale/shift (f32).  Falls back to the XLA composition
    off-TPU or for untileable shapes.
    """
    return _impl(x, w1, s1, t1, wd, sd, td, w3, s3, t3)


import os

_GP_MODE = os.environ.get("RES2_GP", "128")  # '128' | 'natural' (experiment)


def _align_params(w1, s1, t1, wd, sd, td, w3, s3, t3, dt):
    """Pad every split group to a 128-lane-aligned stride (zeros)."""
    width = wd.shape[-1]
    if _GP_MODE == "natural":
        gp = width
    else:
        gp = -(-width // 128) * 128
    pw = gp - width
    # w1: (cin, 4*width) -> (cin, 4*gp), group g at [g*gp, g*gp+width)
    w1g = w1.reshape(w1.shape[0], 4, width)
    w1a = jnp.pad(w1g, ((0, 0), (0, 0), (0, pw))).reshape(w1.shape[0], 4 * gp)
    pad1 = lambda v: jnp.pad(v.reshape(4, width), ((0, 0), (0, pw))).reshape(-1)
    # wd: (3, 3, 3*width, width) [conv, di, dj-stacked, out]
    wdg = wd.reshape(3, 3, 3, width, width)
    wda = jnp.pad(wdg, ((0, 0),) * 3 + ((0, pw), (0, pw)))
    wda = wda.reshape(3, 3, 3 * gp, gp)
    padd = lambda v: jnp.pad(v, ((0, 0), (0, pw)))
    w3a = jnp.pad(w3, ((0, 0), (0, pw), (0, 0)))
    return (gp, w1a.astype(dt), pad1(s1), pad1(t1), wda.astype(dt),
            padd(sd), padd(td), w3a.astype(dt), s3, t3)


def _impl(x, w1, s1, t1, wd, sd, td, w3, s3, t3):
    from pranet2_tpu.ops._pallas import interpret_mode, use_kernel

    n, h, w, cin = x.shape
    ht = _pick_ht(h, w, cin) if _HAS_PLTPU else None
    if ht is None or not use_kernel(_HAS_PLTPU):
        return reference_bottle2neck(x, w1, s1, t1, wd, sd, td, w3, s3, t3)
    dt = x.dtype
    cout = w3.shape[-1]
    gp, *params = _align_params(w1, s1, t1, wd, sd, td, w3, s3, t3, dt)
    wspec = lambda a: pl.BlockSpec(a.shape, lambda *ij: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    pspecs = [wspec(a) for a in params]
    if ht == h:
        return pl.pallas_call(
            functools.partial(_kernel_full, gp=gp),
            out_shape=jax.ShapeDtypeStruct((n, h, w, cout), dt),
            interpret=interpret_mode(),
            grid=(n,),
            in_specs=[pl.BlockSpec((1, h, w, cin), lambda ni: (ni, 0, 0, 0),
                                   memory_space=pltpu.VMEM)] + pspecs,
            out_specs=pl.BlockSpec((1, h, w, cout), lambda ni: (ni, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x, *params)
    halo = 3
    nh = h // ht
    xspec = lambda im: pl.BlockSpec((1, ht, w, cin), im,
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_halo, gp=gp, halo=halo),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), dt),
        interpret=interpret_mode(),
        grid=(n, nh),
        in_specs=[
            xspec(lambda ni, hi: (ni, jnp.maximum(hi - 1, 0), 0, 0)),
            xspec(lambda ni, hi: (ni, hi, 0, 0)),
            xspec(lambda ni, hi: (ni, jnp.minimum(hi + 1, nh - 1), 0, 0)),
        ] + pspecs,
        out_specs=pl.BlockSpec((1, ht, w, cout),
                               lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, x, x, *params)


def _vjp_fwd(x, w1, s1, t1, wd, sd, td, w3, s3, t3):
    out = _impl(x, w1, s1, t1, wd, sd, td, w3, s3, t3)
    return out, (x, w1, s1, t1, wd, sd, td, w3, s3, t3)


def _vjp_bwd(res, g):
    _, vjp = jax.vjp(reference_bottle2neck, *res)
    return vjp(g)


fused_bottle2neck.defvjp(_vjp_fwd, _vjp_bwd)


def fold_bn(scale, bias, mean, var, eps=1e-5):
    """Inference BatchNorm -> per-channel (scale, shift) in f32."""
    s = scale * lax.rsqrt(var + eps)
    return s, bias - mean * s
