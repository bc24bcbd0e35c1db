"""Space-to-depth Res2Net layer-1 (pure XLA, exact restructure) — v2, flat
lane-dense layout.

Layer 1 of res2net50_v1b (``binary_seg/lib/Res2Net_v1b.py:120-141``:
3 Bottle2necks at stride 1 on the 88x88 grid, split width 26) is the
worst lane-padding offender in PraNet-V2's forward: every split tensor
(N, 88, 88, 26) is lane-padded 26 -> 128 in HBM, so the nine 3x3 split
convs alone move ~4.9x their logical bytes (~1.1 ms/iter measured at
352^2 bs16, round-4 trace).

Fix, same recipe as the stem (``ops/stem.py``): re-express the whole
layer on the 2x2 space-to-depth grid.  The round-3 version of this file
kept the packed tensors 5-D with the 26-wide split as the MINOR dim —
so every elementwise/BN/slice op was still 4.9x lane-padded and the
"packed" path measured a regression (1,802 -> 1,436 img/s).  v2 keeps
every tensor FLAT with dense lanes:

* packed maps: (N, hh, ww, 4*C), flat channel = q*C + c (quad-major,
  the ``stem._scatter_w`` convention), q = a*2 + b for pixel (2i+a,2j+b);
* the split hidden u: (N, hh, ww, scale*4*w) with flat = g*4w + q*w + c
  (group-major blocks, quad-major within) — each group is a contiguous
  4w = 104-channel slice (1.23x pad, not 4.9x) that feeds its scattered
  3x3 conv directly;
* 1x1 convs (conv1 / conv3 / downsample) become single flat matmuls
  against block-sparse packed weights (built once per call from the
  canonical parameters).  The zero blocks waste ~4x the 1x1 FLOPs —
  irrelevant at 23% MFU; the narrow-tensor HBM traffic was the binding
  constraint;
* BN (eval, folded running stats) and ReLU broadcast over quads via
  tiled scale/shift vectors — dense, fused elementwise;
* the stage block's stride-1 3x3 avg pool (``Res2Net_v1b.py:87-89``,
  torch ``AvgPool2d(3, 1, 1)``, count_include_pad=True) is a 9-tap
  zero-fill shifted mean over per-quad slices.

The restructure is exact in real arithmetic — same multiply-add sets
per output, only each conv's in-kernel reduction order changes (float
rounding at the compute dtype).  Pack once after the stem, run all
three blocks packed, unpack once into layer 2.

Measured (round 4, v5e, PraNet-V2 352^2 bs16): still a net LOSS —
1,827 img/s without vs 1,666 with.  The op profile shows why: the
pack/unpack boundary relayouts cost ~0.6 ms/iter (XLA materializes the
(16,44,44,2,2,256) transposes) and the packed residual/BN fusions at
1024 flat channels give back part of the split-conv savings.  Kept
opt-in (PRANET2_FUSED=l1pack) as the honest record; making it win
requires the stem to emit packed directly and layer-2 to consume packed
(killing both boundaries), which is out of proportion to the remaining
~0.3 ms upside.

Inference-only: BN folding needs running stats; training uses the module
path (the caller gates on ``train``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from pranet2_tpu.ops.stem import _scatter_w

_SCALE = 4


def pack2(x):
    """(N, H, W, C) -> flat (N, H/2, W/2, 4*C); packed channel q*C + c
    (quad q = a*2 + b holds pixel (2i+a, 2j+b)) — quad-major, dense lanes."""
    n, h, w, c = x.shape
    z = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return z.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def unpack2(z):
    """flat (N, hh, ww, 4*C) -> (N, 2*hh, 2*ww, C)."""
    n, hh, ww, c4 = z.shape
    z = z.reshape(n, hh, ww, 2, 2, c4 // 4).transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(n, 2 * hh, 2 * ww, c4 // 4)


def conv3x3_q(z, k, dt):
    """Stride-1 zero-pad 3x3 conv on the packed grid.

    z: flat (N, hh, ww, 4*C) quad-major; k: the canonical (3, 3, C, Co)
    HWIO kernel.  Returns flat (N, hh, ww, 4*Co) quad-major.
    """
    return lax.conv_general_dilated(
        z.astype(dt), _scatter_w(k).astype(dt), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _w1_packed(w1, scale, width):
    """(Cin, scale*w) 1x1 kernel -> (4*Cin, scale*4*w) packed matmul weight:
    rows q*Cin + ci, cols g*4w + q2*w + c, nonzero iff q == q2."""
    cin = w1.shape[0]
    w1r = w1.reshape(cin, scale, width)
    eye = jnp.eye(4, dtype=w1.dtype)
    wp = jnp.einsum("qQ,igc->qigQc", eye, w1r)
    return wp.reshape(4 * cin, scale * 4 * width)


def _w3_packed(w3, scale, width):
    """(scale*w, Cout) 1x1 kernel -> (scale*4*w, 4*Cout): rows g*4w + Q*w + c,
    cols q*Cout + co, nonzero iff Q == q."""
    cout = w3.shape[1]
    w3r = w3.reshape(scale, width, cout)
    eye = jnp.eye(4, dtype=w3.dtype)
    wp = jnp.einsum("Qq,gci->gQcqi", eye, w3r)
    return wp.reshape(scale * 4 * width, 4 * cout)


def _wd_packed(wd):
    """(Cin, Cout) 1x1 kernel -> (4*Cin, 4*Cout) block-diagonal per quad."""
    cin, cout = wd.shape
    eye = jnp.eye(4, dtype=wd.dtype)
    return jnp.einsum("qQ,ic->qiQc", eye, wd).reshape(4 * cin, 4 * cout)


def _tile_groups(v, scale, width):
    """Logical per-channel vector (scale*w,) -> packed group-major layout
    g*4w + q*w + c (each group's w values repeated over the 4 quads)."""
    return jnp.broadcast_to(
        v.reshape(scale, 1, width), (scale, 4, width)).reshape(-1)


def _shift0(x, dr, dc):
    """Zero-fill shift of a (N, hh, ww, C) map by (dr, dc)."""
    if dr == 0 and dc == 0:
        return x
    pads = [(0, 0), (max(dr, 0), max(-dr, 0)), (max(dc, 0), max(-dc, 0)),
            (0, 0)]
    zp = jnp.pad(x, pads)
    h, w = x.shape[1], x.shape[2]
    return zp[:, max(-dr, 0):max(-dr, 0) + h, max(-dc, 0):max(-dc, 0) + w]


def avgpool3x3_s1_q(z):
    """torch ``AvgPool2d(3, 1, 1)`` (count_include_pad=True) on the packed
    grid: pixel (2r+a, 2c+b) averages rows {2r+a-1, 2r+a, 2r+a+1} — each a
    (quad, packed-shift) pair — over 9 taps, zeros outside the image.

    z: flat (N, hh, ww, 4*C) quad-major; returns the same layout.
    """
    n, hh, ww, c4 = z.shape
    c = c4 // 4
    quads = [z[..., q * c:(q + 1) * c] for q in range(4)]

    def taps(a):
        # pixel row 2r+a+da -> (quad a2, packed row shift)
        out = []
        for da in (-1, 0, 1):
            ra = a + da
            out.append((ra % 2, (ra - ra % 2) // 2))
        return out

    outs = []
    for a in range(2):
        for b in range(2):
            acc = jnp.zeros((n, hh, ww, c), jnp.float32)
            for a2, dr in taps(a):
                for b2, dc in taps(b):
                    src = quads[a2 * 2 + b2].astype(jnp.float32)
                    # shift the packed map so source row r+dr lands at r
                    acc = acc + _shift0(src, -dr, -dc)
            outs.append((acc / 9.0).astype(z.dtype))
    return jnp.concatenate(outs, axis=-1)


def _scatter_w_s2(k):
    """(3,3,C,Co) stride-2 pad-1 kernel -> (2,2,4C,Co) kernel consuming the
    PACKED grid directly (conv padding ((1,0),(1,0))) and emitting the
    UNPACKED 1/2-resolution output — the packed->unpacked stage transition
    without any relayout.  Output (i,j) tap di reads pixel 2i+di-1 = packed
    (row i+qi-1, parity a2) with (qi, a2, di) in {(0,1,0),(1,0,1),(1,1,2)}."""
    c, co = k.shape[2], k.shape[3]
    w = jnp.zeros((2, 2, 4 * c, co), k.dtype)
    m = ((0, 1, 0), (1, 0, 1), (1, 1, 2))
    for qi, al, di in m:
        for qj, be, dj in m:
            q = (al * 2 + be) * c
            w = w.at[qi, qj, q:q + c, :].set(k[di, dj])
    return w


def conv3x3_s2_from_packed(zp, k, dt):
    """Stride-2 3x3 conv reading a packed (N,hh,ww,4C) map, emitting the
    plain (N,hh,ww,Co) half-resolution output."""
    return lax.conv_general_dilated(
        zp.astype(dt), _scatter_w_s2(k).astype(dt), (1, 1),
        ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def avgpool3x3_s2_from_packed(zp):
    """torch ``AvgPool2d(3, 2, 1)`` (count_include_pad=True) reading a
    packed (N,hh,ww,4C) map, emitting plain (N,hh,ww,C): the same tap
    structure as ``_scatter_w_s2`` as shifted quad means, zeros outside."""
    n, hh, ww, c4 = zp.shape
    c = c4 // 4
    m = ((0, 1, 0), (1, 0, 1), (1, 1, 2))
    acc = jnp.zeros((n, hh, ww, c), jnp.float32)
    for qi, al, _ in m:
        for qj, be, _ in m:
            src = zp[..., (al * 2 + be) * c:(al * 2 + be) * c + c]
            acc = acc + _shift0(src.astype(jnp.float32), 1 - qi, 1 - qj)
    return (acc / 9.0).astype(zp.dtype)


def quad_mean(zp):
    """2x2/2 average pool of a packed map == mean over the 4 quads.
    (torch ``AvgPool2d(2, 2, ceil_mode=True, count_include_pad=False)`` on
    an even-sized map has exactly aligned full windows.)  Returns f32."""
    c = zp.shape[-1] // 4
    return sum(zp[..., q * c:(q + 1) * c].astype(jnp.float32)
               for q in range(4)) / 4.0


def bottle2neck_stage_s2_from_packed(xp, p, dt):
    """The next stage's 'stage' block (stride 2, downsample) consuming the
    PACKED previous stage directly — the exit boundary of the packed
    layer-1 path.  The stride-2 split convs read the packed grid with
    scattered (2,2,4w,w) kernels and emit plain half-resolution maps, the
    3x3/2 stage pool becomes shifted quad means and the 2x2/2 downsample
    pool a quad mean, so the ``unpack2`` relayout never materializes.
    Mirrors ``Bottle2neck(stype='stage', stride=2)``
    (models/backbones/res2net.py; reference
    ``binary_seg/lib/Res2Net_v1b.py:44-99``).  Eval-only (folded BN)."""
    width = p["kd"][0].shape[2]
    scale = _SCALE

    def bnr(v, s, t):
        return jnp.maximum(v.astype(jnp.float32) * s + t, 0.0).astype(dt)

    def dot(v, w):
        return jnp.einsum("nhwi,ij->nhwj", v.astype(dt), w.astype(dt))

    s1, t1 = p["f1"]
    u = bnr(dot(xp, _w1_packed(p["w1"], scale, width)),
            _tile_groups(s1, scale, width), _tile_groups(t1, scale, width))
    parts = []
    for i in range(scale - 1):
        g = u[..., i * 4 * width:(i + 1) * 4 * width]
        si, ti = p["fd"][i]
        parts.append(bnr(conv3x3_s2_from_packed(g, p["kd"][i], dt), si, ti))
    parts.append(avgpool3x3_s2_from_packed(
        u[..., (scale - 1) * 4 * width:]).astype(dt))
    cat = jnp.concatenate(parts, axis=-1)
    out = dot(cat, p["w3"]).astype(jnp.float32)
    s3, t3 = p["f3"]
    out = out * s3 + t3
    sd, td = p["fdown"]
    short = dot(quad_mean(xp).astype(dt), p["wdown"]).astype(jnp.float32)
    short = short * sd + td
    return jnp.maximum(out + short, 0.0).astype(dt)


def bottle2neck_q(xp, p, dt, stype: str = "normal"):
    """One stride-1 Bottle2neck on the packed grid (eval, folded BN).

    xp: flat (N, hh, ww, 4*Cin) quad-major.  p: dict with ``w1``
    (Cin, scale*w), ``f1`` (scale, shift), ``kd`` list of (3, 3, w, w),
    ``fd`` list, ``w3`` (scale*w, Cout), ``f3``, and optionally
    ``wdown``/``fdown`` for the stage block's 1x1 downsample.  Mirrors the
    module path at ``models/backbones/res2net.py:111-152``.
    """
    width = p["kd"][0].shape[2]
    scale = _SCALE

    def bnr(v, s, t):
        return jnp.maximum(v.astype(jnp.float32) * s + t, 0.0).astype(dt)

    def dot(v, w):
        return jnp.einsum("nhwi,ij->nhwj", v.astype(dt), w.astype(dt))

    s1, t1 = p["f1"]
    u = bnr(dot(xp, _w1_packed(p["w1"], scale, width)),
            _tile_groups(s1, scale, width), _tile_groups(t1, scale, width))
    groups = [u[..., g * 4 * width:(g + 1) * 4 * width]
              for g in range(scale)]
    parts = []
    sp = None
    for i in range(scale - 1):
        v = groups[i] if (i == 0 or stype == "stage") else groups[i] + sp
        si, ti = p["fd"][i]
        sp = bnr(conv3x3_q(v, p["kd"][i], dt),
                 jnp.tile(si, 4), jnp.tile(ti, 4))
        parts.append(sp)
    if stype == "normal":
        parts.append(groups[-1])
    else:
        parts.append(avgpool3x3_s1_q(groups[-1]))
    cat = jnp.concatenate(parts, axis=-1)           # group-major ✔
    out = dot(cat, _w3_packed(p["w3"], scale, width)).astype(jnp.float32)
    s3, t3 = p["f3"]
    out = out * jnp.tile(s3, 4) + jnp.tile(t3, 4)
    if "wdown" in p:
        sd, td = p["fdown"]
        short = dot(xp, _wd_packed(p["wdown"])).astype(jnp.float32)
        short = short * jnp.tile(sd, 4) + jnp.tile(td, 4)
    else:
        short = xp.astype(jnp.float32)
    return jnp.maximum(out + short, 0.0).astype(dt)
