"""Space-to-depth Res2Net layer-1 (pure XLA, exact restructure).

Layer 1 of res2net50_v1b (``binary_seg/lib/Res2Net_v1b.py:120-141``:
3 Bottle2necks at stride 1 on the 88x88 grid, split width 26) is the
worst lane-padding offender in PraNet-V2's forward: every split tensor
(N, 88, 88, 26) is lane-padded 26 -> 128 in HBM, so the nine 3x3 split
convs alone move ~4.9x their logical bytes (~1.1 ms/iter measured at
352^2 bs16 before this restructure).

Fix, same recipe as the stem (``ops/stem.py``): re-express the whole
layer on the 2x2 space-to-depth grid.  Packed, a split group is
(N, 44, 44, 4, 26) = 104 dense channels -> 128 lanes (1.23x pad), a 4x
traffic cut on every narrow tensor, at the cost of 4x the (negligible)
split-conv FLOPs via block-scattered kernels.  The restructure is exact
in real arithmetic:

* 1x1 convs (conv1 / conv3 / downsample) are the same dense applied to
  each quad's channel block -> one einsum over the quad axis, no extra
  FLOPs;
* stride-1 3x3 convs become 3x3 convs on the packed grid with the
  stem's block-scattered kernels (``stem._scatter_w``);
* the stage block's stride-1 3x3 avg pool (``Res2Net_v1b.py:87-89``,
  torch ``AvgPool2d(3, 1, 1)``, count_include_pad=True) is a 9-tap
  zero-fill shifted mean over quad slices;
* BN (eval, folded from running stats) and ReLU are per-channel /
  elementwise and broadcast over the quad axis unchanged.

Pack once after the stem, run all three blocks packed, unpack once into
layer 2 — the (88, 88, 64)-in / (88, 88, 256)-out boundary relayouts
cost ~0.2 ms against ~0.8-0.9 ms saved inside the layer.  Layers 2-4
stay on the module path: their widths (52/104/208) already pad 1.23-2.5x
and the boundary relayouts at 512+ channels eat the smaller savings.

Inference-only: BN folding needs running stats; training uses the module
path (the caller gates on ``train``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from pranet2_tpu.ops.stem import _scatter_w

_SCALE = 4


def pack2(x):
    """(N, H, W, C) -> (N, H/2, W/2, 4, C); quad index q = a*2 + b holds
    pixel (2i+a, 2j+b) — the same quad-major layout as the stem."""
    n, h, w, c = x.shape
    z = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return z.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4, c)


def unpack2(z):
    """(N, hh, ww, 4, C) -> (N, 2*hh, 2*ww, C)."""
    n, hh, ww, _, c = z.shape
    z = z.reshape(n, hh, ww, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(n, 2 * hh, 2 * ww, c)


def dense_q(z, w, dt):
    """1x1 conv on the packed grid: same (C, Co) dense per quad block."""
    return jnp.einsum("nhwqc,cd->nhwqd", z.astype(dt), w.astype(dt))


def conv3x3_q(z, k, dt):
    """Stride-1 zero-pad 3x3 conv on the packed grid.

    z: (N, hh, ww, 4, C); k: the canonical (3, 3, C, Co) HWIO kernel.
    Returns (N, hh, ww, 4, Co).
    """
    n, hh, ww, _, c = z.shape
    zf = z.reshape(n, hh, ww, 4 * c)
    out = lax.conv_general_dilated(
        zf.astype(dt), _scatter_w(k).astype(dt), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(n, hh, ww, 4, -1)


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
    (quad, packed-shift) pair — over 9 taps, zeros outside the image."""
    n, hh, ww, _, c = z.shape
    quads = [z[:, :, :, q] for q in range(4)]  # (a*2+b)

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
            outs.append(acc / 9.0)
    return jnp.stack(outs, axis=3).astype(z.dtype)


def bottle2neck_q(xp, p, dt, stype: str = "normal"):
    """One stride-1 Bottle2neck on the packed grid (eval, folded BN).

    xp: (N, hh, ww, 4, Cin).  p: dict with ``w1`` (Cin, 4w), ``f1``
    (scale, shift), ``kd`` list of (3, 3, w, w), ``fd`` list, ``w3``
    (4w, Cout), ``f3``, and optionally ``wdown``/``fdown`` for the
    stage block's 1x1 downsample.  Mirrors the module path at
    ``models/backbones/res2net.py:111-152``.
    """
    def bnr(v, f):
        s, t = f
        return jnp.maximum(v.astype(jnp.float32) * s + t, 0.0).astype(dt)

    u = bnr(dense_q(xp, p["w1"], dt), p["f1"])
    width = u.shape[-1] // _SCALE
    groups = [u[..., g * width:(g + 1) * width] for g in range(_SCALE)]
    parts = []
    sp = None
    for i in range(_SCALE - 1):
        v = groups[i] if (i == 0 or stype == "stage") else groups[i] + sp
        sp = bnr(conv3x3_q(v, p["kd"][i], dt), p["fd"][i])
        parts.append(sp)
    if stype == "normal":
        parts.append(groups[-1])
    else:
        parts.append(avgpool3x3_s1_q(groups[-1]))
    cat = jnp.concatenate(parts, axis=-1)
    out = dense_q(cat, p["w3"], dt).astype(jnp.float32)
    s3, t3 = p["f3"]
    out = out * s3 + t3
    if "wdown" in p:
        sd, td = p["fdown"]
        short = dense_q(xp, p["wdown"], dt).astype(jnp.float32) * sd + td
    else:
        short = xp.astype(jnp.float32)
    return jnp.maximum(out + short, 0.0).astype(dt)
