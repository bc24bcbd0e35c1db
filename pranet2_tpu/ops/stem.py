"""Space-to-depth restructure of the Res2Net-v1b deep stem (pure XLA).

The stem (``binary_seg/lib/Res2Net_v1b.py:101-112``: conv3x3/2 3->32, BN,
ReLU, conv3x3 32->32, BN, ReLU, conv3x3 32->64, BN, ReLU, maxpool3x3/2) is
~1.65 ms/iter of a 9 ms PraNet-V2 forward at 352^2 bs16 — not for FLOPs
(29 GFLOP) but because every intermediate is a 32/64-channel map whose
minor dim is lane-padded to 128 in HBM: (16,176,176,32) occupies 127 MB
instead of 32 MB, and each conv pays the padded bytes both ways.

The fix needs no Pallas: re-express the stem on the 2x2 space-to-depth
grid, where every tensor has 128/256 dense channels and zero padding waste:

* conv1 + s2d      == one (5,5,3,128)  stride-4 conv (weights scattered)
* s2d conv2 s2d^-1 == one (3,3,128,128) conv with block-structured weights
* s2d conv3 s2d^-1 == one (3,3,128,256) conv
* maxpool 3x3/2    == elementwise max of 9 shifted channel-slices of the
                      packed conv3 output (one XLA fusion)

Packed channel q = (a*2+b)*C + c holds pixel (2i+a, 2j+b) channel c.  The
restructure is exact in real arithmetic (same multiply-add sets per output;
only the reduction order inside each conv changes, i.e. float rounding at
the compute dtype).  The scattered weights cost ~4x the stem's FLOPs —
irrelevant for a memory-bound stage — and are rebuilt per call from the
canonical parameters (a handful of dynamic-update-slices on 3x3 kernels).

Inference-only: BN is folded from running stats by the caller (training
needs batch stats of the unpacked intermediates; the module path serves it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu importable only where Pallas TPU lowering exists
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _scatter_w1(k1):
    """(3,3,Cin,32) conv1 kernel -> (5,5,Cin,128) packed stride-4 kernel."""
    cin, co = k1.shape[2], k1.shape[3]
    w = jnp.zeros((5, 5, cin, 4 * co), k1.dtype)
    for a in range(2):
        for b in range(2):
            for di in range(3):
                for dj in range(3):
                    q = (a * 2 + b) * co
                    w = w.at[2 * a + di, 2 * b + dj, :, q:q + co].set(
                        k1[di, dj])
    return w


def _scatter_w1_packed(k1):
    """conv1 kernel -> (2,2,16*Cin,128) kernel over the 4x4-packed INPUT.

    Composition of two exact restructures: ``_scatter_w1`` turns
    conv1(3x3/2)+s2d into a (5,5,Cin,128) stride-4 conv (pad ((1,0),(1,0)),
    taps di in [-1,3]); consuming ``patch_embed.pack4``-packed input then
    re-scatters those taps onto the flat quad-major channels, the same move
    as the PVT stage-1 embed (``ops/patch_embed._scatter_embed_w``).  The
    win is the conv emitter: Cin=3 forces XLA's batch-in-sublanes emitter
    plus a raw-input relayout copy (0.27 ms/iter at 352^2 bs16); the packed
    form is a dense stride-1 conv over 48 input channels."""
    w5 = _scatter_w1(k1)
    cin, dout = w5.shape[2], w5.shape[3]
    w = jnp.zeros((2, 2, 16 * cin, dout), w5.dtype)
    for qi in range(2):
        for a in range(4):
            di = 4 * (qi - 1) + a
            if not -1 <= di <= 3:
                continue
            for qj in range(2):
                for b in range(4):
                    dj = 4 * (qj - 1) + b
                    if not -1 <= dj <= 3:
                        continue
                    q = (a * 4 + b) * cin
                    w = w.at[qi, qj, q:q + cin, :].set(w5[di + 1, dj + 1])
    return w


def _scatter_w(k):
    """(3,3,C,Co) stride-1 kernel -> (3,3,4C,4Co) packed-grid kernel."""
    c, co = k.shape[2], k.shape[3]
    w = jnp.zeros((3, 3, 4 * c, 4 * co), k.dtype)
    for a in range(2):
        for b in range(2):
            for di in range(3):
                for dj in range(3):
                    ri, rj = a + di - 1, b + dj - 1
                    qi, ai = ri // 2, ri % 2
                    qj, bj = rj // 2, rj % 2
                    w = w.at[qi + 1, qj + 1,
                             (ai * 2 + bj) * c:(ai * 2 + bj) * c + c,
                             (a * 2 + b) * co:(a * 2 + b) * co + co].set(
                        k[di, dj])
    return w


def _maxpool_kernel(zp_ref, zc_ref, o_ref, *, co: int):
    """One-pass packed-grid maxpool 3x3/2 (pad 1, -inf identity).

    The XLA composition of the same 9-shifted-slice max materializes the
    quad channel-slices and re-reads the (N, H/4, W/4, 4*co) conv3 output
    across two fusions — 0.48 ms/iter at 352^2 bs16 (round-4b profile:
    fusion.1368 + fusion.16).  Here each grid step reads its row-tile once
    plus a one-row halo block (the last row of the previous tile) and
    takes the 9 maxes in VMEM."""
    i = pl.program_id(1)
    zc = zc_ref[0]                                    # (ht, W, 4*co)
    ht, w = zc.shape[0], zc.shape[1]
    neg = jnp.float32(-jnp.inf)
    top = jnp.where(i == 0, jnp.full_like(zc[:1], -jnp.inf), zp_ref[0])
    # f32 in VMEM: Mosaic's sublane rotate is 32-bit (same move as
    # pvt_mlp's rolls); the maxpool's VPU work is trivial either way
    zh = jnp.concatenate([top, zc], axis=0).astype(jnp.float32)
    # quad planes sliced once; rows/cols then cost only cheap re-slices
    planes = {q: zh[..., q * co:(q + 1) * co] for q in range(4)}
    rows = lax.broadcasted_iota(jnp.int32, (ht * w, 1), 0)
    at_w0 = rows - (rows // w) * w == 0               # wpos == 0
    taps = ((1, 1), (0, 0), (0, 1))                   # (shift, quad parity)
    out = None
    for dr, a in taps:
        for dc, b in taps:
            v = planes[a * 2 + b][1 - dr:ht + 1 - dr].reshape(ht * w, co)
            if dc:
                # left neighbor == previous flat row; the wrap rows are
                # exactly the -inf pad positions (wpos == 0)
                v = jnp.where(at_w0, neg, pltpu.roll(v, 1, axis=0))
            out = v if out is None else jnp.maximum(out, v)
    o_ref[0] = out.reshape(ht, w, co).astype(o_ref.dtype)


def _maxpool_s2d_pallas(z, co: int):
    import functools

    n, hq, wq, c4 = z.shape
    ht = 8
    return pl.pallas_call(
        functools.partial(_maxpool_kernel, co=co),
        grid=(n, hq // ht),
        in_specs=[
            # one-row halo: only the previous tile's LAST row (row ht*j-1,
            # clamped at the top edge where the kernel masks it to -inf) —
            # not a whole extra (ht, wq, c4) block, so each input row is
            # read from HBM ~once, not twice (ADVICE r4)
            pl.BlockSpec((1, 1, wq, c4),
                         lambda i, j: (i, jnp.maximum(ht * j - 1, 0), 0, 0)),
            pl.BlockSpec((1, ht, wq, c4), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ht, wq, co), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hq, wq, co), z.dtype),
        interpret=_interpret(),
    )(z, z)


def _interpret() -> bool:
    from pranet2_tpu.ops._pallas import interpret_mode

    return interpret_mode()


def _shifted(z, dr, dc):
    """Shift a (N,H,W,C) map by (dr,dc) with -inf fill (maxpool identity)."""
    if dr == 0 and dc == 0:
        return z
    neg = jnp.array(-jnp.inf, z.dtype)
    pads = [(0, 0), (max(dr, 0), max(-dr, 0)), (max(dc, 0), max(-dc, 0)),
            (0, 0)]
    zp = jnp.pad(z, pads, constant_values=neg)
    h, w = z.shape[1], z.shape[2]
    return zp[:, max(-dr, 0):max(-dr, 0) + h, max(-dc, 0):max(-dc, 0) + w]


def s2d_stem(x, k1, s1, t1, k2, s2, t2, k3, s3, t3, packed_out=False):
    """The full v1b deep stem on the space-to-depth grid.

    x: (N, H, W, Cin); k*: the canonical HWIO 3x3 kernels; s*/t*: folded
    inference-BN scale/shift for each stage (widths 32/32/64).  Returns the
    (N, H/4, W/4, 64) post-maxpool feature map — or, with ``packed_out``,
    its exact 2x2 space-to-depth packing (N, H/8, W/8, 256) in the
    quad-major layout ``res2_packed.pack2`` produces, computed directly
    from the stem's own packed grid (strided shifted maxes) so the packed
    layer-1 path starts with ZERO relayout at the stem boundary.
    """
    dt = x.dtype

    def conv(v, w, stride, pad):
        return lax.conv_general_dilated(
            v, w.astype(dt), (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    tile4 = lambda v: jnp.tile(v, 4)

    def bnrelu(v, s, t):
        # Affine at the compute dtype: the round-3 f32 form made XLA
        # materialize an f32[16,88,88,128] intermediate (0.30 ms/iter at
        # 352^2 bs16) — twice the compute dtype's bytes — and even with an
        # explicit in-expression downcast XLA kept the f32 tensor.  The
        # folded scale/shift stay exact in f32 until the cast; doing the
        # per-element affine in bf16 is within the bf16 path's tolerance
        # (gated by tests/test_stem_s2d.py and the full-model fused-vs-
        # unfused parity test).
        return jnp.maximum(v * tile4(s).astype(dt) + tile4(t).astype(dt),
                           jnp.zeros((), dt))

    from pranet2_tpu.ops.patch_embed import pack4

    z = conv(pack4(x, dt), _scatter_w1_packed(k1), 1, ((1, 0), (1, 0)))
    z = bnrelu(z, s1, t1)
    z = conv(z, _scatter_w(k2), 1, ((1, 1), (1, 1)))
    z = bnrelu(z, s2, t2)
    z = conv(z, _scatter_w(k3), 1, ((1, 1), (1, 1)))
    z = bnrelu(z, s3, t3)

    co = k3.shape[3]
    if not packed_out:
        # maxpool 3x3/2 pad 1 on the packed grid: out(r,c) covers pixel rows
        # {2r-1, 2r, 2r+1} = packed (r-1,a=1), (r,a=0), (r,a=1); same cols.
        # (quad r-1 at output r == shift the map DOWN by one, dr=+1)
        from pranet2_tpu.ops._pallas import component_enabled, use_kernel

        if (use_kernel(_HAS_PLTPU) and component_enabled("s2dmax", True)
                and z.shape[1] % 8 == 0):
            return _maxpool_s2d_pallas(z, co)
        rows = ((1, 1), (0, 0), (0, 1))
        out = None
        for dr, a in rows:
            for dc, b in rows:
                q = (a * 2 + b) * co
                term = _shifted(z[..., q:q + co], dr, dc)
                out = term if out is None else jnp.maximum(out, term)
        return out

    # packed maxpool: output quad (a,b) at (r,c) is the pool output at
    # pixel (2r+a, 2c+b), covering stem-pixel rows {4r+2a-1 .. 4r+2a+1}
    # = z's packed (row 2r+d, parity a2); strided shifted maxes, -inf fill.
    taps = {0: ((-1, 1), (0, 0), (0, 1)), 1: ((0, 1), (1, 0), (1, 1))}

    def strided2(v, dr, dc):
        neg = jnp.array(-jnp.inf, v.dtype)
        vp = jnp.pad(v, [(0, 0), (1, 1), (1, 1), (0, 0)],
                     constant_values=neg)
        h, w = v.shape[1], v.shape[2]
        return vp[:, 1 + dr:1 + dr + h:2, 1 + dc:1 + dc + w:2]

    outs = []
    for a in range(2):
        for b in range(2):
            acc = None
            for dr, a2 in taps[a]:
                for dc, b2 in taps[b]:
                    q = (a2 * 2 + b2) * co
                    t = strided2(z[..., q:q + co], dr, dc)
                    acc = t if acc is None else jnp.maximum(acc, t)
            outs.append(acc)
    return jnp.concatenate(outs, axis=-1)
