"""Pallas 4x4 space-to-depth input pack — one-pass fold of the cast +
two XLA layout copies that feed the s2d stems.

Both space-to-depth input restructures (``ops/stem._scatter_w1_packed``
for the Res2Net deep stem and ``ops/patch_embed.s2d_patch_embed`` for the
PVT stage-1 embed) consume the raw image packed 4x4:
``(N, H, W, C) -> (N, H/4, W/4, 16*C)``, flat channel ``(a*4+b)*C + c``
for pixel ``(4i+a, 4j+b)``.  Composed from XLA ops (``patch_embed.pack4``:
cast + reshape + transpose) the pack materializes as a 2-3 copy chain —
0.29 ms/iter at 352^2 bs16 on v5e (round-4b profile: copy.64/65/66), i.e.
~124 GB/s for what is one 24 MB read + one 12 MB write (~0.05 ms at HBM
speed).  A strided-slice rewrite measured far worse still (1,838 -> 1,336
img/s — 16 strided reads of the raw image defeat the tiled loader).

This kernel does the whole pack in one pass over the image: each grid
step reads ``4*ht`` contiguous input rows (viewed as (4*ht, W*C) — the
(W, C) minor-dim merge is layout-free), permutes them in VMEM, and
writes ``ht`` packed output rows at the target dtype.  The row->channel
move is a register relayout for Mosaic, not an HBM round-trip.

Semantics are exactly ``patch_embed.pack4`` (same element set, same cast,
no arithmetic), so parity is bit-exact; tests/test_pack.py pins it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu importable only where Pallas TPU lowering exists
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

from pranet2_tpu.ops._pallas import interpret_mode, use_kernel


def _pack_kernel(x_ref, o_ref):
    x2 = x_ref[0]                                  # (4*ht, W*C) input rows
    ht, wq, cq = o_ref.shape[1:]                   # (ht, W/4, 16*C)
    c = cq // 16
    x3 = x2.reshape(ht, 4, wq, 4 * c)              # [i, a, j, (b, c)]
    x4 = x3.transpose(0, 2, 1, 3)                  # [i, j, a, (b, c)]
    o_ref[0] = x4.reshape(ht, wq, cq).astype(o_ref.dtype)


def _pick_ht(hq: int) -> int:
    for ht in (8, 11, 4, 2, 1):
        if hq % ht == 0:
            return ht
    return 1


@functools.partial(jax.jit, static_argnames=("dt",))
def _pack4_pallas(x, dt):
    n, h, w, c = x.shape
    hq, wq = h // 4, w // 4
    ht = _pick_ht(hq)
    xr = x.reshape(n, h, w * c)                    # minor-dim merge: free
    return pl.pallas_call(
        _pack_kernel,
        grid=(n, hq // ht),
        in_specs=[pl.BlockSpec((1, 4 * ht, w * c),
                               lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, ht, wq, 16 * c),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hq, wq, 16 * c), dt),
        interpret=interpret_mode(),
    )(xr)


def pack4(x, dt):
    """(N, H, W, C) -> (N, H/4, W/4, 16*C), channel (a*4+b)*C + c, cast to
    ``dt`` in the same pass.  Pallas one-pass kernel on TPU; the XLA
    reshape/transpose composition elsewhere."""
    n, h, w, c = x.shape
    if h % 4 or w % 4:
        raise ValueError(f"pack4 needs H, W % 4 == 0, got {(h, w)}")
    if use_kernel(_HAS_PLTPU):
        return _pack4_pallas(x, dt)
    z = x.astype(dt).reshape(n, h // 4, 4, w // 4, 4, c)
    return z.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 4, w // 4, 16 * c)
