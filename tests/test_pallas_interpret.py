"""In-kernel logic parity via the Pallas interpreter (no TPU needed).

Off-TPU the fused kernels fall back to their XLA reference compositions,
so ordinary CPU test runs never execute the kernel *bodies* (rolls, halo
masks, tap accumulation, lane-padded split groups).  These tests set
``PRANET2_PALLAS_INTERPRET=1`` (see ops/_pallas.py) to run the actual
kernels under the interpreter and pin them against the references.  They
complement the ``-k tpu`` compiled-kernel tests, which additionally cover
the Mosaic lowering.

Marked slow: the interpreter is orders of magnitude slower than compiled
code, so shapes here are minimal-but-representative (halo tiling is forced
by monkeypatching the row-tile picker where the natural threshold would
need huge inputs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _interpret_env(monkeypatch):
    monkeypatch.setenv("PRANET2_PALLAS_INTERPRET", "1")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


# ---------------------------------------------------------------- pvt_mlp


def _mlp_args(rng, n=1, h=6, w=8, d=32, c=64, dtype=jnp.float32):
    mk = lambda s, sc=0.2: jnp.asarray(rng.standard_normal(s) * sc,
                                       jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, h, w, d)), dtype)
    return (x, mk((d,)) + 1.0, mk((d,)), mk((d, c)), mk((c,)),
            mk((3, 3, c)), mk((c,)), mk((c, d)), mk((d,)))


@pytest.mark.parametrize("ht", [None, 2])
def test_mlp_kernel_interpret(rng, ht, monkeypatch):
    from pranet2_tpu.ops import pvt_mlp

    if ht is not None:  # force the halo-tiled grid on a small image
        monkeypatch.setattr(pvt_mlp, "_pick_ht", lambda *a: ht)
    a = _mlp_args(rng)
    got = pvt_mlp.fused_mlp_block(*a)
    want = pvt_mlp.reference_mlp_block(*a)
    # f32 in/out but the kernel accumulates dwconv taps at the compute
    # dtype and uses the polynomial erf; tolerance covers both
    assert _rel_err(got, want) < 3e-3


def test_mlp_kernel_interpret_bf16(rng, monkeypatch):
    from pranet2_tpu.ops import pvt_mlp

    monkeypatch.setattr(pvt_mlp, "_pick_ht", lambda *a: 3)
    a = _mlp_args(rng, n=2, h=6, w=4, d=32, c=128, dtype=jnp.bfloat16)
    got = pvt_mlp.fused_mlp_block(*a)
    want = pvt_mlp.reference_mlp_block(*a)
    assert _rel_err(got, want) < 0.04


@pytest.mark.parametrize("ht", [None, 2])
def test_mlp_kernel_final_ln_interpret(rng, ht, monkeypatch):
    """Stage-end LN folded into the kernel epilogue == block then LN."""
    from pranet2_tpu.ops import pvt_mlp

    if ht is not None:
        monkeypatch.setattr(pvt_mlp, "_pick_ht", lambda *a: ht)
    a = _mlp_args(rng)
    d = a[0].shape[-1]
    lnsf = jnp.asarray(rng.standard_normal((d,)) * 0.2 + 1.0, jnp.float32)
    lnbf = jnp.asarray(rng.standard_normal((d,)) * 0.2, jnp.float32)
    got = pvt_mlp.fused_mlp_block_final_ln(*a, lnsf, lnbf, 1e-6, 1e-6)
    want = pvt_mlp.reference_final_ln(
        pvt_mlp.reference_mlp_block(*a), lnsf, lnbf, 1e-6)
    assert _rel_err(got, want) < 3e-3


def test_mlp_kernel_final_ln_grads_interpret(rng, monkeypatch):
    """custom VJP of the final-LN variant vs autodiff of the reference."""
    from pranet2_tpu.ops import pvt_mlp

    monkeypatch.setattr(pvt_mlp, "_pick_ht", lambda *a: 2)
    a = _mlp_args(rng)
    d = a[0].shape[-1]
    lnsf = jnp.asarray(rng.standard_normal((d,)) * 0.2 + 1.0, jnp.float32)
    lnbf = jnp.asarray(rng.standard_normal((d,)) * 0.2, jnp.float32)

    def loss(x, lnsf, lnbf):
        return jnp.sum(jnp.sin(
            pvt_mlp.fused_mlp_block_final_ln(x, *a[1:], lnsf, lnbf,
                                             1e-6, 1e-6)))

    def loss_ref(x, lnsf, lnbf):
        return jnp.sum(jnp.sin(pvt_mlp.reference_final_ln(
            pvt_mlp.reference_mlp_block(x, *a[1:]), lnsf, lnbf, 1e-6)))

    g = jax.grad(loss, argnums=(0, 1, 2))(a[0], lnsf, lnbf)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(a[0], lnsf, lnbf)
    for gi, gri in zip(g, gr):
        assert _rel_err(gi, gri) < 5e-3


# ---------------------------------------------------------------- pvt_attn


def test_sra_attention_kernel_interpret(rng, monkeypatch):
    from pranet2_tpu.ops import pvt_attn

    monkeypatch.setattr(pvt_attn, "_pick_ht", lambda *a: 3)
    n, h, w, d, nh, tkv = 2, 6, 4, 32, 2, 6
    hd = d // nh
    mk = lambda s, sc=0.2: jnp.asarray(rng.standard_normal(s) * sc,
                                       jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, h, w, d)), jnp.float32)
    a = (x, mk((d,)) + 1.0, mk((d,)), mk((nh, d, hd)), mk((nh, hd)),
         mk((n, nh, hd, tkv)), mk((n, nh, tkv, hd)), mk((d, d)), mk((d,)))
    got = pvt_attn.fused_sra_attention(*a)
    want = pvt_attn.reference_sra_attention(*a)
    assert _rel_err(got, want) < 2e-5


def _sra_block_args(rng, n, h, w, d, nh, sr, dtype=jnp.float32):
    hd = d // nh
    mk = lambda s, sc=0.15: jnp.asarray(rng.standard_normal(s) * sc,
                                        jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, h, w, d)), dtype)
    if sr > 1:
        wsr, lks, lkb = mk((sr * sr * d, d)), mk((d,)) + 1.0, mk((d,))
    else:
        wsr = jnp.zeros((1, d), jnp.float32)
        lks, lkb = jnp.ones((d,), jnp.float32), jnp.zeros((d,), jnp.float32)
    return (x, mk((d,)) + 1.0, mk((d,)), mk((nh, d, hd)), mk((nh, hd)),
            wsr, mk((d,)), lks, lkb, mk((d, 2 * d)), mk((2 * d,)),
            mk((d, d)), mk((d,)))


# (sr, nh) covers every PVTv2-b2 stage config: stage1 (8,1), stage2 (4,2),
# stage3 (2,5), stage4 (1,8) — sr=8 exercises the tkv=1 edge and the
# widest patch regroup; nh=5 a head count that does not divide the lanes
@pytest.mark.parametrize("sr,nh", [(8, 1), (4, 2), (2, 5), (1, 8)])
def test_sra_block_kernel_interpret(rng, sr, nh):
    from pranet2_tpu.ops import pvt_attn

    n, h, w, d = 1, 8, 8, 40 if nh == 5 else 32
    a = _sra_block_args(rng, n, h, w, d, nh, sr)
    got = pvt_attn.fused_sra_block(*a, sr, nh)
    want = pvt_attn.reference_sra_block(*a, sr=sr, nh=nh)
    assert _rel_err(got, want) < 2e-5


def test_sra_block_kernel_interpret_bf16(rng):
    from pranet2_tpu.ops import pvt_attn

    a = _sra_block_args(rng, 2, 8, 4, 32, 2, 2, dtype=jnp.bfloat16)
    got = pvt_attn.fused_sra_block(*a, 2, 2)
    want = pvt_attn.reference_sra_block(*a, sr=2, nh=2)
    assert _rel_err(got, want) < 0.05


def test_sra_block_grad_routes_through_reference(rng):
    # the custom VJP must differentiate (via the XLA composition) even when
    # the forward ran the interpreted kernel
    from pranet2_tpu.ops import pvt_attn

    a = _sra_block_args(rng, 1, 4, 4, 16, 2, 2)

    def loss(x, wkv):
        args = (x,) + a[1:9] + (wkv,) + a[10:]
        return jnp.sum(pvt_attn.fused_sra_block(*args, 2, 2) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(a[0], a[9])
    rx, rw = jax.grad(
        lambda x, wkv: jnp.sum(pvt_attn.reference_sra_block(
            x, *a[1:9], wkv, *a[10:], sr=2, nh=2) ** 2),
        argnums=(0, 1))(a[0], a[9])
    assert _rel_err(gx, rx) < 1e-4 and _rel_err(gw, rw) < 1e-4


# ------------------------------------------------------------ stem s2dmax


def _s2dmax_reference(z, co):
    """XLA shifted-slice composition of the packed-grid maxpool (the
    fallback branch of ops/stem.s2d_stem)."""
    from pranet2_tpu.ops import stem

    rows = ((1, 1), (0, 0), (0, 1))
    out = None
    for dr, a in rows:
        for dc, b in rows:
            q = (a * 2 + b) * co
            term = stem._shifted(z[..., q:q + co], dr, dc)
            out = term if out is None else jnp.maximum(out, term)
    return out


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_s2dmax_kernel_interpret(rng, dtype):
    """One-pass packed-grid maxpool kernel == the 9-shifted-slice max.

    hq=16 forces two row-tiles so the one-row top halo (and its -inf mask
    at the grid edge) is exercised; max is order-preserving so the kernel's
    f32 compute + cast back is bit-exact at either dtype."""
    from pranet2_tpu.ops import stem

    co = 8
    z = jnp.asarray(rng.standard_normal((2, 16, 8, 4 * co)), dtype)
    got = stem._maxpool_s2d_pallas(z, co)
    want = _s2dmax_reference(z, co)
    assert got.dtype == z.dtype
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


# -------------------------------------------------------------- res2_block


def _block_params(rng, cin, width):
    mk = lambda s, sc: jnp.asarray(rng.standard_normal(s) * sc, jnp.float32)
    return (mk((cin, 4 * width), cin ** -0.5),
            mk((4 * width,), 0.1) + 1.0, mk((4 * width,), 0.1),
            mk((3, 3, 3 * width, width), 0.1),
            mk((3, width), 0.1) + 1.0, mk((3, width), 0.1),
            mk((4, width, cin), width ** -0.5),
            mk((cin,), 0.1) + 1.0, mk((cin,), 0.1))


@pytest.mark.parametrize("ht", [None, 4])
def test_bottle2neck_kernel_interpret(rng, ht, monkeypatch):
    from pranet2_tpu.ops import res2_block

    if ht is not None:  # force the 3-row-halo tiled grid
        monkeypatch.setattr(res2_block, "_pick_ht", lambda *a: ht)
    cin, width = 64, 16
    x = jnp.asarray(rng.standard_normal((1, 8, 6, cin)) * 0.5, jnp.float32)
    p = _block_params(rng, cin, width)
    got = res2_block.fused_bottle2neck(x, *p)
    want = res2_block.reference_bottle2neck(x, *p)
    assert _rel_err(got, want) < 2e-5


# -------------------------------------------------------------- pvt_block


def _pvt_block_args(rng, n, h, w, d, nh, sr, c_ratio=4, dtype=jnp.float32):
    a = _sra_block_args(rng, n, h, w, d, nh, sr, dtype)
    mk = lambda s, sc=0.15: jnp.asarray(rng.standard_normal(s) * sc,
                                        jnp.float32)
    c = d * c_ratio
    return a + (mk((d,)) + 1.0, mk((d,)), mk((d, c), 0.08), mk((c,)),
                mk((3, 3, c)), mk((c,)), mk((c, d), 0.08), mk((d,)))


@pytest.mark.parametrize("sr,nh", [(8, 1), (4, 2), (2, 5), (1, 8)])
def test_pvt_block_kernel_interpret(rng, sr, nh):
    """Whole-block (attn+MLP) kernel vs the chained XLA references at every
    PVTv2-b2 stage config."""
    from pranet2_tpu.ops.pvt_block import fused_pvt_block, reference_pvt_block

    n, h, w, d = 1, 8, 8, 40 if nh == 5 else 32
    a = _pvt_block_args(rng, n, h, w, d, nh, sr)
    got = fused_pvt_block(*a, sr, nh)
    want = reference_pvt_block(*a, sr=sr, nh=nh)
    # the erf-GELU polynomial bounds the agreement (|err| < 2e-3 on the
    # hidden activations)
    assert _rel_err(got, want) < 5e-3


def test_pvt_block_kernel_interpret_bf16(rng):
    from pranet2_tpu.ops.pvt_block import fused_pvt_block, reference_pvt_block

    a = _pvt_block_args(rng, 2, 8, 4, 32, 2, 2, dtype=jnp.bfloat16)
    got = fused_pvt_block(*a, 2, 2)
    want = reference_pvt_block(*a, sr=2, nh=2)
    assert _rel_err(got, want) < 0.05


def test_pvt_block_grad_routes_through_reference(rng):
    from pranet2_tpu.ops.pvt_block import fused_pvt_block, reference_pvt_block

    a = _pvt_block_args(rng, 1, 4, 4, 16, 2, 2)

    def loss(x, w1):
        args = a[:15] + (w1,) + a[16:]
        return jnp.sum(fused_pvt_block(x, *args[1:], 2, 2) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(a[0], a[15])
    rx, rw = jax.grad(
        lambda x, w1: jnp.sum(reference_pvt_block(
            x, *a[1:15], w1, *a[16:], sr=2, nh=2) ** 2),
        argnums=(0, 1))(a[0], a[15])
    assert _rel_err(gx, rx) < 2e-2 and _rel_err(gw, rw) < 2e-2


# -------------------------------------------------------------- res2_tail


@pytest.mark.parametrize("ht,dtype", [(None, jnp.float32), (2, jnp.bfloat16)])
def test_res2_tail_kernel_interpret(rng, ht, dtype, monkeypatch):
    from pranet2_tpu.ops import res2_tail

    if ht is not None:  # force the row-tiled grid on a small image
        monkeypatch.setattr(res2_tail, "_pick_ht", lambda *a: ht)
    cin, cout = 24, 32
    mk = lambda s, sc=0.2: jnp.asarray(rng.standard_normal(s) * sc,
                                       jnp.float32)
    # w must be a sublane multiple or the kernel gates itself off (the
    # Mosaic reshape constraint _impl documents)
    cc = jnp.asarray(rng.standard_normal((2, 6, 8, cin)), dtype)
    short = jnp.asarray(rng.standard_normal((2, 6, 8, cout)), dtype)
    args = (cc, short, mk((cin, cout)), mk((cout,)) + 1.0, mk((cout,)))
    got = res2_tail.fused_tail(*args)
    want = res2_tail.reference_tail(*args)
    assert _rel_err(got, want) < (2e-6 if dtype == jnp.float32 else 0.02)


def test_res2_tail_grad_routes_through_reference(rng):
    from pranet2_tpu.ops import res2_tail

    cin, cout = 16, 8
    mk = lambda s, sc=0.2: jnp.asarray(rng.standard_normal(s) * sc,
                                       jnp.float32)
    cc = jnp.asarray(rng.standard_normal((1, 4, 4, cin)), jnp.float32)
    short = jnp.asarray(rng.standard_normal((1, 4, 4, cout)), jnp.float32)
    args = (cc, short, mk((cin, cout)), mk((cout,)) + 1.0, mk((cout,)))
    g_f = jax.grad(lambda *a: res2_tail.fused_tail(*a).sum(), argnums=(0, 2))(
        *args)
    g_r = jax.grad(lambda *a: res2_tail.reference_tail(*a).sum(),
                   argnums=(0, 2))(*args)
    for a, b in zip(g_f, g_r):
        assert _rel_err(a, b) < 2e-5


def test_mlp_kernel_save_acc_interpret(rng, monkeypatch):
    """save_acc mode: the kernel's second output == the reference chain's
    pre-GELU hidden, and the saved-VJP grads flow through it."""
    from pranet2_tpu.ops import pvt_mlp

    monkeypatch.setattr(pvt_mlp, "_pick_ht", lambda *a: 2)
    a = _mlp_args(rng)
    out, acc = pvt_mlp._impl(*a, 1e-6, save_acc=True)
    ref_out, ref_acc = pvt_mlp.reference_mlp_block_with_acc(*a, eps=1e-6)
    assert _rel_err(out, ref_out) < 3e-3
    assert _rel_err(acc, ref_acc) < 3e-3


def test_mlp_kernel_ln_stats_interpret(rng, monkeypatch):
    """stats mode: (out, mu, rstd) == the reference block + LN stats of
    its output."""
    from pranet2_tpu.ops import pvt_mlp

    monkeypatch.setattr(pvt_mlp, "_pick_ht", lambda *a: 2)
    a = _mlp_args(rng)
    out, mu, rstd = pvt_mlp.fused_mlp_block_stats(*a, 1e-6, 1e-6)
    ref = pvt_mlp.reference_mlp_block(*a)
    rmu, rrstd = pvt_mlp.reference_ln_stats(ref, 1e-6)
    assert _rel_err(out, ref) < 3e-3
    # stats are computed from the kernel's own (approximate) output, so
    # compare against stats of THAT output
    kmu, krstd = pvt_mlp.reference_ln_stats(out, 1e-6)
    assert _rel_err(mu, kmu) < 1e-5 and _rel_err(rstd, krstd) < 1e-5
    assert _rel_err(mu, rmu) < 3e-3 and _rel_err(rstd, rrstd) < 2e-2
