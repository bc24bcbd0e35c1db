"""Shared Pallas-kernel plumbing for the fused ops.

The fused kernels (pvt_mlp / pvt_attn / res2_block) compile only on a real
TPU backend and fall back to their plain-XLA reference compositions
everywhere else, so CPU test runs never exercise the *in-kernel* logic
(rolls, halo masks, tap accumulation order).  Setting
``PRANET2_PALLAS_INTERPRET=1`` routes those kernels through the Pallas
interpreter off-TPU instead — slow, but it executes the actual kernel
bodies so their logic is pinned by tests/test_pallas_interpret.py without
a chip.  On a TPU backend the flag is ignored (the compiled kernel is the
thing under test there).
"""

from __future__ import annotations

import os

import jax


def use_kernel(has_pltpu: bool) -> bool:
    """Whether the Pallas path (compiled or interpreted) should run."""
    if not has_pltpu:
        return False
    return jax.default_backend() == "tpu" or interpret_mode()


def interpret_mode() -> bool:
    """True when kernels must run under the Pallas interpreter (off-TPU)."""
    return (os.environ.get("PRANET2_PALLAS_INTERPRET") == "1"
            and jax.default_backend() != "tpu")


def component_enabled(name: str, dtype_ok: bool) -> bool:
    """Auto-enable decision for one fused/restructured component.

    Component names (each has an interpreter-mode body test in
    tests/test_pallas_interpret.py where it is a Pallas kernel, plus a
    BENCH_TABLE row):

    ``mlp``        fused PVT MLP kernel (ops/pvt_mlp.py)
    ``attn``       fused SRA attention kernel (ops/pvt_attn.py)
    ``s2d``        space-to-depth Res2Net stem restructure (ops/stem.py)
    ``s2dmax``     Pallas one-pass maxpool on the s2d stem's packed grid
                   (ops/stem._maxpool_s2d_pallas; callers pass
                   dtype_ok=True because the kernel is dtype-generic —
                   it maxes in f32 and casts back to the input dtype, and
                   the surrounding s2d stem is already gated on the fast
                   path by the ``s2d`` component)
    ``pes2d``      space-to-depth PVT stage-1 patch embed (ops/patch_embed)
    ``tailfuse``   Bottle2neck conv3+BN3+residual+ReLU tail kernel
                   (ops/res2_tail.py; eval-only, folded BN; opt-in —
                   measured negative, see below)
    ``gstage``     block-diagonal batched stage-block split convs (res2net)
    ``splitmm``    row-major dot-form 3x3 split convs in normal blocks
                   (ops/splitconv.py; pure XLA, exact restructure)
    ``decdot``     row-major dot-form narrow decoder convs (RFB/DSRA
                   ConvBN <=64 ch; ops/splitconv.conv_dot)
    ``lnstats``    fused MLP emits its output's per-token LN stats so
                   the next block's XLA K/V-path LN1 skips its reduce
                   (ops/pvt_mlp.fused_mlp_block_stats)
    ``res2block``  whole-Bottle2neck kernel (opt-in, measured negative)
    ``l1pack``     packed layer-1 (opt-in, measured negative)
    ``blockfuse``  whole-transformer-half kernels (opt-in, measured negative)

    Read at trace time.  Default: on exactly when the model computes in
    bfloat16 (the fast path) and ``PRANET2_NO_FUSED`` is unset.
    ``PRANET2_FUSED="mlp,attn"`` overrides the set of enabled components
    explicitly (still gated on the bf16 dtype) — the per-component
    ablation knob tools/exp_ablate_fused.py uses.
    """
    if not dtype_ok or os.environ.get("PRANET2_NO_FUSED"):
        return False
    explicit = os.environ.get("PRANET2_FUSED")
    if explicit is not None:
        return name in {c.strip() for c in explicit.split(",")}
    # All three opt-outs are measured negatives on the v5e chip
    # (tools/exp_ablate_fused.py / exp_pvt_matrix.py): res2block loses at
    # reference widths; l1pack regresses PraNet-V2 bs16 even after the
    # round-4 flat-lane rewrite (1,827 -> 1,666 img/s — pack/unpack
    # relayouts ~0.6 ms/iter eat the split-conv savings; round-3 5-D
    # version was worse still, 1,802 -> 1,436; and the BOUNDARY-FREE
    # version — stem emits packed, layer-2 stage block consumes packed,
    # zero relayouts — still loses 1,966 -> 1,533 img/s, measured round 4b:
    # the packed 1024-flat-channel residual/BN/ReLU fusions and the 4x-FLOP
    # block-sparse 1x1s cost more than the 26-wide lane padding they
    # remove); blockfuse (whole-half kernels) loses to the separate
    # mlp+attn kernels at every combination tried (1,293.8 vs 1,329.1
    # best).  Round-4 matrix re-check of the
    # separate-kernel knobs (exp_pvt_matrix, PVT bs16): f32 taps + attn v1
    # = 1,323.7 img/s; bf16 taps 823; bf16 GELU 1,153; attn v2 1,293 —
    # the f32/v1 defaults below stand.
    # pes2d (space-to-depth stage-1 patch embed) measured a default win:
    # PVT-PraNet-V2 bs16 1,323.9 -> 1,345.7 img/s, full-model parity OK.
    # tailfuse: round-5 measured negative — PraNet-V2 bs16 1,780.5 ->
    # 1,556.8 img/s (tools/exp_r5.py conv, same session).  XLA already
    # producer-fuses the 1x1 conv3 with the BN/residual/ReLU epilogue, so
    # the Pallas junction only added grid overhead and smaller matmuls.
    # The kernel stays (parity-tested) for re-checks on other topologies.
    # splitmm: round-5 measured negative — PraNet-V2 bs16 1,772.4 ->
    # 1,599.9 img/s (tools/exp_r5.py splitmm).  The per-op profile showed
    # the 26-ch split convs ~7.5x off roofline in the batch-in-sublanes
    # emitter plus ~1.4 ms of batch-minor relayout fusions, but replacing
    # them with row-major tap matmuls made the WHOLE model slower: XLA's
    # global layout assignment around the narrow convs beats the per-op
    # arithmetic.  (Same lesson as tailfuse: end-to-end measurement only.)
    # decdot: round-5 measured negative on BOTH models — PraNet-V2 bs16
    # 1,772.4 -> 1,642.0, PVT-PraNet-V2 bs16 1,396.7 -> 1,313.1
    # (tools/exp_r5.py decdot).  Same story at the decoder's 32/64-ch
    # convs as splitmm at the split convs.  Three strikes for the
    # "row-major dot-form beats the narrow-conv emitter" hypothesis.
    return name not in ("res2block", "l1pack", "blockfuse", "tailfuse",
                        "splitmm", "decdot")
