"""Converter key-map coverage for MaxViT / MERIT / MIST checkpoints."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pranet2_tpu.utils.torch_convert import (
    maxvit_key_map,
    merit_key_map,
    mist_key_map,
    split_packed_mha,
)


def flax_prefix_paths(params) -> set[str]:
    """Module paths (dropping kernel/bias/scale leaves; keeping *_gamma)."""
    out = set()
    for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [str(k.key) for k in p]
        if keys[-1] in ("kernel", "bias", "scale"):
            out.add("/".join(keys[:-1]))
        else:
            out.add("/".join(keys))
    return out


def maxvit_torch_prefixes(depths=(2, 2, 5, 2), conv_type="mbconv",
                          prefix=""):
    tp = [f"{prefix}stem.conv1", f"{prefix}stem.norm1", f"{prefix}stem.conv2",
          f"{prefix}norm"]
    for s in range(4):
        for b in range(depths[s]):
            p = f"{prefix}stages.{s}.blocks.{b}"
            if conv_type == "mbconv":
                tp += [f"{p}.conv.{x}" for x in (
                    "pre_norm", "conv1_1x1", "norm1", "conv2_kxk", "norm2",
                    "se.fc1", "se.fc2", "conv3_1x1")]
                if b == 0:
                    tp.append(f"{p}.conv.shortcut.expand")
            else:
                tp += [f"{p}.conv.{x}" for x in (
                    "conv_dw", "norm", "mlp.fc1", "mlp.fc2", "ls")]
                if b == 0 and s > 0:
                    tp.append(f"{p}.conv.shortcut.expand")
            for blk in ("attn_block", "attn_grid"):
                tp += [f"{p}.{blk}.{x}" for x in (
                    "norm1", "norm2", "attn.qkv", "attn.proj",
                    "attn.rel_pos.mlp.fc1", "attn.rel_pos.mlp.fc2",
                    "mlp.fc1", "mlp.fc2", "ls1", "ls2")]
    return tp


@pytest.mark.parametrize("variant,conv_type", [
    ("maxvit_rmlp_small_rw_224", "mbconv"),
    ("maxxvit_rmlp_small_rw_256", "convnext"),
])
def test_maxvit_keymap_covers_backbone(variant, conv_type):
    from pranet2_tpu.models.backbones.maxvit import maxvit

    m = maxvit(variant)
    want = jax.eval_shape(m.init, jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    flax_paths = flax_prefix_paths(want["params"])
    mapped = {
        "/".join(maxvit_key_map(p))
        for p in maxvit_torch_prefixes(conv_type=conv_type)
        if maxvit_key_map(p) is not None
    }
    missing = flax_paths - mapped
    assert not missing, sorted(missing)[:8]


def test_merit_keymap_covers_model():
    from pranet2_tpu.models import get_model

    m = get_model("merit_cascaded", num_classes=4, model_scale="small",
                  dual=True, img_size_s1=(64, 64), img_size_s2=(32, 32))
    want = jax.eval_shape(m.init, jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    flax_paths = flax_prefix_paths(want["params"])
    km = merit_key_map()

    tp = (maxvit_torch_prefixes(conv_type="convnext", prefix="backbone1.")
          + maxvit_torch_prefixes(conv_type="mbconv", prefix="backbone2.")
          + ["conv.0", "conv.1", "out_head4_in", "decoder.Conv_1x1",
             "decoder.SA.conv1"])
    for lvl in (1, 2, 3, 4):
        tp += [f"decoder.ConvBlock{lvl}.conv.0", f"decoder.ConvBlock{lvl}.conv.1",
               f"decoder.ConvBlock{lvl}.conv.3", f"decoder.ConvBlock{lvl}.conv.4",
               f"decoder.ConvBlock{lvl}_fg.conv", f"decoder.ConvBlock{lvl}_fg.bn",
               f"decoder.ConvBlock{lvl}_bg.conv", f"decoder.ConvBlock{lvl}_bg.bn",
               f"decoder.CA{lvl}.fc1", f"decoder.CA{lvl}.fc2"]
    for lvl in (1, 2, 3):
        tp += [f"decoder.Up{lvl}.up.1", f"decoder.Up{lvl}.up.2",
               f"decoder.AG{lvl}.W_g.0", f"decoder.AG{lvl}.W_g.1",
               f"decoder.AG{lvl}.W_x.0", f"decoder.AG{lvl}.W_x.1",
               f"decoder.AG{lvl}.psi.0", f"decoder.AG{lvl}.psi.1"]

    mapped = {"/".join(km(p)) for p in tp if km(p) is not None}
    missing = flax_paths - mapped
    assert not missing, sorted(missing)[:8]


def test_mist_keymap_covers_decoder():
    from pranet2_tpu.models import get_model

    m = get_model("mist_cam", num_classes=4, dual=True, img_size_s1=(64, 64))
    want = jax.eval_shape(m.init, jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    flax_paths = {p for p in flax_prefix_paths(want["params"])
                  if not p.startswith("backbone1/")}
    km = mist_key_map()

    tp = ["conv.0", "conv.1"]
    for i in (1, 2, 3, 4):
        tp += [f"decoder.out_head{i}_fg", f"decoder.out_head{i}_bg"]
    for blk in ("block_5", "block_6", "block_7", "block_8", "block_9"):
        p = f"decoder.{blk}"
        tp += [f"{p}.layernorm", f"{p}.conv1", f"{p}.conv2", f"{p}.conv3"]
        t = f"{p}.trans"
        tp += [f"{t}.conv1", f"{t}.layernorm"]
        for qkv in "qkv":
            tp += [f"{t}.attention_output.conv_{qkv}",
                   f"{t}.attention_output.layernorm_{qkv}",
                   f"{t}.attention_output.attention.in_proj_{qkv}"]
        tp += [f"{t}.attention_output.attention.out_proj"]
        tp += [f"{t}.wide_focus.conv{i}" for i in (1, 2, 3, 4)]

    mapped = {"/".join(km(p)) for p in tp if km(p) is not None}
    missing = flax_paths - mapped
    assert not missing, sorted(missing)[:8]


def test_split_packed_mha():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((12, 4), dtype=np.float32)
    b = rng.standard_normal((12,), dtype=np.float32)
    sd = {"x.attention.in_proj_weight": w, "x.attention.in_proj_bias": b,
          "x.attention.out_proj.weight": rng.standard_normal((4, 4), dtype=np.float32)}
    out = split_packed_mha(sd)
    assert "x.attention.in_proj_weight" not in out
    np.testing.assert_array_equal(out["x.attention.in_proj_q.weight"], w[:4])
    np.testing.assert_array_equal(out["x.attention.in_proj_v.weight"], w[8:])
    np.testing.assert_array_equal(out["x.attention.in_proj_k.bias"], b[4:8])
