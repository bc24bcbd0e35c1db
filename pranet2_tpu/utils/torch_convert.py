"""torch ``.pth`` state_dict -> flax variables converter.

The reference ships all checkpoints as torch state_dicts (backbone ImageNet
weights and trained models — e.g. loading at ``binary_seg/lib/pranet.py:148-152``,
``binary_seg/MyTest_med.py:56-77``).  This module converts them to this
framework's pytree layout so predictions are interchangeable (the Jittor-port
strategy, ``SURVEY.md`` §2.8, applied to JAX).

Design: a per-model *key map* turns a torch dotted key prefix (module path,
without the trailing ``weight``/``bias``/``running_*``) into a flax path
tuple.  Tensor layout conversion is inferred from the parameter kind:

* conv weight  OIHW -> HWIO  (works for depthwise too: (C,1,kh,kw)->(kh,kw,1,C))
* linear weight (out,in) -> (in,out)
* norm weight/bias -> scale/bias; running stats -> ``batch_stats``

Whether a prefix is BatchNorm (vs LayerNorm) is detected by the presence of a
``running_mean`` companion key in the state_dict.
"""

from __future__ import annotations

import re
from collections.abc import Callable

import jax.numpy as jnp
import numpy as np

KeyMap = Callable[[str], tuple[str, ...] | None]


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a ``.pth`` into numpy (torch only needed here, on host).

    Robust to the wrappers real released checkpoints come in:
    ``{'state_dict': ...}`` / ``{'model': ...}`` containers, and the
    ``module.`` prefix that ``nn.DataParallel`` stamps on every key (the
    reference's multiclass trainers wrap before saving —
    ``multiclass_seg/EMCAD/trainer.py:77``,
    ``multiclass_seg/MERIT/train_ACDC.py:169,329``).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return normalize_state_dict(sd)


def normalize_state_dict(sd) -> dict[str, np.ndarray]:
    """Unwrap containers, strip ``module.`` prefixes, coerce to numpy."""
    for wrapper in ("state_dict", "model", "net", "model_state_dict"):
        if (isinstance(sd, dict) and wrapper in sd
                and isinstance(sd[wrapper], dict)):
            sd = sd[wrapper]
            break
    out = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
           for k, v in sd.items()
           if hasattr(v, "numpy") or isinstance(v, np.ndarray)}
    if out and all(k.startswith("module.") for k in out):
        out = {k[len("module."):]: v for k, v in out.items()}
    return out


def convert_state_dict(
    sd: dict[str, np.ndarray],
    key_map: KeyMap,
    strict: bool = True,
) -> dict:
    """Convert a torch state_dict into ``{'params': ..., 'batch_stats': ...}``."""
    params: dict = {}
    stats: dict = {}
    skipped: list[str] = []

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    prefixes = {k.rsplit(".", 1)[0] for k in sd if "." in k}
    for prefix in sorted(prefixes):
        flax_path = key_map(prefix)
        if flax_path is None:
            skipped.append(prefix)
            continue
        is_bn = f"{prefix}.running_mean" in sd
        w = sd.get(f"{prefix}.weight")
        b = sd.get(f"{prefix}.bias")
        gamma = sd.get(f"{prefix}.gamma")
        if gamma is not None:  # LayerScale: flax stores the param directly
            put(params, flax_path, gamma)
            continue
        table = sd.get(f"{prefix}.relative_position_bias_table")
        if table is not None:
            # RelPosBias: same (2W-1)^2-row lexicographic table layout on both
            # sides (timm's unique-inverse index == the swin formula we use);
            # the relative_position_index buffer is recomputed, not converted.
            put(params, flax_path + ("relative_position_bias_table",), table)
            continue
        if is_bn:
            put(params, flax_path + ("scale",), w)
            if b is not None:
                put(params, flax_path + ("bias",), b)
            put(stats, flax_path + ("mean",), sd[f"{prefix}.running_mean"])
            put(stats, flax_path + ("var",), sd[f"{prefix}.running_var"])
        elif w is not None and w.ndim == 4:  # conv
            put(params, flax_path + ("kernel",), np.transpose(w, (2, 3, 1, 0)))
            if b is not None:
                put(params, flax_path + ("bias",), b)
        elif w is not None and w.ndim == 2:  # linear
            put(params, flax_path + ("kernel",), np.transpose(w, (1, 0)))
            if b is not None:
                put(params, flax_path + ("bias",), b)
        elif w is not None and w.ndim == 1:  # layernorm
            put(params, flax_path + ("scale",), w)
            if b is not None:
                put(params, flax_path + ("bias",), b)
        else:
            skipped.append(prefix)

    unexpected = [p for p in skipped if not _is_ignorable(p)]
    if unexpected:
        if strict:
            raise ValueError(f"unmapped torch prefixes: {unexpected[:10]}")
        import logging

        logging.getLogger(__name__).warning(
            "convert_state_dict: %d torch prefixes had no flax mapping and "
            "were skipped (first 10: %s)", len(unexpected), unexpected[:10])
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _is_ignorable(prefix: str) -> bool:
    # classifier heads / thop counters the feature models never use, plus
    # MIST Block_decoder.conv3 — defined but dead in the reference forward
    # (multiclass_seg/MIST/lib/MIST.py:252,265)
    return bool(re.search(
        r"(^|\.)(fc|head)$|num_batches_tracked|total_ops|total_params"
        r"|block_\d\.conv3$", prefix))


# ---------------------------------------------------------------------------
# Key maps
# ---------------------------------------------------------------------------


def res2net_key_map(prefix: str) -> tuple[str, ...] | None:
    """torch Res2Net-v1b names -> flax ``Res2Net`` paths."""
    if prefix in ("fc", "avgpool"):
        return None
    m = re.fullmatch(r"conv1\.(\d)", prefix)
    if m:
        return (f"conv1_{m.group(1)}",)
    if prefix == "bn1":
        return ("bn1",)
    m = re.fullmatch(r"layer(\d)\.(\d+)\.(.+)", prefix)
    if m:
        l, b, rest = m.groups()
        block = f"layer{l}_{b}"
        mm = re.fullmatch(r"(convs|bns)\.(\d)", rest)
        if mm:
            return (block, f"{mm.group(1)}_{mm.group(2)}")
        mm = re.fullmatch(r"downsample\.(\d)", rest)
        if mm:
            return (block, f"downsample_{mm.group(1)}")
        if rest in ("conv1", "bn1", "conv3", "bn3"):
            return (block, rest)
    return None


def pvtv2_key_map(prefix: str) -> tuple[str, ...] | None:
    """torch PVTv2 names -> flax ``PVTv2`` paths."""
    if prefix == "head":
        return None
    m = re.fullmatch(r"patch_embed(\d)\.(proj|norm)", prefix)
    if m:
        return (f"patch_embed{m.group(1)}_{m.group(2)}",)
    m = re.fullmatch(r"norm(\d)", prefix)
    if m:
        return (f"norm{m.group(1)}",)
    m = re.fullmatch(r"block(\d)\.(\d+)\.(.+)", prefix)
    if m:
        s, b, rest = m.groups()
        block = f"block{s}_{b}"
        table = {
            "norm1": ("norm1",),
            "norm2": ("norm2",),
            "attn.q": ("attn", "q"),
            "attn.kv": ("attn", "kv"),
            "attn.proj": ("attn", "proj"),
            "attn.sr": ("attn", "sr"),
            "attn.norm": ("attn", "norm"),
            "mlp.fc1": ("mlp", "fc1"),
            "mlp.fc2": ("mlp", "fc2"),
            "mlp.dwconv.dwconv": ("mlp", "dwconv"),
        }
        if rest in table:
            return (block,) + table[rest]
    return None


def resnet_key_map(prefix: str) -> tuple[str, ...] | None:
    """torchvision-style ResNet names -> flax ``ResNet`` paths."""
    if prefix in ("fc", "avgpool"):
        return None
    if prefix in ("conv1", "bn1"):
        return (prefix,)
    m = re.fullmatch(r"layer(\d)\.(\d+)\.(.+)", prefix)
    if m:
        l, b, rest = m.groups()
        block = f"layer{l}_{b}"
        mm = re.fullmatch(r"downsample\.(\d)", rest)
        if mm:
            return (block, f"downsample_{mm.group(1)}")
        if re.fullmatch(r"(conv|bn)[123]", rest):
            return (block, rest)
    return None


def emcad_key_map(encoder: str = "pvt_v2_b2") -> KeyMap:
    """Key map for full EMCADNet checkpoints (e.g. EMCAD_Synapse.pth).

    Torch layout: 'backbone.*' encoder, 'decoder.*' EMCAD(_dual) decoder,
    'out_head{1..4}' single-supervision heads, 'conv.{0,1}' grayscale stem.
    """
    bb_inner = pvtv2_key_map if encoder.startswith("pvt_v2") else resnet_key_map
    bb = _with_prefix(bb_inner, "backbone", "backbone")

    def decoder(rest: str) -> tuple[str, ...] | None:
        # mscb{i} is an nn.Sequential of MSCB blocks: 'mscbN.0.<...>'
        m = re.fullmatch(r"mscb(\d)\.0\.(.+)", rest)
        if m:
            i, sub = m.groups()
            name = f"mscb{i}"
            mm = re.fullmatch(r"pconv([12])\.0", sub)
            if mm:
                return (name, f"pconv{mm.group(1)}")
            mm = re.fullmatch(r"pconv([12])\.1", sub)
            if mm:
                return (name, f"pconv{mm.group(1)}_bn")
            mm = re.fullmatch(r"msdc\.dwconvs\.(\d)\.0", sub)
            if mm:
                return (name, f"dwconv{mm.group(1)}")
            mm = re.fullmatch(r"msdc\.dwconvs\.(\d)\.1", sub)
            if mm:
                return (name, f"dwconv{mm.group(1)}_bn")
            if sub == "conv1x1":
                return (name, "conv1x1")
            return None
        m = re.fullmatch(r"eucb(\d)\.up_dwc\.1", rest)
        if m:
            return (f"eucb{m.group(1)}", "up_dwc")
        m = re.fullmatch(r"eucb(\d)\.up_dwc\.2", rest)
        if m:
            return (f"eucb{m.group(1)}", "up_dwc_bn")
        m = re.fullmatch(r"eucb(\d)\.pwc\.0", rest)
        if m:
            return (f"eucb{m.group(1)}", "pwc")
        m = re.fullmatch(r"lgag(\d)\.(W_g|W_x)\.0", rest)
        if m:
            return (f"lgag{m.group(1)}", m.group(2))
        m = re.fullmatch(r"lgag(\d)\.(W_g|W_x)\.1", rest)
        if m:
            return (f"lgag{m.group(1)}", f"{m.group(2)}_bn")
        m = re.fullmatch(r"lgag(\d)\.psi\.0", rest)
        if m:
            return (f"lgag{m.group(1)}", "psi")
        m = re.fullmatch(r"lgag(\d)\.psi\.1", rest)
        if m:
            return (f"lgag{m.group(1)}", "psi_bn")
        m = re.fullmatch(r"cab(\d)\.(fc[12])", rest)
        if m:
            return (f"cab{m.group(1)}", m.group(2))
        if rest == "sab.conv":
            return ("sab", "conv")
        m = re.fullmatch(r"(ConvBlock\d_(?:fg|bg))\.(conv|bn)", rest)
        if m:
            return (m.group(1), m.group(2))
        return None

    def f(prefix: str):
        r = bb(prefix)
        if r is not None:
            return r
        if prefix == "conv.0":
            return ("stem_conv",)
        if prefix == "conv.1":
            return ("stem_bn",)
        m = re.fullmatch(r"out_head(\d)", prefix)
        if m:
            return (f"out_head{m.group(1)}",)
        if prefix.startswith("decoder."):
            return _prepend(decoder(prefix[len("decoder."):]), "decoder")
        return None

    return f


def _prepend(path, name):
    return None if path is None else (name,) + path


def maxvit_key_map(prefix: str) -> tuple[str, ...] | None:
    """timm MaxxVit checkpoint names -> flax ``MaxxVit`` paths.

    Torch layout: stem.{conv1,norm1,conv2}, stages.{s}.blocks.{b}.{conv,
    attn_block,attn_grid}.*, final ``norm``; classifier ``head.*`` ignored.
    """
    if prefix.startswith("head"):
        return None
    m = re.fullmatch(r"stem\.(conv1|norm1|conv2)", prefix)
    if m:
        return (f"stem_{m.group(1)}",)
    if prefix == "norm":
        return ("norm",)
    m = re.fullmatch(r"stages\.(\d)\.blocks\.(\d)\.(.+)", prefix)
    if not m:
        return None
    s, b, rest = m.groups()
    base = (f"stages_{s}_blocks_{b}",)

    # conv sub-block (MbConv or ConvNeXt)
    mm = re.fullmatch(r"conv\.(.+)", rest)
    if mm:
        sub = mm.group(1)
        table = {
            "pre_norm": ("pre_norm",),
            "conv1_1x1": ("conv1_1x1",),
            "norm1": ("norm1",),
            "conv2_kxk": ("conv2_kxk",),
            "norm2": ("norm2",),
            "se.fc1": ("se", "fc1"),
            "se.fc2": ("se", "fc2"),
            "conv3_1x1": ("conv3_1x1",),
            "shortcut.expand": ("shortcut", "expand"),
            "shortcut": ("shortcut",),  # ConvNeXt 1x1 shortcut (stride 1)
            "conv_dw": ("conv_dw",),
            "norm": ("norm",),
            "mlp.fc1": ("mlp_fc1",),
            "mlp.fc2": ("mlp_fc2",),
            "ls": ("ls_gamma",),
        }
        if sub in table:
            return base + ("conv",) + table[sub]
        return None

    # attention sub-blocks
    mm = re.fullmatch(r"(attn_block|attn_grid)\.(.+)", rest)
    if mm:
        blk, sub = mm.groups()
        table = {
            "norm1": ("norm1",),
            "norm2": ("norm2",),
            "attn.qkv": ("attn", "qkv"),
            "attn.proj": ("attn", "proj"),
            "attn.rel_pos.mlp.fc1": ("attn", "rel_pos", "fc1"),
            "attn.rel_pos.mlp.fc2": ("attn", "rel_pos", "fc2"),
            "attn.rel_pos": ("attn", "rel_pos"),  # RelPosBias table
            "mlp.fc1": ("mlp_fc1",),
            "mlp.fc2": ("mlp_fc2",),
            "ls1": ("ls1_gamma",),
            "ls2": ("ls2_gamma",),
        }
        if sub in table:
            return base + (blk,) + table[sub]
    return None


def _cascade_member_map(rest: str) -> tuple[str, ...] | None:
    """CASCADE decoder member names (shared by MERIT_* and MaxViT_CASCADE)."""
    if rest == "Conv_1x1":
        return ("Conv_1x1",)
    m = re.fullmatch(r"ConvBlock(\d)\.conv\.(\d)", rest)
    if m:  # conv_block Sequential: conv indices 0/3, bn indices 1/4
        lvl, idx = m.groups()
        name = f"conv{idx}" if idx in ("0", "3") else f"bn{idx}"
        return (f"ConvBlock{lvl}", name)
    m = re.fullmatch(r"ConvBlock(\d)_(fg|bg)\.(conv|bn)", rest)
    if m:
        return (f"ConvBlock{m.group(1)}_{m.group(2)}", m.group(3))
    m = re.fullmatch(r"Up(\d)\.up\.(\d)", rest)
    if m:  # up_conv Sequential: 0 upsample, 1 conv, 2 bn
        lvl, idx = m.groups()
        return (f"Up{lvl}", "conv" if idx == "1" else "bn")
    m = re.fullmatch(r"AG(\d)\.(W_g|W_x|psi)\.(\d)", rest)
    if m:
        lvl, part, idx = m.groups()
        return (f"AG{lvl}", part if idx == "0" else f"{part}_bn")
    m = re.fullmatch(r"CA(\d)\.(fc[12])", rest)
    if m:
        return (f"CA{m.group(1)}", m.group(2))
    if rest == "SA.conv1":
        return ("SA", "conv1")
    return None


def merit_key_map() -> KeyMap:
    """Key map for full MERIT checkpoints (Cascaded/Parallel, dual or not)."""
    bb1 = _with_prefix(maxvit_key_map, "backbone1", "backbone1")
    bb2 = _with_prefix(maxvit_key_map, "backbone2", "backbone2")
    cascade = _cascade_member_map

    def f(prefix: str):
        r = bb1(prefix) or bb2(prefix)
        if r is not None:
            return r
        if prefix == "conv.0":
            return ("gray", "stem_conv")
        if prefix == "conv.1":
            return ("gray", "stem_bn")
        m = re.fullmatch(r"out_head(\d)(_in)?", prefix)
        if m:
            return (f"out_head{m.group(1)}{m.group(2) or ''}",)
        if prefix.startswith("decoder."):
            return _prepend(cascade(prefix[len("decoder."):]), "decoder")
        return None

    return f


def maxvit_single_key_map() -> KeyMap:
    """Key map for the single-backbone MaxViT zoo (``MaxViT``, ``MaxViT4Out``,
    ``MaxViT_CASCADE`` — MERIT/lib/networks.py:62-350): 'backbone.*',
    'conv.{0,1}' grayscale stem, 'out_head[1-4]?', optional CASCADE decoder."""
    bb = _with_prefix(maxvit_key_map, "backbone", "backbone")

    def f(prefix: str):
        r = bb(prefix)
        if r is not None:
            return r
        if prefix == "conv.0":
            return ("gray", "stem_conv")
        if prefix == "conv.1":
            return ("gray", "stem_bn")
        m = re.fullmatch(r"out_head(\d?)", prefix)
        if m:
            return (f"out_head{m.group(1)}",)
        if prefix.startswith("decoder."):
            return _prepend(_cascade_member_map(prefix[len("decoder."):]),
                            "decoder")
        return None

    return f


def split_packed_mha(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Split torch ``nn.MultiheadAttention`` packed in-proj into q/k/v entries.

    ``<p>.in_proj_weight`` (3C, C) -> ``<p>.in_proj_{q,k,v}.weight`` (C, C);
    same for biases.  Needed for MIST's conv-transformer attention.
    """
    out = dict(sd)
    for k in list(sd):
        m = re.fullmatch(r"(.+)\.in_proj_weight", k)
        if m:
            p = m.group(1)
            w = out.pop(k)
            c = w.shape[0] // 3
            for i, name in enumerate("qkv"):
                out[f"{p}.in_proj_{name}.weight"] = w[i * c:(i + 1) * c]
            b = out.pop(f"{p}.in_proj_bias", None)
            if b is not None:
                for i, name in enumerate("qkv"):
                    out[f"{p}.in_proj_{name}.bias"] = b[i * c:(i + 1) * c]
    return out


def mist_key_map() -> KeyMap:
    """Key map for full MIST_CAM checkpoints.

    Run the state dict through :func:`split_packed_mha` first.  Torch layout:
    'backbone1.*' MaxxViT, 'decoder.block_{5..9}.*' CAM blocks,
    'out_head{1..4}[_fg|_bg]', 'conv.{0,1}' grayscale stem.
    """
    bb = _with_prefix(maxvit_key_map, "backbone1", "backbone1")

    def transformer(rest: str) -> tuple[str, ...] | None:
        table = {
            "conv1": ("conv1",),
            "layernorm": ("layernorm",),
        }
        if rest in table:
            return table[rest]
        m = re.fullmatch(r"attention_output\.(conv_[qkv]|layernorm_[qkv])", rest)
        if m:
            return ("attention_output", m.group(1))
        m = re.fullmatch(r"attention_output\.attention\.(in_proj_[qkv]|out_proj)", rest)
        if m:
            return ("attention_output", m.group(1))
        m = re.fullmatch(r"wide_focus\.(conv[1-4])", rest)
        if m:
            return ("wide_focus", m.group(1))
        return None

    def block(rest: str) -> tuple[str, ...] | None:
        m = re.fullmatch(r"out_head(\d)_(fg|bg)", rest)
        if m:  # dual heads are CAM attributes -> flax decoder submodules
            return (f"out_head{m.group(1)}_{m.group(2)}",)
        m = re.fullmatch(r"(block_[5-9])\.(.+)", rest)
        if not m:
            return None
        blk, sub = m.groups()
        if sub in ("layernorm", "conv1", "conv2"):
            return (blk, sub)
        if sub == "conv3":  # defined but unused in the reference forward
            return None
        m2 = re.fullmatch(r"trans\.(.+)", sub)
        if m2:
            t = transformer(m2.group(1))
            return None if t is None else (blk, "trans") + t
        return None

    def f(prefix: str):
        r = bb(prefix)
        if r is not None:
            return r
        if prefix == "conv.0":
            return ("stem_conv",)
        if prefix == "conv.1":
            return ("stem_bn",)
        m = re.fullmatch(r"out_head(\d)", prefix)
        if m:  # single-supervision heads on the network itself
            return (f"out_head{m.group(1)}",)
        if prefix.startswith("decoder."):
            return _prepend(block(prefix[len("decoder."):]), "decoder")
        return None

    return f


def _with_prefix(inner: KeyMap, torch_prefix: str, flax_prefix: str) -> KeyMap:
    def f(prefix: str):
        if not prefix.startswith(torch_prefix + "."):
            return None
        sub = inner(prefix[len(torch_prefix) + 1:])
        return None if sub is None else (flax_prefix,) + sub

    return f


def pranet_key_map(version: str, backbone: str) -> KeyMap:
    """Key map for full PraNet models (binary_seg checkpoints).

    version: 'v1' | 'v2';  backbone: 'res2net50' | 'pvt_v2_b2' | 'resnet50'
    ('resnet50' = the legacy CRANet, binary_seg/lib/PraNet_ResNet.py:102).
    Torch top-level names: 'resnet' (V1 variants) or 'backbone' (others).
    """
    bb_torch = ("resnet" if (version == "v1"
                             and backbone in ("res2net50", "resnet50"))
                else "backbone")
    bb_map = {"res2net50": res2net_key_map, "resnet50": resnet_key_map,
              "pvt_v2_b2": pvtv2_key_map}[backbone]
    bb = _with_prefix(bb_map, bb_torch, "backbone")

    def head(prefix: str) -> tuple[str, ...] | None:
        # grayscale stem (V2): conv.0 / conv.1
        if prefix == "conv.0":
            return ("stem_conv",)
        if prefix == "conv.1":
            return ("stem_bn",)
        # RFBs: rfbX_1.branchK.J.{conv,bn} / conv_cat / conv_res
        m = re.fullmatch(r"(rfb[234]_1)\.branch(\d)\.(\d)\.(conv|bn)", prefix)
        if m:
            return (m.group(1), f"branch{m.group(2)}_{m.group(3)}", m.group(4))
        m = re.fullmatch(r"(rfb[234]_1)\.(conv_cat|conv_res)\.(conv|bn)", prefix)
        if m:
            return (m.group(1), m.group(2), m.group(3))
        # aggregation
        m = re.fullmatch(
            r"agg1\.(conv_upsample\d|conv_concat[23]|conv4)\.(conv|bn)", prefix
        )
        if m:
            return ("agg1", m.group(1), m.group(2))
        m = re.fullmatch(r"agg1\.(conv5(?:_fg|_bg)?)", prefix)
        if m:
            return ("agg1", m.group(1))
        # RA/DSRA branches: ra{4,3,2}_convN[_fg|_bg].{conv,bn}
        m = re.fullmatch(r"ra([234])_(conv\d(?:_fg|_bg)?)\.(conv|bn)", prefix)
        if m:
            return (f"ra{m.group(1)}", m.group(2), m.group(3))
        return None

    def f(prefix: str):
        r = bb(prefix)
        if r is not None:
            return r
        return head(prefix)

    return f
