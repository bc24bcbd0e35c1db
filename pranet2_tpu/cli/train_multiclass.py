"""Multiclass training CLI (equivalent of ``EMCAD/train_synapse.py``,
``MERIT/train_ACDC.py``, ``MIST/Synapse_train.py``).

Example:
    python -m pranet2_tpu.cli.train_multiclass --model emcad --dataset synapse \
        --root_path ./data/synapse/train_npz --list_dir ./lists/lists_Synapse
"""

from __future__ import annotations

import argparse
import os


def build_model(name: str, num_classes: int, args):
    import jax.numpy as jnp

    from pranet2_tpu.models import get_model

    # callers without a --dtype flag (e.g. test CLIs) get f32
    dt = jnp.bfloat16 if getattr(args, "dtype", None) == "bfloat16" else None
    if name == "emcad":
        return get_model(
            "emcad", num_classes=num_classes, encoder=args.encoder,
            kernel_sizes=tuple(args.kernel_sizes),
            expansion_factor=args.expansion_factor,
            lgag_ks=args.lgag_ks, activation=args.activation_mscb,
            dual=args.dual, dtype=dt,
        )
    if name in ("merit", "merit_parallel"):
        return get_model(
            "merit_cascaded" if name == "merit" else "merit_parallel",
            num_classes=num_classes, dual=args.dual, dtype=dt,
        )
    if name == "mist":
        return get_model("mist_cam", num_classes=num_classes, dual=args.dual,
                         dtype=dt)
    raise ValueError(name)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="emcad",
                   choices=["emcad", "merit", "merit_parallel", "mist"])
    p.add_argument("--dataset", default="synapse", choices=["synapse", "acdc"])
    p.add_argument("--root_path", required=True)
    p.add_argument("--list_dir", required=True)
    p.add_argument("--val_root", default=None)
    p.add_argument("--val_split", default=None,
                   help="e.g. val_vol (Synapse) or valid (ACDC)")
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--img_size", type=int, default=None)
    p.add_argument("--base_lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=2222)
    p.add_argument("--dual", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--supervision", default="mutation",
                   choices=["mutation", "deep_supervision", "last_layer"])
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype; params, loss and optimizer "
                        "state stay f32")
    # EMCAD-specific
    p.add_argument("--encoder", default="pvt_v2_b2")
    p.add_argument("--kernel_sizes", type=int, nargs="+", default=[1, 3, 5])
    p.add_argument("--expansion_factor", type=int, default=2)
    p.add_argument("--lgag_ks", type=int, default=3)
    p.add_argument("--activation_mscb", default="relu6")
    p.add_argument("--save_dir", default="./model_out")
    p.add_argument("--cache", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="RAM-cache the decoded train slices; random "
                        "augmentation still applies per epoch")
    args = p.parse_args()

    # dataset-config defaults (EMCAD/train_synapse.py:85-93, MERIT/train_ACDC.py)
    if args.dataset == "synapse":
        num_classes = args.num_classes or 9
        img_size = args.img_size or 224
        batch_size = args.batch_size or 6
        max_epochs = args.max_epochs or 300
    else:
        num_classes = args.num_classes or 4
        img_size = args.img_size or 256
        batch_size = args.batch_size or 4
        max_epochs = args.max_epochs or 400

    from pranet2_tpu.data import (
        ACDCDataset, RandomGenerator, RandomGeneratorACDC, SynapseDataset,
    )
    from pranet2_tpu.train.multiclass import (
        MulticlassTrainConfig, train_multiclass,
    )
    from pranet2_tpu.utils.checkpoint import save_params, save_state

    cfg = MulticlassTrainConfig(
        num_classes=num_classes, max_epochs=max_epochs,
        batch_size=batch_size, img_size=img_size, lr=args.base_lr,
        dual=args.dual, seed=args.seed, supervision=args.supervision,
    )
    def _with_cache(raw_ds, transform):
        from pranet2_tpu.data import AugmentedView, CachedDataset

        def adapter(image, label):
            img, lab = transform(image, label)
            return img[..., None].astype("float32"), lab

        return AugmentedView(CachedDataset(raw_ds), adapter)

    if args.dataset == "synapse":
        transform = RandomGenerator((img_size, img_size), seed=args.seed)
        if args.cache:
            raw = SynapseDataset(args.root_path, args.list_dir, "train",
                                 nclass=num_classes, raw=True)
            train_ds = _with_cache(raw, transform)
        else:
            train_ds = SynapseDataset(
                args.root_path, args.list_dir, "train", nclass=num_classes,
                transform=transform,
            )
        val_ds = (
            SynapseDataset(args.val_root or args.root_path, args.list_dir,
                           args.val_split, nclass=num_classes)
            if args.val_split else None
        )
    else:
        transform = RandomGeneratorACDC((img_size, img_size), seed=args.seed)
        if args.cache:
            raw = ACDCDataset(args.root_path, args.list_dir, "train", raw=True)
            train_ds = _with_cache(raw, transform)
        else:
            train_ds = ACDCDataset(
                args.root_path, args.list_dir, "train", transform=transform,
            )
        val_ds = (
            ACDCDataset(args.root_path, args.list_dir, args.val_split)
            if args.val_split else None
        )

    model = build_model(args.model, num_classes, args)
    state, best, history = train_multiclass(model, cfg, train_ds, val_ds)

    os.makedirs(args.save_dir, exist_ok=True)
    save_state(os.path.join(args.save_dir, "last"), state)
    if best is not None:
        save_params(os.path.join(args.save_dir, "best"), best.variables)
    print("done; snapshots in", args.save_dir)


if __name__ == "__main__":
    main()
