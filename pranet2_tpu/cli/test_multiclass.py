"""Multiclass volumetric test CLI (``EMCAD/test_synapse.py``, ``MERIT/test_ACDC.py``).

Per-volume per-class Dice/HD95/Jaccard/ASD, logged per case and averaged.
Dual-output combination follows the reference family quirk: ``fg_only`` for
MIST/EMCAD test, ``fg_minus_bg`` for MERIT (SURVEY.md §7(f)).
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="emcad",
                   choices=["emcad", "merit", "merit_parallel", "mist"])
    p.add_argument("--dataset", default="synapse", choices=["synapse", "acdc"])
    p.add_argument("--volume_path", required=True)
    p.add_argument("--list_dir", required=True)
    p.add_argument("--split", default=None, help="default: test_vol / test")
    p.add_argument("--checkpoint", required=True,
                   help="orbax params dir (or a torch .pth — converted on "
                        "the fly, incl. DataParallel 'module.' checkpoints)")
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--img_size", type=int, default=None)
    p.add_argument("--mode", default=None,
                   choices=[None, "fg_only", "fg_minus_bg", "single"])
    p.add_argument("--dual", action=argparse.BooleanOptionalAction, default=True)
    # EMCAD-specific construction flags (must match the trained model)
    p.add_argument("--encoder", default="pvt_v2_b2")
    p.add_argument("--kernel_sizes", type=int, nargs="+", default=[1, 3, 5])
    p.add_argument("--expansion_factor", type=int, default=2)
    p.add_argument("--lgag_ks", type=int, default=3)
    p.add_argument("--activation_mscb", default="relu6")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype (bfloat16 for fast eval; "
                        "float32 for checkpoint-parity numbers)")
    p.add_argument("--precision", default="highest",
                   choices=["default", "high", "highest"])
    args = p.parse_args()

    import jax

    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)
    import jax.numpy as jnp

    from pranet2_tpu.cli.train_multiclass import build_model
    from pranet2_tpu.data import ACDCDataset, SynapseDataset
    from pranet2_tpu.train.multiclass import test_volumes
    from pranet2_tpu.utils.checkpoint import restore_params

    if args.dataset == "synapse":
        num_classes = args.num_classes or 9
        img_size = args.img_size or 224
        split = args.split or "test_vol"
        ds = SynapseDataset(args.volume_path, args.list_dir, split,
                            nclass=num_classes)
    else:
        num_classes = args.num_classes or 4
        img_size = args.img_size or 256
        split = args.split or "test"
        ds = ACDCDataset(args.volume_path, args.list_dir, split)

    if args.mode is None:
        if not args.dual:
            mode = "single"
        elif args.model.startswith("merit"):
            mode = "fg_minus_bg"
        else:
            mode = "fg_only"
    else:
        mode = args.mode

    model = build_model(args.model, num_classes, args)
    if args.checkpoint.endswith(".pth"):
        # released reference checkpoints (EMCAD_Synapse.pth etc. —
        # /root/reference/multiclass_seg/EMCAD/test_synapse.py:188)
        from pranet2_tpu.utils.torch_convert import (
            convert_state_dict,
            emcad_key_map,
            load_torch_state_dict,
            merit_key_map,
            mist_key_map,
            split_packed_mha,
        )

        sd = load_torch_state_dict(args.checkpoint)
        if args.model == "emcad":
            km = emcad_key_map(args.encoder)
        elif args.model.startswith("merit"):
            km = merit_key_map()
        else:
            sd = split_packed_mha(sd)
            km = mist_key_map()
        variables = convert_state_dict(sd, km, strict=False)
    else:
        template = jax.eval_shape(
            model.init, jax.random.key(0),
            jnp.zeros((1, img_size, img_size, 1))
        )
        variables = restore_params(args.checkpoint, dict(template))

    metrics, names = test_volumes(
        model, variables, ds, num_classes,
        patch_size=(img_size, img_size), mode=mode,
    )
    for name, m in zip(names, metrics):
        print(f"{name}: mean_dice {m[:, 0].mean():.4f} "
              f"mean_hd95 {m[:, 1].mean():.4f}")
    mean = metrics.mean(axis=0)  # (classes-1, 4)
    for c in range(mean.shape[0]):
        print(f"class {c + 1}: dice {mean[c, 0]:.4f} hd95 {mean[c, 1]:.4f} "
              f"jaccard {mean[c, 2]:.4f} asd {mean[c, 3]:.4f}")
    print(f"mean dice {mean[:, 0].mean():.4f} mean hd95 {mean[:, 1].mean():.4f} "
          f"mean jaccard {mean[:, 2].mean():.4f} mean asd {mean[:, 3].mean():.4f}")


if __name__ == "__main__":
    main()
