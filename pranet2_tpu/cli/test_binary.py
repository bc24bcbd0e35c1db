"""Binary inference + PNG export CLI (equivalent of ``binary_seg/MyTest_med.py``).

Runs each requested model over the polyp test sets and writes min-max
normalized uint8 prediction PNGs under ``results/<model>/<dataset>/`` —
byte-compatible with the reference's export so ``eval_binary`` (or the
reference's own eval.py) can score them.

Supports all 5 released test sets; the reference scripts iterate only 4
(``MyTest_med.py:82`` omits CVC-ColonDB) — pass ``--datasets`` to match.
"""

from __future__ import annotations

import argparse
import os

DEFAULT_DATASETS = [
    "CVC-300", "CVC-ClinicDB", "Kvasir", "ETIS-LaribPolypDB", "CVC-ColonDB",
]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="pranet_v2",
                   choices=["pranet_v1", "pvt_pranet_v1",
                            "pranet_v2", "pvt_pranet_v2"])
    p.add_argument("--checkpoint", required=True,
                   help="orbax dir (or .pth for torch checkpoints)")
    p.add_argument("--testsize", type=int, default=352)
    p.add_argument("--batchsize", type=int, default=16)
    p.add_argument("--data_root", default="./data/TestDataset")
    p.add_argument("--save_root", default="./results")
    p.add_argument("--datasets", nargs="+", default=DEFAULT_DATASETS)
    p.add_argument("--precision", default="highest",
                   choices=["default", "high", "highest"],
                   help="matmul/conv precision; 'highest' (f32 on MXU) for "
                        "checkpoint-parity evaluation, 'default' (bf16 "
                        "passes) for speed")
    args = p.parse_args()

    import jax

    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)
    import jax.numpy as jnp
    from PIL import Image

    from pranet2_tpu.data import PolypTestDataset
    from pranet2_tpu.models import get_model
    from pranet2_tpu.train.binary import make_predict_fn, predict_to_maps

    v2 = args.model.endswith("_v2")
    model = get_model(args.model, **({"num_class": 1} if v2 else {}))

    if args.checkpoint.endswith(".pth"):
        from pranet2_tpu.utils.torch_convert import (
            convert_state_dict, load_torch_state_dict, pranet_key_map,
        )

        version = "v2" if v2 else "v1"
        backbone = "pvt_v2_b2" if args.model.startswith("pvt") else "res2net50"
        variables = convert_state_dict(
            load_torch_state_dict(args.checkpoint),
            pranet_key_map(version, backbone), strict=False,
        )
    else:
        from pranet2_tpu.utils.checkpoint import restore_params

        template = jax.eval_shape(
            model.init, jax.random.key(0),
            jnp.zeros((1, args.testsize, args.testsize, 3)),
        )
        variables = restore_params(args.checkpoint, dict(template))

    fwd = make_predict_fn(model, variables, v2=v2)
    for ds_name in args.datasets:
        img_root = os.path.join(args.data_root, ds_name, "images")
        gt_root = os.path.join(args.data_root, ds_name, "masks")
        if not os.path.isdir(img_root):
            print(f"skip {ds_name}: {img_root} not found")
            continue
        ds = PolypTestDataset(img_root, gt_root, args.testsize)
        out_dir = os.path.join(args.save_root, args.model, ds_name)
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for name, pred, _gt in predict_to_maps(fwd, ds, args.batchsize):
            Image.fromarray(pred).save(os.path.join(out_dir, name))
            n += 1
        print(f"{args.model}/{ds_name}: wrote {n} maps -> {out_dir}")


if __name__ == "__main__":
    main()
