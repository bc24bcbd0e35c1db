"""Multiclass (Synapse/ACDC) training + volumetric inference loops.

Recipe reproduces the reference trainers
(``multiclass_seg/EMCAD/trainer.py:48-200``,
``multiclass_seg/MERIT/train_ACDC.py:240-350``): MUTATION powerset
supervision (dual: 0.5*CE + 0.7*Dice + 0.3*bg-BCE; single: 0.3*CE + 0.7*Dice),
AdamW(lr 1e-4, wd 1e-4) with constant LR, per-epoch slice-wise validation
(``val_single_volume``) and best-checkpoint gating.

Volumetric inference (``test_single_volume``,
``MERIT/utils/utils.py:172-264``) is slice-looped in the reference at bs=1;
here slices are zoomed on host then batched into fixed-size chunks for the
TPU (identical per-slice results, one jitted executable).  The dual-output
combination mode is per-family (SURVEY.md §7(f)):
* 'fg_minus_bg' — MERIT test + all val paths (sum of fg_i - bg_i)
* 'fg_only'     — MIST/EMCAD ``test_single_volume`` (sum of fg_i)
* 'single'      — non-dual models (sum of maps)
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import zoom

from pranet2_tpu.data import BatchLoader, DevicePrefetcher
from pranet2_tpu.evalx.volumetric import (
    calculate_dice_percase,
    calculate_metric_percase,
)
from pranet2_tpu.losses import mutation_loss
from pranet2_tpu.parallel import batch_sharding, make_mesh
from pranet2_tpu.train.optim import make_optimizer
from pranet2_tpu.train.state import TrainState, create_train_state


# ---------------------------------------------------------------------------
# volumetric inference
# ---------------------------------------------------------------------------


def make_slice_predictor(model, variables, num_classes: int,
                         patch_size: tuple[int, int], mode: str,
                         chunk: int = 16):
    """Returns fn(volume (D,H,W) f32) -> prediction (D,H,W) int.

    Host: order-3 zoom each slice to patch size; TPU: chunked batched
    forward + combine + argmax; host: order-0 zoom back.
    """

    @jax.jit
    def fwd(x):  # x: (chunk, H, W, 1)
        outs = model.apply(variables, x)
        if mode == "fg_minus_bg":
            logits = sum(f - b for f, b in zip(outs[:4], outs[4:]))
        elif mode == "fg_only":
            logits = sum(outs[:4])
        else:  # 'single'
            logits = sum(outs)
        return jnp.argmax(logits, axis=-1)  # softmax is monotonic

    def predict(volume: np.ndarray) -> np.ndarray:
        d, x, y = volume.shape
        ph, pw = patch_size
        slices = np.empty((d, ph, pw, 1), np.float32)
        for i in range(d):
            s = volume[i]
            if (x, y) != (ph, pw):
                s = zoom(s, (ph / x, pw / y), order=3)
            slices[i, :, :, 0] = s
        preds = np.empty((d, ph, pw), np.int32)
        for start in range(0, d, chunk):
            batch = slices[start:start + chunk]
            real = batch.shape[0]
            if real < chunk:
                batch = np.concatenate(
                    [batch, np.zeros((chunk - real, ph, pw, 1), np.float32)]
                )
            out = np.asarray(fwd(jnp.asarray(batch)))[:real]
            preds[start:start + real] = out
        if (x, y) != (ph, pw):
            full = np.empty((d, x, y), preds.dtype)
            for i in range(d):
                full[i] = zoom(preds[i], (x / ph, y / pw), order=0)
            return full
        return preds

    return predict


def test_volumes(model, variables, dataset, num_classes: int,
                 patch_size=(224, 224), mode: str = "fg_minus_bg",
                 full_metrics: bool = True, chunk: int = 16):
    """Per-volume per-class metrics over a test dataset.

    Returns (metric_array (n_vols, n_classes-1, 4 or 1), case_names).
    """
    predict = make_slice_predictor(model, variables, num_classes,
                                   tuple(patch_size), mode, chunk)
    rows, names = [], []
    for i in range(len(dataset)):
        image, label = dataset[i]
        # normalise to (D, H, W): datasets yield volumes (D,H,W), single
        # slices (H,W,1) (ACDC 'valid'), or bare (H,W)
        if image.ndim == 2:
            image = image[None]
        elif image.ndim == 3 and image.shape[-1] == 1:
            image = image[None, :, :, 0]
        if label.ndim == 2:
            label = label[None]
        pred = predict(image)
        per_class = []
        for c in range(1, num_classes):
            if full_metrics:
                per_class.append(calculate_metric_percase(pred == c, label == c))
            else:
                per_class.append((calculate_dice_percase(pred == c, label == c),))
        rows.append(per_class)
        names.append(dataset.case_name(i))
    return np.asarray(rows, np.float64), names


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MulticlassTrainConfig:
    num_classes: int = 9
    max_epochs: int = 300
    batch_size: int = 6
    img_size: int = 224
    lr: float = 1e-4
    weight_decay: float = 1e-4
    dual: bool = True
    loss_weights: tuple[float, float, float] = (0.5, 0.7, 0.3)
    single_weights: tuple[float, float] = (0.3, 0.7)
    seed: int = 2222
    eval_from_frac: float = 0.5     # start validating at this fraction of epochs
    best_threshold: float = 0.80    # min val mean-dice to save best
    remat: bool = False             # rematerialize the forward
    supervision: str = "mutation"   # 'mutation' | 'deep_supervision' | 'last_layer'


def make_multiclass_train_step(model, cfg: MulticlassTrainConfig):
    def forward(params, batch_stats, images, step):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(
                jax.random.key(cfg.seed), step)},
        )

    if cfg.remat:
        forward = jax.checkpoint(forward)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, images, labels):
        def loss_fn(params):
            outs, updates = forward(
                params, state.batch_stats, images, state.step
            )
            if cfg.dual:
                loss = mutation_loss(
                    list(outs[:4]), labels, cfg.num_classes, list(outs[4:]),
                    weights=cfg.loss_weights, supervision=cfg.supervision,
                )
            else:
                loss = mutation_loss(
                    list(outs), labels, cfg.num_classes,
                    single_weights=cfg.single_weights,
                    supervision=cfg.supervision,
                )
            return loss, updates["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads, new_batch_stats=stats), loss

    return step


def train_multiclass(model, cfg: MulticlassTrainConfig, train_dataset,
                     val_dataset=None, mesh=None, log=print,
                     num_threads: int = 8):
    """Returns (final_state, best_state, history)."""
    mesh = mesh or make_mesh()
    tx = make_optimizer(cfg.lr, clip_value=None,
                        weight_decay=cfg.weight_decay)
    sample = jnp.zeros((cfg.batch_size, cfg.img_size, cfg.img_size, 1))
    state = create_train_state(model, jax.random.key(cfg.seed), sample, tx)
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))

    loader = BatchLoader(train_dataset, cfg.batch_size, seed=cfg.seed,
                         num_threads=num_threads)
    step_fn = make_multiclass_train_step(model, cfg)
    shard = batch_sharding(mesh)

    best_dice, best_state = -1.0, None
    history = []
    eval_from = int(cfg.max_epochs * cfg.eval_from_frac)
    for epoch in range(1, cfg.max_epochs + 1):
        t0 = time.time()
        total, nsteps = 0.0, 0
        for images, labels in DevicePrefetcher(loader, sharding=shard):
            state, loss = step_fn(state, images, labels)
            total += float(loss)
            nsteps += 1
        dt = time.time() - t0
        mean_loss = total / max(nsteps, 1)
        history.append(dict(epoch=epoch, loss=mean_loss, sec=dt))
        log(f"epoch {epoch}/{cfg.max_epochs} loss {mean_loss:.4f} ({dt:.1f}s)")

        if val_dataset is not None and epoch >= eval_from:
            dice = validate(model, state.variables, val_dataset, cfg)
            history[-1]["val_dice"] = dice
            log(f"epoch {epoch} val mean-dice {dice:.4f}")
            if dice > best_dice and dice >= cfg.best_threshold:
                best_dice, best_state = dice, state
                log(f"epoch {epoch}: new best {dice:.4f}")
    return state, best_state, history


def validate(model, variables, val_dataset, cfg: MulticlassTrainConfig) -> float:
    """Slice-wise val (``val_single_volume`` semantics: fg-bg for dual)."""
    mode = "fg_minus_bg" if cfg.dual else "single"
    metrics, _ = test_volumes(
        model, variables, val_dataset, cfg.num_classes,
        patch_size=(cfg.img_size, cfg.img_size), mode=mode,
        full_metrics=False,
    )
    return float(metrics[..., 0].mean())
