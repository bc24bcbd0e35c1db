"""PraNet-V2 binary training + inference loops (TPU, data-parallel).

Recipe reproduces ``binary_seg/MyTrain_med.py``: multi-scale training at
rates [0.75, 1, 1.25] (each rate = an independent fwd/bwd/step; rescale with
bilinear align_corners=True; ``bg = 1 - gts``), 4 structure losses summed,
Adam + value-clip 0.5, step LR decay, per-epoch in-memory evaluation on
held-out datasets keeping ``best`` by summed meanDice
(``MyTrain_med.py:152-172``).

TPU design:
* The rescale happens *inside* the jitted step (static target size) — one
  compiled executable per rate, no recompilation storms (SURVEY.md §7(d)).
* Batches are sharded over the mesh 'data' axis; params replicated; XLA
  emits the gradient all-reduce and global-batch BN statistics.
* The state pytree is donated — no HBM copies per step.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pranet2_tpu.data import BatchLoader, DevicePrefetcher, PolypDataset, PolypTestDataset
from pranet2_tpu.evalx import aggregate_dataset_metrics, binary_image_metrics
from pranet2_tpu.losses import structure_loss
from pranet2_tpu.models import get_model
from pranet2_tpu.ops import resize_bilinear
from pranet2_tpu.parallel import batch_sharding, make_mesh
from pranet2_tpu.train.optim import make_optimizer, step_decay_schedule
from pranet2_tpu.train.state import TrainState, create_train_state


@dataclasses.dataclass
class BinaryTrainConfig:
    model: str = "pranet_v2"          # or 'pvt_pranet_v2'
    epochs: int = 30
    lr: float = 1e-4
    batch_size: int = 8
    trainsize: int = 352
    clip: float = 0.5
    decay_rate: float = 0.1
    decay_epoch: int = 50
    size_rates: tuple[float, ...] = (0.75, 1.0, 1.25)
    seed: int = 0
    train_path: str = "./data/TrainDataset"
    test_root: str = "./data/TestDataset"
    eval_datasets: tuple[str, ...] = ("CVC-300", "CVC-ClinicDB")
    save_dir: str = "./snapshots/pranet_v2"
    snapshot_every: int = 10
    log_every: int = 20
    dtype: str = "float32"             # 'bfloat16' for bf16 compute
    remat: bool = False                # rematerialize the forward (memory<->FLOPs)
    cache_dataset: bool = True         # preload+RAM-cache the (small) train set


def _rate_size(trainsize: int, rate: float) -> int:
    return int(round(trainsize * rate / 32) * 32)


def make_train_step(model, *, target_size: int, rescale: bool,
                    remat: bool = False):
    """Build the jitted multi-loss train step for one static scale."""

    def forward(params, batch_stats, images, step):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(jax.random.key(0), step)},
        )

    if remat:
        forward = jax.checkpoint(forward)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, images, gts):
        if rescale:
            images = resize_bilinear(
                images, (target_size, target_size), align_corners=True
            )
            gts = resize_bilinear(
                gts, (target_size, target_size), align_corners=True
            )
        bg_mask = 1.0 - gts

        def loss_fn(params):
            outs, updates = forward(
                params, state.batch_stats, images, state.step
            )
            fg, bg = outs[:4], outs[4:]
            from pranet2_tpu.losses.binary import _boundary_weight

            weit = _boundary_weight(gts.astype(jnp.float32))
            losses = [
                structure_loss(f, b, gts, bg_mask, weit=weit)
                for f, b in zip(fg, bg)
            ]
            return sum(losses), (updates["batch_stats"], losses)

        (loss, (new_stats, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, loss, jnp.stack(losses)

    return step


def train(cfg: BinaryTrainConfig, mesh=None, dataset=None, eval_fn=None,
          log=print):
    """Full training run. Returns the final TrainState and best metrics."""
    mesh = mesh or make_mesh()
    model = get_model(
        cfg.model, num_class=1,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else None,
    )

    dataset = dataset or PolypDataset(
        os.path.join(cfg.train_path, "images"),
        os.path.join(cfg.train_path, "masks"),
        cfg.trainsize,
    )
    if cfg.cache_dataset:
        from pranet2_tpu.data import CachedDataset

        dataset = CachedDataset(dataset)
    loader = BatchLoader(dataset, cfg.batch_size, seed=cfg.seed)
    steps_per_epoch = len(loader) * len(cfg.size_rates)
    schedule = step_decay_schedule(
        cfg.lr, cfg.decay_rate, cfg.decay_epoch, steps_per_epoch
    )
    tx = make_optimizer(schedule, clip_value=cfg.clip)

    sample = jnp.zeros((cfg.batch_size, cfg.trainsize, cfg.trainsize, 3))
    state = create_train_state(model, jax.random.key(cfg.seed), sample, tx)
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))

    steps = {
        rate: make_train_step(
            model,
            target_size=_rate_size(cfg.trainsize, rate),
            rescale=rate != 1.0,
            remat=cfg.remat,
        )
        for rate in cfg.size_rates
    }
    data_shard = batch_sharding(mesh)

    best_score, best_state = -1.0, None
    history = []
    for epoch in range(1, cfg.epochs):
        t0 = time.time()
        n_img = 0
        for i, (images, gts) in enumerate(
            DevicePrefetcher(loader, sharding=data_shard), start=1
        ):
            for rate in cfg.size_rates:
                state, loss, losses = steps[rate](state, images, gts)
            n_img += images.shape[0]
            if i % cfg.log_every == 0:
                log(f"epoch {epoch} step {i}/{len(loader)} "
                    f"loss {float(loss):.4f}")
        if n_img == 0:
            raise RuntimeError(
                f"epoch {epoch}: training dataset produced no batches "
                f"(check train_path / batch_size)")
        float(loss)  # hard fence: epoch timing must include device completion
        dt = time.time() - t0
        history.append(dict(epoch=epoch, sec=dt,
                            img_per_sec=n_img * len(cfg.size_rates) / dt))
        log(f"epoch {epoch}: {dt:.1f}s "
            f"({history[-1]['img_per_sec']:.1f} train img/s incl. 3 scales)")

        if cfg.snapshot_every and epoch % cfg.snapshot_every == 0:
            from pranet2_tpu.utils.checkpoint import save_state

            os.makedirs(cfg.save_dir, exist_ok=True)
            save_state(os.path.join(cfg.save_dir, f"epoch_{epoch}"), state)
            log(f"epoch {epoch}: snapshot saved")

        if eval_fn is not None:
            score = eval_fn(model, state)
            if score > best_score:
                best_score, best_state = score, state
                log(f"epoch {epoch}: new best score {score:.4f}")
    return state, best_state, history


# ---------------------------------------------------------------------------
# inference / prediction export (MyTest_med.py equivalents)
# ---------------------------------------------------------------------------


def make_predict_fn(model, variables, v2: bool = True):
    """Jitted batched forward -> summed fg logits at test resolution."""

    @jax.jit
    def fwd(images):
        outs = model.apply(variables, images)
        if v2:
            return outs[0] + outs[1] + outs[2] + outs[3]
        return outs[3]  # V1: finest map (reference uses res2)

    return fwd


def predict_to_maps(fwd, test_ds: PolypTestDataset, batch_size: int = 16):
    """Yield (name, uint8 prediction at native GT size, native gt) per image.

    Post-processing matches ``MyTest_med.py:104-111``: bilinear resize to GT
    size (align_corners=False) -> sigmoid -> min-max normalize -> uint8.
    The resize-to-native runs per-image (sizes vary); everything batched
    stays on TPU.
    """
    for images, gts, names, real in test_ds.batches(batch_size):
        logits = np.asarray(fwd(jnp.asarray(images)))[:real]
        for logit, gt, name in zip(logits, gts[:real], names[:real]):
            yield name, _postprocess(logit, gt.shape), gt


def _postprocess(logit_hw1: np.ndarray, gt_shape) -> np.ndarray:
    from pranet2_tpu.ops.resize import resize_bilinear_np
    from scipy.special import expit

    # host-side: per-image output shapes vary, a jitted resize would compile
    # one executable per shape
    x = resize_bilinear_np(np.asarray(logit_hw1), tuple(gt_shape))[:, :, 0]
    x = expit(x)
    x = (x - x.min()) / (x.max() - x.min() + 1e-8)
    return (x * 255).astype(np.uint8)


def test_with_eval(model, variables, test_root: str,
                   datasets: Sequence[str], testsize: int = 352,
                   batch_size: int = 16, v2: bool = True):
    """In-memory evaluation across datasets (``MyTest_med.py:15-46``).

    Returns {dataset: {metric: value}} using the full metric suite.
    """
    fwd = make_predict_fn(model, variables, v2=v2)
    results = {}
    for ds_name in datasets:
        ds = PolypTestDataset(
            os.path.join(test_root, ds_name, "images"),
            os.path.join(test_root, ds_name, "masks"),
            testsize,
        )
        per_image = [
            binary_image_metrics(pred, _norm_gt(gt))
            for _, pred, gt in predict_to_maps(fwd, ds, batch_size)
        ]
        results[ds_name] = aggregate_dataset_metrics(per_image)
    return results


def _norm_gt(gt: np.ndarray) -> np.ndarray:
    gt = np.asarray(gt, np.float32)
    return gt / (gt.max() + 1e-8)
