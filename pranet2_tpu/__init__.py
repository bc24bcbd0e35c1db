"""pranet2-tpu: a TPU-native (JAX/XLA/Pallas/pjit) medical-image-segmentation framework.

Re-implements, TPU-first, the full capability surface of the PraNet-V2 reference
stack (PraNet-V1/V2 binary polyp segmentation + DSRA-grafted MERIT/MIST/EMCAD
multi-class segmentation), with data-parallel execution over a `jax.sharding.Mesh`.

Layout:
    ops/       low-level functional ops (torch-parity resize, DSRA gate, pooling)
    nn.py      shared flax.linen building blocks (ConvBN, RFB, aggregation, ...)
    models/    backbones (Res2Net, PVTv2, ResNet, MaxViT) and model zoo
    losses/    structure_loss, DiceLoss, MUTATION powerset supervision
    data/      host-side input pipelines (polyp, ACDC, Synapse) + prefetcher
    train/     optimizers, schedules, train loops
    evalx/     metric suites (binary threshold sweeps, volumetric Dice/HD95)
    parallel/  mesh construction and sharding policies
    utils/     checkpointing, torch `.pth` conversion, config, logging
"""

__version__ = "0.1.0"

from pranet2_tpu.models import get_model, list_models  # noqa: E402

__all__ = ["get_model", "list_models", "__version__"]
