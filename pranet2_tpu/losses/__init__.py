from pranet2_tpu.losses.binary import (
    structure_loss,
    structure_loss_multi,
    structure_loss_v1,
)
from pranet2_tpu.losses.multiclass import (
    dice_loss,
    softmax_ce_loss,
    bce_with_logits,
    powerset,
    mutation_loss,
)

__all__ = [
    "structure_loss",
    "structure_loss_multi",
    "structure_loss_v1",
    "dice_loss",
    "softmax_ce_loss",
    "bce_with_logits",
    "powerset",
    "mutation_loss",
]
