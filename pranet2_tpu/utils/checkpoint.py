"""Orbax checkpointing: params + opt state + BN stats (resume-complete).

The reference saves weights-only ``torch.save(model.state_dict())``
(``binary_seg/MyTrain_med.py:101-103``) and cannot resume optimizer state —
here the full TrainState is checkpointed (params, batch_stats, opt_state,
step), an intentional capability upgrade (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp


def save_state(path: str, state) -> None:
    """Save a TrainState (or any pytree) to ``path`` (directory)."""
    path = os.path.abspath(path)
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def restore_state(path: str, template_state):
    """Restore into the structure of ``template_state`` (same tx)."""
    path = os.path.abspath(path)
    tree = {
        "step": template_state.step,
        "params": template_state.params,
        "batch_stats": template_state.batch_stats,
        "opt_state": template_state.opt_state,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=tree)
    return template_state.replace(**restored)


def save_params(path: str, variables: dict) -> None:
    """Save inference variables ({'params', 'batch_stats'})."""
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), variables, force=True)


def restore_params(path: str, template: dict | None = None) -> dict:
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(os.path.abspath(path))
        return ckptr.restore(os.path.abspath(path), item=template)
