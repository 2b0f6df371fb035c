"""Orbax checkpointing with the reference's save semantics.

Reference behavior reproduced (`src/training/main.py:280-328`):
  - the saved model weights are the alpha-ensemble of student and ORIGINAL
    teacher weights when alpha < 1.0
  - optimizer state + step are saved for resume
  - atomic latest-checkpoint update (Orbax writes atomically by design)
  - optional deletion of the previous checkpoint
Plus an exporter to the PyTorch layout for F-ViT interop.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from clipself_tpu.train.ensemble import student_teacher_ensemble


def _manager(ckpt_dir: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(
    ckpt_dir: str,
    state,
    teacher_params: Optional[Any],
    epoch: int,
    alpha: float = 1.0,
    keep: Optional[int] = None,
) -> Any:
    """Save {ensembled params, optimizer state, step} at `epoch`.

    Returns the ensembled params (what eval/export should consume).
    """
    if alpha < 1.0 and teacher_params is not None:
        target = student_teacher_ensemble(state.params, teacher_params, alpha)
    else:
        target = state.params
    mgr = _manager(ckpt_dir, keep)
    payload = {
        "params": target,
        "student_params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()
    return target


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    """Newest saved epoch under a checkpoint dir (None when empty)."""
    mgr = _manager(ckpt_dir)
    try:
        return mgr.latest_step()
    finally:
        mgr.close()


def restore_checkpoint(ckpt_dir: str, state, epoch: Optional[int] = None):
    """Restore (state, epoch). Structure comes from the passed-in state."""
    mgr = _manager(ckpt_dir)
    if epoch is None:
        epoch = mgr.latest_step()
    if epoch is None:
        mgr.close()
        return state, 0
    template = {
        "params": state.params,
        "student_params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = mgr.restore(epoch, args=ocp.args.StandardRestore(template))
    mgr.close()
    new_state = state.replace(
        params=restored["student_params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, int(epoch)


def load_params(ckpt_dir: str, epoch: Optional[int] = None):
    """Load just the (ensembled) params from a checkpoint directory."""
    mgr = _manager(ckpt_dir)
    if epoch is None:
        epoch = mgr.latest_step()
    restored = mgr.restore(epoch)
    mgr.close()
    return restored["params"]


def export_torch(path: str, params, cfg, epoch: int = 0, name: str = ""):
    """Export ensembled params to the PyTorch reference layout for F-ViT."""
    from clipself_tpu.models.torch_io import save_torch_checkpoint

    host_params = jax.tree.map(np.asarray, params)
    save_torch_checkpoint(path, host_params, cfg, meta={"epoch": epoch, "name": name})
