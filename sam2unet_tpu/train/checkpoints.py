"""Checkpoint save/restore (Orbax) + the reference's two-tier naming policy.

The reference saves bare state dicts: best-by-mIoU as
`SAM2-UNet_epoch-N_loss-L_iou-I.pth` and a rolling `SAM2-UNet_epoch-latest`
(train.py:130-149), and never persists optimizer/scheduler state. Here the
same policy applies to Orbax directories, and — as a framework improvement —
`save_train_state` optionally persists the full TrainState (opt state,
step) for true resume.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(p: str) -> str:
    return os.path.abspath(p)


def save_variables(path: str, variables: dict) -> None:
    """Save model variables ({'params', 'batch_stats'}) to an Orbax dir."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(_path(path), jax.tree.map(np.asarray, variables), force=True)
    ckpt.wait_until_finished()


def restore_variables(path: str, template: dict | None = None) -> dict:
    ckpt = ocp.StandardCheckpointer()
    if template is not None:
        return ckpt.restore(_path(path), template)
    return ckpt.restore(_path(path))


def best_checkpoint_name(epoch: int, loss: float, iou: float) -> str:
    """train.py:137-140 naming."""
    return f"SAM2-UNet_epoch-{epoch}_loss-{loss:.3f}_iou-{iou:.3f}"


LATEST_NAME = "SAM2-UNet_epoch-latest"


class CheckpointPolicy:
    """Best-mIoU gating + periodic latest (train.py:130-149)."""

    def __init__(self, save_path: str, base_mean_iou: float, save_interval: int,
                 total_epochs: int):
        self.save_path = save_path
        self.best = base_mean_iou
        self.interval = save_interval
        self.total = total_epochs
        os.makedirs(save_path, exist_ok=True)

    def maybe_save(
        self, epoch1: int, loss: float, mean_iou: float, variables: dict
    ) -> str | None:
        """epoch1 is 1-based. Returns the saved path or None."""
        if mean_iou > self.best:
            self.best = mean_iou
            name = best_checkpoint_name(epoch1, loss, mean_iou)
            out = os.path.join(self.save_path, name)
            save_variables(out, variables)
            print("Saving Snapshot best:", out)
            return out
        if epoch1 % self.interval == 0 or epoch1 == self.total:
            out = os.path.join(self.save_path, LATEST_NAME)
            save_variables(out, variables)
            print("Saving Snapshot:", out)
            return out
        return None


def save_train_state(path: str, state: Any) -> None:
    """Full-resume checkpoint (step/opt state included) — an improvement
    over the reference, which restarts optimizer state on resume."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(_path(path), jax.tree.map(np.asarray, state), force=True)
    ckpt.wait_until_finished()


def restore_train_state(path: str, template: Any) -> Any:
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(_path(path), template)


def load_any_checkpoint(path: str, template: dict | None = None) -> dict:
    """Load model variables from either an Orbax dir or a torch .pth/.pt
    (auto-converted)."""
    if os.path.isdir(path):
        return restore_variables(path, template)
    from sam2unet_tpu.interop.torch_convert import load_sam2unet_checkpoint

    return load_sam2unet_checkpoint(path)
