"""Checkpoint/resume: full train-state pytree + history.

Upgrades the reference's policy (/root/reference/train.py:153-163,294-328):
the reference saves only the model state_dict (optimizer state lost, resume
is weights-only with an LR rescale hack at train.py:84-88). Here the FULL
state (params, batch_stats, optimizer state, step) is serialised via flax
msgpack, so resume is exact. The best-metric checkpoint policy is preserved:
save every `period` epochs, at the final epoch, and whenever any per-class or
mean IoU improves after a warmup of 15 epochs.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(ckpt_dir: str, tag: str, state, history: Dict) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"state_{tag}.msgpack")
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    with open(os.path.join(ckpt_dir, f"history_{tag}.json"), "w") as f:
        json.dump(_jsonable(history), f)
    return path


def restore_checkpoint(path: str, target_state):
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(target_state, data)


def restore_params_only(path: str, target_state):
    """Warm-start weights (+batch stats) from a checkpoint while keeping a
    fresh optimizer — the reference's `--weights_unet` semantics
    (/root/reference/models/models.py:161-164, strict=False).

    Deserialises leniently from raw msgpack so a checkpoint written with a
    different optimizer/schedule (hence different opt_state pytree) still
    restores the model weights."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(target_state.params,
                                           raw["params"], name="params")
    batch_stats = serialization.from_state_dict(
        target_state.batch_stats, raw["batch_stats"], name="batch_stats")
    return target_state.replace(params=params, batch_stats=batch_stats)


def _jsonable(x):
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, (np.ndarray, np.generic)):
        return np.asarray(x).tolist()
    if hasattr(x, "item") and getattr(x, "ndim", 1) == 0:
        return x.item()
    return x


class BestIoUPolicy:
    """The reference's checkpoint decision rule
    (/root/reference/train.py:294-328): track best per-class IoU (3 classes)
    and best mean IoU; checkpoint on any improvement after `warmup` epochs,
    plus every `period` epochs and at the final epoch."""

    def __init__(self, warmup: int = 15, period: int = 50):
        self.warmup = warmup
        self.period = period
        self.best: Dict[str, float] = {
            "mIoU_1": 0.0, "mIoU_2": 0.0, "mIoU_3": 0.0, "mIoU": 0.0}
        self.best_epoch: Dict[str, int] = {
            "epoch_1": 0, "epoch_2": 0, "epoch_3": 0, "epoch": 0}

    def update(self, epoch: int, iou: np.ndarray, num_epoch: int) -> bool:
        """iou: per-class IoU vector (classes 1..3). Returns True when a
        checkpoint should be written."""
        improved = False
        for i, v in enumerate(iou, start=1):
            if v > self.best[f"mIoU_{i}"]:
                self.best[f"mIoU_{i}"] = float(v)
                self.best_epoch[f"epoch_{i}"] = epoch
                improved = True
        mean = float(np.mean(iou))
        if mean > self.best["mIoU"]:
            self.best["mIoU"] = mean
            self.best_epoch["epoch"] = epoch
            improved = True

        if epoch % self.period == 0 or epoch == num_epoch:
            return True
        if epoch < self.warmup:
            return False
        return improved
