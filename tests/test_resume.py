"""Exact-resume flow: latest-checkpoint discovery + full-state restore
(the reference's weakest aux subsystem, SURVEY.md §5 checkpoint/resume)."""
import os

import numpy as np

import jax
import jax.numpy as jnp

from saunet_tpu.cli.train import _latest_checkpoint
from saunet_tpu.train import (
    TrainState, radam, restore_checkpoint, save_checkpoint,
)


def _state(step):
    params = {"w": jnp.full(3, float(step))}
    tx = radam(1e-3)
    return TrainState(step=jnp.asarray(step, jnp.int32), params=params,
                      batch_stats={}, opt_state=tx.init(params))


def test_latest_checkpoint_discovery(tmp_path):
    d = str(tmp_path)
    assert _latest_checkpoint(d) is None
    for e in (1, 5, 50, 7):
        save_checkpoint(d, f"epoch_{e}", _state(e), {})
    path, epoch = _latest_checkpoint(d)
    assert epoch == 50
    assert path.endswith("state_epoch_50.msgpack")


def test_resume_restores_full_state(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, "epoch_3", _state(3), {})
    path, epoch = _latest_checkpoint(d)
    fresh = _state(0)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full(3, 3.0))
    # optimizer counter restored too
    counts = [x for x in jax.tree_util.tree_leaves(restored.opt_state)
              if getattr(x, "dtype", None) == jnp.int32]
    assert counts  # RAdam count present and loaded
