"""Checkpoint policy + full-state save/restore roundtrip
(/root/reference/train.py:153-163,294-328 capability)."""
import numpy as np

import jax
import jax.numpy as jnp

from saunet_tpu.train import (
    BestIoUPolicy, TrainState, radam, restore_checkpoint,
    restore_params_only, save_checkpoint,
)


def _tiny_state():
    params = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
    tx = radam(1e-3)
    return TrainState(step=jnp.asarray(7, jnp.int32), params=params,
                      batch_stats={"m": jnp.zeros(3)},
                      opt_state=tx.init(params))


def test_save_restore_roundtrip(tmp_path):
    state = _tiny_state()
    path = save_checkpoint(str(tmp_path), "epoch_7", state,
                           {"train": {"loss": [1.0]}})
    blank = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(path, blank)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(4.0))
    # optimizer state restored too (full-state resume, unlike the reference)
    flat_a = jax.tree_util.tree_leaves(state.opt_state)
    flat_b = jax.tree_util.tree_leaves(restored.opt_state)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_params_only(tmp_path):
    state = _tiny_state()
    path = save_checkpoint(str(tmp_path), "warm", state, {})
    fresh = _tiny_state().replace(
        step=jnp.asarray(0, jnp.int32),
        params=jax.tree.map(jnp.zeros_like, state.params))
    warm = restore_params_only(path, fresh)
    np.testing.assert_array_equal(np.asarray(warm.params["w"]),
                                  np.arange(4.0))
    assert int(warm.step) == 0  # optimizer/step untouched


def test_best_iou_policy():
    p = BestIoUPolicy(warmup=15, period=50)
    # early epochs: improvement alone doesn't checkpoint
    assert p.update(5, np.array([0.5, 0.5, 0.5]), 120) is False
    # epoch 50: periodic save
    assert p.update(50, np.array([0.1, 0.1, 0.1]), 120) is True
    # after warmup with improvement
    assert p.update(60, np.array([0.6, 0.6, 0.6]), 120) is True
    # no improvement, not periodic
    assert p.update(61, np.array([0.1, 0.1, 0.1]), 120) is False
    # single-class improvement triggers
    assert p.update(62, np.array([0.7, 0.1, 0.1]), 120) is True
    # final epoch always saves
    assert p.update(120, np.array([0.0, 0.0, 0.0]), 120) is True
    assert p.best["mIoU"] > 0.5
