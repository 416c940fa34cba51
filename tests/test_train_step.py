"""End-to-end slice (SURVEY.md §7 milestone 3): synthetic batch -> forward ->
dual loss -> grad -> RAdam update, jit-compiled; plus the 8-device
data-parallel oracle test (sharded == single-device on the same global batch —
the pattern of /root/reference/lib/nn/modules/tests/test_sync_batchnorm.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saunet_tpu.models import SAUNet
from saunet_tpu.parallel import make_mesh, shard_batch
from saunet_tpu.train import (
    create_train_state, make_train_step, radam,
)


def synthetic_batch(rng, n=2, hw=32):
    k1, k2 = np.random.RandomState(rng), np.random.RandomState(rng + 1)
    img = k1.randn(n, hw, hw, 3).astype(np.float32)
    label = k2.randint(0, 4, size=(n, hw, hw)).astype(np.int32)
    edge = (k2.rand(n, hw, hw, 1) > 0.8).astype(np.float32)
    return {"image": img, "label": label, "edge": edge}


@pytest.fixture(scope="module")
def setup():
    model = SAUNet(num_classes=4)
    tx = radam(1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               input_shape=(1, 32, 32, 3))
    return model, tx, state


def test_train_step_runs_and_learns(setup):
    model, tx, state = setup
    step = make_train_step(model, tx, donate=False)
    batch = jax.tree.map(jnp.asarray, synthetic_batch(0))
    rng = jax.random.PRNGKey(0)

    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 4
    # overfitting a fixed batch must reduce the loss
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert metrics["jaccard"].shape == (3,)


def test_data_parallel_matches_single_device(setup):
    """8-way sharded step == single-device step on the same global batch."""
    model, tx, state0 = setup
    batch = synthetic_batch(7, n=8)

    step = make_train_step(model, tx, donate=False)
    rng = jax.random.PRNGKey(1)

    # single device
    b1 = jax.tree.map(jnp.asarray, batch)
    s1, m1 = step(state0, b1, rng)

    # 8-device mesh, batch sharded over 'data'
    mesh = make_mesh(jax.devices(), data=8, space=1)
    b8 = shard_batch(batch, mesh)
    s8, m8 = step(state0, b8, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-5, atol=2e-5)
    # Parameters after update must agree (global-batch BN + summed grads).
    # Absolute tolerance, like the reference's SyncBN oracle
    # (_checkBatchNormResult, atol 1e-3): cross-device reduction order
    # perturbs gradients in the last bit and a 121-layer net amplifies it.
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-3)
