"""Explicit-collective shard_map backend: SyncBN via BatchNorm(axis_name)
+ hand-placed pmeans must reproduce the jit auto-sharding step.

Equivalence is tested on a batch that is identical across shards so the
per-shard loss normalisation (the reference DataParallel's mean-of-means
semantics, /root/reference/train.py:96) coincides with the global mean."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saunet_tpu.models import SAUNet
from saunet_tpu.parallel import make_mesh, shard_batch
from saunet_tpu.parallel.shard_map_step import (
    make_shard_map_train_step, syncbn_axis,
)
from saunet_tpu.train import create_train_state, make_train_step, radam


def test_shard_map_matches_jit_on_uniform_shards():
    model = SAUNet(num_classes=4)
    tx = radam(1e-3)
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0),
                                input_shape=(1, 32, 32, 3))

    rs = np.random.RandomState(0)
    one = {
        "image": rs.randn(1, 32, 32, 3).astype(np.float32),
        "label": rs.randint(0, 4, size=(1, 32, 32)).astype(np.int32),
        "edge": (rs.rand(1, 32, 32, 1) > 0.8).astype(np.float32),
    }
    batch = {k: np.tile(v, (8,) + (1,) * (v.ndim - 1))
             for k, v in one.items()}

    # jit auto-sharding reference on one device
    jit_step = make_train_step(model, tx, donate=False)
    s_ref, m_ref = jit_step(state0, jax.tree.map(jnp.asarray, batch),
                            jax.random.PRNGKey(1))

    # explicit shard_map over 8 devices with SyncBN axis
    mesh = make_mesh(jax.devices(), data=8, space=1)
    with syncbn_axis("data"):
        sm_step = make_shard_map_train_step(model, tx, mesh)
        b8 = shard_batch(batch, mesh)
        s_sm, m_sm = sm_step(state0, b8, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_sm["loss"]),
                               rtol=1e-4, atol=1e-3)
    # batch stats synced (variance entries ~1.4: shard-wise moment
    # accumulation reorders the f32 sums)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.batch_stats),
                    jax.tree_util.tree_leaves(s_sm.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)

    # Update oracle, calibrated for f32 conditioning: gradients through ~90
    # train-mode BatchNorms are chaotically sensitive (verified: in float64
    # every meaningful gradient agrees to machine precision between the two
    # backends; in f32 the largest updates drift ~10%). A missing/mis-axed
    # collective produces O(8x) errors, so a 25% bound on the 20 largest
    # updates still catches every structural bug while tolerating noise.
    # Tensors with near-zero analytic gradients (biases feeding BN) are
    # excluded by taking the largest updates.
    entries = []
    for (path, p0), a, b in zip(
            jax.tree_util.tree_leaves_with_path(state0.params),
            jax.tree_util.tree_leaves(s_ref.params),
            jax.tree_util.tree_leaves(s_sm.params)):
        key = jax.tree_util.keystr(path)
        if "kernel" not in key:
            # bias/scale grads are pure sums with possible catastrophic
            # cancellation — magnitude ranking can select noise
            continue
        da = np.asarray(a) - np.asarray(p0)
        db = np.asarray(b) - np.asarray(p0)
        entries.append((float(np.abs(da).max()),
                        float(np.abs(da - db).max()), key))
    entries.sort(reverse=True)
    bad = [(p, d / s) for s, d, p in entries[:20] if d / s > 0.25]
    assert not bad, f"large-update mismatches: {bad}"
