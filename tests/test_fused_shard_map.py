"""Fused Pallas encoder under shard_map on a multi-device 'data' mesh:
per-shard kernels (interpret mode on CPU) == the single-device fused
forward == the XLA eval forward. Eval has no cross-batch math, so shards
must be bitwise-independent of the mesh layout."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saunet_tpu.models import SAUNet
from saunet_tpu.parallel import make_mesh
from saunet_tpu.train import create_train_state, radam
from saunet_tpu.train.state import (
    _fused_forward,
    _fused_forward_sharded,
    _use_fused_encoder,
    make_infer_step,
)


@pytest.fixture(scope="module")
def setup():
    from saunet_tpu.utils.config import cfg

    model = SAUNet(num_classes=4, dtype=jnp.bfloat16, edge_kernel="xla")
    state = create_train_state(model, radam(1e-3), jax.random.PRNGKey(0),
                               input_shape=(1, 32, 32, 3))
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(8, 32, 32, 3).astype(np.float32))

    # Converge batch_stats to the real batch statistics (momentum 0 for
    # one train-mode apply): with fresh-init stats (mean 0 / var 1) the
    # eval forward is un-normalised and random-init activations explode
    # exponentially (|seg| ~ 1e5, where one bf16 ulp is ~1e3), drowning
    # any kernel-vs-XLA comparison in amplified rounding.
    prev = cfg.MODEL.BN_MOMENTUM
    cfg.MODEL.BN_MOMENTUM = 0.0
    try:
        _, mut = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=True, mutable=["batch_stats"])
    finally:
        cfg.MODEL.BN_MOMENTUM = prev
    state = state.replace(batch_stats=mut["batch_stats"])
    return model, state, images


def test_sharded_fused_matches_single_device(setup):
    model, state, images = setup
    seg1, edge1 = _fused_forward(model, state, images, interpret=True)

    mesh = make_mesh(jax.devices(), data=8, space=1)
    segN, edgeN = _fused_forward_sharded(model, state, images, mesh,
                                         interpret=True)
    # per-shard batch is 1 vs 8 unsharded: XLA fuses the bf16 decode
    # differently per batch size, so agreement is to bf16 rounding, not
    # bitwise
    seg1 = np.asarray(seg1, np.float32)
    tol = 0.01 * max(np.abs(seg1).max(), 1e-3)
    np.testing.assert_allclose(np.asarray(segN, np.float32), seg1,
                               rtol=0, atol=tol)
    np.testing.assert_allclose(np.asarray(edgeN, np.float32),
                               np.asarray(edge1, np.float32),
                               rtol=0, atol=1e-2)


def test_sharded_fused_matches_xla_forward(setup):
    """Sanity vs the XLA forward: at random init the eval decoder
    amplifies bf16 encoder rounding chaotically (no normalisation against
    drift in eval mode), so elementwise logit comparison is meaningless —
    assert prediction agreement instead. (Encoder-tap numerics vs XLA are
    tightly tested in test_dense_block_kernel.py; end-to-end agreement at
    trained weights measured 97.2% on hardware, README perf table.)"""
    model, state, images = setup
    ref_seg, ref_edge = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        images, train=False)

    mesh = make_mesh(jax.devices(), data=8, space=1)
    seg, edge = _fused_forward_sharded(model, state, images, mesh,
                                       interpret=True)
    agree = np.mean(np.argmax(np.asarray(seg, np.float32), -1)
                    == np.argmax(np.asarray(ref_seg, np.float32), -1))
    assert agree > 0.8, agree
    ediff = np.abs(np.asarray(edge, np.float32)
                   - np.asarray(ref_edge, np.float32))
    assert ediff.mean() < 0.01, ediff.mean()
    assert (ediff > 0.25).mean() < 0.01, (ediff > 0.25).mean()


def test_infer_step_dispatches_sharded(setup):
    model, state, images = setup
    mesh = make_mesh(jax.devices(), data=4, space=2)
    # space>1: the kernel owns whole images -> no fused dispatch
    assert not _use_fused_encoder(model, "auto", mesh)
    mesh = make_mesh(jax.devices(), data=8, space=1)
    # CPU backend still gates 'auto' off; forcing works through infer
    infer = make_infer_step(model, fused_encoder=True, mesh=mesh,
                            interpret=True, with_probs=True,
                            with_edge=True)
    probs, preds, edge = infer(state, images)
    assert probs.shape == (8, 32, 32, 4)
    assert preds.shape == (8, 32, 32)
    assert np.isfinite(np.asarray(probs, np.float32)).all()
