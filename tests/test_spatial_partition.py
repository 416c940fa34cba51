"""Spatial-partition ('space' axis) oracle tests.

The 'space' mesh axis shards the image H dimension — the conv-net analogue
of sequence/context parallelism (SURVEY.md §2.3 "absent strategies" row,
parallel/mesh.py). XLA's spatial partitioner must insert halo exchanges at
shard boundaries for every conv; these tests verify that against the
single-device oracle, the pattern of the reference's SyncBN two-GPU test
(/root/reference/lib/nn/modules/tests/test_sync_batchnorm.py:44-65).

Envelope note (found while building these tests): with exactly ONE row per
'space' shard, XLA's GSPMD partitioner miscompiles the BACKWARD of the
DenseNet fan-out pattern `concat([x, conv3x3(x)])` — encoder gradients come
back orders of magnitude wrong while the loss stays correct, and the error
compounds per dense layer (observed 1e12 relative at denseblock4 on a 32²
input with space=2). Two rows per shard is exact for every pattern in the
model. `parallel.mesh.validate_spatial_partition` enforces that envelope;
these tests run inside it and `test_one_row_shard_bug_is_guarded` pins the
boundary.

A second, *inherent* seed of divergence is the Canny edge cue: its
threshold/NMS comparisons are discrete, so reduction-order fp noise under
sharding can flip tie pixels (constant-intensity rows tie by construction).
That is a property of any Canny (cv2 included), is stop-gradiented like the
reference's detach, and is excluded here by configuring unreachable
thresholds (deterministic all-zero edge map) so the oracle isolates the
partitioner itself.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from saunet_tpu.models import SAUNet
from saunet_tpu.models.densenet import DenseBlock
from saunet_tpu.parallel import (
    make_mesh,
    shard_batch,
    validate_spatial_partition,
)
from saunet_tpu.train import create_train_state, make_train_step


def _stripe_image(n, h, w, c, boundaries, seed=3):
    """Random image with high-contrast single-row stripes ON the shard
    boundaries: a 3x3 conv output at rows b-1/b/b+1 then depends on rows
    owned by the neighbouring shard, so any halo-exchange defect (e.g.
    zero-filled edges) shows up as a large mismatch, not a rounding one."""
    rs = np.random.RandomState(seed)
    img = rs.randn(n, h, w, c).astype(np.float32) * 0.1
    for b in boundaries:
        img[:, b - 1] = 2.0
        img[:, b] = -2.0
    return img


def test_conv_halo_exchange_stripe_oracle():
    """Two chained 3x3 convs (receptive field 5: crosses a shard boundary
    twice) sharded H-over-'space' == unsharded, on a boundary-stripe
    image."""
    mesh = make_mesh(jax.devices(), data=1, space=8)
    h = 64
    x = _stripe_image(1, h, 64, 3, boundaries=[h // 8 * i
                                               for i in range(1, 8)])
    k1 = jnp.asarray(np.random.RandomState(0).randn(3, 3, 3, 8)
                     .astype(np.float32))
    k2 = jnp.asarray(np.random.RandomState(1).randn(3, 3, 8, 4)
                     .astype(np.float32))

    def f(x):
        dn = ("NHWC", "HWIO", "NHWC")
        y = jax.lax.conv_general_dilated(x, k1, (1, 1), "SAME",
                                         dimension_numbers=dn)
        y = jax.nn.relu(y)
        return jax.lax.conv_general_dilated(y, k2, (1, 1), "SAME",
                                            dimension_numbers=dn)

    ref = jax.jit(f)(jnp.asarray(x))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "space", None,
                                                 None)))
    out = jax.jit(f)(xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # sanity: the stripes make boundary rows genuinely boundary-sensitive
    interior = np.asarray(ref)[:, 1:-1]
    assert np.abs(interior).max() > 1.0


def test_dense_block_space4_train_oracle():
    """The GSPMD-fragile pattern itself — a dense block (concat fan-out +
    3x3 halo + BatchNorm batch stats) — on a 2x4 (data x space) mesh with
    2 rows per shard: gradients, outputs and batch stats must match the
    single-device oracle."""
    rs = np.random.RandomState(0)
    x = rs.randn(4, 8, 8, 256).astype(np.float32)
    block = DenseBlock(8)
    v = block.init(jax.random.PRNGKey(0), jnp.asarray(x), True)

    def loss(params, stats, xx):
        out, mut = block.apply({"params": params, "batch_stats": stats},
                               xx, True, mutable=["batch_stats"])
        return jnp.sum(out ** 2) / out.size, mut["batch_stats"]

    g = jax.jit(jax.value_and_grad(loss, has_aux=True))
    (l1, s1), g1 = g(v["params"], v["batch_stats"], jnp.asarray(x))

    mesh = make_mesh(jax.devices(), data=2, space=4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "space", None,
                                                 None)))
    (lN, sN), gN = g(v["params"], v["batch_stats"], xs)

    np.testing.assert_allclose(float(l1), float(lN), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gN)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=0,
                                   atol=1e-5 * max(np.abs(a).max(), 1.0))
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(sN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_one_row_shard_bug_is_guarded():
    """Pin the envelope: 1 row/shard of the deepest dense block is
    rejected by validate_spatial_partition (the regime where GSPMD
    miscompiles the dense-concat backward)."""
    validate_spatial_partition(64, 2)       # 2 rows/shard: ok
    validate_spatial_partition(256, 8)      # 2 rows/shard: ok
    validate_spatial_partition(256, 1)      # no spatial sharding: ok
    with pytest.raises(ValueError, match="rows"):
        validate_spatial_partition(32, 2)   # 1 row/shard
    with pytest.raises(ValueError, match="rows"):
        validate_spatial_partition(64, 4)


@pytest.fixture(scope="module")
def setup():
    import optax

    # unreachable canny thresholds -> deterministic zero edge cue (see
    # module docstring)
    model = SAUNet(num_classes=4, canny_low=1e8, canny_high=1e9)
    tx = optax.sgd(0.1)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               input_shape=(1, 64, 64, 3))
    step = make_train_step(model, tx, donate=False)
    rs = np.random.RandomState(11)
    batch = {
        "image": _stripe_image(8, 64, 64, 3, boundaries=[16, 32, 48]),
        "label": rs.randint(0, 4, size=(8, 64, 64)).astype(np.int32),
        "edge": (rs.rand(8, 64, 64, 1) > 0.8).astype(np.float32),
    }
    rng = jax.random.PRNGKey(2)
    s1, m1 = step(state, jax.tree.map(jnp.asarray, batch), rng)
    return state, step, batch, rng, s1, m1


def test_space2_train_step_matches_single_device(setup):
    """4x2 (data x space) full SAUNet train step vs single device, inside
    the validated envelope (64² -> 2 rows of denseblock4 per shard).

    Tolerances are CHAOS-BOUNDED, not fp-tight: at random init this
    121-layer net amplifies a 1e-6 input perturbation into ~1e-2 relative
    gradient changes on a SINGLE device (marginal ReLUs flip), so exact
    gradient equality across different reduction orders is unachievable at
    full depth — the reference faced the same physics and tested SyncBN on
    a 2-layer net (test_sync_batchnorm.py). Here the stable quantities are
    asserted (loss, forward batch statistics, boundedness of the update);
    exact per-gradient halo verification lives in the shallow oracles
    above."""
    state, step, batch, rng, s1, m1 = setup
    validate_spatial_partition(64, 2)
    mesh = make_mesh(jax.devices(), data=4, space=2)
    sN, mN = step(state, shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]),
                               rtol=2e-2)
    for k in ("ce", "dice", "edge"):
        np.testing.assert_allclose(float(m1[k]), float(mN[k]), rtol=2e-2)
    # forward batch statistics agree to chaos-noise level (a broken halo
    # zero-fills boundary rows -> means/vars shift at the 1e-1 level)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(sN.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-2)
    # the update stays finite and boundedly close: chaos noise moves
    # params by up to ~lr * grad-scale (~2 here); the 1-row-shard
    # backward bug moved them by ~1e4 — three orders of separation
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(sN.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() < 10.0, np.abs(a - b).max()
