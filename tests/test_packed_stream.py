"""Packed shape-stream oracle tests: the lane-packed modules
(models/packed_stream.py) must match their dense counterparts exactly —
same parameter tree, same outputs, same BatchNorm statistics, same
gradients — under identical parameters."""
import numpy as np
import jax
import jax.numpy as jnp

from saunet_tpu.models.blocks import GatedSpatialConv, ResBasicBlock
from saunet_tpu.models.packed_stream import (
    PBatchNorm,
    PGatedSpatialConv,
    PResBasicBlock,
    packed_stream_worthwhile,
    stream_packs,
)
from saunet_tpu.models.saunet import SAUNet
from saunet_tpu.ops.packed import pack, unpack
from flax import linen as nn


def _rand(*shape, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32))


def test_stream_packs_chain():
    for w in (224, 256, 512, 64, 48, 250):
        pk = stream_packs(w)
        assert all(w % p == 0 for p in pk.values()), (w, pk)
        chain = [pk[64], pk[32], pk[16], pk[8], pk[1]]
        for a, b in zip(chain, chain[1:]):
            assert b % a == 0, (w, pk)  # each pack divides the next
        for c, p in pk.items():
            assert p * c <= 128
    assert stream_packs(224) == {64: 2, 32: 4, 16: 8, 8: 16, 1: 112}
    assert stream_packs(256) == {64: 2, 32: 4, 16: 8, 8: 16, 1: 128}
    assert stream_packs(225) == {64: 1, 32: 3, 16: 3, 8: 15, 1: 75}
    assert packed_stream_worthwhile(224)
    assert not packed_stream_worthwhile(13)


def test_pbatchnorm_matches_flax():
    x = _rand(4, 6, 16, 5, seed=1)
    dense = nn.BatchNorm(use_running_average=False, momentum=0.9,
                         epsilon=1e-5)
    v = dense.init(jax.random.PRNGKey(0), x)
    ref, mut = dense.apply(v, x, mutable=["batch_stats"])

    pbn = PBatchNorm(5)
    pv = {"params": v["params"], "batch_stats": v["batch_stats"]}
    got, pmut = pbn.apply(pv, [(pack(x, 2), 5, 2)], True,
                          mutable=["batch_stats"])
    np.testing.assert_allclose(unpack(got[0], 5), ref, rtol=1e-5, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        mut["batch_stats"], pmut["batch_stats"])

    # eval mode uses running stats
    ref_e = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                         use_running_average=True).apply(
        {"params": v["params"], "batch_stats": mut["batch_stats"]}, x)
    got_e = pbn.apply({"params": v["params"],
                       "batch_stats": pmut["batch_stats"]},
                      [(pack(x, 2), 5, 2)], False)
    np.testing.assert_allclose(unpack(got_e[0], 5), ref_e,
                               rtol=1e-5, atol=1e-5)


def test_pbatchnorm_split_parts():
    """BN over a channel-split part list == BN over the concatenated
    tensor (per-channel statistics are split-invariant)."""
    a = _rand(2, 4, 8, 3, seed=2)
    b = _rand(2, 4, 8, 1, seed=3)
    x = jnp.concatenate([a, b], axis=-1)
    dense = nn.BatchNorm(use_running_average=False, momentum=0.9,
                         epsilon=1e-5)
    v = dense.init(jax.random.PRNGKey(1), x)
    ref, mut = dense.apply(v, x, mutable=["batch_stats"])

    got, pmut = PBatchNorm(4).apply(
        v, [(pack(a, 2), 3, 2), (pack(b, 8), 1, 8)], True,
        mutable=["batch_stats"])
    np.testing.assert_allclose(unpack(got[0], 3), ref[..., :3],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(unpack(got[1], 1), ref[..., 3:],
                               rtol=1e-5, atol=1e-5)
    jax.tree.map(
        lambda p, q: np.testing.assert_allclose(p, q, rtol=1e-5, atol=1e-6),
        mut["batch_stats"], pmut["batch_stats"])


def test_presbasicblock_matches_dense():
    x = _rand(2, 8, 16, 16, seed=4)
    dense = ResBasicBlock(16)
    v = dense.init(jax.random.PRNGKey(2), x)
    ref, mut = dense.apply(v, x, True, mutable=["batch_stats"])

    packed = PResBasicBlock(16)
    got, pmut = packed.apply(v, pack(x, 8), 8, True,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(unpack(got, 16), ref, rtol=1e-4, atol=1e-4)
    jax.tree.map(
        lambda p, q: np.testing.assert_allclose(p, q, rtol=1e-4, atol=1e-5),
        mut["batch_stats"], pmut["batch_stats"])


def test_pgatedspatialconv_matches_dense():
    ss = _rand(2, 8, 16, 8, seed=5)
    cue = _rand(2, 8, 16, 1, seed=6)
    dense = GatedSpatialConv(8)
    v = dense.init(jax.random.PRNGKey(3), ss, cue)
    (ref_out, ref_a), mut = dense.apply(v, ss, cue, True,
                                        mutable=["batch_stats"])

    packed = PGatedSpatialConv(8, c_in=8)
    (got_out, got_a), pmut = packed.apply(
        v, pack(ss, 16), pack(cue, 16), 16, 16, True,
        mutable=["batch_stats"])
    np.testing.assert_allclose(unpack(got_out, 8), ref_out,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(unpack(got_a, 1), ref_a,
                               rtol=1e-4, atol=1e-4)
    jax.tree.map(
        lambda p, q: np.testing.assert_allclose(p, q, rtol=1e-4, atol=1e-5),
        mut["batch_stats"], pmut["batch_stats"])


def test_pgatedspatialconv_param_gradients_match():
    ss = _rand(1, 4, 8, 8, seed=7)
    cue = _rand(1, 4, 8, 1, seed=8)
    dense = GatedSpatialConv(8)
    v = dense.init(jax.random.PRNGKey(4), ss, cue)
    packed = PGatedSpatialConv(8, c_in=8)

    def loss_dense(p):
        (o, a), _ = dense.apply({"params": p,
                                 "batch_stats": v["batch_stats"]},
                                ss, cue, True, mutable=["batch_stats"])
        return jnp.sum(o ** 2) + jnp.sum(a ** 2)

    def loss_packed(p):
        (o, a), _ = packed.apply({"params": p,
                                  "batch_stats": v["batch_stats"]},
                                 pack(ss, 8), pack(cue, 8), 8, 8, True,
                                 mutable=["batch_stats"])
        return jnp.sum(o ** 2) + jnp.sum(a ** 2)

    gd = jax.grad(loss_dense)(v["params"])
    gp = jax.grad(loss_packed)(v["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4),
        gd, gp)


def _tiny_models():
    kw = dict(num_classes=4, edge_kernel="xla")
    return (SAUNet(stream_impl="xla", **kw),
            SAUNet(stream_impl="packed", **kw))


def test_saunet_packed_param_tree_identical():
    xla, packed = _tiny_models()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v_x = xla.init(jax.random.PRNGKey(5), x, True)
    v_p = packed.init(jax.random.PRNGKey(5), x, True)
    # identical structure AND identical values (same init paths/rng)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        v_x, v_p)


def test_saunet_packed_forward_matches_xla():
    xla, packed = _tiny_models()
    x = _rand(2, 32, 32, 3, seed=9)
    v = xla.init(jax.random.PRNGKey(6), x, True)
    (seg_r, edge_r), mut_r = xla.apply(v, x, True, mutable=["batch_stats"])
    (seg_p, edge_p), mut_p = packed.apply(v, x, True,
                                          mutable=["batch_stats"])
    np.testing.assert_allclose(seg_p, seg_r, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(edge_p, edge_r, rtol=1e-3, atol=1e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4),
        mut_r["batch_stats"], mut_p["batch_stats"])


def test_saunet_packed_eval_and_return_att():
    xla, packed = _tiny_models()
    x = _rand(1, 32, 32, 3, seed=10)
    v = xla.init(jax.random.PRNGKey(7), x, True)
    seg_r, edge_r, atts_r = xla.apply(v, x, False, True)
    seg_p, edge_p, atts_p = packed.apply(v, x, False, True)
    np.testing.assert_allclose(seg_p, seg_r, rtol=1e-3, atol=1e-3)
    assert len(atts_p) == len(atts_r) == 7
    for ar, ap in zip(atts_r, atts_p):
        assert ar.shape == ap.shape
        np.testing.assert_allclose(ap, ar, rtol=1e-3, atol=1e-3)


def test_dual_loss_packed_matches_dense():
    from saunet_tpu.train.losses import dual_loss, dual_loss_packed

    rs = np.random.RandomState(31)
    n, h, w, c = 3, 8, 16, 4
    seg = jnp.asarray(rs.randn(n, h, w, c).astype(np.float32) * 7)
    edge = jnp.asarray(rs.rand(n, h, w, 1).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, c, size=(n, h, w)))
    edge_t = jnp.asarray((rs.rand(n, h, w) > 0.7).astype(np.float32))

    for mask in (None, jnp.asarray([1.0, 1.0, 0.0])):
        ref_total, ref_parts = dual_loss(seg, edge, labels, edge_t,
                                         sample_mask=mask)
        got_total, got_parts = dual_loss_packed(
            pack(seg, 8), pack(edge, 16), labels, edge_t,
            num_classes=c, sample_mask=mask)
        np.testing.assert_allclose(got_total, ref_total, rtol=1e-5,
                                   atol=1e-5)
        for k in ref_parts:
            np.testing.assert_allclose(got_parts[k], ref_parts[k],
                                       rtol=1e-5, atol=1e-5, err_msg=k)


def test_train_outputs_packed_loss_matches_dense_path():
    """End-to-end: packed train_outputs + dual_loss_packed == dense
    __call__ + dual_loss under identical parameters."""
    from saunet_tpu.train.losses import dual_loss, dual_loss_packed

    xla, packed = _tiny_models()
    rs = np.random.RandomState(32)
    x = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 4, size=(2, 32, 32)))
    edge_t = jnp.asarray((rs.rand(2, 32, 32) > 0.8).astype(np.float32))
    v = xla.init(jax.random.PRNGKey(8), x, True)

    (seg_r, edge_r), _ = xla.apply(v, x, True, mutable=["batch_stats"])
    ref_total, _ = dual_loss(seg_r, edge_r, labels, edge_t)

    (seg_p, edge_p), _ = packed.apply(v, x, True, mutable=["batch_stats"],
                                      method="train_outputs")
    got_total, _ = dual_loss_packed(seg_p, edge_p, labels, edge_t)
    np.testing.assert_allclose(got_total, ref_total, rtol=2e-3, atol=2e-3)


def test_packed_train_step_runs():
    """make_train_step dispatches the packed loss path and produces
    finite metrics + updated state for a packed model."""
    import optax
    from saunet_tpu.train import create_train_state, make_train_step

    model = SAUNet(num_classes=4, edge_kernel="xla", stream_impl="packed")
    tx = optax.sgd(1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               input_shape=(1, 32, 32, 3))
    rs = np.random.RandomState(33)
    batch = {
        "image": jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32)),
        "label": jnp.asarray(rs.randint(0, 4, size=(2, 32, 32))),
        "edge": jnp.asarray((rs.rand(2, 32, 32) > 0.8)
                            .astype(np.float32)),
    }
    step = make_train_step(model, tx, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["acc"]))
    assert int(new_state.step) == 1
