"""Oracle tests for concat_mode='fused' (ops/dense_block_train.py).

The fused block must be a drop-in for the chain block: identical variable
tree, matching forward values, matching updated batch statistics, and
matching gradients (params AND input) — the custom VJP re-derives the
BatchNorm batch-statistic correction terms, so gradient equality is the
load-bearing check. Pattern follows the reference's SyncBN oracle test
(/root/reference/lib/nn/modules/tests/test_sync_batchnorm.py): same input,
two implementations, assert closeness.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saunet_tpu.models.densenet import DenseBlock


def _tree_allclose(a, b, rtol, atol):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def setup():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 8, 64).astype(np.float32))
    chain = DenseBlock(3)
    fused = DenseBlock(3, concat_mode="fused")
    v = chain.init(jax.random.PRNGKey(0), x, True)
    return x, chain, fused, v


def test_variable_tree_matches(setup):
    x, chain, fused, v = setup
    vf = fused.init(jax.random.PRNGKey(0), x, True)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vf))
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(vf)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_forward_and_stats_match(setup):
    x, chain, fused, v = setup
    yc, mc = chain.apply(v, x, True, mutable=["batch_stats"])
    yf, mf = fused.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yc), np.asarray(yf),
                               rtol=1e-5, atol=1e-5)
    _tree_allclose(mc["batch_stats"], mf["batch_stats"], 1e-5, 1e-6)


def test_eval_forward_matches(setup):
    x, chain, fused, v = setup
    # non-trivial running stats: take one train step's worth
    _, m = chain.apply(v, x, True, mutable=["batch_stats"])
    v2 = {"params": v["params"], "batch_stats": m["batch_stats"]}
    np.testing.assert_allclose(
        np.asarray(chain.apply(v2, x, False)),
        np.asarray(fused.apply(v2, x, False)),
        rtol=1e-5, atol=1e-5)


def test_gradients_match(setup):
    x, chain, fused, v = setup

    def run(mod):
        def f(params, xx):
            y, _ = mod.apply(
                {"params": params,
                 "batch_stats": v["batch_stats"]}, xx, True,
                mutable=["batch_stats"])
            # weighted sum so every output channel has a distinct cotangent
            w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)
            return jnp.sum(y * jnp.sin(w))
        return jax.grad(f, argnums=(0, 1))(v["params"], x)

    gc, gf = run(chain), run(fused)
    _tree_allclose(gc[0], gf[0], 1e-4, 1e-4)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gf[1]),
                               rtol=1e-4, atol=1e-4)


def test_bf16_runs_and_finite():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 8, 64)).astype(jnp.bfloat16)
    fused = DenseBlock(2, dtype=jnp.bfloat16, concat_mode="fused")
    v = fused.init(jax.random.PRNGKey(0), x, True)

    def f(params):
        y, _ = fused.apply({"params": params,
                            "batch_stats": v["batch_stats"]}, x, True,
                           mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    val, grads = jax.value_and_grad(f)(v["params"])
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g, np.float32)).all()
               for g in jax.tree.leaves(grads))


def test_shard_map_axis_name_matches_global(setup):
    """Under shard_map with BN_AXIS_NAME set, per-shard stats pmean to the
    global-batch statistics: sharded fused == single-device chain on the
    same global batch (the SyncBN oracle of parallel/shard_map_step.py —
    per-shard grads of the mean loss, pmean'd over the axis)."""
    from jax.sharding import Mesh, PartitionSpec as P

    from saunet_tpu.utils.config import cfg

    x, chain, fused, v = setup
    xg = jnp.concatenate([x, x[::-1] * 0.5], axis=0)  # global batch of 4
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))

    def mean_loss(mod, params, xx):
        y, _ = mod.apply({"params": params,
                          "batch_stats": v["batch_stats"]}, xx, True,
                         mutable=["batch_stats"])
        return jnp.mean(y ** 2)

    old = cfg.MODEL.get("BN_AXIS_NAME", None)
    cfg.MODEL.BN_AXIS_NAME = "data"
    try:
        def per_shard(params, xx):
            val, gp = jax.value_and_grad(
                lambda p: mean_loss(fused, p, xx))(params)
            return jax.lax.pmean(val, "data"), jax.lax.pmean(gp, "data")

        gfn = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P("data")), out_specs=(P(), P()),
            check_vma=False)
        val_sh, gp_sh = gfn(v["params"], xg)
    finally:
        cfg.MODEL.BN_AXIS_NAME = old

    val, gp = jax.value_and_grad(
        lambda p: mean_loss(chain, p, xg))(v["params"])
    np.testing.assert_allclose(float(val), float(val_sh), rtol=1e-5)
    _tree_allclose(gp, gp_sh, 1e-4, 1e-4)
