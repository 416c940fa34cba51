"""Round-2 behavioural fixes: padded-eval loss masking and --fix_bn.

Mask contract: the loss reported on a padded batch (last val batch repeats
the final slice, cli/train.py evaluate) must equal the loss over the real
samples only. fix_bn contract (/root/reference/train.py fine-tune surface):
batch statistics are frozen during training steps; parameters still learn.
"""
import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from saunet_tpu.train.losses import dual_loss
from saunet_tpu.train.state import create_train_state, make_train_step


def _rand_batch(rs, n, h=8, w=8, c=4):
    seg = jnp.asarray(rs.randn(n, h, w, c).astype(np.float32))
    edge = jax.nn.sigmoid(jnp.asarray(rs.randn(n, h, w, 1)
                                      .astype(np.float32)))
    lab = jnp.asarray(rs.randint(0, c, size=(n, h, w)).astype(np.int32))
    edge_t = jnp.asarray((rs.rand(n, h, w, 1) > 0.8).astype(np.float32))
    return seg, edge, lab, edge_t


def test_sample_mask_removes_padding_bias():
    rs = np.random.RandomState(0)
    seg, edge, lab, edge_t = _rand_batch(rs, 5)

    # padded batch: last 2 samples are repeats of sample 2 (junk w.r.t.
    # the real set); mask them out
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    total_masked, parts_masked = dual_loss(seg, edge, lab, edge_t,
                                           sample_mask=mask)
    total_real, parts_real = dual_loss(seg[:3], edge[:3], lab[:3],
                                       edge_t[:3])
    np.testing.assert_allclose(float(total_masked), float(total_real),
                               rtol=1e-5)
    for k in ("ce", "dice", "edge"):
        np.testing.assert_allclose(float(parts_masked[k]),
                                   float(parts_real[k]), rtol=1e-5)


def test_all_ones_mask_is_identity():
    rs = np.random.RandomState(1)
    seg, edge, lab, edge_t = _rand_batch(rs, 3)
    t_mask, _ = dual_loss(seg, edge, lab, edge_t,
                          sample_mask=jnp.ones(3))
    t_plain, _ = dual_loss(seg, edge, lab, edge_t)
    np.testing.assert_allclose(float(t_mask), float(t_plain), rtol=1e-6)


class _TinyDual(nn.Module):
    """Minimal (seg, edge) model with one BatchNorm — enough to observe
    batch_stats freezing without compiling SAUNet."""
    num_classes: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.Conv(8, (3, 3), padding="SAME")(x)
        h = nn.BatchNorm(use_running_average=not train,
                         momentum=0.9)(h)
        h = nn.relu(h)
        seg = nn.Conv(self.num_classes, (1, 1))(h)
        edge = nn.sigmoid(nn.Conv(1, (1, 1))(h))
        return seg, edge


def _tiny_setup(fix_bn):
    model = _TinyDual()
    tx = optax.sgd(1e-2)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               input_shape=(1, 8, 8, 3))
    step = make_train_step(model, tx, fix_bn=fix_bn, donate=False)
    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.randn(4, 8, 8, 3).astype(np.float32)),
        "label": jnp.asarray(rs.randint(0, 4, (4, 8, 8)).astype(np.int32)),
        "edge": jnp.asarray((rs.rand(4, 8, 8, 1) > 0.8)
                            .astype(np.float32)),
    }
    return state, step, batch


def test_fix_bn_freezes_batch_stats():
    state, step, batch = _tiny_setup(fix_bn=True)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params (incl. BN affine) still learn
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(jax.tree.leaves(state.params),
                             jax.tree.leaves(new_state.params))]
    assert max(diffs) > 0


def test_buffer_concat_matches_chain():
    """DenseBlock concat_mode='buffer' (in-place dynamic-update-slice
    concat buffer) must equal the textbook concatenate chain: identical
    param tree, bit-identical forward/batch stats; grads equal up to
    cotangent summation order (slice-of-buffer accumulates fan-out adds
    in a different association than the concat chain)."""
    from saunet_tpu.models.densenet import DenseBlock

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 8, 64).astype(np.float32))
    chain = DenseBlock(3)
    buffer = DenseBlock(3, concat_mode="buffer")
    v = chain.init(jax.random.PRNGKey(0), x, True)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                buffer.init(jax.random.PRNGKey(0), x, True)))

    # eval forward: exact
    np.testing.assert_array_equal(
        np.asarray(chain.apply(v, x, False)),
        np.asarray(buffer.apply(v, x, False)))

    # train forward + new batch stats + input grads: exact
    def run(mod):
        def f(xx):
            y, mut = mod.apply(v, xx, True, mutable=["batch_stats"])
            return jnp.sum(y ** 2), mut["batch_stats"]
        (val, stats), grad = jax.value_and_grad(f, has_aux=True)(x)
        return val, stats, grad

    v1, s1, g1 = run(chain)
    v2, s2, g2 = run(buffer)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


def test_default_step_updates_batch_stats():
    state, step, batch = _tiny_setup(fix_bn=False)
    new_state, _ = step(state, batch, jax.random.PRNGKey(1))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.batch_stats),
                        jax.tree.leaves(new_state.batch_stats)))
    assert changed
