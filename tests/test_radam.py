"""RAdam must reproduce the reference update rule
(/root/reference/radam.py:15-78) — verified against an independent numpy
implementation of the published RAdam math."""
import numpy as np

import jax
import jax.numpy as jnp

from saunet_tpu.train.optim import cosine_epoch_schedule, radam


def numpy_radam_step(p, g, m, v, t, lr=1e-3, b1=0.9, b2=0.999, eps=1e-8):
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    beta2_t = b2 ** t
    n_max = 2 / (1 - b2) - 1
    n_sma = n_max - 2 * t * beta2_t / (1 - beta2_t)
    if n_sma >= 5:
        step_size = lr * np.sqrt(
            (1 - beta2_t) * (n_sma - 4) / (n_max - 4) * (n_sma - 2) / n_sma
            * n_max / (n_max - 2)) / (1 - b1 ** t)
        p = p - step_size * m / (np.sqrt(v) + eps)
    else:
        step_size = lr / (1 - b1 ** t)
        p = p - step_size * m
    return p, m, v


def test_matches_numpy_reference_over_steps():
    rng = np.random.RandomState(0)
    p0 = rng.randn(7).astype(np.float32)
    grads = [rng.randn(7).astype(np.float32) for _ in range(12)]

    tx = radam(1e-3)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)

    p_ref, m, v = p0.astype(np.float64), np.zeros(7), np.zeros(7)
    for t, g in enumerate(grads, start=1):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        p_ref, m, v = numpy_radam_step(p_ref, g.astype(np.float64), m, v, t)
        np.testing.assert_allclose(np.asarray(params["w"]), p_ref,
                                   rtol=1e-5, atol=1e-6)


def test_early_steps_use_plain_momentum():
    # With b2=0.999, N_sma < 5 until step 5 — the un-rectified branch.
    tx = radam(1.0)
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    updates, state = tx.update(g, state, params)
    # step 1: plain branch: update = -lr * m / (1-b1) = -1.0 * 0.1/0.1 = -1
    np.testing.assert_allclose(np.asarray(updates["w"]), -np.ones(3),
                               rtol=1e-6)


def test_cosine_epoch_schedule():
    sched = cosine_epoch_schedule(base_lr=1.0, num_epoch=10,
                                  steps_per_epoch=16)
    assert float(sched(0)) == 1.0           # epoch 1 at base LR
    assert float(sched(15)) == 1.0          # still epoch 1
    e2 = 0.5 * (1 + np.cos(np.pi * 1 / 10))
    np.testing.assert_allclose(float(sched(16)), e2, rtol=1e-6)
    last = 0.5 * (1 + np.cos(np.pi * 9 / 10))
    np.testing.assert_allclose(float(sched(16 * 9)), last, rtol=1e-6)
