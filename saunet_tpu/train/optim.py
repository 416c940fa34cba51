"""Optimizers: RAdam (optax-native), plus SGD/Adam parity and the cosine
epoch schedule.

RAdam matches the reference update rule exactly
(/root/reference/radam.py:15-78): rectified adaptive step with
N_sma threshold 5, falling back to bias-corrected momentum-SGD while the
variance estimate is unrectifiable. The reference's 10-slot step-size cache is
a CPU-side memoisation artifact — under jit the step-size expression is just
part of the compiled program, so no cache exists.

`create_optimizer` mirrors /root/reference/train.py:188-207 (sgd/adam/radam
selection; the reference's weight-decay split via `group_weight` is
honoured, though the reference runs RAdam with weight_decay=0).

`cosine_epoch_schedule` matches /root/reference/train.py:210-216: the LR is
constant within an epoch and scaled by 0.5*(1+cos(pi*(epoch-1)/num_epoch)),
with epoch 1 running at the base LR.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class RAdamState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    mu: optax.Updates
    nu: optax.Updates


def scale_by_radam(b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """Rectified Adam scaling. Produces the *negative-of-update direction
    times the rectified step size factor* (excluding lr)."""

    def init_fn(params):
        return RAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            nu=jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree.map(
            lambda m, g: b1 * m + (1 - b1) * g.astype(jnp.float32),
            state.mu, updates)
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu, updates)

        beta2_t = b2 ** t
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt(
            (1.0 - beta2_t)
            * (n_sma - 4.0) / (n_sma_max - 4.0)
            * (n_sma - 2.0) / n_sma
            * n_sma_max / (n_sma_max - 2.0)
        )
        bias1 = 1.0 - b1 ** t
        use_adaptive = n_sma >= 5.0
        # step sizes (without lr)
        adaptive_ss = rect / bias1
        plain_ss = 1.0 / bias1

        def scaled(m, v):
            adaptive = adaptive_ss * m / (jnp.sqrt(v) + eps)
            plain = plain_ss * m
            return jnp.where(use_adaptive, adaptive, plain)

        new_updates = jax.tree.map(scaled, mu, nu)
        return new_updates, RAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def radam(learning_rate, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0,
          weight_decay_mask=None) -> optax.GradientTransformation:
    chain = []
    if weight_decay:
        # Reference applies decoupled decay -wd*lr*p before the step
        # (/root/reference/radam.py:66-67).
        chain.append(optax.add_decayed_weights(weight_decay,
                                               mask=weight_decay_mask))
    chain.append(scale_by_radam(b1=b1, b2=b2, eps=eps))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


def plain_radam(learning_rate, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8, weight_decay: float = 0.0,
                weight_decay_mask=None) -> optax.GradientTransformation:
    """Un-buffered RAdam (the reference's PlainRAdam,
    /root/reference/radam.py:80-142 — whose broken super() call,
    SURVEY.md §2.7, is naturally not reproduced). Under jit the buffered and
    plain variants compile to the same program, so this is an alias with
    independent identity for API parity."""
    return radam(learning_rate, b1=b1, b2=b2, eps=eps,
                 weight_decay=weight_decay,
                 weight_decay_mask=weight_decay_mask)


def adamw(learning_rate, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 1e-2,
          weight_decay_mask=None) -> optax.GradientTransformation:
    """Decoupled-weight-decay Adam (the reference's AdamW,
    /root/reference/radam.py:145-207 — its undefined `amsgrad` bug not
    reproduced)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=weight_decay_mask),
        optax.adam(learning_rate, b1=b1, b2=b2, eps=eps),
    )


def decay_mask(params) -> dict:
    """True for conv/dense kernels, False for biases and norm scales —
    the `group_weight` split of /root/reference/train.py:166-185."""
    def is_kernel(path, _):
        return path[-1].key == "kernel"
    return jax.tree_util.tree_map_with_path(is_kernel, params)


def cosine_epoch_schedule(base_lr: float, num_epoch: int,
                          steps_per_epoch: int):
    """LR constant per epoch: base * 0.5*(1+cos(pi*(epoch-1)/num_epoch))."""
    def schedule(step):
        epoch0 = step // steps_per_epoch  # 0-indexed epoch
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch0 / num_epoch))
    return schedule


def create_optimizer(name: str, learning_rate, params=None,
                     beta1: float = 0.9, weight_decay: float = 1e-4,
                     ) -> optax.GradientTransformation:
    """sgd/adam/radam selection (reference train.py:188-207 semantics:
    SGD gets momentum+weight decay on kernels; Adam/RAdam run undecayed)."""
    name = name.lower()
    if name == "sgd":
        mask = decay_mask(params) if params is not None else None
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask),
            optax.sgd(learning_rate, momentum=beta1, nesterov=False),
        )
    if name == "adam":
        return optax.adam(learning_rate, b1=0.9, b2=0.999)
    if name == "radam":
        return radam(learning_rate, b1=0.9, b2=0.999)
    raise ValueError(
        "Invalid optimizer. Please try again with optimizer sgd, adam, or "
        f"radam (got {name!r}).")
