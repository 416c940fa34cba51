"""Explicit-collective data-parallel train step via `jax.shard_map`.

The jit auto-sharding step (train/state.py) is the default backend: the
compiler sees global arrays and inserts collectives. This module is the
*explicit* backend — per-shard tensors with hand-placed collectives — for
users who want manual control of the communication schedule (and as living
documentation of what the auto path does):

  * gradients:       `lax.pmean` over the 'data' axis — the role of the
                     reference's DataParallel gradient reduction.
  * batch-norm:      flax BatchNorm(axis_name='data') pmeans the batch
                     statistics — exactly what SynchronizedBatchNorm's
                     thread rendezvous + ReduceAddCoalesced/Broadcast
                     computes (/root/reference/lib/nn/modules/
                     batchnorm.py:98-117, comm.py:96-127).
  * metrics:         pmean'd scalars.

Requires `cfg.MODEL.BN_AXIS_NAME = 'data'` while the model is traced (set
temporarily inside `make_shard_map_train_step`).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..train.losses import DEFAULT_CLASS_WEIGHTS, dual_loss
from ..train.metrics import pixel_acc
from ..utils.config import cfg


def make_shard_map_train_step(model, tx: optax.GradientTransformation,
                              mesh: Mesh, num_class: int = 4,
                              class_weights=DEFAULT_CLASS_WEIGHTS,
                              augment_fn: Optional[Callable] = None,
                              axis: str = "data"):
    """Build a jitted shard_map step: batch sharded over `axis`, state
    replicated. The returned function has the same signature/semantics as
    make_train_step's."""

    def per_shard_step(state, batch, rng):
        if augment_fn is not None:
            # fold the shard index into the rng so shards draw distinct
            # augmentations
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            batch = augment_fn(rng, batch)

        def loss_fn(params, batch_stats):
            (seg, edge), mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
            )
            total, parts = dual_loss(seg, edge, batch["label"],
                                     batch["edge"], class_weights)
            return total, (mut["batch_stats"], seg, parts)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, seg, parts)), grads = grad_fn(
            state.params, state.batch_stats)

        # explicit gradient all-reduce over ICI
        grads = jax.lax.pmean(grads, axis)
        # batch_stats were already axis-synced by BatchNorm(axis_name), but
        # pmean is a no-op-safe guard against per-shard drift
        new_stats = jax.lax.pmean(new_stats, axis)

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)

        preds = jnp.argmax(seg, axis=-1)
        acc, jaccard = pixel_acc(preds, batch["label"], num_class)
        metrics = {k: jax.lax.pmean(v, axis) for k, v in parts.items()}
        metrics["acc"] = jax.lax.pmean(acc, axis)
        metrics["jaccard"] = jax.lax.pmean(jaccard, axis)

        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt_state)
        return new_state, metrics

    batch_spec = {"image": P(axis), "label": P(axis), "edge": P(axis)}
    sharded = jax.shard_map(
        per_shard_step, mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


class syncbn_axis:
    """Context manager setting cfg.MODEL.BN_AXIS_NAME during model tracing."""

    def __init__(self, axis: str = "data"):
        self.axis = axis
        self.prev = None

    def __enter__(self):
        self.prev = cfg.MODEL.get("BN_AXIS_NAME", None)
        cfg.MODEL.BN_AXIS_NAME = self.axis
        return self

    def __exit__(self, *exc):
        cfg.MODEL.BN_AXIS_NAME = self.prev
        return False
