"""Normalisation-layer indirection.

Capability parity with the reference's `Norm2d` + `cfg.MODEL.BNFUNC` switch
(/root/reference/models/norm.py:16-22, /root/reference/config.py:73-94):
every model block constructs its norm through this factory, and the global
config chooses the behaviour.

TPU semantics of the choices:
  * 'batchnorm' under SPMD jit already computes GLOBAL-batch statistics (the
    batch is one logical array; XLA inserts the cross-device reductions), so
    it IS SyncBN — the reference's whole thread-rendezvous machinery
    (lib/nn/modules/{comm,batchnorm,replicate}.py) has no equivalent here.
  * cfg.MODEL.BN_AXIS_NAME: set to a mesh axis name (e.g. 'data') when the
    step runs under `shard_map`, where per-shard tensors need an explicit
    `lax.pmean` over the axis — flax's BatchNorm(axis_name=...) does exactly
    that. Leave None under jit auto-sharding.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..utils.config import cfg


def batch_norm(train: bool, dtype: Any = jnp.float32,
               name: Optional[str] = None) -> nn.BatchNorm:
    """BatchNorm configured from the global config (momentum/eps/axis)."""
    axis_name = cfg.MODEL.get("BN_AXIS_NAME", None)
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=cfg.MODEL.BN_MOMENTUM,
        epsilon=cfg.MODEL.BN_EPS,
        dtype=dtype,
        axis_name=axis_name,
        name=name,
    )
