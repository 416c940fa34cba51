"""Selectable global pooling (capability of
/root/reference/models/adaptive_avgmax_pool.py:19-75): 'avg', 'max',
'avgmax' (mean of both), 'catavgmax' (channel concat)."""
from __future__ import annotations

import jax.numpy as jnp


def adaptive_pool2d(x: jnp.ndarray, pool_type: str = "avg",
                    keepdims: bool = True) -> jnp.ndarray:
    """Global pooling over H, W of an NHWC tensor."""
    if pool_type == "avg":
        out = jnp.mean(x, axis=(1, 2), keepdims=keepdims)
    elif pool_type == "max":
        out = jnp.max(x, axis=(1, 2), keepdims=keepdims)
    elif pool_type == "avgmax":
        out = 0.5 * (jnp.mean(x, axis=(1, 2), keepdims=keepdims)
                     + jnp.max(x, axis=(1, 2), keepdims=keepdims))
    elif pool_type == "catavgmax":
        out = jnp.concatenate(
            [jnp.mean(x, axis=(1, 2), keepdims=keepdims),
             jnp.max(x, axis=(1, 2), keepdims=keepdims)], axis=-1)
    else:
        raise ValueError(f"Invalid pool type: {pool_type}")
    return out


def pooling_factor(pool_type: str = "avg") -> int:
    """Channel multiplier of the pooling output (catavgmax doubles)."""
    return 2 if pool_type == "catavgmax" else 1
