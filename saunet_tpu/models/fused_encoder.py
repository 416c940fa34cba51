"""Eval/inference DenseNet-121 encoder with fused Pallas dense blocks.

Drives the same parameter pytree as `DenseNetEncoder` (checkpoints are
interchangeable) but computes each dense block with the VMEM-resident
Pallas kernel (ops/pallas/dense_block.py) instead of L separate
concat-and-conv programs; conv0/norm0 and the transitions stay XLA (they
are single convs — XLA already does them at speed of light).

Used by `make_infer_step`/`make_eval_step` via
`model.apply(vars, taps, x, method=SAUNet.decode)`. Eval only: training
needs batch statistics + autodiff, which keep the XLA path.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.config import cfg
from .densenet import DENSENET121_BLOCKS

Array = jnp.ndarray


def _bn_affine(x: Array, p: Dict[str, Array], s: Dict[str, Array],
               eps: float) -> Array:
    a = p["scale"] * jax.lax.rsqrt(s["var"] + eps)
    b = p["bias"] - s["mean"] * a
    return x * a.astype(x.dtype) + b.astype(x.dtype)


def _dense_block_xla(h: Array, bp: Dict[str, Any], bs: Dict[str, Any],
                     num_layers: int, eps: float, dtype) -> Array:
    """Eval-mode dense block via plain XLA convs (BN folded from running
    stats) — the fallback when no Pallas band configuration fits VMEM or
    satisfies the kernel's DMA alignment contract."""
    dn = ("NHWC", "HWIO", "NHWC")
    for l in range(num_layers):
        lp, ls = bp[f"denselayer{l + 1}"], bs[f"denselayer{l + 1}"]
        u = jax.nn.relu(_bn_affine(h, lp["norm1"], ls["norm1"], eps))
        t = jax.lax.conv_general_dilated(
            u, lp["conv1"]["kernel"].astype(dtype), (1, 1), "VALID",
            dimension_numbers=dn)
        t = jax.nn.relu(_bn_affine(t, lp["norm2"], ls["norm2"], eps))
        new = jax.lax.conv_general_dilated(
            t, lp["conv2"]["kernel"].astype(dtype), (1, 1), "SAME",
            dimension_numbers=dn)
        h = jnp.concatenate([h, new], axis=-1)
    return h


def encoder_apply_fused(params: Dict[str, Any], stats: Dict[str, Any],
                        x: Array, dtype=jnp.bfloat16,
                        interpret: bool = False
                        ) -> Tuple[Array, Array, Array, Array, Array]:
    """(N, H, W, 3) -> the five SAUNet feature taps (f1..f5), eval mode.

    Numerically matches `DenseNetEncoder.apply(..., train=False)` up to
    bf16 accumulation order inside the fused blocks.
    """
    from ..ops.pallas.dense_block import dense_block_fused, pick_band_rows

    eps = cfg.MODEL.BN_EPS
    x = x.astype(dtype)

    f1 = jax.lax.conv_general_dilated(
        x, params["conv0"]["kernel"].astype(dtype), (2, 2),
        [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    f1 = _bn_affine(f1, params["norm0"], stats["norm0"], eps)

    h = f1
    taps = []
    for i, num_layers in enumerate(DENSENET121_BLOCKS):
        bp = params[f"denseblock{i + 1}"]
        bs = stats[f"denseblock{i + 1}"]
        band = pick_band_rows(h.shape[1], h.shape[2], h.shape[3],
                              num_layers)
        if band is None:
            # no band fits VMEM / satisfies alignment: whole-map mode would
            # be the configuration already known not to fit, so use XLA
            h = _dense_block_xla(h, bp, bs, num_layers, eps, dtype)
        else:
            h = dense_block_fused(
                h, bp, bs, num_layers=num_layers, eps=eps,
                band_rows=None if band == h.shape[1] else band,
                interpret=interpret,
            ).astype(dtype)  # kernel emits bf16; keep f32 models consistent
        if i != len(DENSENET121_BLOCKS) - 1:
            tp = params[f"transition{i + 1}"]
            ts = stats[f"transition{i + 1}"]
            t = _bn_affine(h, tp["norm"], ts["norm"], eps)
            t = jax.nn.relu(t)
            t = jax.lax.conv_general_dilated(
                t, tp["conv"]["kernel"].astype(dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = nn.avg_pool(t, (2, 2), strides=(2, 2))
            taps.append(h)
    f5 = _bn_affine(h, params["norm5"], stats["norm5"], eps)
    f2, f3, f4 = taps
    return f1, f2, f3, f4, f5
