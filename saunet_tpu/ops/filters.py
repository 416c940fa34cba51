"""Small image-filter ops.

Capability parity with /root/reference/models/custom_functions.py:22-176 —
with one deliberate upgrade: the reference STUBS most of these
(gradient_central_diff returns its input at custom_functions.py:39, convTri
returns its input at :93); here they are real implementations, since real
gradients/triangle filters are what the shape-stream literature intends.
Only `conv2d_same` is live in the reference (via Conv2dPad,
GSConv.py:65-67).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def conv2d_same(x: jnp.ndarray, kernel: jnp.ndarray,
                feature_group_count: int = 1) -> jnp.ndarray:
    """SAME-padded 2D conv; x NHWC, kernel HWIO."""
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count)


def gradient_central_diff(x: jnp.ndarray):
    """(d/dx, d/dy) central differences of NHWC (replicated-edge)."""
    pad_w = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    pad_h = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    dx = (pad_w[:, :, 2:] - pad_w[:, :, :-2]) * 0.5
    dy = (pad_h[:, 2:] - pad_h[:, :-2]) * 0.5
    return dx, dy


def triangle_kernel(r: int) -> np.ndarray:
    """1D triangle filter of radius r, normalised (Piotr Dollar's convTri)."""
    k = np.concatenate([np.arange(1, r + 2), np.arange(r, 0, -1)]
                       ).astype(np.float32)
    return k / k.sum()


def conv_tri(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Separable triangle blur on NHWC (real implementation of the
    reference's stubbed convTri)."""
    if r <= 0:
        return x
    k = jnp.asarray(triangle_kernel(r))
    c = x.shape[-1]
    kv = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kh = jnp.tile(k.reshape(1, -1, 1, 1), (1, 1, 1, c))
    x = conv2d_same(x, kv, feature_group_count=c)
    return conv2d_same(x, kh, feature_group_count=c)


def gradient_magnitude_and_normal(x: jnp.ndarray, blur_radius: int = 4):
    """(magnitude, unit-normal) of the image gradient after a triangle blur
    — the edge-normal computation the reference's compute_grad_mag/
    compute_normal sketch (custom_functions.py:96-176)."""
    s = conv_tri(x, blur_radius)
    dx, dy = gradient_central_diff(s)
    mag = jnp.sqrt(dx * dx + dy * dy + 1e-12)
    return mag, jnp.stack([dx / mag, dy / mag], axis=-1)
