"""On-device Canny-style edge operator.

The reference leaves the device mid-forward to run `cv2.Canny(img, 10, 100)`
per sample on the CPU (/root/reference/models/models.py:359-364) — a host
round-trip inside every training step. Here the whole operator is expressed in
XLA so it stays on-chip and fuses into the surrounding program:

    Sobel 3x3 -> L1 gradient magnitude -> direction-quantised non-maximum
    suppression -> double threshold (10/100) -> iterative hysteresis
    (fixed-point propagation of strong labels through weak pixels).

This is a deliberate, documented deviation: bit-exact Canny requires
data-dependent connected components; the learned 2->1 fusion conv (`cw`,
/root/reference/models/models.py:293,367) absorbs edge-operator differences
during training, so fidelity is gated on end metrics (see SURVEY.md §7).

Note the reference feeds `mean(x, ch).astype(uint8)` of a z-scored image —
mostly wrap-around noise. We instead rescale the float image to [0, 255]
per-sample before the operator (deviation documented in SURVEY.md §7).
Output is {0, 255} float like cv2.Canny, matching the scale the fusion conv
sees in the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SOBEL_X = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
SOBEL_Y = jnp.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]])


def _conv3x3(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 conv on NHW1, zero padding."""
    k = kernel.reshape(3, 3, 1, 1).astype(img.dtype)
    return jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift NHW1 by (dy, dx) with zero fill (neighbour lookup)."""
    return jnp.roll(x, shift=(dy, dx), axis=(1, 2)) * _shift_mask(x.shape, dy, dx, x.dtype)


def _shift_mask(shape, dy, dx, dtype):
    h, w = shape[1], shape[2]
    row = jnp.ones((h,), dtype)
    col = jnp.ones((w,), dtype)
    if dy > 0:
        row = row.at[:dy].set(0)
    elif dy < 0:
        row = row.at[dy:].set(0)
    if dx > 0:
        col = col.at[:dx].set(0)
    elif dx < 0:
        col = col.at[dx:].set(0)
    return (row[:, None] * col[None, :])[None, :, :, None]


def canny_edges(
    gray: jnp.ndarray,
    low: float = 10.0,
    high: float = 100.0,
    hysteresis_iters: int = 8,
) -> jnp.ndarray:
    """Canny-style edge map on NHW1 grayscale in [0, 255]. Returns {0,255} NHW1.

    `hysteresis_iters` bounds the strong-label propagation distance — a static
    unrolled fixed point instead of cv2's unbounded flood fill (XLA needs
    static control flow; 8 steps covers typical cardiac-edge gaps).
    """
    gray = gray.astype(jnp.float32)
    gx = _conv3x3(gray, SOBEL_X)
    gy = _conv3x3(gray, SOBEL_Y)
    mag = jnp.abs(gx) + jnp.abs(gy)  # cv2 default L1 norm

    # Direction-quantised non-maximum suppression: 4 bins by tan threshold.
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    tan225 = 0.4142135623730951
    tan675 = 2.414213562373095
    # bin 0: horizontal gradient (compare left/right)
    horiz = ay <= tan225 * ax
    vert = ay >= tan675 * ax
    diag = jnp.logical_and(~horiz, ~vert)
    same_sign = (gx * gy) >= 0
    n_l, n_r = _shift(mag, 0, -1), _shift(mag, 0, 1)
    n_u, n_d = _shift(mag, -1, 0), _shift(mag, 1, 0)
    n_ul, n_dr = _shift(mag, -1, -1), _shift(mag, 1, 1)
    n_ur, n_dl = _shift(mag, -1, 1), _shift(mag, 1, -1)

    keep_h = jnp.logical_and(mag >= n_l, mag >= n_r)
    keep_v = jnp.logical_and(mag >= n_u, mag >= n_d)
    keep_d1 = jnp.logical_and(mag >= n_ul, mag >= n_dr)  # 45°: same-sign grads
    keep_d2 = jnp.logical_and(mag >= n_ur, mag >= n_dl)  # 135°

    keep = jnp.where(
        horiz, keep_h,
        jnp.where(vert, keep_v, jnp.where(same_sign, keep_d1, keep_d2)),
    )
    nms = jnp.where(keep, mag, 0.0)

    strong = (nms > high).astype(jnp.float32)
    weak = (nms > low).astype(jnp.float32)

    def body(_, s):
        # Dilate strong by 3x3, clip to weak support.
        grown = jax.lax.reduce_window(
            s, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
        )
        return jnp.maximum(s, grown * weak)

    edges = jax.lax.fori_loop(0, hysteresis_iters, body, strong)
    return edges * 255.0


def image_to_gray255(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC image -> NHW1 grayscale rescaled to [0, 255] per sample.

    Replaces the reference's `mean(ch).astype(uint8)` cast
    (/root/reference/models/models.py:359) with a well-defined rescale.
    """
    g = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    lo = jnp.min(g, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(g, axis=(1, 2, 3), keepdims=True)
    return (g - lo) / (hi - lo + 1e-8) * 255.0
