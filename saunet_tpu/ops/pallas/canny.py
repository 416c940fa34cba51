"""Fused Canny-style edge kernel (Pallas, TPU).

The XLA reference implementation (saunet_tpu.ops.edge.canny_edges) lowers to
~30 elementwise/conv/reduce-window HLOs; the hysteresis loop in particular
re-round-trips HBM every iteration. This kernel keeps one image resident in
VMEM for the whole pipeline — Sobel, L1 magnitude, direction-quantised NMS,
double threshold, and the unrolled hysteresis propagation — writing HBM once.

Grid: one program per batch element; block = the full (H, W) image
(256² f32 = 256 KiB; all live buffers fit comfortably in ~16 MiB VMEM).
All ops are VPU elementwise/shift work. Numerics match `canny_edges`
bit-for-bit (asserted by tests/test_pallas_canny.py, interpret mode on CPU).

Replaces the reference's per-forward CPU round trip to cv2.Canny
(/root/reference/models/models.py:359-364).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift (H, W) by (dy, dx) with zero fill — pure VPU (roll + mask).

    Roll only the nonzero axes: a zero-shift roll lowers to a zero-size
    slice in Mosaic ('vector types must have positive constant sizes')."""
    h, w = x.shape
    out = x
    if dy != 0:
        out = jnp.roll(out, shift=dy, axis=0)
    if dx != 0:
        out = jnp.roll(out, shift=dx, axis=1)
    if dy != 0:
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        out = jnp.where(rows >= dy if dy > 0 else rows < h + dy, out, 0.0)
    if dx != 0:
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        out = jnp.where(cols >= dx if dx > 0 else cols < w + dx, out, 0.0)
    return out


def _canny_kernel(low: float, high: float, iters: int,
                  gray_ref, out_ref):
    g = gray_ref[0].astype(jnp.float32)

    # Sobel via shifted adds (zero boundary, = conv SAME zero padding).
    # _shift(g, dy, dx) holds g[y-dy, x-dx]; kernel tap (ky, kx) in a 3x3
    # correlation reads g[y+ky, x+kx] -> shift by (-ky, -kx).
    n = _shift(g, 1, 0)    # g[y-1, x]
    s = _shift(g, -1, 0)   # g[y+1, x]
    e = _shift(g, 0, -1)   # g[y, x+1]
    w_ = _shift(g, 0, 1)   # g[y, x-1]
    ne = _shift(g, 1, -1)
    nw = _shift(g, 1, 1)
    se = _shift(g, -1, -1)
    sw = _shift(g, -1, 1)

    gx = (ne + 2.0 * e + se) - (nw + 2.0 * w_ + sw)
    gy = (sw + 2.0 * s + se) - (nw + 2.0 * n + ne)
    mag = jnp.abs(gx) + jnp.abs(gy)

    ax, ay = jnp.abs(gx), jnp.abs(gy)
    tan225 = 0.4142135623730951
    tan675 = 2.414213562373095
    horiz = ay <= tan225 * ax
    vert = ay >= tan675 * ax
    same_sign = (gx * gy) >= 0

    m_l, m_r = _shift(mag, 0, 1), _shift(mag, 0, -1)
    m_u, m_d = _shift(mag, 1, 0), _shift(mag, -1, 0)
    m_ul, m_dr = _shift(mag, 1, 1), _shift(mag, -1, -1)
    m_ur, m_dl = _shift(mag, 1, -1), _shift(mag, -1, 1)

    # float {0,1} keep masks: Mosaic doesn't lower boolean-vector selects
    # ('unsupported target bitwidth for truncation'), so select between f32.
    keep_h = ((mag >= m_l) & (mag >= m_r)).astype(jnp.float32)
    keep_v = ((mag >= m_u) & (mag >= m_d)).astype(jnp.float32)
    keep_d1 = ((mag >= m_ul) & (mag >= m_dr)).astype(jnp.float32)
    keep_d2 = ((mag >= m_ur) & (mag >= m_dl)).astype(jnp.float32)

    keep = jnp.where(horiz, keep_h,
                     jnp.where(vert, keep_v,
                               jnp.where(same_sign, keep_d1, keep_d2)))
    nms = mag * keep

    strong = (nms > high).astype(jnp.float32)
    weak = (nms > low).astype(jnp.float32)

    def body(_, s_):
        grown = jnp.maximum(s_, jnp.maximum(
            jnp.maximum(_shift(s_, 1, 0), _shift(s_, -1, 0)),
            jnp.maximum(_shift(s_, 0, 1), _shift(s_, 0, -1))))
        grown = jnp.maximum(grown, jnp.maximum(
            jnp.maximum(_shift(s_, 1, 1), _shift(s_, 1, -1)),
            jnp.maximum(_shift(s_, -1, 1), _shift(s_, -1, -1))))
        return jnp.maximum(s_, grown * weak)

    edges = jax.lax.fori_loop(0, iters, body, strong)
    out_ref[0] = edges * 255.0


@functools.partial(jax.jit, static_argnames=("low", "high",
                                             "hysteresis_iters",
                                             "interpret"))
def canny_edges_pallas(gray: jnp.ndarray, low: float = 10.0,
                       high: float = 100.0, hysteresis_iters: int = 8,
                       interpret: bool = False) -> jnp.ndarray:
    """NHW1 grayscale [0,255] -> {0,255} NHW1 edges. Pallas-fused."""
    x = gray[..., 0] if gray.ndim == 4 else gray  # (N, H, W)
    n, h, w = x.shape
    kernel = functools.partial(_canny_kernel, low, high, hysteresis_iters)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32))
    return out[..., None]
