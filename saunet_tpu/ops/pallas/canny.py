"""Fused Canny-style edge kernel (Pallas, TPU).

The XLA reference implementation (saunet_tpu.ops.edge.canny_edges) lowers to
~30 elementwise/conv/reduce-window HLOs; the hysteresis loop in particular
re-round-trips HBM every iteration. This kernel keeps one image resident in
VMEM for the whole pipeline — Sobel, L1 magnitude, direction-quantised NMS,
double threshold, and the unrolled hysteresis propagation — writing HBM once.

Grid: one program per batch element; block = the full (H, W) image
(256² f32 = 256 KiB; all live buffers fit comfortably in ~16 MiB VMEM).
All ops are VPU elementwise/shift work. Numerics match `canny_edges`
bit-for-bit in interpret mode (asserted by tests/test_pallas_canny.py); on
real hardware, Mosaic's fp contraction/excess precision flips ~0.2% of
pixels at the double-threshold comparisons — immaterial for an edge cue
that feeds a learned 2->1 fusion conv (the operator is itself a documented
approximation of cv2.Canny, see saunet_tpu.ops.edge).

For images whose working set exceeds VMEM (>~448²), `canny_edges_pallas_tiled`
processes halo'd row bands DMA'd from HBM — measured 243x faster than the
XLA lowering at 512²x8 (3.3 ms vs 803 ms; the XLA hysteresis loop
re-round-trips HBM through reduce_window every iteration).

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
    out_ref[0] = _canny_math(gray_ref[0].astype(jnp.float32),
                             low, high, iters)


def _canny_math(g: jnp.ndarray, low: float, high: float,
                iters: int, row_valid=None) -> jnp.ndarray:
    """The full Canny pipeline on one (H, W) f32 VMEM block.

    Shared by the whole-image kernel and the row-tiled kernel. `row_valid`
    (f32 {0,1}, broadcastable to (H, W)) marks rows inside the real image:
    the whole-image kernel's `_shift` zero-fills DERIVED tensors (mag,
    strong, weak) beyond the image, while a zero-padded band computes a
    synthetic Sobel response at the data/zero interface — zeroing `mag`
    outside the image makes every downstream stage bit-identical.
    """
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
    if row_valid is not None:
        mag = mag * row_valid

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
    return edges * 255.0


def _canny_tiled_kernel(low: float, high: float, iters: int,
                        halo: int, tile_rows: int, h_img: int,
                        hbm_ref, out_ref, scratch, sem):
    """One (tile_rows + 2*halo, W) row band: DMA in, compute, crop halo.

    The input stays in HBM/ANY (overlapping halo'd windows are not
    expressible as a BlockSpec partition); each program copies its band
    into VMEM scratch with an async DMA, runs the shared pipeline, and
    writes only the valid interior rows. halo = hysteresis_iters + 2
    (Sobel 1 + NMS 1 + one row per hysteresis step) makes the result
    bit-identical to the whole-image kernel.
    """
    n = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        hbm_ref.at[n, pl.ds(i * tile_rows, tile_rows + 2 * halo), :],
        scratch, sem)
    dma.start()
    dma.wait()
    band = tile_rows + 2 * halo
    w = scratch.shape[1]
    # padded-global row of each band row; real image rows are [halo, halo+H)
    rows = (i * tile_rows
            + jax.lax.broadcasted_iota(jnp.int32, (band, w), 0))
    row_valid = ((rows >= halo) & (rows < halo + h_img)).astype(jnp.float32)
    edges = _canny_math(scratch[:], low, high, iters, row_valid)
    out_ref[0] = jax.lax.slice_in_dim(edges, halo, halo + tile_rows, axis=0)


@functools.partial(jax.jit, static_argnames=("low", "high",
                                             "hysteresis_iters",
                                             "tile_rows", "interpret"))
def canny_edges_pallas_tiled(gray: jnp.ndarray, low: float = 10.0,
                             high: float = 100.0,
                             hysteresis_iters: int = 8,
                             tile_rows: int = 128,
                             interpret: bool = False) -> jnp.ndarray:
    """Row-tiled variant of `canny_edges_pallas` for images whose full
    working set exceeds VMEM (>~448²). Requires H % tile_rows == 0.

    Zero rows are padded top and bottom (the same zero boundary the
    whole-image kernel's `_shift` produces), so every band — including the
    first and last — sees exactly the context the untiled kernel sees,
    and the output is bit-identical to it at any tile_rows.
    """
    x = gray[..., 0] if gray.ndim == 4 else gray  # (N, H, W)
    n, h, w = x.shape
    if h % tile_rows:
        raise ValueError(f"H={h} not divisible by tile_rows={tile_rows}")
    if tile_rows % 8:
        raise ValueError(f"tile_rows={tile_rows} must be a multiple of 8 "
                         "(Mosaic DMA slices are sublane-tiled)")
    # minimum exact halo is hysteresis_iters + 2; round up to a multiple
    # of 4 so the DMA band (tile_rows + 2*halo) stays 8-row aligned
    halo = -(-(hysteresis_iters + 2) // 4) * 4
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (halo, halo), (0, 0)))
    kernel = functools.partial(_canny_tiled_kernel, low, high,
                               hysteresis_iters, halo, tile_rows, h)
    out = pl.pallas_call(
        kernel,
        grid=(n, h // tile_rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, tile_rows, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_rows + 2 * halo, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp)
    return out[..., None]


def pick_tile_rows(h: int, w: int, hysteresis_iters: int = 8,
                   vmem_budget_bytes: int = 12 * 1024 * 1024,
                   live_buffers: int = 20) -> int | None:
    """Largest 8-aligned divisor of H whose halo'd band fits the VMEM
    budget (~20 live (rows, W) f32 buffers through the pipeline), or
    None."""
    halo = -(-(hysteresis_iters + 2) // 4) * 4
    for tr in range(h, 7, -1):
        if h % tr or tr % 8:
            continue
        if (tr + 2 * halo) * w * 4 * live_buffers <= vmem_budget_bytes:
            return tr
    return None


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
