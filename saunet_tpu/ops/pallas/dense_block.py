"""Fused DenseNet block kernel (Pallas, TPU) — eval/inference path.

A DenseNet block re-reads its growing concat from HBM every layer: layer l
reads C0 + l*G channels, so a block moves O(L²·G) channel-pixels through HBM
while only C0 in + (C0+L·G) out are fundamental. XLA cannot fix this — the
concats are materialised between layer programs. This kernel keeps one batch
element's whole concat buffer resident in VMEM across ALL layers of the
block: HBM traffic drops from sum_l(C_l) reads + L·G writes to C0 reads +
C_final writes (e.g. 12.8x less for denseblock3).

Eval-mode math per layer (BN folded on the fly from running stats):
    u  = relu(x_cat * a1 + b1)            # norm1 affine, bf16 like flax
    t  = relu(u @ W1f + b2f)              # conv1 1x1 with norm2 folded in
    new = sum_taps shift(t, dy, dx) @ W2[tap]   # conv2 3x3 as 9 matmuls
    x_cat[:, C_l:C_l+G] = new             # concat = lane-offset store

Layers are unrolled (static offsets); per-layer params are zero-padded to
the block's final width so every matmul has one static shape — padded rows
multiply garbage lanes by 0 (the concat scratch is zero-initialised, so no
NaN leaks). Spatial 3x3 taps are flat rolls of the row-major (H·W, 128)
activation with destination row/col validity masks (zero boundary =
conv SAME). Images too large for VMEM are processed in halo'd row bands
like the tiled canny kernel (halo = num_layers rows, one per 3x3).

Train mode keeps the XLA path (batch stats + autodiff). Reference parity:
this computes torchvision densenet121's _DenseLayer stack
(/root/reference/models/models.py:271,306-313 tap usage) exactly, in the
eval regime SAUNet uses for validation/inference.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROWTH = 32
HIDDEN = 128  # bn_size * growth


def fold_dense_block_params(params: Dict[str, Any], stats: Dict[str, Any],
                            num_layers: int, c0: int,
                            eps: float) -> Dict[str, jnp.ndarray]:
    """Stack + BN-fold a denseblock's flax params into kernel operands.

    Returns (L = num_layers, Cmax = c0 + L*GROWTH):
      a1, b1: (L, 1, Cmax)  norm1 affine (bf16; zero-padded lanes)
      w1:     (L, Cmax, HIDDEN) bf16, conv1 kernel with norm2 scale folded
      b2:     (L, 1, HIDDEN) f32, norm2 shift
      w2:     (L, HIDDEN, 9*GROWTH) bf16, the 9 conv2 taps side by side
              (row-major (dy, dx) order)
    """
    cmax = c0 + num_layers * GROWTH
    a1s, b1s, w1s, b2s, w2s = [], [], [], [], []
    for l in range(num_layers):
        lp = params[f"denselayer{l + 1}"]
        ls = stats[f"denselayer{l + 1}"]
        cl = c0 + l * GROWTH
        n1s, n1b = lp["norm1"]["scale"], lp["norm1"]["bias"]
        n1m, n1v = ls["norm1"]["mean"], ls["norm1"]["var"]
        a1 = n1s * jax.lax.rsqrt(n1v + eps)
        b1 = n1b - n1m * a1
        a1s.append(jnp.pad(a1, (0, cmax - cl))[None])
        b1s.append(jnp.pad(b1, (0, cmax - cl))[None])

        w1 = lp["conv1"]["kernel"][0, 0]  # (Cl, HIDDEN)
        n2s, n2b = lp["norm2"]["scale"], lp["norm2"]["bias"]
        n2m, n2v = ls["norm2"]["mean"], ls["norm2"]["var"]
        a2 = n2s * jax.lax.rsqrt(n2v + eps)
        w1s.append(jnp.pad(w1 * a2[None, :], ((0, cmax - cl), (0, 0))))
        b2s.append((n2b - n2m * a2)[None])

        w2 = lp["conv2"]["kernel"]  # (3, 3, HIDDEN, GROWTH)
        # all 9 taps side by side: one (HIDDEN, 9*GROWTH) matmul per layer
        w2s.append(w2.reshape(9, HIDDEN, GROWTH).transpose(1, 0, 2)
                   .reshape(HIDDEN, 9 * GROWTH))
    return {
        "a1": jnp.stack(a1s).astype(jnp.bfloat16),
        "b1": jnp.stack(b1s).astype(jnp.bfloat16),
        "w1": jnp.stack(w1s).astype(jnp.bfloat16),
        "b2": jnp.stack(b2s).astype(jnp.float32),
        "w2": jnp.stack(w2s).astype(jnp.bfloat16),
    }


def _dense_block_kernel(num_layers: int, c0: int, h: int, w: int,
                        band_rows: int, halo_rows: int, nbands: int,
                        x_ref, a1_ref, b1_ref, w1_ref, b2_ref, w2_ref,
                        out_ref, x0_ref, xcat_ref, sem, osem):
    """One (batch, band) program. xcat scratch: (band+2*halo rows)·W x Cmax.

    VMEM discipline: the BN1-affine + 1x1 conv runs over 128-lane CHUNKS of
    the concat, so no (hw, Cmax) temporary ever exists, and chunks beyond
    the layer's live width are statically skipped (no padded-lane FLOPs).
    Output leaves via a manual DMA straight from the concat scratch — an
    out BlockSpec would double-buffer a whole (hw, Cmax) block."""
    cmax = c0 + num_layers * GROWTH
    hw = x0_ref.shape[0]       # padded band px (8-aligned by caller)
    hw_out = hw if halo_rows == 0 else band_rows * w
    b = pl.program_id(1)

    # DMA this band's input into a staging scratch (DMA slices need
    # 8-aligned sublane extents and 128-aligned lane extents, hence the
    # caller's px/channel padding), then seed the concat scratch: input
    # channels + zeros (padded matmul lanes must multiply clean zeros,
    # not uninitialised VMEM).
    # literal 0 offset when there is a single band: Mosaic must PROVE the
    # traced offset is tile-aligned, which b*band_px cannot be when band_px
    # itself is unaligned (e.g. a padded whole map)
    src_off = 0 if nbands == 1 else b * band_rows * w
    dma = pltpu.make_async_copy(
        x_ref.at[pl.program_id(0), pl.ds(src_off, hw), :],
        x0_ref, sem)
    dma.start()
    xcat_ref[:, c0:] = jnp.zeros((hw, cmax - c0), jnp.bfloat16)
    dma.wait()
    xcat_ref[:, 0:c0] = x0_ref[:, 0:c0]

    # global (padded-image) row/col of each flat position; the real image
    # occupies padded rows [halo_rows, halo_rows + h)
    flat = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    grow = b * band_rows + flat // w
    gcol = flat % w

    def dest_mask(dy, dx):
        ok_r = ((grow + dy >= halo_rows) & (grow + dy < halo_rows + h))
        ok_c = (gcol + dx >= 0) & (gcol + dx < w)
        return (ok_r & ok_c).astype(jnp.float32)

    masks = {(dy, dx): dest_mask(dy, dx)
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)}

    for l in range(num_layers):
        cl = c0 + l * GROWTH
        t = None
        for c in range(-(-cl // HIDDEN)):  # only chunks with live lanes
            lo, hi = c * HIDDEN, (c + 1) * HIDDEN
            u = jnp.maximum(
                xcat_ref[:, lo:hi] * a1_ref[l, :, lo:hi]
                + b1_ref[l, :, lo:hi], 0).astype(jnp.bfloat16)
            p = jnp.dot(u, w1_ref[l, lo:hi, :],
                        preferred_element_type=jnp.float32)
            t = p if t is None else t + p
        s = jnp.maximum(t + b2_ref[l], 0).astype(jnp.bfloat16)

        # one matmul for all 9 taps, then roll/mask the cheap (hw, G)
        # products: rolls (row permutations) and (hw, 1) masks commute
        # with the row-wise matmul, so this is exactly the masked-input
        # 3x3 conv at ~1/4 the VPU work.
        taps = jnp.dot(s, w2_ref[l], preferred_element_type=jnp.float32)
        acc = None
        for tap, (dy, dx) in enumerate(
                (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)):
            off = dy * w + dx
            sl = taps[:, tap * GROWTH:(tap + 1) * GROWTH]
            sh = jnp.roll(sl, -off, axis=0) if off else sl
            sh = sh * masks[(dy, dx)]
            acc = sh if acc is None else acc + sh
        xcat_ref[:, cl:cl + GROWTH] = acc.astype(jnp.bfloat16)

    dst_off = 0 if nbands == 1 else b * band_rows * w
    odma = pltpu.make_async_copy(
        xcat_ref.at[pl.ds(halo_rows * w, hw_out), :],
        out_ref.at[pl.program_id(0), pl.ds(dst_off, hw_out), :],
        osem)
    odma.start()
    odma.wait()


def pick_band_rows(h: int, w: int, c0: int, num_layers: int,
                   vmem_budget_bytes: int = 20 * 1024 * 1024):
    """Largest divisor of H whose halo'd band fits VMEM, or None.

    Estimates the chunked kernel's live set: concat scratch (hw x Cmax
    bf16), input staging, ~6 (hw x HIDDEN) mixed-precision temporaries, and
    the stacked layer params. Mosaic's stack allocator measures ~2.3x this
    estimate (unshared unrolled temporaries), so the 20 MiB budget
    corresponds to the kernel's 100 MiB vmem_limit_bytes with headroom —
    calibrated on v5e (block2 whole-map: est 11.3M, real 25.9M, runs).

    Banded candidates that violate the kernel's DMA alignment contract —
    both the band extent (band*W) and the full halo'd scratch extent
    ((band + 2*halo)*W) must be multiples of 8 sublanes — are skipped, so
    the caller never trips `dense_block_fused`'s ValueError; a None return
    means "no configuration fits, use the XLA path"."""
    cmax = c0 + num_layers * GROWTH
    params = (num_layers * cmax * HIDDEN * 2
              + num_layers * 9 * HIDDEN * GROWTH * 2)
    for band in range(h, 0, -1):
        if h % band:
            continue
        halo = 0 if band == h else num_layers
        hw = (band + 2 * halo) * w
        if halo and ((band * w) % 8 or hw % 8):
            continue
        need = hw * (cmax * 2 + c0 * 2 + HIDDEN * 12) + params
        if need <= vmem_budget_bytes:
            return band
    return None


@functools.partial(jax.jit, static_argnames=("num_layers", "eps",
                                             "band_rows", "interpret"))
def dense_block_fused(x: jnp.ndarray, params: Dict[str, Any],
                      stats: Dict[str, Any], num_layers: int,
                      eps: float = 1e-5, band_rows: int | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused eval-mode dense block. x: (N, H, W, C0) -> (N, H, W, Cmax).

    `band_rows` must divide H (None = whole image in one band).
    """
    n, h, w, c0 = x.shape
    cmax = c0 + num_layers * GROWTH
    folded = fold_dense_block_params(params, stats, num_layers, c0, eps)

    if band_rows is None:
        band_rows = h
    if h % band_rows:
        raise ValueError(f"H={h} not divisible by band_rows={band_rows}")
    halo_rows = num_layers if band_rows != h else 0
    nbands = h // band_rows
    if halo_rows and (band_rows * w) % 8:
        raise ValueError("banded mode needs 8-aligned band px; pick a "
                         "band_rows with band_rows*W % 8 == 0")
    if halo_rows and ((band_rows + 2 * halo_rows) * w) % 8:
        # the staging DMA copies the full halo'd scratch extent, not just
        # the band — it must be sublane-aligned too (e.g. odd W with
        # num_layers=6 makes the 12*W halo term non-8-aligned)
        raise ValueError("banded mode needs an 8-aligned halo'd scratch "
                         "extent: ((band_rows + 2*num_layers)*W) % 8 == 0")

    # DMA alignment: lane extents must be 128-multiples (pad channels with
    # zeros — they contribute nothing through the zero-padded a1/W1 rows),
    # sublane extents 8-multiples (pad flat px in whole-map mode; the
    # padded positions are masked as out-of-image and sliced off).
    c0p = -(-c0 // HIDDEN) * HIDDEN
    xp = x.astype(jnp.bfloat16)
    if c0p != c0:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, c0p - c0)))
    if halo_rows:
        xp = jnp.pad(xp, ((0, 0), (halo_rows, halo_rows), (0, 0), (0, 0)))
    xp = xp.reshape(n, -1, c0p)
    scratch_hw = (band_rows + 2 * halo_rows) * w
    px_pad = (-scratch_hw) % 8 if halo_rows == 0 else 0
    if px_pad:
        xp = jnp.pad(xp, ((0, 0), (0, px_pad), (0, 0)))
        scratch_hw += px_pad
    hw_total = h * w + px_pad

    kernel = functools.partial(_dense_block_kernel, num_layers, c0, h, w,
                               band_rows, halo_rows, nbands)
    out = pl.pallas_call(
        kernel,
        grid=(n, nbands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((num_layers, 1, cmax), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, 1, cmax), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, cmax, HIDDEN),
                         lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, 1, HIDDEN), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, HIDDEN, 9 * GROWTH),
                         lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, hw_total, cmax), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((scratch_hw, c0p), jnp.bfloat16),
            pltpu.VMEM((scratch_hw, cmax), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, folded["a1"], folded["b1"], folded["w1"], folded["b2"],
      folded["w2"])
    if px_pad:
        out = out[:, :h * w]
    return out.reshape(n, h, w, cmax)
