"""Fused shape-stream kernel (Pallas, TPU) — eval/inference path.

SAUNet's shape stream runs ~15 full-resolution passes over tensors of 8-64
channels (res blocks, gates, projections — /root/reference/models/models.py
:337-356). On TPU, narrow-channel NHWC tensors pad their lane dimension to
128 in HBM, so every XLA pass costs a full 128-lane pass regardless of C —
~12 GB of padded traffic per 64-batch at 224². This kernel runs the ENTIRE
stream (res1 → d1 → gate1 → res2 → d2 → gate2 → res3 → d3 → gate3 → fuse →
sigmoid) on VMEM-resident row bands: HBM sees one packed 67-lane read and
one write.

Inputs are packed by `SAUNet.shape_stream_inputs` into ONE (N, H, W, 67)
tensor (lanes 0:64 = resized d0 projection, 64/65/66 = the three resized
1-channel texture cues), so exactly one full-res XLA pass feeds the kernel.

Eval-mode folding: every BatchNorm is a per-channel affine; bn1/bn2 fold
into their conv's output scale (+ bias term), gate_bn1 is applied as a
lane affine before gate_conv1, gate_bn2 collapses to two scalars inside
the sigmoid. 3x3 convs use the roll-after-matmul trick (one
(px,128)@(128,1152) matmul of all 9 taps, then rolls + destination
validity masks on the slices — rolls and (px,1) masks commute with the
row-wise matmul). The gate's (C+1)-lane concat is never materialised:
cat @ W == ss @ W[:C] + cue * W[C] (outer product).

Halo = 6 rows (the stream contains six 3x3 convolutions); zero-fill
boundary semantics match XLA's conv SAME padding exactly.

Training keeps the XLA path (batch statistics + autodiff), as does
`return_att` (the kernel does not export the gate maps).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TAPS = 9
HALO = 6  # six 3x3 convs in the stream
CHANNELS = (64, 32, 16, 8)  # ss width entering res1 / res2 / res3 / fuse
CUE_LANES = (64, 65, 66)


def _affine(p, s, eps):
    a = p["scale"] * jax.lax.rsqrt(s["var"] + eps)
    return a, p["bias"] - s["mean"] * a


def _pad_to(x, rows=None, cols=None):
    x = jnp.asarray(x)
    pr = (rows - x.shape[0]) if rows else 0
    pc = (cols - x.shape[1]) if (cols and x.ndim > 1) else 0
    if x.ndim == 1:
        return jnp.pad(x, (0, pr))
    return jnp.pad(x, ((0, pr), (0, pc)))


def _fold_res(p, s, eps):
    """ResBasicBlock -> two (128, 9*C) tap matrices + two (1,128) biases,
    BN folded into the conv output scale. Tap blocks are C wide, NOT
    128-padded: the tap matmul's output width is where the MXU cost
    lives, and C is 64/32/16 here."""
    outs = []
    for conv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
        a, b = _affine(p[bn], s[bn], eps)
        k = p[conv]["kernel"]  # (3, 3, C, C)
        c_in, c_out = k.shape[2], k.shape[3]
        w = jnp.zeros((LANES, TAPS * c_out), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                t = ky * 3 + kx
                w = w.at[:c_in, t * c_out:(t + 1) * c_out].set(
                    k[ky, kx] * a[None, :])
        outs.append((w.astype(jnp.bfloat16),
                     _pad_to(b, cols=None, rows=LANES)[None]
                     .astype(jnp.float32)))
    (w1, b1), (w2, b2) = outs
    return w1, b1, w2, b2


def _fold_gate(p, s, eps, c):
    """GatedSpatialConv -> lane affine for bn1, two matmuls (+biases),
    bn2 scalars, and the final (C->C) conv."""
    a1, b1 = _affine(p["gate_bn1"], s["gate_bn1"], eps)  # (C+1,)
    w1 = p["gate_conv1"]["kernel"][0, 0]  # (C+1, C+1)
    bb1 = p["gate_conv1"]["bias"]
    w2 = p["gate_conv2"]["kernel"][0, 0]  # (C+1, 1)
    bb2 = p["gate_conv2"]["bias"]  # (1,)
    a2, b2 = _affine(p["gate_bn2"], s["gate_bn2"], eps)  # (1,)
    wg = p["conv"]["kernel"][0, 0]  # (C, C)
    def scalar(v):
        return jnp.full((1, 1), v, jnp.float32)

    return {
        "a_ss": _pad_to(a1[:c], rows=LANES)[None].astype(jnp.bfloat16),
        "b_ss": _pad_to(b1[:c], rows=LANES)[None].astype(jnp.bfloat16),
        "a_cue": scalar(a1[c]),
        "b_cue": scalar(b1[c]),
        "w1_ss": _pad_to(w1[:c], rows=LANES, cols=LANES)
        .astype(jnp.bfloat16),
        "w1_cue": _pad_to(w1[c], rows=LANES)[None].astype(jnp.float32),
        "b1": _pad_to(bb1, rows=LANES)[None].astype(jnp.float32),
        "w2": _pad_to(w2, rows=LANES, cols=LANES).astype(jnp.bfloat16),
        "b2": scalar(bb2[0]),
        "a2": scalar(a2[0]),
        "bn2b": scalar(b2[0]),
        "wg": _pad_to(wg, rows=LANES, cols=LANES).astype(jnp.bfloat16),
    }


def fold_shape_stream_params(params: Dict[str, Any], stats: Dict[str, Any],
                             eps: float) -> Dict[str, Any]:
    """Fold the stream's flax params/batch-stats into kernel operands.
    All matrices zero-padded to 128 lanes (padded lanes stay exactly zero
    through the whole chain)."""
    folded: Dict[str, Any] = {}
    for i, name in enumerate(("res1", "res2", "res3")):
        w1, b1, w2, b2 = _fold_res(params[name], stats[name], eps)
        folded[f"r{i}_w1"], folded[f"r{i}_b1"] = w1, b1
        folded[f"r{i}_w2"], folded[f"r{i}_b2"] = w2, b2
    for i, name in enumerate(("d1", "d2", "d3")):
        k = params[name]["kernel"][0, 0]
        folded[f"d{i}_w"] = _pad_to(k, rows=LANES, cols=LANES).astype(
            jnp.bfloat16)
        folded[f"d{i}_b"] = _pad_to(params[name]["bias"], rows=LANES)[None] \
            .astype(jnp.float32)
    for i, name in enumerate(("gate1", "gate2", "gate3")):
        g = _fold_gate(params[name], stats[name],
                       eps, CHANNELS[i + 1])
        for k, v in g.items():
            folded[f"g{i}_{k}"] = v
    folded["fuse_w"] = _pad_to(params["fuse"]["kernel"][0, 0],
                               rows=LANES, cols=LANES).astype(jnp.bfloat16)
    return folded


def _shape_stream_kernel(h: int, w: int, band_rows: int, nbands: int,
                         halo: int, names, x_ref, *refs):
    weight_refs = refs[:len(names)]
    out_ref, band_scr, sem, osem = refs[len(names):]
    wts = {n: r for n, r in zip(names, weight_refs)}
    hw = band_scr.shape[0]
    b = pl.program_id(1)

    src_off = 0 if nbands == 1 else b * band_rows * w
    dma = pltpu.make_async_copy(
        x_ref.at[pl.program_id(0), pl.ds(src_off, hw), :], band_scr, sem)
    dma.start()
    dma.wait()

    flat = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    grow = b * band_rows + flat // w
    gcol = flat % w

    def dest_mask(dy, dx):
        ok_r = (grow + dy >= halo) & (grow + dy < halo + h)
        ok_c = (gcol + dx >= 0) & (gcol + dx < w)
        return (ok_r & ok_c).astype(jnp.float32)

    masks = {(dy, dx): dest_mask(dy, dx)
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)}

    def conv3x3(x, wtap, bias, c_out):
        taps = jnp.dot(x, wtap[...], preferred_element_type=jnp.float32)
        acc = None
        for t, (dy, dx) in enumerate(
                (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)):
            off = dy * w + dx
            sl = taps[:, t * c_out:(t + 1) * c_out]
            sh = jnp.roll(sl, -off, axis=0) if off else sl
            acc = sh * masks[(dy, dx)] if acc is None \
                else acc + sh * masks[(dy, dx)]
        acc = acc + bias[:, :c_out]
        return jnp.pad(acc, ((0, 0), (0, LANES - c_out)))

    def res_block(ss, i):
        c = CHANNELS[i]
        y = jnp.maximum(conv3x3(ss, wts[f"r{i}_w1"], wts[f"r{i}_b1"], c),
                        0).astype(jnp.bfloat16)
        y = conv3x3(y, wts[f"r{i}_w2"], wts[f"r{i}_b2"], c)
        return jnp.maximum(y + ss.astype(jnp.float32), 0) \
            .astype(jnp.bfloat16)

    def gate(ss, i):
        cue = band_scr[:, CUE_LANES[i]:CUE_LANES[i] + 1] \
            .astype(jnp.float32)
        pre = (ss * wts[f"g{i}_a_ss"][...]
               + wts[f"g{i}_b_ss"][...]).astype(jnp.bfloat16)
        cuep = cue * wts[f"g{i}_a_cue"][0, 0] + wts[f"g{i}_b_cue"][0, 0]
        g = (jnp.dot(pre, wts[f"g{i}_w1_ss"][...],
                     preferred_element_type=jnp.float32)
             + cuep * wts[f"g{i}_w1_cue"][...] + wts[f"g{i}_b1"][...])
        g = jnp.maximum(g, 0).astype(jnp.bfloat16)
        g2 = jnp.dot(g, wts[f"g{i}_w2"][...],
                     preferred_element_type=jnp.float32)[:, 0:1]
        g2 = g2 + wts[f"g{i}_b2"][0, 0]
        alpha = jax.nn.sigmoid(wts[f"g{i}_a2"][0, 0] * g2
                               + wts[f"g{i}_bn2b"][0, 0])
        gated = (ss.astype(jnp.float32) * (alpha + 1.0)) \
            .astype(jnp.bfloat16)
        return jnp.dot(gated, wts[f"g{i}_wg"][...],
                       preferred_element_type=jnp.float32) \
            .astype(jnp.bfloat16)

    ss = band_scr[:, 0:LANES]
    # zero the cue/pad lanes of the working state (live ss is lanes 0:64)
    lane = jax.lax.broadcasted_iota(jnp.int32, (hw, LANES), 1)
    ss = jnp.where(lane < CHANNELS[0], ss, 0).astype(jnp.bfloat16)

    ss = res_block(ss, 0)
    ss = (jnp.dot(ss, wts["d0_w"][...],
                  preferred_element_type=jnp.float32)
          + wts["d0_b"][...]).astype(jnp.bfloat16)
    ss = gate(ss, 0)
    ss = res_block(ss, 1)
    ss = (jnp.dot(ss, wts["d1_w"][...],
                  preferred_element_type=jnp.float32)
          + wts["d1_b"][...]).astype(jnp.bfloat16)
    ss = gate(ss, 1)
    ss = res_block(ss, 2)
    ss = (jnp.dot(ss, wts["d2_w"][...],
                  preferred_element_type=jnp.float32)
          + wts["d2_b"][...]).astype(jnp.bfloat16)
    ss = gate(ss, 2)
    edge = jax.nn.sigmoid(
        jnp.dot(ss, wts["fuse_w"][...],
                preferred_element_type=jnp.float32))

    hw_out = band_rows * w if nbands > 1 else hw
    lo = halo * w
    band_scr[:, :] = edge.astype(jnp.bfloat16)
    dst_off = 0 if nbands == 1 else b * band_rows * w
    odma = pltpu.make_async_copy(
        band_scr.at[pl.ds(lo, hw_out), :],
        out_ref.at[pl.program_id(0), pl.ds(dst_off, hw_out), :], osem)
    odma.start()
    odma.wait()


def pick_band_rows_ss(h: int, w: int,
                      vmem_budget_bytes: int = 60 * 1024 * 1024):
    """Largest divisor of H whose halo'd band keeps ~12 (px,128) working
    maps in budget (calibrated like the dense-block kernel)."""
    for band in range(h, 0, -1):
        if h % band or (band * w) % 8:
            continue
        hw = (band + (2 * HALO if band != h else 0)) * w
        if hw * LANES * 2 * 12 <= vmem_budget_bytes:
            return band
    return None


@functools.partial(jax.jit, static_argnames=("eps", "band_rows",
                                             "interpret"))
def shape_stream_fused(packed: jnp.ndarray, params: Dict[str, Any],
                       stats: Dict[str, Any], eps: float = 1e-5,
                       band_rows: int | None = None,
                       interpret: bool = False) -> jnp.ndarray:
    """packed (N, H, W, 67) from SAUNet.shape_stream_inputs ->
    edge_out (N, H, W, 1) f32 (sigmoid computed in f32, stored bf16)."""
    n, h, w, _ = packed.shape
    folded = fold_shape_stream_params(params, stats, eps)
    names = sorted(folded.keys())

    if band_rows is None:
        band_rows = pick_band_rows_ss(h, w) or h
    if h % band_rows:
        raise ValueError(f"H={h} not divisible by band_rows={band_rows}")
    nbands = h // band_rows
    halo = HALO if nbands > 1 else 0

    xp = jnp.pad(packed.astype(jnp.bfloat16),
                 ((0, 0), (halo, halo), (0, 0),
                  (0, LANES - packed.shape[-1])))
    xp = xp.reshape(n, -1, LANES)
    scratch_hw = (band_rows + 2 * halo) * w
    px_pad = (-scratch_hw) % 8 if nbands == 1 else 0
    if px_pad:
        xp = jnp.pad(xp, ((0, 0), (0, px_pad), (0, 0)))
        scratch_hw += px_pad
    hw_total = h * w + px_pad

    kernel = functools.partial(_shape_stream_kernel, h, w, band_rows,
                               nbands, halo, names)
    out = pl.pallas_call(
        kernel,
        grid=(n, nbands),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec(folded[k].shape,
                         (lambda *i, nd=folded[k].ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for k in names
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, hw_total, LANES), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((scratch_hw, LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, *[folded[k] for k in names])
    edge = out[:, :h * w, 0:1].astype(jnp.float32)
    return edge.reshape(n, h, w, 1)
