"""Empirical gather-strategy shootout for the augmentation warp (TPU).

The warp is gather-op-bound (profile_augment.py: 93ms for 4 bilinear taps +
24ms nearest at b64/224²). Candidates:

  1. flat 1-D take, f32 (current per-tap primitive)
  2. flat 1-D take, bf16 (does dtype matter?)
  3. packed row gather: operand (NHW, 8) bf16, one take(axis=0) fetches the
     whole 2x2 image patch + packed 2x2 label byte per output pixel
  4. same via lax.gather slice_sizes=(1, 8)
  5. full packed warp end-to-end (build pack + 1 gather + combine + decode)
  6. Pallas in-kernel take_along_axis probes (lane/sublane gather support)
"""
from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(os.environ.get("EXP_BATCH", "64"))
HW = int(os.environ.get("EXP_HW", "224"))
STEPS = int(os.environ.get("EXP_STEPS", "20"))


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        _sync(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name:<34s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:<34s} {dt*1e3:8.2f} ms/batch")
    return dt


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))


def main():
    rs = np.random.RandomState(0)
    n, h, w = B, HW, HW
    imgs = jnp.asarray(rs.randn(n, h, w).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 4, size=(n, h, w)).astype(np.int32))
    # plausible warp coords (rotation-ish)
    sy = jnp.asarray((rs.rand(n, h, w) * (h - 1)).astype(np.float32))
    sx = jnp.asarray((rs.rand(n, h, w) * (w - 1)).astype(np.float32))

    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    yc = jnp.clip(y0, 0, h - 1)
    xc = jnp.clip(x0, 0, w - 1)
    base = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]
    flat_idx = (base + yc * w + xc).reshape(-1)

    @jax.jit
    def take_f32(imgs, idx):
        return jnp.take(imgs.reshape(-1), idx, mode="clip").reshape(n, h, w)

    @jax.jit
    def take_bf16(imgs, idx):
        return jnp.take(imgs.astype(jnp.bfloat16).reshape(-1), idx,
                        mode="clip").reshape(n, h, w)

    def build_pack(imgs, labels):
        """(NHW, 8) bf16: [v00 v01 v10 v11 labbyte 0 0 0]."""
        def sh(a, dy, dx):
            return jnp.pad(a, ((0, 0), (0, dy), (0, dx)))[:, dy:, dx:]
        v00 = imgs
        v01 = sh(imgs, 0, 1)
        v10 = sh(imgs, 1, 0)
        v11 = sh(imgs, 1, 1)
        lb = (labels + 4 * sh(labels, 0, 1) + 16 * sh(labels, 1, 0)
              + 64 * sh(labels, 1, 1)).astype(jnp.float32)
        p = jnp.stack([v00, v01, v10, v11, lb,
                       jnp.zeros_like(v00), jnp.zeros_like(v00),
                       jnp.zeros_like(v00)], axis=-1)
        return p.astype(jnp.bfloat16).reshape(-1, 8)

    @jax.jit
    def pack_only(imgs, labels):
        return build_pack(imgs, labels)

    @jax.jit
    def packed_take(pack, idx):
        return jnp.take(pack, idx, axis=0, mode="clip")

    @jax.jit
    def packed_gather(pack, idx):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,))
        return jax.lax.gather(pack, idx[:, None], dn, slice_sizes=(1, 8),
                              mode="clip")

    pack = pack_only(imgs, labels)

    @jax.jit
    def full_packed_warp(imgs, labels, sy, sx):
        p = build_pack(imgs, labels)
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        fy = (sy - y0).astype(jnp.float32)
        fx = (sx - x0).astype(jnp.float32)
        yi = y0.astype(jnp.int32)
        xi = x0.astype(jnp.int32)
        ycc = jnp.clip(yi, 0, h - 1)
        xcc = jnp.clip(xi, 0, w - 1)
        idx = (base + ycc * w + xcc).reshape(-1)
        g = jnp.take(p, idx, axis=0, mode="clip").reshape(n, h, w, 8)
        gf = g[..., :4].astype(jnp.float32)
        img_w = ((1 - fy) * ((1 - fx) * gf[..., 0] + fx * gf[..., 1])
                 + fy * ((1 - fx) * gf[..., 2] + fx * gf[..., 3]))
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        img_w = jnp.where(inside, img_w, 0.0)
        lb = g[..., 4].astype(jnp.int32)
        near_y = (sy - y0) >= 0.5
        near_x = (sx - x0) >= 0.5
        shift = jnp.where(near_y, 4, 0) + jnp.where(near_x, 2, 0)
        # labbyte = l00 + 4*l01 + 16*l10 + 64*l11 (2 bits each)
        lab = (lb // jnp.left_shift(1, shift)) % 4
        lab = jnp.where(inside, lab, 0)
        return img_w, lab

    print(f"batch {B} @ {HW}²  device {jax.devices()[0].platform}")
    timeit("flat take f32 (1 tap)", take_f32, imgs, flat_idx)
    timeit("flat take bf16 (1 tap)", take_bf16, imgs, flat_idx)
    timeit("build pack only", pack_only, imgs, labels)
    timeit("packed take (NHW,8) bf16", packed_take, pack, flat_idx)
    timeit("packed lax.gather (1,8)", packed_gather, pack, flat_idx)
    timeit("FULL packed warp", full_packed_warp, imgs, labels, sy, sx)

    # --- Pallas probes ---------------------------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k_lane(img_ref, idx_ref, out_ref):
        out_ref[0] = jnp.take_along_axis(img_ref[0], idx_ref[0], axis=1)

    def k_sub(img_ref, idx_ref, out_ref):
        out_ref[0] = jnp.take_along_axis(img_ref[0], idx_ref[0], axis=0)

    def k_flat(img_ref, idx_ref, out_ref):
        flat = img_ref[0].reshape(1, -1)
        idx = idx_ref[0].reshape(1, -1)
        out_ref[0] = jnp.take_along_axis(flat, idx, axis=1).reshape(h, w)

    idx_lane = jnp.clip(xc, 0, w - 1)
    idx_sub = jnp.clip(yc, 0, h - 1)
    idx_flat = (yc * w + xc)

    def probe(name, kernel, idx):
        def run(imgs, idx):
            return pl.pallas_call(
                kernel,
                grid=(n,),
                in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
            )(imgs, idx)
        timeit(name, jax.jit(run), imgs, idx)

    probe("pallas take_along lane (axis=1)", k_lane, idx_lane)
    probe("pallas take_along sublane (ax=0)", k_sub, idx_sub)
    probe("pallas flat 1D take (reshape)", k_flat, idx_flat)


if __name__ == "__main__":
    main()
