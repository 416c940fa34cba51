"""Micro-profile the fused augmentation path on the real TPU.

Times each stage of saunet_tpu.data.augment (coords/elastic field, warp
gathers, gamma+zscore, edge GT) as separate jitted programs, plus the full
fused augment, so the next optimization lever is chosen on evidence.

Timing per the verify skill: sync via scalar host transfer, never
block_until_ready, persistent compile cache on.
"""
from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from saunet_tpu.data import augment as A  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "64"))
HW = int(os.environ.get("PROF_HW", "224"))
STEPS = int(os.environ.get("PROF_STEPS", "20"))


def timeit(name, fn, *args):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:<28s} {dt*1e3:8.2f} ms/batch   "
          f"{B/dt:8.1f} slices/sec")
    return dt


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))


def main():
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.randn(B, HW, HW).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 4, size=(B, HW, HW)).astype(np.int32))
    rng = jax.random.PRNGKey(1)
    rngs = jax.random.split(rng, B)

    @jax.jit
    def coords(rngs):
        return jax.vmap(lambda r: A._coords_one(r, HW, HW, True))(rngs)

    sy, sx, gamma = coords(rngs)

    @jax.jit
    def coords_nodeform(rngs):
        return jax.vmap(lambda r: A._coords_one(r, HW, HW, False))(rngs)

    @jax.jit
    def warp_bilinear(imgs, sy, sx):
        return A._sample_bilinear_batched(imgs, sy, sx)

    @jax.jit
    def warp_nearest(labels, sy, sx):
        return A._sample_nearest_batched(labels, sy, sx)

    lab_w = warp_nearest(labels, sy, sx)

    @jax.jit
    def edge(lab):
        return A.edge_ground_truth(lab, 4)

    @jax.jit
    def gamma_zscore(img_w, gamma):
        mn = jnp.min(img_w, axis=(1, 2), keepdims=True)
        rng_ = jnp.max(img_w, axis=(1, 2), keepdims=True) - mn
        g = gamma[:, None, None]
        img_g = jnp.power((img_w - mn) / (rng_ + 1e-7), g) * rng_ + mn
        mu = jnp.mean(img_g, axis=(1, 2), keepdims=True)
        sd = jnp.std(img_g, axis=(1, 2), keepdims=True)
        img_a = (img_g - mu) / (sd + 1e-10)
        return jnp.repeat(img_a[..., None], 3, axis=-1)

    full = jax.jit(A.make_augment_fn(4, True))
    full_nodeform = jax.jit(A.make_augment_fn(4, False))

    batch = {"image": imgs, "label": labels}
    print(f"batch {B} @ {HW}²  ({STEPS} steps, device "
          f"{jax.devices()[0].platform})")
    timeit("coords (elastic on)", coords, rngs)
    timeit("coords (no deform)", coords_nodeform, rngs)
    timeit("warp bilinear (image)", warp_bilinear, imgs, sy, sx)
    timeit("warp nearest (labels)", warp_nearest, labels, sy, sx)
    timeit("edge ground truth", edge, lab_w)
    timeit("gamma + zscore + 3ch", gamma_zscore, imgs, gamma)
    timeit("FULL augment (deform)", full, rng, batch)
    timeit("FULL augment (no deform)", full_nodeform, rng, batch)


if __name__ == "__main__":
    main()
