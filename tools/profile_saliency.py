"""Measured TPU throughput for the interpretability suite (VERDICT r4
task #5 — driver config #4's bench row).

SmoothGrad (n=50 noisy backprops, vanilla and guided variants) at 224²,
bf16 SAUNet — the reference runs the same workload as 50 sequential
single-image forward+backward passes through python hooks
(/root/reference/smoothgrad.py:18-45); here the noisy copies are vmapped
into device batches (interpret/saliency.py::smooth_grad), so one map
costs ~n/batch compiled steps.

Prints ms/map and maps/sec for: single vanilla backprop, single guided
backprop, SmoothGrad-50 vanilla, SmoothGrad-50 guided.
"""
from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from saunet_tpu.interpret.saliency import (  # noqa: E402
    guided_model,
    smooth_grad,
    vanilla_gradients,
)
from saunet_tpu.models import SAUNet  # noqa: E402

HW = int(os.environ.get("PROF_HW", "224"))
N = int(os.environ.get("PROF_N", "50"))
BS = int(os.environ.get("PROF_SG_BATCH", "10"))
REPS = int(os.environ.get("PROF_STEPS", "5"))


def timeit(fn):
    out = fn()
    float(jnp.sum(jnp.asarray(out, jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    float(jnp.sum(jnp.asarray(out, jnp.float32)))
    return (time.perf_counter() - t0) / REPS


def main():
    rs = np.random.RandomState(0)
    image = jnp.asarray(rs.rand(HW, HW, 3).astype(np.float32))
    target = jnp.asarray(rs.randint(0, 4, size=(HW, HW)).astype(np.int32))
    model = SAUNet(num_classes=4, dtype=jnp.bfloat16, stream_impl="packed")
    variables = model.init(jax.random.PRNGKey(0), image[None], train=False)
    gmodel = guided_model(model)
    rng = jax.random.PRNGKey(7)

    vanilla = jax.jit(
        lambda img: vanilla_gradients(model, variables, img, target))
    guided = jax.jit(
        lambda img: vanilla_gradients(gmodel, variables, img, target))

    print(f"{HW}²  n={N} batch={BS}  device {jax.devices()[0].platform}")
    for name, gf in (("vanilla", vanilla), ("guided", guided)):
        dt = timeit(lambda: gf(image))
        print(f"single {name:8s} backprop: {dt*1e3:8.1f} ms")
        dt = timeit(lambda: smooth_grad(gf, rng, image, n=N, batch_size=BS))
        print(f"SmoothGrad-{N} {name:8s}:  {dt*1e3:8.1f} ms/map  "
              f"({1.0/dt:6.2f} maps/sec, {dt*1e3/N:6.2f} ms per noisy "
              f"backprop)")


if __name__ == "__main__":
    main()
