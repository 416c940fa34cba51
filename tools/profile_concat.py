"""Isolate the dense-block concat-mode costs on the real chip.

Times, for each concat mode (chain/buffer/fused), the encoder-only
forward and the encoder-only fwd+bwd (grad of a scalar over all taps),
so the fused custom-VJP's forward and backward costs are attributed
separately. Env: PROF_BATCH (64), PROF_HW (224), PROF_STEPS (10),
PROF_MODES (comma list).
"""
from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from saunet_tpu.models.densenet import DenseNetEncoder  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "64"))
HW = int(os.environ.get("PROF_HW", "224"))
STEPS = int(os.environ.get("PROF_STEPS", "10"))
MODES = os.environ.get("PROF_MODES", "chain,fused").split(",")


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    hbm = flops = None
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops, hbm = ca.get("flops"), ca.get("bytes accessed")
    except Exception:
        pass
    extra = ""
    if hbm:
        extra = (f"  traffic={hbm / 1e9:.1f}GB eff_bw="
                 f"{hbm / 1e9 / (dt / 1e3):.0f}GB/s")
    if flops:
        extra += f"  tflops={flops / 1e12 / (dt / 1e3):.1f}"
    print(f"{name:26s} {dt:8.2f} ms{extra}", flush=True)
    return dt


def main():
    x = jnp.asarray(np.random.RandomState(0).randn(B, HW, HW, 3),
                    jnp.bfloat16)
    for mode in MODES:
        enc = DenseNetEncoder(dtype=jnp.bfloat16, concat_mode=mode)
        v = jax.device_put(jax.tree.map(
            np.asarray, enc.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, HW, HW, 3), jnp.float32),
                                 train=False)))

        @jax.jit
        def fwd(v, x, enc=enc):
            taps, _ = enc.apply(v, x, True, mutable=["batch_stats"])
            return sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in taps)

        @jax.jit
        def fwdbwd(v, x, enc=enc):
            def loss(params):
                taps, _ = enc.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    x, True, mutable=["batch_stats"])
                return sum(jnp.sum(t.astype(jnp.float32) ** 2)
                           for t in taps)
            val, g = jax.value_and_grad(loss)(v["params"])
            return val, g

        timeit(f"{mode} encoder fwd", fwd, v, x)
        timeit(f"{mode} encoder fwd+bwd", fwdbwd, v, x)


if __name__ == "__main__":
    main()
