"""Per-dense-block TRAIN fwd+bwd cost on the real chip (VERDICT r3 #8).

KERNELS.md §6 closed the train-mode concat question at whole-encoder
granularity (chain autodiff = 94% of the HBM roofline); the remaining
stretch asked whether a fused fwd+bwd Pallas kernel for blocks 3-4 —
the only ones whose concat could be VMEM-resident — could still win.
That needs each block's isolated train-mode fwd+bwd time: the measured
ceiling on what ANY fused kernel could save. This tool times
jit(grad(mean(block(x)))) per block at the b64 @224² geometry the train
step runs (block1 112²/C64/L6, block2 56²/C128/L12, block3 28²/C256/L24,
block4 14²/C512/L16).

Reference hot path this bounds: the densenet trunk of SAUNet.forward,
/root/reference/models/models.py:331-334.
"""
from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from saunet_tpu.models.densenet import DenseBlock  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "64"))
STEPS = int(os.environ.get("PROF_STEPS", "10"))

# (name, spatial, c_in, num_layers) at 224² input — this encoder's block
# resolutions (KERNELS.md §2: taps at 1/2..1/16, not torchvision's /4../32)
BLOCKS = [
    ("denseblock1", 112, 64, 6),
    ("denseblock2", 56, 128, 12),
    ("denseblock3", 28, 256, 24),
    ("denseblock4", 14, 512, 16),
]


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    hbm = None
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        hbm = ca.get("bytes accessed")
    except Exception:
        pass
    extra = ""
    if hbm:
        extra = (f"  traffic={hbm / 1e9:6.2f} GB  eff_bw="
                 f"{hbm / 1e9 / (dt / 1e3):4.0f} GB/s")
    print(f"{name:24s} {dt:8.2f} ms{extra}", flush=True)
    return dt


def main():
    total = 0.0
    for name, hw, c_in, n_layers in BLOCKS:
        blk = DenseBlock(num_layers=n_layers, dtype=jnp.bfloat16)
        x = jnp.asarray(
            np.random.RandomState(0).randn(B, hw, hw, c_in), jnp.bfloat16)
        variables = blk.init(jax.random.PRNGKey(0), x, train=False)

        def loss(params, stats, x, blk=blk):
            out, mut = blk.apply(
                {"params": params, "batch_stats": stats}, x, True,
                mutable=["batch_stats"])
            return jnp.mean(out.astype(jnp.float32)), mut

        @jax.jit
        def g(params, stats, x, loss=loss):
            (l, _), grads = jax.value_and_grad(loss, has_aux=True)(
                params, stats, x)
            return l, grads

        total += timeit(f"{name} ({hw}² C{c_in} L{n_layers})", g,
                        variables["params"], variables["batch_stats"], x)
    print(f"{'all blocks fwd+bwd':24s} {total:8.2f} ms "
          f"(isolated-sum; fusion across block boundaries not counted)")


if __name__ == "__main__":
    main()
