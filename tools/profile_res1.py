"""A/B the stream res1 lever (VERDICT r4 task #3): isolated fwd+bwd of
the packed res1 block (two 64-ch conv3x3 at full resolution, P=2 —
KERNELS.md §8's single most expensive sub-roofline stage, +23.1 ms at
~554 GB/s / ~61% MXU) with the standard block-placed conv kernel vs the
mid/cross split (packed_conv3x3_split: 2/3 the MACs, one extra
materialised shift tensor per conv).

Reference stage: the stream's first residual block,
/root/reference/models/models.py:337-342.
"""
from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from saunet_tpu.models.packed_stream import PResBasicBlock  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "64"))
HW = int(os.environ.get("PROF_HW", "224"))
STEPS = int(os.environ.get("PROF_STEPS", "20"))
P = 2
C = 64


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / STEPS


def main():
    rs = np.random.RandomState(0)
    xp = jnp.asarray(
        rs.rand(B, HW, HW // P, P * C).astype(np.float32)
    ).astype(jnp.bfloat16)

    results = {}
    for impl in ("block", "split"):
        blk = PResBasicBlock(C, dtype=jnp.bfloat16, conv_impl=impl)
        variables = blk.init(jax.random.PRNGKey(0), xp[:1], P, True)
        params = variables["params"]

        def fwd(params, xp):
            out, _ = blk.apply({"params": params}, xp, P, True,
                               mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))

        grad_fn = jax.jit(jax.value_and_grad(fwd, argnums=(0, 1)))
        fwd_j = jax.jit(fwd)

        tf = timeit(fwd_j, params, xp)
        tb = timeit(grad_fn, params, xp)
        results[impl] = (tf, tb)
        print(f"res1[{impl:5s}]  fwd {tf*1e3:7.2f} ms   "
              f"fwd+bwd {tb*1e3:7.2f} ms")

    b, s = results["block"][1], results["split"][1]
    print(f"split vs block fwd+bwd: {b*1e3:.2f} -> {s*1e3:.2f} ms "
          f"({(b - s)*1e3:+.2f} ms, {100*(b-s)/b:+.1f}%)")


if __name__ == "__main__":
    main()
