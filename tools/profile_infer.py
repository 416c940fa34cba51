"""Break the inference step into encoder / decode / sub-stage timings on
the real chip, to pick the next kernel target on evidence."""
from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from saunet_tpu.models import SAUNet  # noqa: E402
from saunet_tpu.models.fused_encoder import encoder_apply_fused  # noqa: E402

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
    print(f"{name:<30s} {dt*1e3:8.2f} ms/batch")


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, HW, HW, 3).astype(np.float32))
    model = SAUNet(num_classes=4, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    params, stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def enc_fused(x):
        return encoder_apply_fused(params["encoder"], stats["encoder"], x)

    @jax.jit
    def enc_xla(x):
        return model.apply(variables, x.astype(jnp.bfloat16), False,
                           method=lambda m, xx, t: m.encoder(xx, t))

    taps = enc_fused(x)
    jax.block_until_ready(taps)

    @jax.jit
    def decode(taps, x):
        return model.apply(variables, taps[1:], x, False, method="decode")

    @jax.jit
    def full(x):
        return model.apply(variables, x, train=False)

    print(f"batch {B} @ {HW}²  device {jax.devices()[0].platform}")
    timeit("encoder fused", enc_fused, x)
    timeit("encoder XLA", enc_xla, x)
    timeit("decode (shape+dec+edge)", decode, taps, x)
    timeit("full __call__ (XLA enc)", full, x)


if __name__ == "__main__":
    main()
