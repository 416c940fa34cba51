"""Per-segment attribution of the PACKED inference program — the program
`make_infer_step` auto-dispatches ABOVE 256², where the fused Pallas
encoder's banded fallback collapses (docs/KERNELS.md §10).

At 512²x8 the shipping packed program runs 59.4 ms (134.7 slices/sec) at
70.8% HBM util / 31.7% MFU — neither roofline saturated, the same
mixed-phase signature §10 diagnosed at 224². This tool produces the
cumulative-prefix table that says which segment owns the time:

  dense XLA encoder | + packed shape stream | + packed decode/tail |
  + packed argmax | shipping make_infer_step program

Method identical to tools/profile_infer_seg.py (jitted cumulative
prefixes, scalar host-transfer sync; consecutive deltas are
decision-grade, not exact, because XLA fuses across the cut points).

Reference hot loop this program replaces: the per-slice inference loop,
/root/reference/test_and_pack.py:109-126.
"""
from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from saunet_tpu.models import SAUNet  # noqa: E402
from saunet_tpu.ops.packed import packed_argmax  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "8"))
HW = int(os.environ.get("PROF_HW", "512"))
STEPS = int(os.environ.get("PROF_STEPS", "20"))


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / STEPS


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, HW, HW, 3).astype(np.float32))
    model = SAUNet(num_classes=4, dtype=jnp.bfloat16, stream_impl="packed")
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    def encoder(m, xx):
        return m.encoder(xx.astype(m.dtype), False)

    def stream(m, xx):
        taps = m.encoder(xx.astype(m.dtype), False)
        return m._shape_stream_packed_core(taps[1:], xx, False)

    def decode(m, xx):
        taps = m.encoder(xx.astype(m.dtype), False)
        seg_p, edge_p, _, _ = m._decode_packed(taps[1:], xx, False)
        return seg_p, edge_p

    def full(m, xx):
        taps = m.encoder(xx.astype(m.dtype), False)
        seg_p, _, _, _ = m._decode_packed(taps[1:], xx, False)
        return packed_argmax(seg_p, 4)

    cuts = [("dense XLA encoder", encoder),
            ("+ packed shape stream", stream),
            ("+ packed decode/tail", decode),
            ("+ packed argmax", full)]

    def cost(jf, *args):
        """(flops, bytes) from the compiled cost model; (0, 0) if the
        backend doesn't expose it. Bytes overcount cached reuse — an
        upper bound on true HBM traffic (verify skill), so the derived
        HBM% is an upper bound too."""
        try:
            ca = jf.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
        except Exception:
            return 0.0, 0.0

    peak_tflops, peak_gbps = 197e12, 819e9  # v5e bf16
    print(f"batch {B} @ {HW}²  device {jax.devices()[0].platform}  "
          f"steps {STEPS}")
    print(f"{'cut':<24s} {'cum ms':>8s} {'delta ms':>9s} "
          f"{'seg MFU%':>9s} {'seg HBM%':>9s}")
    prev = prev_f = prev_b = 0.0
    for name, fn in cuts:
        jf = jax.jit(lambda xx, fn=fn: model.apply(variables, xx,
                                                   method=fn))
        dt = timeit(jf, x)
        f, by = cost(jf, x)
        d, df, db = dt - prev, f - prev_f, by - prev_b
        mfu = df / d / peak_tflops * 100 if d > 0 else 0.0
        hbm = db / d / peak_gbps * 100 if d > 0 else 0.0
        print(f"{name:<24s} {dt * 1e3:8.2f} {d * 1e3:+9.2f} "
              f"{mfu:9.1f} {hbm:9.1f}")
        prev, prev_f, prev_b = dt, f, by

    from collections import namedtuple

    from saunet_tpu.train import make_infer_step
    View = namedtuple("View", ["params", "batch_stats"])
    state = View(variables["params"], variables["batch_stats"])
    infer_ship = make_infer_step(model)  # auto -> packed program at 512²
    dt = timeit(infer_ship, state, x)
    print(f"{'shipping infer step':<24s} {dt * 1e3:8.2f}")


if __name__ == "__main__":
    main()
