"""Decompose the train step's optimizer+metrics segment (r4 profiler:
+23.3 ms on top of grad(full loss) at b64 @224² packed, moving only
~4.8 GB — ~206 GB/s, far below the 770 GB/s the rest of the step
achieves, so the segment is NOT bandwidth-bound and is the top
remaining target).

Times four programs (cumulative): grad only, grad+RAdam, grad+metrics,
the full train step — so the RAdam update and the in-graph metrics
(packed_argmax + pixel_acc) are attributed separately.

Env: PROF_BATCH (64), PROF_HW (224), PROF_STEPS (10), PROF_STREAM.
"""
from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

def _enable_cache():
    # only after the CPU-side init — see profile_train.py / bench.py:
    # remotely-compiled CPU executables carry foreign ISA features
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from saunet_tpu.models import SAUNet  # noqa: E402
from saunet_tpu.train import create_train_state, make_train_step, radam  # noqa: E402
from saunet_tpu.train.losses import dual_loss, dual_loss_packed  # noqa: E402
from saunet_tpu.train.metrics import pixel_acc  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "64"))
HW = int(os.environ.get("PROF_HW", "224"))
STEPS = int(os.environ.get("PROF_STEPS", "10"))
STREAM = os.environ.get("PROF_STREAM", "packed")


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS
    hbm = None
    try:
        lfn = getattr(fn, "_jitted", fn)  # make_train_step wrapper
        ca = lfn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        hbm = ca.get("bytes accessed")
    except Exception:
        pass
    extra = f"  {hbm / 1e9:6.1f} GB" if hbm else ""
    print(f"{name:32s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.rand(B, HW, HW, 3).astype(np.float32)),
        "label": jnp.asarray(
            rs.randint(0, 4, size=(B, HW, HW)).astype(np.int32)),
        "edge": jnp.asarray(
            (rs.rand(B, HW, HW, 1) > 0.8).astype(np.float32)),
    }
    model = SAUNet(num_classes=4, dtype=jnp.bfloat16, stream_impl=STREAM)
    tx = radam(1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               input_shape=(1, HW, HW, 3), init_on_cpu=True)
    _enable_cache()
    packed = STREAM == "packed"
    print(f"batch {B} @ {HW}²  stream={STREAM}")

    def loss_fn(params, stats, b):
        if packed:
            (seg, edge), mut = model.apply(
                {"params": params, "batch_stats": stats}, b["image"], True,
                mutable=["batch_stats"], method="train_outputs")
            total, parts = dual_loss_packed(seg, edge, b["label"], b["edge"])
        else:
            (seg, edge), mut = model.apply(
                {"params": params, "batch_stats": stats}, b["image"], True,
                mutable=["batch_stats"])
            total, parts = dual_loss(seg, edge, b["label"], b["edge"])
        return total, (mut["batch_stats"], seg, parts)

    @jax.jit
    def g_only(state, b):
        (_, (_, _, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, b)
        return parts["loss"], grads

    @jax.jit
    def g_radam(state, b):
        (_, (stats, _, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, b)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return parts["loss"], state.replace(
            params=params, batch_stats=stats, opt_state=opt_state)

    @jax.jit
    def g_metrics(state, b):
        (_, (_, seg, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, b)
        if packed:
            from saunet_tpu.ops.packed import packed_argmax
            preds = packed_argmax(seg, 4)
        else:
            preds = jnp.argmax(seg, axis=-1)
        acc, jacc = pixel_acc(preds, b["label"], 4)
        return parts["loss"], acc, jacc, grads

    @jax.jit
    def g_all(state, b):
        """RAdam AND metrics together — isolates the interaction term
        (r4 measured: RAdam alone +6.96, metrics alone +0.94, full step
        +23.72: the union costs more than the sum of parts)."""
        (_, (stats, seg, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, b)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if packed:
            from saunet_tpu.ops.packed import packed_argmax
            preds = packed_argmax(seg, 4)
        else:
            preds = jnp.argmax(seg, axis=-1)
        acc, jacc = pixel_acc(preds, b["label"], 4)
        new_state = state.replace(params=params, batch_stats=stats,
                                  opt_state=opt_state)
        return parts["loss"], acc, jacc, new_state

    step = make_train_step(model, tx, donate=False)
    step_d = make_train_step(model, tx, donate=True)

    t_g = timeit("grad only", g_only, state, batch)
    t_r = timeit("grad + RAdam", g_radam, state, batch)
    t_m = timeit("grad + metrics", g_metrics, state, batch)
    t_a = timeit("grad + RAdam + metrics", g_all, state, batch)
    t_s = timeit("full train step", step, state, batch,
                 jax.random.PRNGKey(1))

    def run_donated():
        # donated buffers are consumed per call — thread the state
        s = jax.tree.map(jnp.copy, state)
        rng = jax.random.PRNGKey(1)
        s, m = step_d(s, batch, rng)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            s, m = step_d(s, batch, rng)
        float(m["loss"])
        return (time.perf_counter() - t0) / STEPS

    t_sd = run_donated()
    print(f"{'full train step (donated)':32s} {t_sd * 1e3:8.2f} ms")
    print(f"\nRAdam update: +{(t_r - t_g) * 1e3:.2f} ms   "
          f"metrics (argmax+pixel_acc): +{(t_m - t_g) * 1e3:.2f} ms   "
          f"both: +{(t_a - t_g) * 1e3:.2f} ms   "
          f"step total over grad: +{(t_s - t_g) * 1e3:.2f} ms   "
          f"donated step: {t_sd * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
