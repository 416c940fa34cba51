"""Benchmark: SAUNet train-step throughput (slices/sec/chip) at 224².

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the denominator is a
measured PyTorch CPU baseline of the same architecture and step
(tools/torch_baseline.py), cached in baseline_torch.json. If the cache is
missing, vs_baseline falls back to 1.0 with a note on stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def sanity_check(dt, steps, flops, hbm_bytes, peak_tflops, peak_gbps):
    """Reject physically impossible timings (VERDICT r3 weak #1: BENCH_r03
    published 1197% MFU from a broken sync). Returns a reason string if the
    timing is impossible, else None."""
    step_s = dt / steps
    if dt <= 0:
        return "non-positive wall time"
    if flops and flops / step_s / (peak_tflops * 1e12) > 1.0:
        return f"MFU>100% ({flops / step_s / (peak_tflops * 1e10):.0f}%)"
    # "bytes accessed" overestimates true HBM traffic (fused/cached
    # accesses are still counted — the augmented train step measures
    # a reproducible 315 ms against a 384 ms naive bound), so flag
    # only timings below HALF the cost-model bound: broken syncs miss
    # by 40x (BENCH_r03), not 1.2x.
    if hbm_bytes and step_s < hbm_bytes / (peak_gbps * 1e9) / 2:
        return (f"step {step_s*1e3:.2f} ms under half the HBM bound "
                f"{hbm_bytes / (peak_gbps * 1e6):.2f} ms")
    return None


def measure_with_retry(timed_run, check):
    """Run the timing loop, retry ONCE if the sanity gate rejects it, and
    exit(1) rather than publish a still-insane number."""
    dt = timed_run()
    problem = check(dt)
    if problem:
        print(f"bench: insane timing ({problem}); retrying once",
              file=sys.stderr)
        dt = timed_run()
        problem = check(dt)
        if problem:
            print(f"bench: timing still insane after retry ({problem}); "
                  "refusing to publish garbage", file=sys.stderr)
            sys.exit(1)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    def enable_cache():
        # Persistent compile cache for TPU programs (the remote compiler is
        # slow). Enabled only AFTER the CPU-side init: CPU programs are also
        # compiled remotely here, for a machine with ISA features this host
        # lacks — loading such a cached CPU executable can SIGILL.
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass

    from saunet_tpu.models import SAUNet
    from saunet_tpu.train import create_train_state, make_train_step, radam

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    hw = int(os.environ.get("BENCH_HW", "224"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    mode = os.environ.get("BENCH_MODE", "train")  # train | infer | eval
    # fused Pallas encoder dispatch for infer/eval: auto (TPU bf16 on),
    # 0 (off — measures the pure packed/XLA eval program), 1 (force on)
    fused = {"auto": "auto", "0": False, "1": True}[
        os.environ.get("BENCH_FUSED", "auto")]
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    augment = os.environ.get("BENCH_AUGMENT", "0") == "1"
    donate = os.environ.get("BENCH_DONATE", "0") == "1"
    concat = os.environ.get("BENCH_CONCAT", "chain")  # chain | buffer
    stream = os.environ.get("BENCH_STREAM", "auto")  # auto | xla | packed

    from saunet_tpu.train import make_infer_step

    if stream == "auto":
        from saunet_tpu.models.packed_stream import packed_stream_worthwhile
        stream = "packed" if packed_stream_worthwhile(hw) else "xla"
    model = SAUNet(num_classes=4, dtype=jnp.bfloat16, remat=remat,
                   encoder_concat=concat, stream_impl=stream)
    tx = radam(1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               input_shape=(1, hw, hw, 3),
                               init_on_cpu=True)
    enable_cache()

    rs = np.random.RandomState(0)
    b = {
        "image": jnp.asarray(rs.randn(batch, hw, hw, 3).astype(np.float32)),
        "label": jnp.asarray(
            rs.randint(0, 4, size=(batch, hw, hw)).astype(np.int32)),
        "edge": jnp.asarray(
            (rs.rand(batch, hw, hw, 1) > 0.8).astype(np.float32)),
    }
    rng = jax.random.PRNGKey(1)

    def cost_analysis(jfn, *args):
        """(flops, hbm bytes) per step from the compiled executable's cost
        model; None on backends/tunnels that don't expose it."""
        try:
            jfn = getattr(jfn, "_jitted", jfn)  # make_train_step wrapper
            ca = jfn.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return ca.get("flops"), ca.get("bytes accessed")
        except Exception:
            return None, None

    def sync(x):
        # On the axon TPU tunnel jax.block_until_ready can return before
        # the program actually finishes (.claude/skills/verify/SKILL.md);
        # the only reliable sync is a scalar host transfer.
        return float(jnp.asarray(x, dtype=jnp.float32).sum())

    flops = hbm_bytes = None
    if mode == "saliency":
        # driver config #4 (interpretability): SmoothGrad over n noisy
        # guided backprops, vmapped into device batches — the reference
        # runs the same workload as n sequential hooked forward+backward
        # passes (/root/reference/smoothgrad.py:18-45)
        from saunet_tpu.interpret.saliency import (guided_model,
                                                   smooth_grad,
                                                   vanilla_gradients)
        n_noisy = int(os.environ.get("BENCH_SG_N", "50"))
        sg_batch = int(os.environ.get("BENCH_SG_BATCH", "10"))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        gmodel = guided_model(model)
        image, target = b["image"][0], b["label"][0]
        gf = jax.jit(
            lambda img: vanilla_gradients(gmodel, variables, img, target))
        out = smooth_grad(gf, rng, image, n=n_noisy, batch_size=sg_batch)
        sync(out[0, 0])

        def timed_run():
            t0 = time.perf_counter()
            for _ in range(steps):
                out = smooth_grad(gf, rng, image, n=n_noisy,
                                  batch_size=sg_batch)
            sync(out[0, 0])
            return time.perf_counter() - t0
    elif mode == "infer":
        infer = make_infer_step(model, fused_encoder=fused)
        _, preds, _ = infer(state, b["image"])
        sync(preds[0, 0, 0])
        flops, hbm_bytes = cost_analysis(infer, state, b["image"])

        def timed_run():
            t0 = time.perf_counter()
            for _ in range(steps):
                _, preds, _ = infer(state, b["image"])
            sync(preds[0, 0, 0])
            return time.perf_counter() - t0
    elif mode == "eval":
        # the val-epoch program: forward + dual loss + in-graph metrics
        # (the reference's per-sample eval loop, /root/reference/train.py:25-64)
        from saunet_tpu.train import make_eval_step
        ev = make_eval_step(model, fused_encoder=fused)
        _, _, m = ev(state, b)
        sync(m["loss"])
        flops, hbm_bytes = cost_analysis(ev, state, b)

        def timed_run():
            t0 = time.perf_counter()
            for _ in range(steps):
                _, _, m = ev(state, b)
            sync(m["loss"])
            return time.perf_counter() - t0
    else:
        augment_fn = None
        if augment:
            # the real training path: flips/rotation/elastic/gamma/z-score
            # + edge ground truth fused into the compiled step
            from saunet_tpu.data import make_augment_fn
            augment_fn = make_augment_fn(num_classes=4)
            b = {"image": b["image"][..., 0], "label": b["label"]}
        step = make_train_step(model, tx, donate=donate,
                               augment_fn=augment_fn)
        if not donate:  # donated buffers invalidate re-lowering args
            flops, hbm_bytes = cost_analysis(step, state, b, rng)
        state, metrics = step(state, b, rng)
        sync(metrics["loss"])

        def timed_run():
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(steps):
                state, metrics = step(state, b, rng)
            # each step consumes the previous state, so syncing the final
            # loss transitively waits for the whole chain
            sync(metrics["loss"])
            return time.perf_counter() - t0

    peak_tflops = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
    peak_gbps = float(os.environ.get("BENCH_PEAK_GBPS", "819"))
    dt = measure_with_retry(
        timed_run,
        lambda d: sanity_check(d, steps, flops, hbm_bytes,
                               peak_tflops, peak_gbps))

    slices_per_sec = (steps if mode == "saliency" else batch * steps) / dt

    # Roofline placement (the honest perf claim — VERDICT r1 §weak 1):
    # MFU against the chip's peak matmul throughput and achieved HBM
    # bandwidth against its memory roofline. Peaks default to TPU v5e
    # (197 bf16 TFLOP/s, 819 GB/s) and are env-overridable for other chips.
    step_s = dt / steps
    mfu_pct = hbm_gbps = hbm_pct = None
    if flops:
        mfu_pct = round(flops / step_s / (peak_tflops * 1e12) * 100, 2)
    if hbm_bytes:
        hbm_gbps = round(hbm_bytes / step_s / 1e9, 1)
        hbm_pct = round(100 * hbm_gbps / peak_gbps, 1)

    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "baseline_torch.json")
    vs_baseline = 1.0
    if mode == "saliency":
        pass  # no torch saliency baseline measured; vs_baseline stays 1.0
    elif os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        ref = base.get("train_slices_per_sec")
        if ref:
            vs_baseline = slices_per_sec / ref
    else:
        print("bench: baseline_torch.json missing; vs_baseline=1.0",
              file=sys.stderr)

    tag = f"{mode}+aug" if (mode == "train" and augment) else mode
    if mode == "saliency":
        tag = f"SmoothGrad-{os.environ.get('BENCH_SG_N', '50')} guided"
    unit = "maps/sec" if mode == "saliency" else "slices/sec/chip"
    out = {
        "metric": f"SAUNet {tag} {unit} @{hw}² bf16"
                  + ("" if mode == "saliency" else f" batch {batch}"),
        "value": round(slices_per_sec, 2),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 2),
        "step_ms": round(step_s * 1e3, 2),
        "mfu_pct": mfu_pct,
        "hbm_gbps": hbm_gbps,
        "hbm_util_pct": hbm_pct,
    }
    if hbm_pct is not None and hbm_pct > 100:
        # the cost model counts logical bytes accessed; gather-heavy
        # programs (fused augmentation) re-count rows the hardware serves
        # from cache, so the derived "bandwidth" can exceed the physical
        # peak. The timing is real (MFU stays sane); the bytes are an
        # upper bound on true HBM traffic.
        out["hbm_note"] = ("cost-model bytes overcount gather reuse; "
                          ">100% reflects the overcount, not the timing")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
