"""Per-segment attribution of the fused-encoder INFERENCE program
(VERDICT r4 task #1 / docs/KERNELS.md §10).

The shipping `make_infer_step` fused program runs 69.5 ms at b64 @224²
(921 slices/sec) at only 41.4% HBM util / 31.2% MFU — neither roofline
near-saturated, so this tool breaks it into cumulative jitted prefixes
(PROF_DECODER-style: consecutive deltas are decision-grade, not exact,
because XLA fuses across the cut points):

  stem | block1..4 (fused Pallas kernels) | transitions | shape stream
  (packed) | decoder+tail (packed) | argmax

and additionally times the two improvement candidates:

  * packed tail for the fused path: fused encoder -> _decode_packed ->
    packed_argmax, skipping the dense 128-lane-padded (N,H,W,4) logits
    unpack the shipping program pays (make_infer_step packed-vs-fused
    dispatch is either/or today);
  * the same composition + dual_loss_packed + metrics = a candidate
    EVAL program (current auto eval = fully-packed XLA program,
    725.6 slices/sec, because the fused-encoder eval paid ~59 ms of
    dense dual-loss logits traffic — KERNELS.md §5).

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
from saunet_tpu.models.densenet import DENSENET121_BLOCKS  # noqa: E402
from saunet_tpu.models.fused_encoder import _bn_affine  # noqa: E402
from saunet_tpu.ops.packed import packed_argmax  # noqa: E402
from saunet_tpu.train.losses import dual_loss_packed  # noqa: E402
from saunet_tpu.train.metrics import pixel_acc  # noqa: E402
from saunet_tpu.utils.config import cfg  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "64"))
HW = int(os.environ.get("PROF_HW", "224"))
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


def encoder_prefix(params, stats, x, stop: str, dtype=jnp.bfloat16):
    """encoder_apply_fused (models/fused_encoder.py) with a cut point.
    Structure mirrors the shipping function exactly so prefix deltas
    attribute the real program's segments."""
    from flax import linen as nn

    from saunet_tpu.ops.pallas.dense_block import (dense_block_fused,
                                                   pick_band_rows)

    eps = cfg.MODEL.BN_EPS
    x = x.astype(dtype)
    f1 = jax.lax.conv_general_dilated(
        x, params["conv0"]["kernel"].astype(dtype), (2, 2),
        [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    f1 = _bn_affine(f1, params["norm0"], stats["norm0"], eps)
    if stop == "stem":
        return f1
    h = f1
    taps = []
    for i, num_layers in enumerate(DENSENET121_BLOCKS):
        bp = params[f"denseblock{i + 1}"]
        bs = stats[f"denseblock{i + 1}"]
        band = pick_band_rows(h.shape[1], h.shape[2], h.shape[3],
                              num_layers)
        assert band is not None, (i, h.shape)
        h = dense_block_fused(
            h, bp, bs, num_layers=num_layers, eps=eps,
            band_rows=None if band == h.shape[1] else band).astype(dtype)
        if stop == f"block{i + 1}":
            return h
        if i != len(DENSENET121_BLOCKS) - 1:
            tp = params[f"transition{i + 1}"]
            ts = stats[f"transition{i + 1}"]
            t = _bn_affine(h, tp["norm"], ts["norm"], eps)
            t = nn.relu(t)
            t = jax.lax.conv_general_dilated(
                t, tp["conv"]["kernel"].astype(dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = nn.avg_pool(t, (2, 2), strides=(2, 2))
            taps.append(h)
            if stop == f"trans{i + 1}":
                return h
    f5 = _bn_affine(h, params["norm5"], stats["norm5"], eps)
    f2, f3, f4 = taps
    return f1, f2, f3, f4, f5


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, HW, HW, 3).astype(np.float32))
    label = jnp.asarray(rs.randint(0, 4, size=(B, HW, HW)).astype(np.int32))
    edge_t = jnp.asarray((rs.rand(B, HW, HW, 1) > 0.8).astype(np.float32))
    model = SAUNet(num_classes=4, dtype=jnp.bfloat16, stream_impl="packed")
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    ep, es = variables["params"]["encoder"], \
        variables["batch_stats"]["encoder"]

    cuts = ["stem", "block1", "trans1", "block2", "trans2", "block3",
            "trans3", "block4", "encoder"]
    fns = {c: jax.jit(lambda xx, c=c: encoder_prefix(ep, es, xx, c))
           for c in cuts}

    def enc(xx):
        return encoder_prefix(ep, es, xx, "encoder")

    @jax.jit
    def stream(xx):
        f = enc(xx)
        return model.apply(variables, f[1:], xx, False,
                           method="_shape_stream_packed_core")

    @jax.jit
    def decode(xx):
        f = enc(xx)
        seg_p, edge_p, _, _ = model.apply(variables, f[1:], xx, False,
                                          method="_decode_packed")
        return seg_p, edge_p

    @jax.jit
    def infer_packed_tail(xx):
        f = enc(xx)
        seg_p, _, _, _ = model.apply(variables, f[1:], xx, False,
                                     method="_decode_packed")
        return packed_argmax(seg_p, 4)

    @jax.jit
    def eval_packed_tail(xx, lab, et):
        f = enc(xx)
        seg_p, edge_p, _, _ = model.apply(variables, f[1:], xx, False,
                                          method="_decode_packed")
        total, parts = dual_loss_packed(seg_p, edge_p, lab, et)
        preds = packed_argmax(seg_p, 4)
        acc, jacc = pixel_acc(preds, lab, 4)
        return total, parts["ce"], parts["dice"], parts["edge"], acc, jacc

    # the shipping programs for comparison
    from saunet_tpu.train import make_eval_step, make_infer_step
    infer_ship = make_infer_step(model)    # auto -> fused + dense argmax
    eval_ship = make_eval_step(model)      # auto -> fully-packed XLA
    batch = {"image": x, "label": label, "edge": edge_t}

    # logical HBM bytes (in+out feature maps, bf16) for the Pallas blocks
    hw2 = (HW // 2) ** 2
    blk_bytes = {
        "block1": B * hw2 * (64 + 256) * 2,
        "block2": B * hw2 // 4 * (128 + 512) * 2,
        "block3": B * hw2 // 16 * (256 + 1024) * 2,
        "block4": B * hw2 // 64 * (512 + 1024) * 2,
    }

    print(f"batch {B} @ {HW}²  device {jax.devices()[0].platform}  "
          f"steps {STEPS}")
    print(f"{'cut':<24s} {'cum ms':>8s} {'delta ms':>9s} {'eff GB/s':>9s}")
    prev = 0.0
    for c in cuts:
        dt = timeit(fns[c], x)
        d = dt - prev
        bw = ""
        if c in blk_bytes:
            bw = f"{blk_bytes[c] / d / 1e9:8.0f}"
        print(f"{c:<24s} {dt * 1e3:8.2f} {d * 1e3:+9.2f} {bw:>9s}")
        prev = dt
    for name, fn, args in [
        ("+ shape stream (packed)", stream, (x,)),
        ("+ decoder/tail (packed)", decode, (x,)),
        ("+ packed argmax [CAND]", infer_packed_tail, (x,)),
    ]:
        dt = timeit(fn, *args)
        print(f"{name:<24s} {dt * 1e3:8.2f} {(dt - prev) * 1e3:+9.2f}")
        prev = dt

    from collections import namedtuple
    View = namedtuple("View", ["params", "batch_stats"])
    state = View(variables["params"], variables["batch_stats"])

    dt = timeit(infer_ship, state, x)
    print(f"{'shipping infer (dense)':<24s} {dt * 1e3:8.2f}")
    dt = timeit(eval_packed_tail, x, label, edge_t)
    print(f"{'eval fused+packed [CAND]':<24s} {dt * 1e3:8.2f}")
    dt = timeit(eval_ship, state, batch)
    print(f"{'shipping eval (packed)':<24s} {dt * 1e3:8.2f}")


if __name__ == "__main__":
    main()
