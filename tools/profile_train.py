"""Break the TRAIN step into segment fwd+bwd costs on the real chip.

The round-1 profile showed the train step is HBM-bound (~279 GB/step at
b64/224²) but never attributed the traffic. This tool times jax.grad over
truncated objectives (encoder only, encoder+shape-stream, full loss) and
reads each compiled executable's cost model, so the next kernel/graph
restructure targets the measured hot segment rather than the assumed one.

Segments are cumulative (each includes the previous), so consecutive
differences approximate per-segment fwd+bwd cost. Exact attribution is
impossible (XLA fuses across segment boundaries), but the deltas are the
decision-grade signal.

Env: PROF_BATCH (64), PROF_HW (224), PROF_STEPS (10), PROF_CONCAT
(chain|buffer), PROF_REMAT=1, PROF_STREAM (xla|packed), PROF_DECODER=1
(per-decoder-stage attribution: cumulative grads through center, dec5..dec2,
and the full-res tail, so the decoder trunk — half of SAUNet.forward,
/root/reference/models/models.py:371-384 — gets the same decision-grade
breakdown the round-2 work gave the encoder and shape stream).
"""
from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

def _enable_cache():
    # Enabled only AFTER the CPU-side init (create_train_state
    # init_on_cpu): CPU programs are compiled remotely here for a machine
    # with ISA features this host lacks — caching/loading such a CPU
    # executable logs AOT feature-mismatch errors and can SIGILL
    # (bench.py applies the same ordering).
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from saunet_tpu.models import SAUNet  # noqa: E402
from saunet_tpu.train import create_train_state, make_train_step, radam  # noqa: E402
from saunet_tpu.train.losses import dual_loss  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "64"))
HW = int(os.environ.get("PROF_HW", "224"))
STEPS = int(os.environ.get("PROF_STEPS", "10"))
CONCAT = os.environ.get("PROF_CONCAT", "chain")
REMAT = os.environ.get("PROF_REMAT", "0") == "1"
STREAM = os.environ.get("PROF_STREAM", "xla")
DECODER = os.environ.get("PROF_DECODER", "0") == "1"


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, *args):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / STEPS
    flops = hbm = None
    try:
        lfn = getattr(fn, "_jitted", fn)  # make_train_step wrapper
        ca = lfn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops, hbm = ca.get("flops"), ca.get("bytes accessed")
    except Exception:
        pass
    extra = ""
    if hbm:
        extra = f"  {hbm / 1e9:7.1f} GB  {hbm / dt / 1e9:6.0f} GB/s"
    if flops:
        extra += f"  {flops / dt / 1e12:6.1f} TF/s"
    print(f"{name:<34s} {dt * 1e3:8.2f} ms{extra}")
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
    model = SAUNet(num_classes=4, dtype=jnp.bfloat16, remat=REMAT,
                   encoder_concat=CONCAT, stream_impl=STREAM)
    tx = radam(1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               input_shape=(1, HW, HW, 3),
                               init_on_cpu=True)
    _enable_cache()
    print(f"batch {B} @ {HW}²  concat={CONCAT} remat={REMAT} "
          f"stream={STREAM} device {jax.devices()[0].platform}")

    def enc_loss(params, stats, images):
        (taps, mut) = model.apply(
            {"params": params, "batch_stats": stats}, images, True,
            mutable=["batch_stats"],
            method=lambda m, xx, t: m.encoder(xx, t))
        loss = sum(jnp.mean(t.astype(jnp.float32) ** 2) for t in taps)
        return loss, mut["batch_stats"]

    def ss_loss(params, stats, images):
        def run(m, xx, t):
            taps = m.encoder(xx, t)
            edge_out, gates = m.shape_stream(taps[1:], xx, t)
            return taps, edge_out
        ((taps, edge_out), mut) = model.apply(
            {"params": params, "batch_stats": stats}, images, True,
            mutable=["batch_stats"], method=run)
        loss = (sum(jnp.mean(t.astype(jnp.float32) ** 2) for t in taps)
                + jnp.mean(edge_out))
        return loss, mut["batch_stats"]

    def full_loss(params, stats, b):
        # the REAL train-step objective: packed models keep (seg, edge)
        # lane-packed through the loss (train_outputs + dual_loss_packed),
        # exactly like make_train_step — measuring the dense __call__ here
        # would charge the tail for a 32x-lane-padded logits tensor the
        # train program never materialises.
        if STREAM == "packed":
            from saunet_tpu.train.losses import dual_loss_packed
            (seg, edge), mut = model.apply(
                {"params": params, "batch_stats": stats}, b["image"], True,
                mutable=["batch_stats"], method="train_outputs")
            total, _ = dual_loss_packed(seg, edge, b["label"], b["edge"])
        else:
            (seg, edge), mut = model.apply(
                {"params": params, "batch_stats": stats}, b["image"], True,
                mutable=["batch_stats"])
            total, _ = dual_loss(seg, edge, b["label"], b["edge"])
        return total, mut["batch_stats"]

    @jax.jit
    def fwd_full(params, stats, b):
        return full_loss(params, stats, b)[0]

    @jax.jit
    def g_enc(params, stats, images):
        (l, _), g = jax.value_and_grad(enc_loss, has_aux=True)(
            params, stats, images)
        return l, g

    @jax.jit
    def g_ss(params, stats, images):
        (l, _), g = jax.value_and_grad(ss_loss, has_aux=True)(
            params, stats, images)
        return l, g

    @jax.jit
    def g_full(params, stats, b):
        (l, _), g = jax.value_and_grad(full_loss, has_aux=True)(
            params, stats, b)
        return l, g

    step = make_train_step(model, tx, donate=False)

    p, s = state.params, state.batch_stats
    timeit("fwd only (train mode, loss)", fwd_full, p, s, batch)
    t_enc = timeit("grad: encoder only", g_enc, p, s, batch["image"])
    t_ss = timeit("grad: encoder+shape stream", g_ss, p, s, batch["image"])
    t_full = timeit("grad: full loss", g_full, p, s, batch)
    t_step = timeit("train step (grad+RAdam)", step, state, batch,
                    jax.random.PRNGKey(1))
    print(f"\nsegment deltas (fwd+bwd): encoder {t_enc * 1e3:.1f} ms, "
          f"shape stream +{(t_ss - t_enc) * 1e3:.1f} ms, "
          f"decoder/edge/loss +{(t_full - t_ss) * 1e3:.1f} ms, "
          f"optimizer +{(t_step - t_full) * 1e3:.1f} ms")

    if os.environ.get("PROF_SS", "0") == "1" and STREAM == "packed":
        # --- packed shape-stream sub-stage attribution -------------------
        from saunet_tpu.models.packed_stream import stream_packs
        from saunet_tpu.ops.packed import resize_bilinear_packed

        def make_ss_stage(n):
            """enc + stream prefix: 0=d0+resize, 1=+res1, 2=+d1/c3/gate1,
            3=+res2/d2/c4/gate2, 4=+res3/d3/c5/gate3, 5=+fuse."""
            def run(m, xx, t):
                taps = m.encoder(xx, t)[1:]
                conv2, conv3, conv4, conv5 = taps
                h, w = xx.shape[1], xx.shape[2]
                pk = stream_packs(w)
                p1 = pk[1]
                outs = list(taps)
                ss = resize_bilinear_packed(m.d0(conv2), (h, w), pk[64])
                if n >= 1:
                    ss = m.res1(ss, pk[64], t)
                if n >= 2:
                    ss = m.d1(ss, pk[64], pk[32])
                    c3 = resize_bilinear_packed(m.c3(conv3), (h, w), p1)
                    ss, _ = m.gate1(ss, c3, pk[32], p1, t)
                if n >= 3:
                    ss = m.res2(ss, pk[32], t)
                    ss = m.d2(ss, pk[32], pk[16])
                    c4 = resize_bilinear_packed(m.c4(conv4), (h, w), p1)
                    ss, _ = m.gate2(ss, c4, pk[16], p1, t)
                if n >= 4:
                    ss = m.res3(ss, pk[16], t)
                    ss = m.d3(ss, pk[16], pk[8])
                    c5 = resize_bilinear_packed(m.c5(conv5), (h, w), p1)
                    ss, _ = m.gate3(ss, c5, pk[8], p1, t)
                if n >= 5:
                    ss = m.fuse(ss, pk[8], p1)
                outs.append(ss)
                return outs

            def loss(params, stats, images):
                outs, mut = model.apply(
                    {"params": params, "batch_stats": stats}, images, True,
                    mutable=["batch_stats"], method=run)
                l = sum(jnp.mean(o.astype(jnp.float32))
                        for o in jax.tree.leaves(outs))
                return l, mut["batch_stats"]

            @jax.jit
            def g(params, stats, images):
                (l, _), grads = jax.value_and_grad(loss, has_aux=True)(
                    params, stats, images)
                return l, grads

            return g

        ss_names = ["d0+resize", "res1", "d1+c3+gate1", "res2+d2+c4+gate2",
                    "res3+d3+c5+gate3", "fuse"]
        prev = t_enc
        print("\nshape-stream sub-stage deltas (cumulative fwd+bwd, on top "
              "of encoder):")
        for i, name in enumerate(ss_names):
            t = timeit(f"grad: ..+{name}", make_ss_stage(i), p, s,
                       batch["image"])
            print(f"    {name:<18s} +{(t - prev) * 1e3:7.2f} ms")
            prev = t
        print(f"    {'sigmoid/rest':<18s} +{(t_ss - prev) * 1e3:7.2f} ms")

    if not DECODER:
        return

    # --- per-decoder-stage attribution (cumulative grads) ----------------
    from saunet_tpu.models.blocks import max_pool_2x2
    from saunet_tpu.ops.resize import resize_bilinear

    def make_dec_loss(n_stages):
        """enc + stream + skip resizes + center + the first n_stages
        DualAttBlocks (0..4; 4 = through dec2)."""
        def run(m, xx, t):
            taps = m.encoder(xx, t)[1:]
            if STREAM == "packed":
                edge_out, _ = m._shape_stream_packed_core(taps, xx, t)
            else:
                edge_out, _ = m.shape_stream(taps, xx, t)
            conv2, conv3, conv4, conv5 = taps
            ups = [resize_bilinear(c, (c.shape[1] * 2, c.shape[2] * 2))
                   for c in (conv2, conv3, conv4)]
            conv2u, conv3u, conv4u = ups
            d = m.center(max_pool_2x2(conv5), t)
            outs = [edge_out, conv2u, conv3u, conv4u, d]
            seq = [(m.dec5, conv5), (m.dec4, conv4u),
                   (m.dec3, conv3u), (m.dec2, conv2u)]
            if STREAM == "packed":
                from saunet_tpu.models.packed_stream import stream_packs
                pks = stream_packs(xx.shape[2])
                if pks[32] % 2 != 0:  # mirror SAUNet._decode_packed's guard
                    raise ValueError(
                        f"packed decoder profiling needs a 2-divisible "
                        f"32-channel pack; got width {xx.shape[2]} (packs "
                        f"{pks}). Run with STREAM=xla for this geometry.")
                p2 = pks[32] // 2
                packs = [1, 1, 1, p2]
                for (blk, skip), pp in zip(seq[:n_stages], packs):
                    d, _ = blk([d, skip], pp, t)
            else:
                for blk, skip in seq[:n_stages]:
                    d, _ = blk([d, skip], t)
            outs.append(d)
            return outs

        def loss(params, stats, images):
            outs, mut = model.apply(
                {"params": params, "batch_stats": stats}, images, True,
                mutable=["batch_stats"], method=run)
            l = sum(jnp.mean(o.astype(jnp.float32))
                    for o in jax.tree.leaves(outs))
            return l, mut["batch_stats"]

        @jax.jit
        def g(params, stats, images):
            (l, _), grads = jax.value_and_grad(loss, has_aux=True)(
                params, stats, images)
            return l, grads

        return g

    names = ["resizes+center", "dec5", "dec4", "dec3", "dec2"]
    prev = t_ss
    print("\ndecoder-stage deltas (cumulative fwd+bwd, on top of "
          "enc+stream):")
    for i, name in enumerate(names):
        t = timeit(f"grad: ..+{name}", make_dec_loss(i), p, s,
                   batch["image"])
        print(f"    {name:<16s} +{(t - prev) * 1e3:7.2f} ms")
        prev = t
    print(f"    {'tail(edge fusion+dec1/0+head+loss)':<16s} "
          f"+{(t_full - prev) * 1e3:7.2f} ms")

    if STREAM != "packed" or os.environ.get("PROF_TAIL", "0") != "1":
        return

    # --- packed full-res tail sub-stages (PROF_TAIL=1) --------------------
    from flax import linen as fnn
    from saunet_tpu.models.packed_stream import stream_packs
    from saunet_tpu.ops.edge import image_to_gray255
    from saunet_tpu.ops.packed import pack

    def make_tail_loss(stage):
        """Cumulative grads through the packed tail: 1=+canny/edge-fusion,
        2=+dec1, 3=+dec0, 4=+head — mirrors SAUNet._decode_packed."""
        def run(m, xx, t):
            taps = m.encoder(xx, t)[1:]
            edge_p, _ = m._shape_stream_packed_core(taps, xx, t)
            w = xx.shape[2]
            pk = stream_packs(w)
            p1, p32 = pk[1], pk[32]
            nf, dt = m.num_filters, m.dtype
            d, _ = m._dualatt_decoder_packed(taps, p32 // 2, t)
            outs = [edge_p, d]
            if stage >= 1:
                gray = image_to_gray255(xx)
                canny_p = pack(
                    jax.lax.stop_gradient(m._canny(gray)).astype(dt), p1)
                kcw, _ = m.cw()
                kcw = kcw.astype(dt)
                acts = fnn.sigmoid(edge_p.astype(dt) * kcw[0, 0]
                                   + canny_p * kcw[1, 0])
                edge = m.expand(acts, p1, p32, t)
                outs.append(edge)
            if stage >= 2:
                dec1 = m.dec1(d, p32 // 2, t)
                outs.append(dec1)
            if stage >= 3:
                dec0 = m.dec0([(dec1, nf), (edge, nf)], p32, p32, t)
                outs.append(dec0)
            if stage >= 4:
                pseg, mult = p32, p32
                while (mult + p32) * m.num_classes <= 128:
                    mult += p32
                    if w % mult == 0:
                        pseg = mult
                outs.append(m.final(dec0, p32, pseg))
            return outs

        def loss(params, stats, images):
            outs, mut = model.apply(
                {"params": params, "batch_stats": stats}, images, True,
                mutable=["batch_stats"], method=run)
            l = sum(jnp.mean(o.astype(jnp.float32))
                    for o in jax.tree.leaves(outs))
            return l, mut["batch_stats"]

        @jax.jit
        def g(params, stats, images):
            (l, _), grads = jax.value_and_grad(loss, has_aux=True)(
                params, stats, images)
            return l, grads

        return g

    tail_names = ["canny+edge fusion", "dec1", "dec0", "head"]
    print("\npacked tail deltas (cumulative fwd+bwd, on top of ..+dec2):")
    for i, name in enumerate(tail_names, 1):
        t = timeit(f"grad: ..+{name}", make_tail_loss(i), p, s,
                   batch["image"])
        print(f"    {name:<18s} +{(t - prev) * 1e3:7.2f} ms")
        prev = t
    print(f"    {'packed dual loss':<18s} +{(t_full - prev) * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
