"""Sub-profile SAUNet.decode on the real chip: shape stream vs edge fusion
vs dual-attention decoder vs resizes — picks the next kernel target."""
from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from saunet_tpu.models import SAUNet  # noqa: E402
from saunet_tpu.models.fused_encoder import encoder_apply_fused  # noqa: E402
from saunet_tpu.ops.resize import resize_bilinear  # noqa: E402
from saunet_tpu.ops.edge import image_to_gray255  # noqa: E402

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
    print(f"{name:<30s} {(time.perf_counter()-t0)/STEPS*1e3:8.2f} ms/batch")


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, HW, HW, 3).astype(np.float32))
    model = SAUNet(num_classes=4, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)

    @jax.jit
    def enc(x):
        p, s = variables["params"], variables["batch_stats"]
        return encoder_apply_fused(p["encoder"], s["encoder"], x)

    taps = enc(x)
    jax.block_until_ready(taps)
    _, conv2, conv3, conv4, conv5 = taps
    xb = x.astype(jnp.bfloat16)

    def shape_stream(m, conv2, conv3, conv4, conv5, x):
        h, w = x.shape[1], x.shape[2]
        ss = m.d0(conv2)
        ss = resize_bilinear(ss, (h, w))
        ss = m.res1(ss, False)
        ss = m.d1(ss)
        c3 = resize_bilinear(m.c3(conv3), (h, w))
        ss, g1 = m.gate1(ss, c3, False)
        ss = m.res2(ss, False)
        ss = m.d2(ss)
        c4 = resize_bilinear(m.c4(conv4), (h, w))
        ss, g2 = m.gate2(ss, c4, False)
        ss = m.res3(ss, False)
        ss = m.d3(ss)
        c5 = resize_bilinear(m.c5(conv5), (h, w))
        ss, g3 = m.gate3(ss, c5, False)
        return nn.sigmoid(m.fuse(ss).astype(jnp.float32))

    def edge_fuse(m, edge_out, x):
        gray = image_to_gray255(x)
        canny = m._canny(gray).astype(m.dtype)
        cat = jnp.concatenate([edge_out.astype(m.dtype), canny], axis=-1)
        return m.expand(nn.sigmoid(m.cw(cat)), False)

    def decoder(m, conv2, conv3, conv4, conv5, edge):
        from saunet_tpu.models.blocks import max_pool_2x2
        conv2u = resize_bilinear(conv2, (conv2.shape[1] * 2,
                                         conv2.shape[2] * 2))
        conv3u = resize_bilinear(conv3, (conv3.shape[1] * 2,
                                         conv3.shape[2] * 2))
        conv4u = resize_bilinear(conv4, (conv4.shape[1] * 2,
                                         conv4.shape[2] * 2))
        center = m.center(max_pool_2x2(conv5), False)
        dec5, _ = m.dec5([center, conv5], False)
        dec4, _ = m.dec4([dec5, conv4u], False)
        dec3, _ = m.dec3([dec4, conv3u], False)
        dec2, _ = m.dec2([dec3, conv2u], False)
        dec1 = m.dec1(dec2, False)
        dec0 = m.dec0(jnp.concatenate([dec1, edge], axis=-1), False)
        return m.final(dec0).astype(jnp.float32)

    ss_fn = jax.jit(lambda c2, c3, c4, c5, x: model.apply(
        variables, c2, c3, c4, c5, x, method=shape_stream))
    edge_out = ss_fn(conv2, conv3, conv4, conv5, xb)
    jax.block_until_ready(edge_out)
    ef_fn = jax.jit(lambda e, x: model.apply(variables, e, x,
                                             method=edge_fuse))
    edge = ef_fn(edge_out, xb)
    jax.block_until_ready(edge)
    dec_fn = jax.jit(lambda c2, c3, c4, c5, e: model.apply(
        variables, c2, c3, c4, c5, e, method=decoder))

    print(f"batch {B} @ {HW}²  device {jax.devices()[0].platform}")
    timeit("shape stream (full res)", ss_fn, conv2, conv3, conv4, conv5, xb)
    timeit("edge fusion (canny+cw)", ef_fn, edge_out, xb)
    timeit("dual-att decoder + head", dec_fn, conv2, conv3, conv4, conv5,
           edge)


if __name__ == "__main__":
    main()
