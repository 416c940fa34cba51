"""Residual-lean dense block for TRAINING (pure XLA, custom VJP).

The train-path analogue of the eval-side Pallas kernel
(ops/pallas/dense_block.py): attack the O(L²·G) HBM traffic a DenseNet
block pays under plain autodiff. Three sources of redundant traffic in the
textbook 'chain' lowering:

  1. concat copies — every layer materialises a fresh (N,H,W,Cl+G) buffer
     (2·O(L²·G) read+write);
  2. saved residuals — autodiff saves each layer's growing input prefix
     for the backward (O(L²·G) write + read);
  3. double stats pass — BatchNorm reduces the prefix for (mean, var) and
     then reads it again to normalise (2·O(L²·G) reads).

All three exploit the same fact: **channels of the concat are never
overwritten**, so (a) every layer's input prefix is recoverable from the
FINAL buffer, and (b) the per-channel batch statistics a layer's norm1
needs are exactly the statistics of each channel group at the moment it
was produced (one cheap pass over the G new channels, not a re-reduction
of the whole prefix).

Layout discipline (the first, buffer-based attempt measured WORSE than
chain on v5e — 22.6 GB of forward traffic but only 290 GB/s effective
bandwidth, because every 32-channel slice/update of a 128-lane-tiled
buffer is lane-UNALIGNED and runs as partial-tile copies): all HBM-visible
arrays here are either full 128-lane chunks or the layer's native
(. . ., G) group — never an offset slice of a wider array.

  * forward: the concat lives as a list of completed (N,H,W,128) chunks
    plus <=3 pending (N,H,W,G) groups; every 128 channels produced, one
    aligned concat completes a chunk. A layer's 1x1 conv distributes over
    chunks: sum_k relu(a_k*chunk_k + b_k) @ W1_k, f32-accumulated — the
    BN1 affine (a, b assembled from per-group statistics) fuses into the
    matmul operand, so the prefix is read ONCE per layer.
  * backward (custom VJP): the only tensor residual is the final concat.
    Layers run in reverse; each re-slices its chunks at ALIGNED offsets,
    zero-pads its affine over not-yet-live channels (zeros contribute
    nothing through the matmul — the eval kernel's padded-lane trick),
    and re-runs `jax.vjp` over the layer (statistics recomputed from the
    chunks, so the BN batch-statistic gradient terms are exact — NOT a
    straight-through approximation). Chunk cotangents accumulate at
    offset 0 with 128-multiple widths — aligned.

Numerics mirror `flax.linen.BatchNorm` exactly: f32 statistics with the
fast-variance form clipped at zero, f32 normalisation arithmetic cast to
the model dtype at the end, and `lax.pmean` over ``axis_name`` (stacked,
one collective) when the step runs under `shard_map`.

Reference role: the dense blocks ARE the reference's training hot loop —
torchvision densenet121 inside SAUNet.forward
(/root/reference/models/models.py:271,330-334), driven every step by
/root/reference/train.py:90-118.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

GROWTH = 32
LANES = 128


def _stats(x: jnp.ndarray, axis_name: Optional[str]):
    """flax `_compute_stats` (fast variance, f32, clipped): per-channel
    (mean, var) over (N, H, W)."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean((0, 1, 2))
    mu2 = (x32 * x32).mean((0, 1, 2))
    if axis_name is not None:
        mu, mu2 = lax.pmean(jnp.stack([mu, mu2]), axis_name)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    return mu, var


def _normalize(x, mu, var, scale, bias, dtype, eps: float):
    """flax `_normalize` op-for-op: f32 arithmetic, final cast to dtype."""
    y = x.astype(jnp.float32) - mu
    y = y * (lax.rsqrt(var + eps) * scale) + bias
    return y.astype(dtype)


def _affine(mu, var, scale, bias, eps: float):
    """Fold BN (stats + learned affine) into per-channel (a, b), f32:
    normalize(x) == x*a + b. Algebraically equal to `_normalize`; used
    where the affine must fuse into a matmul operand read."""
    a = lax.rsqrt(var + eps) * scale
    return a, bias - mu * a


def _conv3x3(x, w, dtype):
    return lax.conv_general_dilated(
        x, w.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _pad_to(v, n):
    return jnp.pad(v, (0, n - v.shape[0]))


def _layer_from_pieces(pieces, pl, stats1, eps, axis_name, act, dtype,
                       stats2=None):
    """One DenseLayer over channel `pieces` [(array, live_width), ...]
    covering the prefix (possibly with dead trailing lanes in the last
    piece). `stats1`: per-piece (mu, var) over the LIVE channels, or None
    to recompute from the pieces (backward path — keeps the statistics'
    dependence on the inputs so `jax.vjp` carries the BN correction
    terms). `stats2`: running (mu, var) for norm2 (eval mode); None
    computes batch statistics. Returns (new, (mu2, var2))."""
    if stats1 is None:
        stats1 = [_stats(p[..., :live], axis_name)
                  for p, live in pieces]
    hidden = pl["w1"].shape[-1]
    t32 = None
    off = 0
    for (piece, live), (mu, var) in zip(pieces, stats1):
        width = piece.shape[-1]
        a, b = _affine(mu[:live], var[:live], pl["n1s"][off:off + live],
                       pl["n1b"][off:off + live], eps)
        if live < width:  # dead lanes: zero affine -> relu(0) = 0
            a, b = _pad_to(a, width), _pad_to(b, width)
        u = act((piece.astype(jnp.float32) * a + b).astype(dtype))
        w1 = pl["w1"][0, 0, off:off + live].astype(dtype)
        if live < width:  # zero rows: dead-lane u is 0 anyway
            w1 = jnp.pad(w1, ((0, width - live), (0, 0)))
        p = lax.dot_general(u.reshape(-1, width), w1,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        t32 = p if t32 is None else t32 + p
        off += live
    n, h, w_, _ = pieces[0][0].shape
    t = t32.astype(dtype).reshape(n, h, w_, hidden)
    mu2, var2 = _stats(t, axis_name) if stats2 is None else stats2
    s = act(_normalize(t, mu2, var2, pl["n2s"], pl["n2b"], dtype, eps))
    new = _conv3x3(s, pl["w2"], dtype)
    return new, (mu2, var2)


def _forward(cfg, x, layers):
    eps, axis_name, act = cfg
    num_layers = len(layers)
    dtype = x.dtype
    c0 = x.shape[-1]

    # split the input into aligned full chunks + a narrow remainder
    chunks = [x[..., k * LANES:(k + 1) * LANES]
              for k in range(c0 // LANES)]
    pend = []  # [(array, width)] — pending, not yet a full chunk
    if c0 % LANES:
        pend.append((x[..., (c0 // LANES) * LANES:], c0 % LANES))

    # per-piece statistics, parallel to chunks/pend; plus flat per-group
    # lists for the aux (EMA) return
    chunk_stats = [_stats(c, axis_name) for c in chunks]
    pend_stats = [_stats(p, axis_name) for p, _ in pend]
    g_mu = [s[0] for s in chunk_stats] + [s[0] for s in pend_stats]
    g_var = [s[1] for s in chunk_stats] + [s[1] for s in pend_stats]

    stats2 = []
    for l in range(num_layers):
        pieces = ([(c, LANES) for c in chunks]
                  + [(p, w) for p, w in pend])
        stats1 = chunk_stats + pend_stats
        new, (mu2, var2) = _layer_from_pieces(
            pieces, layers[l], stats1, eps, axis_name, act, dtype)
        stats2.append((mu2, var2))
        if l < num_layers - 1:
            st = _stats(new, axis_name)
            g_mu.append(st[0])
            g_var.append(st[1])
        else:
            st = None
        pend.append((new, GROWTH))
        pend_stats.append(st)
        if sum(w for _, w in pend) == LANES:
            chunks.append(jnp.concatenate([p for p, _ in pend], axis=-1))
            if l < num_layers - 1:
                chunk_stats.append((
                    jnp.concatenate([s[0] for s in pend_stats]),
                    jnp.concatenate([s[1] for s in pend_stats])))
            pend, pend_stats = [], []

    # a trailing partial chunk (Cmax % 128 != 0 — test geometries; all
    # densenet121 blocks end 128-aligned) just joins the final concat
    buf = jnp.concatenate(chunks + [p for p, _ in pend], axis=-1)
    # aux: group stats up to c_{L-1} (what the per-layer norm1 EMAs need)
    # plus each layer's norm2 stats. The stats of the LAST G channels are
    # consumed by the Transition/norm5 BatchNorm outside the block, which
    # computes its own — so they are deliberately not computed here.
    aux = (jnp.concatenate(g_mu), jnp.concatenate(g_var), tuple(stats2))
    return buf, aux


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core(cfg, x, layers):
    return _forward(cfg, x, layers)


def _core_fwd(cfg, x, layers):
    out = _forward(cfg, x, layers)
    # The ONLY tensor residual is the output buffer itself (shared with the
    # primal output — no extra HBM) plus the f32 parameter leaves.
    return out, (out[0], layers, x.shape[-1])


def _core_bwd(cfg, res, cots):
    eps, axis_name, act = cfg
    buf, layers, c0 = res
    gbuf, _g_aux = cots  # stats feed EMA buffers only (aux of
    #                      value_and_grad) — their cotangents are zeros
    num_layers = len(layers)
    cmax = buf.shape[-1]
    gacc = gbuf
    glayers = []
    for l in reversed(range(num_layers)):
        cl = c0 + l * GROWTH
        nk = -(-cl // LANES)  # chunks covering the live prefix

        def f(chunks_, pl_, cl=cl, nk=nk):
            pieces = [(c, min(c.shape[-1], cl - k * LANES))
                      for k, c in enumerate(chunks_)]
            return _layer_from_pieces(pieces, pl_, None, eps,
                                      axis_name, act, buf.dtype)[0]

        chunks = tuple(buf[..., k * LANES:min((k + 1) * LANES, cmax)]
                       for k in range(nk))
        g_new = gacc[..., cl:cl + GROWTH]
        _, vjp_fn = jax.vjp(f, chunks, layers[l])
        dchunks, dpl = vjp_fn(g_new)
        glayers.append(dpl)
        # aligned accumulate: offset 0, width nk*128 (clamped at Cmax)
        gacc = gacc.at[..., :min(nk * LANES, cmax)].add(
            jnp.concatenate(dchunks, axis=-1))
    gx = gacc[..., :c0]
    if c0 == cmax:  # degenerate no-layer block
        gx = gbuf
    return gx, tuple(reversed(glayers))


_core.defvjp(_core_fwd, _core_bwd)


def dense_block_train(x: jnp.ndarray, layers: Sequence[dict],
                      eps: float = 1e-5,
                      axis_name: Optional[str] = None,
                      act: Callable = jax.nn.relu):
    """Training-mode dense block, residual-lean custom VJP.

    x: (N, H, W, C0), model dtype. `layers`: per-layer dicts with f32
    leaves n1s/n1b (C_l), w1 (1,1,C_l,hidden), n2s/n2b (hidden),
    w2 (3,3,hidden,G). C0 % G == 0 keeps channel groups landing on chunk
    boundaries (all densenet121 blocks qualify with Cmax % 128 == 0; any
    other geometry still computes correctly, just with a trailing
    partial chunk).

    Returns (buf, (norm1_mean, norm1_var, per-layer (norm2_mean,
    norm2_var))): `buf` is the (N, H, W, Cmax) concat; the stats are the
    f32 batch statistics the caller folds into the running-average EMAs
    (layer l's norm1 stats are the leading C_l entries of norm1_mean/var).
    """
    return _core((float(eps), axis_name, act), x, tuple(layers))


def dense_block_eval(x: jnp.ndarray, layers: Sequence[dict],
                     run_stats: Sequence[dict],
                     eps: float = 1e-5,
                     act: Callable = jax.nn.relu) -> jnp.ndarray:
    """Eval-mode dense block in the same chunked layout: normalise with
    the per-layer RUNNING statistics (`run_stats[l]`: m1/v1 (C_l), m2/v2).
    Plain autodiff (stats are constants); used by the fused module when
    train=False — e.g. the --fix_bn fine-tune step. The inference path
    proper uses the Pallas kernel (ops/pallas/dense_block.py)."""
    dtype = x.dtype
    c0 = x.shape[-1]
    chunks = [x[..., k * LANES:(k + 1) * LANES]
              for k in range(c0 // LANES)]
    pend = []
    if c0 % LANES:
        pend.append((x[..., (c0 // LANES) * LANES:], c0 % LANES))
    for pl, rs in zip(layers, run_stats):
        pieces = [(c, LANES) for c in chunks] + pend
        stats1, off = [], 0
        for _, live in pieces:
            stats1.append((rs["m1"][off:off + live],
                           rs["v1"][off:off + live]))
            off += live
        new, _ = _layer_from_pieces(pieces, pl, stats1, eps, None, act,
                                    dtype, stats2=(rs["m2"], rs["v2"]))
        pend.append((new, GROWTH))
        if sum(w for _, w in pend) == LANES:
            chunks.append(jnp.concatenate([p for p, _ in pend], axis=-1))
            pend = []
    return jnp.concatenate(chunks + [p for p, _ in pend], axis=-1)
