"""Dual-task loss: class-weighted cross-entropy + soft Dice + edge BCE.

Numerically matches /root/reference/loss.py:
  * cross_entropy  <- nn.CrossEntropyLoss(weight=[1,4,5,1]) (loss.py:130,153):
    weighted mean over pixels, normalised by the sum of per-pixel weights
    (torch's `weight` semantics).
  * dice_loss      <- loss.py:51-88: softmax probs, one-hot target, reduction
    over (batch, H, W) jointly, mean over classes, `1 - dice`.
  * edge bce       <- nn.BCELoss() on the sigmoid edge map vs the
    distance-transform edge ground truth (loss.py:132,156).
  * total          <- dice + ce + edge (loss.py:159). The reference's dormant
    edge_attention / image-based-CE / label-smoothing paths (loss.py:90-147,
    SURVEY.md §2.4) are intentionally not replicated; `edge_attention` is
    provided for API parity but disabled by default, as in the reference.

All reductions are in float32 regardless of model compute dtype.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT_CLASS_WEIGHTS = (1.0, 4.0, 5.0, 1.0)


def weighted_cross_entropy(
    logits: jnp.ndarray,  # (N, H, W, C) float
    labels: jnp.ndarray,  # (N, H, W) int
    class_weights=DEFAULT_CLASS_WEIGHTS,
    sample_mask=None,     # (N,) {0,1}: exclude padded samples
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels = labels.astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = jnp.asarray(class_weights, dtype=jnp.float32)[labels]
    if sample_mask is not None:
        w = w * sample_mask.astype(jnp.float32)[:, None, None]
    return jnp.sum(w * nll) / jnp.sum(w)


def dice_loss(labels: jnp.ndarray, logits: jnp.ndarray,
              eps: float = 1e-7, sample_mask=None) -> jnp.ndarray:
    """Soft Dice over softmax probabilities; labels (N,H,W) int,
    logits (N,H,W,C)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    probas = jax.nn.softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32)[:, None, None, None]
        probas = probas * m
        one_hot = one_hot * m
    dims = (0, 1, 2)  # reduce batch + spatial jointly, keep classes
    intersection = jnp.sum(probas * one_hot, axis=dims)
    cardinality = jnp.sum(probas + one_hot, axis=dims)
    dice = jnp.mean(2.0 * intersection / (cardinality + eps))
    return 1.0 - dice


def edge_bce(edge_probs: jnp.ndarray, edge_targets: jnp.ndarray,
             eps: float = 1e-7, sample_mask=None) -> jnp.ndarray:
    """Mean binary cross-entropy on probabilities (post-sigmoid).

    eps must stay representable next to 1.0 in float32 (1 - 1e-12 == 1.0
    would make the clip a no-op and log(0) = -inf); torch's BCELoss clamps
    log terms at -100 for the same reason."""
    p = jnp.clip(edge_probs.astype(jnp.float32), eps, 1.0 - eps)
    t = edge_targets.astype(jnp.float32)
    ll = t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p)
    if sample_mask is None:
        return -jnp.mean(ll)
    m = sample_mask.astype(jnp.float32)
    px = float(np_prod(ll.shape[1:]))
    return -jnp.sum(ll * m.reshape((-1,) + (1,) * (ll.ndim - 1))) / (
        jnp.sum(m) * px)


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


def dual_loss(
    seg_logits: jnp.ndarray,   # (N, H, W, C)
    edge_probs: jnp.ndarray,   # (N, H, W, 1), sigmoid output
    seg_targets: jnp.ndarray,  # (N, H, W) int
    edge_targets: jnp.ndarray,  # (N, H, W) or (N, H, W, 1) {0,1}
    class_weights=DEFAULT_CLASS_WEIGHTS,
    sample_mask=None,          # (N,) {0,1}: exclude padded eval samples
) -> Tuple[jnp.ndarray, dict]:
    """Returns (total, components). total = dice + ce + edge.

    `sample_mask` removes repeated/padded samples from every reduction, so
    the reported loss on a padded final eval batch equals the loss over the
    real samples only."""
    if edge_targets.ndim == edge_probs.ndim - 1:
        edge_targets = edge_targets[..., None]
    ce = weighted_cross_entropy(seg_logits, seg_targets, class_weights,
                                sample_mask=sample_mask)
    dice = dice_loss(seg_targets, seg_logits, sample_mask=sample_mask)
    edge = edge_bce(edge_probs, edge_targets, sample_mask=sample_mask)
    total = dice + ce + edge
    return total, {"loss": total, "ce": ce, "dice": dice, "edge": edge}


def dual_loss_packed(
    seg_packed: jnp.ndarray,    # (N, H, W/P, P*C) packed logits
    edge_packed: jnp.ndarray,   # (N, H, W/Pe, Pe) packed sigmoid edge
    seg_targets: jnp.ndarray,   # (N, H, W) int
    edge_targets: jnp.ndarray,  # (N, H, W) or (N, H, W, 1) {0,1}
    num_classes: int = 4,
    class_weights=DEFAULT_CLASS_WEIGHTS,
    eps: float = 1e-7,
    sample_mask=None,
) -> Tuple[jnp.ndarray, dict]:
    """dual_loss computed directly on lane-packed model outputs.

    Mathematically identical to `dual_loss` (tested), but the (N, H, W, C)
    logits tensor — which HBM stores padded to 128 lanes, 32x its nominal
    size for C=4 — never exists: softmax/CE/dice run on the packed layout
    via per-group selector matmuls and elementwise ops. The softmax shift
    is the per-pixel group *mean* (a matmul; the max would need lane
    shuffles), exact for logsumexp and overflow-safe while logit spread
    within a pixel stays < ~160 in f32 — segmentation logits are O(10).
    """
    n, h, v, lanes = seg_packed.shape
    c = num_classes
    p = lanes // c
    x = seg_packed.astype(jnp.float32)

    # selectors: lane l = pix*C + cls
    sel_group = jnp.asarray(
        np.kron(np.eye(p, dtype=np.float32), np.ones((c, 1), np.float32)))
    sel_class = jnp.asarray(
        np.tile(np.eye(c, dtype=np.float32), (p, 1)))   # (lanes, C)

    avg_g = (x @ sel_group) / c                        # (N,H,V,P)
    avg = avg_g @ sel_group.T                          # per-lane group mean
    e = jnp.exp(x - avg)
    se_g = e @ sel_group                               # group sum-exp
    lse = (jnp.log(se_g) + avg_g) @ sel_group.T
    logp = x - lse
    probas = jnp.exp(logp)

    labels_lane = (seg_targets.astype(jnp.float32).reshape(n, h, v, p)
                   @ sel_group.T)                      # pixel label per lane
    class_pattern = jnp.tile(jnp.arange(c, dtype=jnp.float32), p)
    onehot = (labels_lane == class_pattern).astype(jnp.float32)
    w_pattern = jnp.tile(jnp.asarray(class_weights, jnp.float32), p)

    m = None
    if sample_mask is not None:
        m = sample_mask.astype(jnp.float32)[:, None, None, None]
        onehot_m = onehot * m
    else:
        onehot_m = onehot

    # weighted CE: sum_pixels w[label] * nll / sum w[label]
    wsel = onehot_m * w_pattern
    ce = -jnp.sum(wsel * logp) / jnp.sum(wsel)

    # soft dice, per-class reductions via the class selector
    probas_m = probas * m if m is not None else probas
    inter = jnp.einsum("nhvl,lc->c", probas_m * onehot, sel_class)
    card = jnp.einsum("nhvl,lc->c", probas_m + onehot_m, sel_class)
    dice = 1.0 - jnp.mean(2.0 * inter / (card + eps))

    # edge BCE on the packed edge map
    if edge_targets.ndim == 4:
        edge_targets = edge_targets[..., 0]
    pe = edge_packed.shape[-1]
    et = edge_targets.astype(jnp.float32).reshape(
        n, h, edge_targets.shape[2] // pe, pe)
    pclip = jnp.clip(edge_packed.astype(jnp.float32), eps, 1.0 - eps)
    ll = et * jnp.log(pclip) + (1.0 - et) * jnp.log(1.0 - pclip)
    if sample_mask is None:
        edge = -jnp.mean(ll)
    else:
        mm = sample_mask.astype(jnp.float32)
        px = float(np_prod(ll.shape[1:]))
        edge = -jnp.sum(ll * mm[:, None, None, None]) / (jnp.sum(mm) * px)

    total = dice + ce + edge
    return total, {"loss": total, "ce": ce, "dice": dice, "edge": edge}


def image_based_cross_entropy(
    logits: jnp.ndarray,  # (N, H, W, C)
    labels: jnp.ndarray,  # (N, H, W)
    upper_bound: float = 1.0,
    norm: bool = False,
    batch_weights: bool = False,
) -> jnp.ndarray:
    """Histogram-weighted CE (the reference's dormant
    ImageBasedCrossEntropyLoss2d, /root/reference/loss.py:7-41): per-image
    (or per-batch) class frequencies reweight the NLL — rare classes count
    more. Fully in-graph (the reference round-trips numpy histograms)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    labels = labels.astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]

    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    axes = (0, 1, 2) if batch_weights else (1, 2)
    hist = jnp.sum(one_hot, axis=axes)
    hist = hist / jnp.sum(hist, axis=-1, keepdims=True)
    if norm:
        w = jnp.where(hist > 0, upper_bound / jnp.maximum(hist, 1e-12),
                      0.0) + 1.0
    else:
        w = jnp.where(hist > 0, upper_bound * (1.0 - hist), 0.0) + 1.0
    if batch_weights:
        pix_w = w[labels]
    else:
        pix_w = jnp.take_along_axis(
            w[:, None, None, :], labels[..., None], axis=-1)[..., 0]
    # reference: per-image NLLLoss means over pixels, images summed
    per_img = (jnp.sum(pix_w * nll, axis=(1, 2))
               / jnp.maximum(jnp.sum(pix_w, axis=(1, 2)), 1e-12))
    return jnp.sum(per_img)


def label_smooth_softmax_ce(
    logits: jnp.ndarray,   # (N, H, W, C)
    labels: jnp.ndarray,   # (N, H, W)
    lb_pos: float = 0.9,
    lb_neg: float = 0.005,
    reduction: str = "mean",
    lb_ignore: int = -1,
) -> jnp.ndarray:
    """Label-smoothed softmax CE (the reference's dormant
    LabelSmoothSoftmaxCE, /root/reference/loss.py:90-121)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    logs = jax.nn.log_softmax(logits, axis=-1)
    ignore = labels == lb_ignore
    labels_safe = jnp.where(ignore, 0, labels).astype(jnp.int32)
    one_hot = jax.nn.one_hot(labels_safe, num_classes, dtype=jnp.float32)
    smoothed = lb_pos * one_hot + lb_neg * (1.0 - one_hot)
    loss = -jnp.sum(logs * smoothed, axis=-1)
    loss = jnp.where(ignore, 0.0, loss)
    if reduction == "mean":
        n_valid = jnp.maximum(jnp.sum(~ignore), 1)
        return jnp.sum(loss) / n_valid
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def edge_attention_loss(seg_logits, seg_targets, edge_probs,
                        threshold: float = 0.8,
                        class_weights=DEFAULT_CLASS_WEIGHTS):
    """CE restricted to pixels where the predicted edge prob exceeds
    `threshold` — the reference's dormant `edge_attention` term
    (/root/reference/loss.py:143-147, disabled at :157). Off by default."""
    logits = seg_logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    labels = seg_targets.astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = jnp.asarray(class_weights, dtype=jnp.float32)[labels]
    mask = (jnp.max(edge_probs, axis=-1) > threshold).astype(jnp.float32)
    denom = jnp.sum(w * mask)
    return jnp.sum(w * nll * mask) / jnp.maximum(denom, 1.0)
