"""Segmentation metrics, in-graph (jnp) and host (numpy) variants.

  pixel_acc / per-class Jaccard  <- /root/reference/models/models.py:51-74
    (foreground-only accuracy over label>=1 pixels; Jaccard for classes
     1..C-1 computed on argmax predictions)
  intersection_and_union         <- /root/reference/utils.py:119-140
    (histogram IoU accumulated across an eval epoch)

The in-graph versions run inside the jitted step so metrics cost no extra
host round-trips — replacing the reference's numpy/CPU metric paths.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def pixel_acc(preds: jnp.ndarray, labels: jnp.ndarray,
              num_class: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """preds/labels (N, H, W) int. Returns (fg accuracy scalar,
    per-class jaccard vector of length num_class-1)."""
    labels = labels.astype(jnp.int32)
    preds = preds.astype(jnp.int32)
    valid = (labels >= 1)
    acc_sum = jnp.sum(jnp.where(valid & (preds == labels), 1.0, 0.0))
    pixel_sum = jnp.sum(valid.astype(jnp.float32))
    acc = acc_sum / (pixel_sum + 1e-10)

    cls = jnp.arange(1, num_class)[:, None, None, None]
    v = (labels[None] == cls)
    p = (preds[None] == cls)
    anb = jnp.sum((v & p).astype(jnp.float32), axis=(1, 2, 3))
    denom = (jnp.sum(v, axis=(1, 2, 3)) + jnp.sum(p, axis=(1, 2, 3))
             ).astype(jnp.float32) - anb
    jaccard = anb / (denom + 1e-10)
    return acc, jaccard


def intersection_and_union(pred: np.ndarray, label: np.ndarray,
                           num_class: int) -> Tuple[np.ndarray, np.ndarray]:
    """Histogram intersection/union per class (host-side, accumulated by the
    eval loop). pred/label int arrays of the same shape."""
    pred = np.asarray(pred).astype(np.int64) + 1
    label = np.asarray(label).astype(np.int64) + 1
    pred = pred * (label > 0)

    intersection = pred * (pred == label)
    area_inter, _ = np.histogram(intersection, bins=num_class,
                                 range=(1, num_class))
    area_pred, _ = np.histogram(pred, bins=num_class, range=(1, num_class))
    area_lab, _ = np.histogram(label, bins=num_class, range=(1, num_class))
    return area_inter, area_pred + area_lab - area_inter


def accuracy(preds: np.ndarray, label: np.ndarray):
    """Valid-pixel accuracy over label >= 0 (capability of
    /root/reference/utils.py:111-116)."""
    valid = label >= 0
    acc_sum = np.sum(valid * (preds == label))
    valid_sum = np.sum(valid)
    return float(acc_sum) / (float(valid_sum) + 1e-10), valid_sum


def dice_coefficient(pred: np.ndarray, label: np.ndarray,
                     num_class: int) -> np.ndarray:
    """Per-class Dice for classes 1..num_class-1 (host-side)."""
    dices = []
    for c in range(1, num_class):
        p = (pred == c)
        l = (label == c)
        inter = np.sum(p & l)
        denom = p.sum() + l.sum()
        dices.append(2.0 * inter / denom if denom > 0 else 1.0)
    return np.asarray(dices)
