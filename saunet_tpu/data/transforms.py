"""On-device paired (image, mask) transform library.

Covers the reference's full augmentation inventory
(/root/reference/data/augmentations.py — used AND unused rows of
SURVEY.md §2.2): Compose, PaddingCenterCrop, flips, RandomRotate,
RandomErasing, RandomCrop, CenterCrop, AdjustGamma/Brightness/Contrast/
Saturation/Hue, FreeScale, Scale, RandomTranslate, RandomSizedCrop,
RandomSized — re-expressed as pure jax functions `(rng, img, mask) ->
(img, mask)` over (H, W) or (H, W, C) arrays, composable and vmappable.

Unlike the reference's PIL pipeline (one image at a time on the host), every
transform here jits and vmaps; random crops/scales keep STATIC output shapes
(XLA requirement) by sampling the crop geometry into a gather grid instead
of slicing dynamically.
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

Pair = Tuple[jnp.ndarray, jnp.ndarray]
Transform = Callable[[jax.Array, jnp.ndarray, jnp.ndarray], Pair]


class Compose:
    """Chain paired transforms under one rng
    (augmentations.py:9-27 semantics)."""

    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = list(transforms)

    def __call__(self, rng, img, mask) -> Pair:
        for t in self.transforms:
            rng, sub = jax.random.split(rng)
            img, mask = t(sub, img, mask)
        return img, mask


def _grid(h, w):
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return yy, xx


def _resample(img, mask, sy, sx):
    from .augment import _sample_bilinear, _sample_nearest
    if img.ndim == 3:
        im = jnp.stack([_sample_bilinear(img[..., c], sy, sx)
                        for c in range(img.shape[-1])], axis=-1)
    else:
        im = _sample_bilinear(img, sy, sx)
    return im, _sample_nearest(mask, sy, sx)


def random_horizontally_flip(p: float = 0.5) -> Transform:
    def t(rng, img, mask):
        do = jax.random.bernoulli(rng, p)
        return (jnp.where(do, jnp.flip(img, axis=1), img),
                jnp.where(do, jnp.flip(mask, axis=1), mask))
    return t


def random_vertically_flip(p: float = 0.5) -> Transform:
    def t(rng, img, mask):
        do = jax.random.bernoulli(rng, p)
        return (jnp.where(do, jnp.flip(img, axis=0), img),
                jnp.where(do, jnp.flip(mask, axis=0), mask))
    return t


def random_rotate(degree: float) -> Transform:
    """Rotation by U(-degree, degree), bilinear img / nearest mask, zero
    fill (augmentations.py:392-412)."""
    def t(rng, img, mask):
        h, w = mask.shape[:2]
        angle = jax.random.uniform(rng, minval=-degree, maxval=degree)
        a = angle * jnp.pi / 180.0
        yy, xx = _grid(h, w)
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        py, px = yy - cy, xx - cx
        ca, sa = jnp.cos(a), jnp.sin(a)
        sy = ca * py - sa * px + cy
        sx = sa * py + ca * px + cx
        return _resample(img, mask, sy, sx)
    return t


def random_translate(offset: Tuple[int, int]) -> Transform:
    """Random shift up to +-offset (pixels), zero fill
    (augmentations.py RandomTranslate)."""
    def t(rng, img, mask):
        h, w = mask.shape[:2]
        ky, kx = jax.random.split(rng)
        dy = jax.random.randint(ky, (), -offset[0], offset[0] + 1)
        dx = jax.random.randint(kx, (), -offset[1], offset[1] + 1)
        yy, xx = _grid(h, w)
        return _resample(img, mask, yy - dy, xx - dx)
    return t


def center_crop(size: int) -> Transform:
    def t(rng, img, mask):
        h, w = mask.shape[:2]
        y0 = (h - size) // 2
        x0 = (w - size) // 2
        yy, xx = _grid(size, size)
        return _resample(img, mask, yy + y0, xx + x0)
    return t


def random_crop(size: int) -> Transform:
    """Random crop to (size, size); pads implicitly with zeros when the
    input is smaller (augmentations.py RandomCrop capability)."""
    def t(rng, img, mask):
        h, w = mask.shape[:2]
        ky, kx = jax.random.split(rng)
        y0 = jax.random.randint(ky, (), 0, max(h - size, 0) + 1)
        x0 = jax.random.randint(kx, (), 0, max(w - size, 0) + 1)
        yy, xx = _grid(size, size)
        return _resample(img, mask, yy + y0, xx + x0)
    return t


def free_scale(size: Tuple[int, int]) -> Transform:
    """Resize to a fixed (h, w), aspect-free (augmentations.py FreeScale)."""
    def t(rng, img, mask):
        h, w = mask.shape[:2]
        oh, ow = size
        yy, xx = _grid(oh, ow)
        sy = yy * (h - 1) / jnp.maximum(oh - 1, 1)
        sx = xx * (w - 1) / jnp.maximum(ow - 1, 1)
        return _resample(img, mask, sy, sx)
    return t


def scale_shorter_side(size: int, out_hw: Tuple[int, int]) -> Transform:
    """Scale so the shorter side == size, then pad/crop to static out_hw
    (augmentations.py Scale, made static-shape)."""
    def t(rng, img, mask):
        h, w = mask.shape[:2]
        factor = size / jnp.minimum(h, w).astype(jnp.float32)
        oh, ow = out_hw
        yy, xx = _grid(oh, ow)
        return _resample(img, mask, yy / factor, xx / factor)
    return t


def random_sized_crop(size: int, scale=(0.45, 1.0), ratio=(0.5, 2.0),
                      ) -> Transform:
    """Area/aspect-jittered crop resized to (size, size)
    (augmentations.py RandomSizedCrop)."""
    def t(rng, img, mask):
        h, w = mask.shape[:2]
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        area = h * w * jax.random.uniform(k1, minval=scale[0],
                                          maxval=scale[1])
        aspect = jax.random.uniform(k2, minval=ratio[0], maxval=ratio[1])
        ch = jnp.clip(jnp.sqrt(area * aspect), 8.0, h).astype(jnp.float32)
        cw = jnp.clip(jnp.sqrt(area / aspect), 8.0, w).astype(jnp.float32)
        y0 = jax.random.uniform(k3) * (h - ch)
        x0 = jax.random.uniform(k4) * (w - cw)
        yy, xx = _grid(size, size)
        sy = y0 + yy * (ch - 1) / (size - 1)
        sx = x0 + xx * (cw - 1) / (size - 1)
        return _resample(img, mask, sy, sx)
    return t


def random_sized(size: int, lo: float = 0.5, hi: float = 2.0) -> Transform:
    """Random isotropic rescale then random crop to size
    (augmentations.py RandomSized)."""
    rc = random_crop(size)

    def t(rng, img, mask):
        k1, k2 = jax.random.split(rng)
        factor = jax.random.uniform(k1, minval=lo, maxval=hi)
        h, w = mask.shape[:2]
        yy, xx = _grid(int(h), int(w))
        img2, mask2 = _resample(img, mask, yy / factor, xx / factor)
        return rc(k2, img2, mask2)
    return t


def random_erasing(p: float = 0.5, sl: float = 0.02, sh: float = 0.4,
                   r1: float = 0.3, fill: float = 0.0) -> Transform:
    """Random rectangle erasure on the image only
    (augmentations.py:266 RandomErasing capability, single attempt —
    geometry clipped to bounds instead of rejection-sampled)."""
    def t(rng, img, mask):
        h, w = mask.shape[:2]
        k0, k1, k2, k3, k4 = jax.random.split(rng, 5)
        do = jax.random.bernoulli(k0, p)
        area = h * w * jax.random.uniform(k1, minval=sl, maxval=sh)
        ratio = jax.random.uniform(k2, minval=r1, maxval=1.0 / r1)
        eh = jnp.clip(jnp.sqrt(area * ratio), 1, h - 1)
        ew = jnp.clip(jnp.sqrt(area / ratio), 1, w - 1)
        y0 = jax.random.uniform(k3) * (h - eh)
        x0 = jax.random.uniform(k4) * (w - ew)
        yy, xx = _grid(h, w)
        inside = ((yy >= y0) & (yy < y0 + eh) & (xx >= x0) & (xx < x0 + ew)
                  & do)
        if img.ndim == 3:
            inside = inside[..., None]
        return jnp.where(inside, fill, img), mask
    return t


def adjust_gamma(gamma_delta: float) -> Transform:
    """gamma in U(1, 1+delta) on a [0,1]-normalised image
    (augmentations.py AdjustGamma)."""
    def t(rng, img, mask):
        gamma = jax.random.uniform(rng, minval=1.0,
                                   maxval=1.0 + gamma_delta)
        mn = jnp.min(img)
        rg = jnp.max(img) - mn
        out = jnp.power((img - mn) / (rg + 1e-7), gamma) * rg + mn
        return out, mask
    return t


def adjust_brightness(bf: float) -> Transform:
    def t(rng, img, mask):
        f = jax.random.uniform(rng, minval=1.0 - bf / 255.0,
                               maxval=1.0 + bf / 255.0)
        return img * f, mask
    return t


def adjust_contrast(cf: float) -> Transform:
    def t(rng, img, mask):
        f = jax.random.uniform(rng, minval=1.0 - cf, maxval=1.0 + cf)
        mean = jnp.mean(img)
        return (img - mean) * f + mean, mask
    return t


def adjust_saturation(sf: float) -> Transform:
    """Blend with grayscale (RGB images; identity for single-channel)."""
    def t(rng, img, mask):
        if img.ndim != 3 or img.shape[-1] != 3:
            return img, mask
        f = jax.random.uniform(rng, minval=1.0 - sf, maxval=1.0 + sf)
        gray = jnp.mean(img, axis=-1, keepdims=True)
        return gray + (img - gray) * f, mask
    return t


def adjust_hue(hf: float) -> Transform:
    """Channel-rotation hue jitter (RGB; identity for single-channel)."""
    def t(rng, img, mask):
        if img.ndim != 3 or img.shape[-1] != 3:
            return img, mask
        theta = jax.random.uniform(rng, minval=-hf, maxval=hf) * 2 * jnp.pi
        # YIQ rotation approximation
        c, s = jnp.cos(theta), jnp.sin(theta)
        m = jnp.asarray([
            [0.299 + 0.701 * c + 0.168 * s,
             0.587 - 0.587 * c + 0.330 * s,
             0.114 - 0.114 * c - 0.497 * s],
            [0.299 - 0.299 * c - 0.328 * s,
             0.587 + 0.413 * c + 0.035 * s,
             0.114 - 0.114 * c + 0.292 * s],
            [0.299 - 0.300 * c + 1.250 * s,
             0.587 - 0.588 * c - 1.050 * s,
             0.114 + 0.886 * c - 0.203 * s],
        ])
        return jnp.einsum("hwc,dc->hwd", img, m), mask
    return t
