"""Interpretability suite: vanilla / guided backprop and SmoothGrad as
gradient transforms.

Replaces the reference's hook machinery with jax transforms (SURVEY.md §3.4):
  * VanillaBackprop (/root/reference/vanilla_backprop.py:10-52): the
    backward-hook capture of the input gradient seeded with a one-hot over
    classes (0, 1) on the segmentation output IS `jax.grad` of
    `sum(seg[..., classes] * one_hot(target))` w.r.t. the input.
  * GuidedBackprop (/root/reference/guided_backprop.py:40-100): the
    recursive ReLU forward/backward hook rewiring becomes a single
    `jax.custom_vjp` ReLU (zero upstream gradient where input <= 0 OR
    gradient < 0) threaded through the model's `act` attribute.
  * SmoothGrad (/root/reference/smoothgrad.py:18-45): the python loop over
    noisy copies becomes a batched/vmapped mean of gradients; noise std is
    sigma_multiplier/(max-min) squared, matching the reference's
    `normal_(mean, sigma**2)` (torch's normal_ takes a std argument, so the
    reference's noise std IS sigma**2 — reproduced faithfully).
  * misc helpers (/root/reference/misc_functions.py:16-29,189-199):
    grayscale conversion with 99th-percentile clip, positive/negative
    saliency split, image export.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp


@jax.custom_vjp
def guided_relu(x):
    return jnp.maximum(x, 0.0)


def _guided_relu_fwd(x):
    return jnp.maximum(x, 0.0), x


def _guided_relu_bwd(x, g):
    # guided backprop: pass gradient only where the input was positive AND
    # the upstream gradient is positive
    return (jnp.where((x > 0) & (g > 0), g, 0.0),)


guided_relu.defvjp(_guided_relu_fwd, _guided_relu_bwd)


def _seg_apply(model, variables):
    def apply(image):
        out = model.apply(variables, image, train=False)
        return out[0]  # seg logits
    return apply


def vanilla_gradients(model, variables, image: jnp.ndarray,
                      target: jnp.ndarray,
                      classes: Sequence[int] = (0, 1)) -> jnp.ndarray:
    """d(sum over seeded classes)/d(image).

    image (1, H, W, 3) or (H, W, 3); target (H, W) int labels. The seed is
    the reference's one-hot over `classes` of the target mask
    (vanilla_backprop.py:39-43).
    """
    squeeze = image.ndim == 3
    if squeeze:
        image = image[None]
    apply = _seg_apply(model, variables)

    def objective(img):
        seg = apply(img)  # (1, H, W, C)
        seed = jnp.stack([(target == c).astype(seg.dtype) for c in classes],
                         axis=-1)
        return jnp.sum(seg[0, :, :, list(classes)].transpose(1, 2, 0) * seed)

    grads = jax.grad(objective)(image)
    return grads[0] if squeeze else grads


def guided_model(model):
    """Clone of `model` whose ReLUs use the guided-backprop VJP."""
    return model.clone(act=guided_relu)


def guided_gradients(model, variables, image, target,
                     classes: Sequence[int] = (0, 1)) -> jnp.ndarray:
    return vanilla_gradients(guided_model(model), variables, image, target,
                             classes)


def smooth_grad(grad_fn: Callable, rng, image: jnp.ndarray, n: int = 50,
                sigma_multiplier: float = 4.0,
                batch_size: int = 10) -> jnp.ndarray:
    """Average `grad_fn(image + noise)` over `n` noisy samples.

    noise std = (sigma_multiplier / (max - min)) ** 2, the reference's
    effective std (smoothgrad.py:31-38).
    """
    sigma = sigma_multiplier / (float(jnp.max(image)) - float(jnp.min(image)))
    std = sigma ** 2

    def one(key):
        noise = jax.random.normal(key, image.shape, dtype=image.dtype) * std
        return grad_fn(image + noise)

    total = jnp.zeros_like(image)
    keys = jax.random.split(rng, n)
    # chunked vmap: bounded memory, still batched on device
    for i in range(0, n, batch_size):
        chunk = keys[i:i + batch_size]
        total = total + jnp.sum(jax.vmap(one)(chunk), axis=0)
    return total / n


def convert_to_grayscale(grads: np.ndarray) -> np.ndarray:
    """Sum |grad| over channels, clip at the 99th percentile, rescale to
    [0, 1] (misc_functions.py:16-29)."""
    g = np.sum(np.abs(np.asarray(grads)), axis=-1)
    hi = np.percentile(g, 99)
    lo = g.min()
    return np.clip((g - lo) / (hi - lo + 1e-12), 0, 1)


def positive_negative_saliency(grads: np.ndarray):
    """(pos, neg) maps normalised by their own extrema
    (misc_functions.py:189-199)."""
    g = np.asarray(grads)
    pos = np.maximum(0, g) / (g.max() + 1e-12)
    neg = np.maximum(0, -g) / (-g.min() + 1e-12)
    return pos, neg


def save_gradient_image(grads: np.ndarray, path: str) -> None:
    """Export a gradient map as PNG (misc_functions.py:32-46)."""
    from PIL import Image

    g = np.asarray(grads, dtype=np.float64)
    g = (g - g.min()) / (g.max() - g.min() + 1e-12)
    arr = (g * 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 3:
        Image.fromarray(arr, mode="RGB").save(path)
    else:
        if arr.ndim == 3:
            arr = arr[..., 0]
        Image.fromarray(arr, mode="L").save(path)
