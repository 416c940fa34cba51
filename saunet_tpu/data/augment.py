"""On-device augmentation: one fused, jit-compiled program per batch.

Replaces the reference's host-side augmentation stack — PIL flips/rotation
(/root/reference/data/augmentations.py:308-412), gamma
(/root/reference/data/ac17_dataloader.py:22-57), z-score (:146-148), elastic
deformation (:260-287) and the scipy distance-transform edge ground truth
(:231-258) — with pure XLA ops keyed by `jax.random`, so augmentation fuses
into the train step and no CPU worker pool exists.

Matching probabilities: flip H 0.5, flip V 0.5, rotation U(-180°, 180°)
bilinear/nearest, gamma in (0.5, 2) with the reference's branch rule,
elastic 50% with alpha=500 sigma=20.

Design notes (documented deviations, SURVEY.md §7):
  * flip + rotation + elastic compose into a SINGLE displacement field and
    one gather-based bilinear/nearest sample (the reference warps up to three
    times on the host). Out-of-bounds fills 0 (the reference's elastic uses
    edge-clamp; its flip/rotate fill 0).
  * the image's 2x2 bilinear patch and the label's 2x2 nearest patch are
    packed into one 8-lane bf16 row so the whole warp is a SINGLE gather
    (6.6x faster than independent taps — see _warp_image_label_packed).
  * labels are warped with nearest-neighbour sampling. The reference
    bilinearly interpolates the label raster and floors it
    (ac17_dataloader.py:200-216) which manufactures off-label values at
    boundaries — intentionally not reproduced.
  * fresh randomness every epoch; the reference freezes flip/rotate/gamma at
    dataset construction (ac17_dataloader.py:182-189) and only re-rolls
    elastic. A strict superset of the reference's augmentation schedule.
  * the edge ground truth uses disk-radius-2 morphology: a pixel is an edge
    pixel iff a disk of Euclidean radius 2 around it contains both classes —
    exactly the reference's "EDT(in)+EDT(out) <= 2" rule, computed as one
    depthwise 5x5 convolution instead of four scipy EDT passes per slice.
"""
from __future__ import annotations

import functools
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

ELASTIC_ALPHA = 500.0
ELASTIC_SIGMA = 20.0
GAMMA_RANGE = (0.5, 2.0)


@functools.lru_cache(maxsize=None)
def _gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _gaussian_filter2d(field: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable zero-padded gaussian blur on (N, H, W)."""
    k = jnp.asarray(_gaussian_kernel1d(sigma))
    r = (k.shape[0] - 1) // 2
    x = field[:, None]  # NCHW with C=1
    kv = k.reshape(1, 1, -1, 1)
    kh = k.reshape(1, 1, 1, -1)
    dn = ("NCHW", "OIHW", "NCHW")
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), [(r, r), (0, 0)],
                                     dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(0, 0), (r, r)],
                                     dimension_numbers=dn)
    return x[:, 0]


@functools.lru_cache(maxsize=None)
def _disk_kernel() -> np.ndarray:
    """5x5 Euclidean disk of radius 2 (13 taps)."""
    yy, xx = np.mgrid[-2:3, -2:3]
    return (yy * yy + xx * xx <= 4).astype(np.float32)


def edge_ground_truth(labels: jnp.ndarray, num_classes: int = 4,
                      radius_kernel: np.ndarray | None = None) -> jnp.ndarray:
    """(N, H, W) int labels -> (N, H, W, 1) {0,1} float edge map.

    Pixel p is an edge pixel iff, for some foreground class c in 1..C-1, the
    radius-2 disk around p contains both c and not-c — identical to the
    reference's per-class distance-transform rule with radius 2 and zero
    padding at the image border.
    """
    k = jnp.asarray(radius_kernel if radius_kernel is not None
                    else _disk_kernel())
    taps = float(np.sum(_disk_kernel()))
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    fg = one_hot[..., 1:]  # classes 1..C-1
    c = fg.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    s = jax.lax.conv_general_dilated(
        fg, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    dil = s > 0.5
    ero = s > (taps - 0.5)
    edge = jnp.any(dil & ~ero, axis=-1, keepdims=True)
    return edge.astype(jnp.float32)


def _sample_bilinear(img: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray
                     ) -> jnp.ndarray:
    """img (H, W); sy/sx (H, W) float source coords; zero outside."""
    out = _sample_bilinear_batched(img[None], sy[None], sx[None])
    return out[0]


def _sample_nearest(img: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray
                    ) -> jnp.ndarray:
    out = _sample_nearest_batched(img[None], sy[None], sx[None])
    return out[0]


def _flat_gather(imgs: jnp.ndarray, yc: jnp.ndarray, xc: jnp.ndarray
                 ) -> jnp.ndarray:
    """One flat 1-D gather over the whole (N, H, W) batch — lowers far
    better on TPU than N independent 2-D gathers. The output takes the
    COORDINATE grid's shape (N, Ho, Wo), which may differ from the image's
    (scale / crop transforms sample onto a new grid)."""
    n, h, w = imgs.shape
    base = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]
    idx = base + yc * w + xc
    return jnp.take(imgs.reshape(-1), idx.reshape(-1),
                    mode="clip").reshape(yc.shape)


def _sample_bilinear_batched(imgs: jnp.ndarray, sy: jnp.ndarray,
                             sx: jnp.ndarray) -> jnp.ndarray:
    """imgs (N, H, W); sy/sx (N, Ho, Wo) float source coords; zero
    outside."""
    n, h, w = imgs.shape
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0).astype(imgs.dtype)
    fx = (sx - x0).astype(imgs.dtype)

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return jnp.where(inside, _flat_gather(imgs, yc, xc), 0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def _sample_nearest_batched(imgs: jnp.ndarray, sy: jnp.ndarray,
                            sx: jnp.ndarray) -> jnp.ndarray:
    n, h, w = imgs.shape
    yi = jnp.round(sy)
    xi = jnp.round(sx)
    inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
    xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
    return jnp.where(inside, _flat_gather(imgs, yc, xc), 0)


def _warp_image_label_packed(imgs: jnp.ndarray, labels: jnp.ndarray,
                             sy: jnp.ndarray, sx: jnp.ndarray,
                             num_classes: int):
    """Fused warp: bilinear image + nearest-neighbour label in ONE gather.

    The warp is gather-op-bound on TPU, not bandwidth-bound (each flat
    1-D take of the 5 independent taps costs ~24 ms at b64/224² regardless
    of dtype — tools/exp_gather.py). So all the data an output pixel needs
    is packed into one 8-lane row up front:

      lanes 0-3: the 2x2 bilinear patch (bf16)
      lane  4:   the 2x2 label patch packed 2 bits per tap into one byte
                 (exact in bf16 for <= 4 classes)

    and a single row gather fetches it. Measured 6.6x faster than the five
    independent gathers (117.7 -> 17.7 ms at b64/224²).

    Numerics: image taps are bf16 (<= 2^-8 relative interpolation error,
    far below augmentation noise; the model computes in bf16 anyway); the
    bilinear combine runs in f32. Boundary semantics are identical to
    `_sample_bilinear_batched`/`_sample_nearest_batched` (zero fill): a
    1-px zero pad makes taps falling one row/col outside exact, and a
    whole-pixel mask covers coordinates farther out, where every tap is
    outside anyway.
    """
    n, h, w = imgs.shape
    assert num_classes <= 4, "packed label byte holds 2 bits per tap"

    ip = jnp.pad(imgs.astype(jnp.float32), ((0, 0), (1, 1), (1, 1)))
    lp = jnp.pad(labels.astype(jnp.int32), ((0, 0), (1, 1), (1, 1)))
    v00 = ip[:, :-1, :-1]
    v01 = ip[:, :-1, 1:]
    v10 = ip[:, 1:, :-1]
    v11 = ip[:, 1:, 1:]
    lab_byte = (lp[:, :-1, :-1] + 4 * lp[:, :-1, 1:]
                + 16 * lp[:, 1:, :-1] + 64 * lp[:, 1:, 1:]).astype(
                    jnp.float32)
    zero = jnp.zeros_like(v00)
    pack = jnp.stack([v00, v01, v10, v11, lab_byte, zero, zero, zero],
                     axis=-1).astype(jnp.bfloat16)
    hp, wp = h + 1, w + 1
    pack = pack.reshape(n * hp * wp, 8)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0).astype(jnp.float32)
    fx = (sx - x0).astype(jnp.float32)
    yp = jnp.clip(y0.astype(jnp.int32) + 1, 0, hp - 1)
    xp = jnp.clip(x0.astype(jnp.int32) + 1, 0, wp - 1)
    base = (jnp.arange(n, dtype=jnp.int32) * (hp * wp))[:, None, None]
    idx = (base + yp * wp + xp).reshape(-1)

    g = jnp.take(pack, idx, axis=0, mode="clip").reshape(n, h, w, 8)
    gf = g[..., :4].astype(jnp.float32)
    img_w = ((1 - fy) * ((1 - fx) * gf[..., 0] + fx * gf[..., 1])
             + fy * ((1 - fx) * gf[..., 2] + fx * gf[..., 3]))
    inside = (sy > -1) & (sy < h) & (sx > -1) & (sx < w)
    img_w = jnp.where(inside, img_w, 0.0)

    byte = g[..., 4].astype(jnp.int32)
    # nearest-label selection via fy/fx >= 0.5 (round half up); the unpacked
    # sampler uses jnp.round (half to even), so an exact .5 source coordinate
    # could pick the other neighbour — unreachable in practice, since warp
    # coordinates are continuous random draws
    shift = (jnp.where(fy >= 0.5, 4, 0) + jnp.where(fx >= 0.5, 2, 0))
    lab = jnp.right_shift(byte, shift) & 3
    lab = jnp.where(inside, lab, 0)
    return img_w, lab


def _coords_one(rng, h: int, w: int, enable_deform: bool):
    """Per-sample inverse-map source coordinates (sy, sx) composing
    flips + rotation + elastic: src = F(R(p + d(p))); plus the gamma draw."""
    (k_fh, k_fv, k_rot, k_el, k_elx, k_ely, k_g1, k_g2) = jax.random.split(
        rng, 8)

    flip_h = jax.random.bernoulli(k_fh)
    flip_v = jax.random.bernoulli(k_fv)
    angle = jax.random.uniform(k_rot, minval=-jnp.pi, maxval=jnp.pi)

    if enable_deform:
        # The σ=20px-smoothed field has no content above ~1/σ px⁻¹, so draw
        # and blur it on a stride-4 grid (Nyquist 1/8 px⁻¹) and bilinearly
        # upsample — ~64x less work than the full-res 161-tap blur, same
        # spatial statistics. Blurring at σ/s GROWS the per-pixel std by
        # exactly s (std ∝ sqrt(Σk²) per axis, Σk² = (2√π σ)⁻¹, two axes),
        # so rescale by 1/s to match the full-res field's amplitude.
        s = 4
        hl, wl = -(-h // s), -(-w // s)
        do_el = jax.random.bernoulli(k_el).astype(jnp.float32)
        fx = jax.random.uniform(k_elx, (1, hl, wl)) * 2.0 - 1.0
        fy = jax.random.uniform(k_ely, (1, hl, wl)) * 2.0 - 1.0
        amp = ELASTIC_ALPHA * do_el / s
        dx = jax.image.resize(
            _gaussian_filter2d(fx, ELASTIC_SIGMA / s)[0], (h, w),
            "linear") * amp
        dy = jax.image.resize(
            _gaussian_filter2d(fy, ELASTIC_SIGMA / s)[0], (h, w),
            "linear") * amp
    else:
        dx = jnp.zeros((h, w))
        dy = jnp.zeros((h, w))

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    py = yy + dy - cy
    px = xx + dx - cx
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    ry = ca * py - sa * px
    rx = sa * py + ca * px
    ry = jnp.where(flip_v, -ry, ry)
    rx = jnp.where(flip_h, -rx, rx)

    use_low = jax.random.bernoulli(k_g1)
    g_low = jax.random.uniform(k_g2, minval=GAMMA_RANGE[0], maxval=1.0)
    g_high = jax.random.uniform(k_g2, minval=1.0, maxval=GAMMA_RANGE[1])
    gamma = jnp.where(use_low, g_low, g_high)
    return ry + cy, rx + cx, gamma


def make_augment_fn(num_classes: int = 4, enable_deform: bool = True):
    """Batch augmentation: (rng, {image (N,H,W), label (N,H,W)}) ->
    {image (N,H,W,3), label int32, edge (N,H,W,1)} — coordinates are drawn
    per sample (vmapped) but the warp runs as ONE flat batched gather,
    which lowers much better on TPU than per-sample 2-D gathers."""

    def augment(rng, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        imgs = batch["image"]
        labels = batch["label"]
        if imgs.ndim == 4:  # (N,H,W,1) -> (N,H,W)
            imgs = imgs[..., 0]
        n, h, w = imgs.shape
        rngs = jax.random.split(rng, n)
        sy, sx, gamma = jax.vmap(
            lambda r: _coords_one(r, h, w, enable_deform))(rngs)

        if num_classes <= 4:
            img_w, lab_a = _warp_image_label_packed(
                imgs, labels, sy, sx, num_classes)
        else:  # packed label byte needs <= 2 bits per tap
            img_w = _sample_bilinear_batched(imgs.astype(jnp.float32),
                                             sy, sx)
            lab_a = _sample_nearest_batched(labels, sy, sx)

        # gamma (reference augment_gamma branch rule), per sample
        mn = jnp.min(img_w, axis=(1, 2), keepdims=True)
        rng_ = jnp.max(img_w, axis=(1, 2), keepdims=True) - mn
        g = gamma[:, None, None]
        img_g = jnp.power((img_w - mn) / (rng_ + 1e-7), g) * rng_ + mn

        # z-score per sample
        mu = jnp.mean(img_g, axis=(1, 2), keepdims=True)
        sd = jnp.std(img_g, axis=(1, 2), keepdims=True)
        img_a = (img_g - mu) / (sd + 1e-10)

        image3 = jnp.repeat(img_a[..., None], 3, axis=-1)
        edge = edge_ground_truth(lab_a, num_classes)
        return {"image": image3, "label": lab_a.astype(jnp.int32),
                "edge": edge}

    return augment


def normalize_for_eval(imgs: jnp.ndarray) -> jnp.ndarray:
    """Val/test path: per-slice z-score + channel triplication (no random
    transforms), matching ac17_dataloader val semantics."""
    if imgs.ndim == 4:
        imgs = imgs[..., 0]
    mu = jnp.mean(imgs, axis=(1, 2), keepdims=True)
    sd = jnp.std(imgs, axis=(1, 2), keepdims=True)
    out = (imgs - mu) / (sd + 1e-10)
    return jnp.repeat(out[..., None], 3, axis=-1)
