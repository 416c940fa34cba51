"""Pallas fused Canny kernel == XLA reference implementation
(interpret mode on CPU; compiled path exercised on TPU by bench/model).

On real hardware Mosaic's fp contraction flips ~0.2% of pixels at the
threshold comparisons — bit-exactness is an interpret-mode property."""
import numpy as np

import jax
import jax.numpy as jnp

from saunet_tpu.ops.edge import canny_edges, image_to_gray255
from saunet_tpu.ops.pallas.canny import canny_edges_pallas


def test_pallas_matches_xla_reference():
    rs = np.random.RandomState(0)
    # smooth-ish synthetic image with structure: blobs + gradient
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    img = (
        100 * np.exp(-((yy - 20) ** 2 + (xx - 30) ** 2) / 100.0)
        + 80 * (xx > 40)
        + 10 * rs.rand(64, 64)
    ).astype(np.float32)[None]
    gray = np.clip(img, 0, 255)

    ref = np.asarray(canny_edges(jnp.asarray(gray[..., None])))[..., 0]
    ours = np.asarray(canny_edges_pallas(jnp.asarray(gray),
                                         interpret=True))[..., 0]
    np.testing.assert_array_equal(ours, ref)


def test_pallas_batch_and_values():
    rs = np.random.RandomState(1)
    gray = (rs.rand(3, 32, 32) * 255).astype(np.float32)
    out = np.asarray(canny_edges_pallas(jnp.asarray(gray), interpret=True))
    assert out.shape == (3, 32, 32, 1)
    assert set(np.unique(out)) <= {0.0, 255.0}


def test_tiled_matches_whole_image_kernel():
    """Row-tiled kernel (halo'd DMA bands) is bit-identical to the
    whole-image kernel and the XLA reference, at several tile sizes."""
    from saunet_tpu.ops.pallas.canny import canny_edges_pallas_tiled

    rs = np.random.RandomState(4)
    yy, xx = np.mgrid[0:64, 0:48].astype(np.float32)
    img = (
        120 * np.exp(-((yy - 40) ** 2 + (xx - 12) ** 2) / 60.0)
        + 90 * (yy > 50)
        + 12 * rs.rand(64, 48)
    ).astype(np.float32)[None]
    gray = np.clip(img, 0, 255)
    gray = np.concatenate([gray, gray[:, ::-1]], axis=0)  # batch of 2

    ref = np.asarray(canny_edges(jnp.asarray(gray[..., None])))
    for tile_rows in (16, 32, 64):
        ours = np.asarray(canny_edges_pallas_tiled(
            jnp.asarray(gray), tile_rows=tile_rows, interpret=True))
        np.testing.assert_array_equal(ours, ref, err_msg=f"tile {tile_rows}")


def test_tiled_rejects_non_divisible():
    import pytest

    from saunet_tpu.ops.pallas.canny import canny_edges_pallas_tiled

    with pytest.raises(ValueError):
        canny_edges_pallas_tiled(jnp.zeros((1, 60, 48)), tile_rows=16,
                                 interpret=True)


def test_image_to_gray255_range():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 16, 16, 3).astype(np.float32))
    g = np.asarray(image_to_gray255(x))
    assert g.shape == (2, 16, 16, 1)
    assert g.min() >= 0 and abs(g.max() - 255.0) < 1e-3


def test_grad_linearizes_past_stopped_pallas_canny():
    """Saliency differentiates w.r.t. the image, whose tangent reaches the
    canny subgraph. pallas_call has no autodiff rule, and a stop_gradient
    at the kernel's OUTPUT is not enough — linearization already fails at
    the call. The model stops the gradient at the kernel's INPUT
    (models/saunet.py::_canny); this pins the op-level pattern."""
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.rand(1, 32, 32, 3).astype(np.float32))

    def f(im):
        gray = image_to_gray255(im)
        edges = canny_edges_pallas(jax.lax.stop_gradient(gray),
                                   interpret=True)
        return jnp.sum(im * 2.0) + edges.astype(im.dtype).sum()

    g = jax.grad(f)(img)  # must not raise "Linearization failed"
    np.testing.assert_allclose(np.asarray(g), 2.0)
