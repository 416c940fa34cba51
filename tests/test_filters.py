"""Filter ops (custom_functions parity, real implementations)."""
import numpy as np

import jax.numpy as jnp

from saunet_tpu.ops import (
    conv2d_same, conv_tri, gradient_central_diff,
    gradient_magnitude_and_normal,
)
from saunet_tpu.ops.filters import triangle_kernel
from saunet_tpu.train.metrics import accuracy


def test_conv2d_same_identity():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 2)
                    .astype(np.float32))
    k = np.zeros((3, 3, 2, 2), np.float32)
    k[1, 1, 0, 0] = 1
    k[1, 1, 1, 1] = 1
    y = conv2d_same(x, jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6)


def test_gradient_central_diff_linear_ramp():
    h = np.arange(8, dtype=np.float32)
    x = jnp.asarray(np.tile(h, (1, 8, 1)).reshape(1, 8, 8, 1))
    dx, dy = gradient_central_diff(x)
    # interior gradient of a unit ramp along W is 1
    np.testing.assert_allclose(np.asarray(dx)[0, :, 1:-1, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dy)[0, 1:-1, :, 0], 0.0, atol=1e-6)


def test_triangle_kernel_normalised():
    k = triangle_kernel(2)
    assert k.shape == (5,)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    assert k[2] == k.max()


def test_conv_tri_preserves_mean():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 1)
                    .astype(np.float32))
    y = conv_tri(x, 2)
    assert y.shape == x.shape
    # interior mean preserved by a normalised blur
    np.testing.assert_allclose(float(jnp.mean(y[:, 4:-4, 4:-4])),
                               float(jnp.mean(x[:, 4:-4, 4:-4])), atol=0.02)
    # r=0 identity
    np.testing.assert_array_equal(np.asarray(conv_tri(x, 0)), np.asarray(x))


def test_gradient_magnitude_unit_normals():
    h = np.arange(16, dtype=np.float32)
    x = jnp.asarray(np.tile(h, (1, 16, 1)).reshape(1, 16, 16, 1))
    mag, normal = gradient_magnitude_and_normal(x, blur_radius=1)
    norm = np.asarray(normal)
    lengths = np.sqrt((norm ** 2).sum(-1))
    np.testing.assert_allclose(lengths[0, 4:-4, 4:-4, 0], 1.0, atol=1e-4)


def test_accuracy_util():
    pred = np.array([[0, 1], [2, 3]])
    lab = np.array([[0, 1], [2, 0]])
    acc, valid = accuracy(pred, lab)
    assert abs(acc - 0.75) < 1e-9
    assert valid == 4
