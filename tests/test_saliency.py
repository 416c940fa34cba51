"""Saliency transforms: guided-ReLU VJP rule, vanilla gradients on a small
model, SmoothGrad averaging (SURVEY.md §2.5/§3.4 capability)."""
import numpy as np

import jax
import jax.numpy as jnp

from saunet_tpu.interpret import (
    convert_to_grayscale,
    guided_relu,
    positive_negative_saliency,
    smooth_grad,
)


def test_guided_relu_forward_is_relu():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    np.testing.assert_array_equal(np.asarray(guided_relu(x)),
                                  [0, 0, 0, 0.5, 2.0])


def test_guided_relu_backward_rule():
    x = jnp.asarray([-1.0, 1.0, 2.0, 3.0])

    # upstream grads: one positive, one negative across positions
    def f(x):
        return jnp.sum(guided_relu(x) * jnp.asarray([1.0, 1.0, -1.0, 2.0]))

    g = np.asarray(jax.grad(f)(x))
    # x<=0 -> 0; upstream negative -> 0; else upstream
    np.testing.assert_array_equal(g, [0.0, 1.0, 0.0, 2.0])


def test_vanilla_gradients_on_toy_model():
    """A 1x1-conv 'segmentation model' has an analytic input gradient."""
    from flax import linen as nn

    class Toy(nn.Module):
        act: object = nn.relu

        @nn.compact
        def __call__(self, x, train=False):
            seg = nn.Conv(4, (1, 1), name="final")(x)
            return seg, jnp.zeros_like(x[..., :1])

    from saunet_tpu.interpret import vanilla_gradients

    model = Toy()
    x = jnp.ones((1, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    target = jnp.zeros((8, 8), jnp.int32)  # all class 0
    g = vanilla_gradients(model, variables, x, target, classes=(0, 1))
    # gradient = W[:, 0] everywhere (target==0 seeds only class 0 channel)
    w = np.asarray(variables["params"]["final"]["kernel"])[0, 0]  # (3, 4)
    np.testing.assert_allclose(np.asarray(g)[0, 0, 0], w[:, 0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g)[0, 5, 3], w[:, 0], rtol=1e-5)


def test_smooth_grad_reduces_to_plain_grad_at_zero_noise():
    grad_fn = lambda img: img * 2.0  # deterministic "gradient"
    img = jnp.asarray(np.random.RandomState(0).rand(4, 4).astype(np.float32))
    out = smooth_grad(grad_fn, jax.random.PRNGKey(0), img, n=8,
                      sigma_multiplier=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img) * 2, rtol=1e-6)


def test_grayscale_and_posneg():
    g = np.random.RandomState(0).randn(8, 8, 3).astype(np.float32)
    gray = convert_to_grayscale(g)
    assert gray.shape == (8, 8)
    assert gray.min() >= 0 and gray.max() <= 1
    pos, neg = positive_negative_saliency(g)
    assert (pos >= 0).all() and (neg >= 0).all()
    assert pos.max() <= 1.0 + 1e-6 and neg.max() <= 1.0 + 1e-6
