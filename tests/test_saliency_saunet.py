"""Saliency end-to-end on the real SAUNet: vanilla vs guided gradients and
SmoothGrad through the full dual-stream model (SURVEY.md §3.4 capability,
configs #4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saunet_tpu.interpret import (
    guided_gradients, smooth_grad, vanilla_gradients,
)
from saunet_tpu.models import SAUNet


@pytest.fixture(scope="module")
def model_vars():
    model = SAUNet(num_classes=4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    return model, variables


def test_vanilla_and_guided_differ(model_vars):
    model, variables = model_vars
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.randn(1, 32, 32, 3).astype(np.float32))
    target = jnp.asarray(rs.randint(0, 2, size=(32, 32)))

    g_v = vanilla_gradients(model, variables, img, target)
    g_g = guided_gradients(model, variables, img, target)
    assert g_v.shape == img.shape and g_g.shape == img.shape
    assert np.isfinite(np.asarray(g_v)).all()
    assert np.isfinite(np.asarray(g_g)).all()
    # guided zeroes negative flows -> strictly different field
    assert not np.allclose(np.asarray(g_v), np.asarray(g_g))


def test_smoothgrad_on_model(model_vars):
    model, variables = model_vars
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.randn(32, 32, 3).astype(np.float32))
    target = jnp.asarray(rs.randint(0, 2, size=(32, 32)))

    grad_fn = lambda im: vanilla_gradients(model, variables, im, target)
    sg = smooth_grad(grad_fn, jax.random.PRNGKey(0), img, n=4, batch_size=2)
    assert sg.shape == img.shape
    assert np.isfinite(np.asarray(sg)).all()


def test_canny_prior_is_gradient_opaque(model_vars):
    """The edge prior must stop the gradient at the canny INPUT: on TPU the
    canny is a pallas_call with no autodiff rule, and saliency's grad
    w.r.t. the image fails linearization if the image tangent enters the
    kernel (BENCH_MODE=saliency r5 failure). Backend-independent pin: the
    gradient of the canny prior w.r.t. its input is exactly zero."""
    model, _ = model_vars
    rs = np.random.RandomState(3)
    gray = jnp.asarray(rs.rand(1, 32, 32, 1).astype(np.float32) * 255.0)
    g = jax.grad(lambda gg: jnp.sum(model._canny(gg)))(gray)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
