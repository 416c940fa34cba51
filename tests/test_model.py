"""SAUNet architecture contract tests: the channel/resolution table of
SURVEY.md §3.3 (scaled to 64² inputs), output ranges, and attention-map
surface (/root/reference/models/models.py:326-394)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saunet_tpu.models import SAUNet, build_unet


@pytest.fixture(scope="module")
def model_and_vars():
    model = SAUNet(num_classes=4)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(rng, x, train=False)
    return model, variables


def test_output_shapes_and_ranges(model_and_vars):
    model, variables = model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    (seg, edge), mut = model.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
    assert seg.shape == (2, 64, 64, 4)
    assert edge.shape == (2, 64, 64, 1)
    assert seg.dtype == jnp.float32
    e = np.asarray(edge)
    assert (e >= 0).all() and (e <= 1).all()  # sigmoid output
    # batch stats actually update in train mode
    assert mut["batch_stats"]


def test_encoder_feature_table():
    from saunet_tpu.models.densenet import DenseNetEncoder
    enc = DenseNetEncoder()
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    f1, f2, f3, f4, f5 = enc.apply(variables, x, train=False)
    # pool0 dropped: denseblock1 runs at H/2
    assert f1.shape == (1, 32, 32, 64)
    assert f2.shape == (1, 16, 16, 128)
    assert f3.shape == (1, 8, 8, 256)
    assert f4.shape == (1, 4, 4, 512)
    assert f5.shape == (1, 4, 4, 1024)


def test_return_att_surface(model_and_vars):
    model, variables = model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    seg, edge, atts = model.apply(variables, x, train=False, return_att=True)
    # [att2, att3, att4, att5, g1, g2, g3], all upsampled to input res
    assert len(atts) == 7
    for a in atts:
        assert a.shape[1:3] == (64, 64)
        assert a.shape[-1] == 1


def test_eval_mode_deterministic(model_and_vars):
    model, variables = model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    y1, _ = model.apply(variables, x, train=False)
    y2, _ = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_build_unet_factory():
    m = build_unet(num_class=4, arch="saunet")
    assert isinstance(m, SAUNet)
    with pytest.raises(ValueError):
        build_unet(arch="albunet")
