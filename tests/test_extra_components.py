"""Inventory-completeness components: ResNet family, SE bottlenecks, DoG
gated conv, adaptive pooling, dormant losses, optimizer variants,
SegmentationModule facade (SURVEY.md §2.1/§2.4 rows not exercised by the
SAUNet hot path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saunet_tpu.models import (
    HighFrequencyGatedSpatialConv,
    SAUNet,
    SEBottleneck,
    SegmentationModule,
    SEResNetBottleneck,
    resnet18,
    resnet50,
)
from saunet_tpu.ops import adaptive_pool2d, pooling_factor
from saunet_tpu.train import (
    adamw,
    image_based_cross_entropy,
    label_smooth_softmax_ce,
    plain_radam,
)

torch = pytest.importorskip("torch")


def test_resnet18_taps():
    m = resnet18()
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    c1, c2, c3, c4, c5 = m.apply(v, x, train=False)
    assert c1.shape == (1, 32, 32, 128)   # deep stem, /2
    assert c2.shape == (1, 16, 16, 64)    # after pool, layer1
    assert c3.shape == (1, 8, 8, 128)
    assert c4.shape == (1, 4, 4, 256)
    assert c5.shape == (1, 2, 2, 512)


def test_resnet50_channels():
    m = resnet50()
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    _, c2, _, _, c5 = m.apply(v, x, train=False)
    assert c2.shape[-1] == 256   # bottleneck expansion 4
    assert c5.shape[-1] == 2048


def test_se_bottlenecks_shapes():
    x = jnp.zeros((1, 8, 8, 64))
    for cls in (SEBottleneck, SEResNetBottleneck):
        m = cls(planes=16, downsample=True)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        y = m.apply(v, x, train=False)
        assert y.shape == (1, 8, 8, 64)


def test_hf_gated_conv():
    m = HighFrequencyGatedSpatialConv(8)
    x = jnp.ones((1, 16, 16, 8))
    cue = jnp.ones((1, 16, 16, 1))
    v = m.init(jax.random.PRNGKey(0), x, cue, train=False)
    y = m.apply(v, x, cue, train=False)
    assert y.shape == (1, 16, 16, 8)


def test_adaptive_pool_modes():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4, 8)
                    .astype(np.float32))
    avg = adaptive_pool2d(x, "avg")
    mx = adaptive_pool2d(x, "max")
    am = adaptive_pool2d(x, "avgmax")
    cat = adaptive_pool2d(x, "catavgmax")
    assert avg.shape == (2, 1, 1, 8)
    np.testing.assert_allclose(np.asarray(am),
                               (np.asarray(avg) + np.asarray(mx)) / 2)
    assert cat.shape == (2, 1, 1, 16)
    assert pooling_factor("catavgmax") == 2
    with pytest.raises(ValueError):
        adaptive_pool2d(x, "bogus")


def test_label_smooth_ce_matches_manual():
    rs = np.random.RandomState(0)
    logits = rs.randn(2, 4, 4, 3).astype(np.float32)
    labels = rs.randint(0, 3, size=(2, 4, 4))
    ours = float(label_smooth_softmax_ce(jnp.asarray(logits),
                                         jnp.asarray(labels)))
    lt = torch.from_numpy(logits)
    logs = torch.nn.functional.log_softmax(lt, dim=-1)
    one_hot = torch.nn.functional.one_hot(torch.from_numpy(labels), 3).float()
    sm = 0.9 * one_hot + 0.005 * (1 - one_hot)
    ref = float((-(logs * sm).sum(-1)).mean())
    assert abs(ours - ref) < 1e-5


def test_label_smooth_ce_ignore_index():
    logits = jnp.zeros((1, 2, 2, 3))
    labels = jnp.asarray([[[0, -1], [-1, -1]]])
    v = float(label_smooth_softmax_ce(logits, labels))
    # only one valid pixel; uniform logits -> loss = -sum(sm * log(1/3))
    expect = -(0.9 + 2 * 0.005) * np.log(1 / 3)
    assert abs(v - expect) < 1e-5


def test_image_based_ce_runs_and_weights_rare_classes():
    rs = np.random.RandomState(0)
    logits = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32))
    labels = np.zeros((2, 8, 8), np.int32)
    labels[:, 0, 0] = 3  # rare class
    v = float(image_based_cross_entropy(logits, jnp.asarray(labels)))
    assert np.isfinite(v) and v > 0


def test_optimizer_variants_step():
    params = {"w": jnp.ones(4)}
    g = {"w": jnp.full(4, 0.1)}
    for tx in (plain_radam(1e-3), adamw(1e-3, weight_decay=1e-2)):
        st = tx.init(params)
        up, st = tx.update(g, st, params)
        assert np.isfinite(np.asarray(up["w"])).all()


@pytest.fixture(scope="module")
def small_sm():
    model = SAUNet(num_classes=4)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    return SegmentationModule(model, num_class=4), v


def test_segmentation_module_modes(small_sm):
    sm, variables = small_sm
    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.randn(1, 32, 32, 3).astype(np.float32)),
        "label": jnp.asarray(rs.randint(0, 4, size=(1, 32, 32))),
        "edge": jnp.asarray((rs.rand(1, 32, 32, 1) > 0.8)
                            .astype(np.float32)),
    }
    (loss, (acc, jac)), mut = sm.train(variables, batch)
    assert np.isfinite(float(loss)) and jac.shape == (3,)
    probs = sm.predict(variables, batch["image"])
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-4)
    probs2, atts = sm.predict(variables, batch["image"], return_att=True)
    assert len(atts) == 7
    probs3, loss3 = sm.infer_loss(variables, batch)
    assert np.isfinite(float(loss3))
