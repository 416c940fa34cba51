"""resize_bilinear must match torch F.interpolate(align_corners=True) —
the op the reference model uses everywhere (models/models.py:337-389)."""
import numpy as np
import pytest

import jax.numpy as jnp

from saunet_tpu.ops.resize import resize_bilinear, resize_nearest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 16), (32, 32)),   # x2 upsample (decoder skips)
    ((8, 8), (64, 64)),     # x8 (attention maps)
    ((4, 6), (13, 9)),      # ragged
    ((32, 32), (16, 16)),   # downsample
    ((7, 7), (7, 7)),       # identity
])
def test_matches_torch_align_corners(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 5).astype(np.float32)

    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_rank_flexibility():
    x = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = resize_bilinear(jnp.asarray(x), (8, 8))
    assert out.shape == (8, 8)
    out3 = resize_bilinear(jnp.asarray(x)[..., None], (8, 8))
    assert out3.shape == (8, 8, 1)


def test_nearest_preserves_labels():
    x = np.random.RandomState(1).randint(0, 4, size=(1, 10, 10, 1))
    out = np.asarray(resize_nearest(jnp.asarray(x), (23, 23)))
    assert set(np.unique(out)) <= set(np.unique(x))
    assert out.shape == (1, 23, 23, 1)
