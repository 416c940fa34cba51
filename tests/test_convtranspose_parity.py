"""flax ConvTranspose('SAME', k=4, s=2) == torch ConvTranspose2d(4, 2, 1)
up to a spatial kernel flip — the upsampler used by every decoder block
(_MRF attention_blocks.py:175-206, DecoderBlock models.py:208-214). This
pins the weight-porting rule: transpose OIHW->HWIO via (2,3,0,1) then flip
both spatial axes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

torch = pytest.importorskip("torch")


def test_same_padding_matches_torch_k4s2p1():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 4, 6, 6).astype(np.float32)
    w = rs.randn(4, 8, 4, 4).astype(np.float32)  # torch (in, out, kh, kw)

    yt = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1
    ).numpy()

    m = nn.ConvTranspose(8, (4, 4), strides=(2, 2), padding="SAME")
    k = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()
    yj = m.apply({"params": {"kernel": jnp.asarray(k),
                             "bias": jnp.zeros(8)}},
                 jnp.asarray(x.transpose(0, 2, 3, 1)))
    yj = np.asarray(yj).transpose(0, 3, 1, 2)

    assert yj.shape == yt.shape == (2, 8, 12, 12)
    np.testing.assert_allclose(yj, yt, rtol=1e-4, atol=1e-5)
