"""Fused Pallas shape-stream kernel == the XLA shape stream in eval mode
(interpret mode on CPU; compiled path exercised on TPU by bench/infer)."""
import numpy as np

import jax
import jax.numpy as jnp

from saunet_tpu.models import SAUNet
from saunet_tpu.ops.pallas.shape_stream import shape_stream_fused


def _setup(hw=32, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.rand(2, hw, hw, 3).astype(np.float32))
    m = SAUNet(num_classes=4, dtype=jnp.bfloat16, edge_kernel="xla")
    v = m.init(jax.random.PRNGKey(seed), x, train=False)
    taps = m.apply(v, x, False, method=lambda s, xx, t: s.encoder(xx, t))
    return m, v, taps[1:], x.astype(jnp.bfloat16)


def test_fused_shape_stream_matches_xla():
    m, v, taps, x = _setup()
    ref, _gates = m.apply(v, taps, x, False, method="shape_stream")
    packed = m.apply(v, taps, x, method="shape_stream_inputs")
    assert packed.shape[-1] == 67
    out = shape_stream_fused(packed, v["params"], v["batch_stats"],
                             interpret=True)
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    assert out.shape == ref.shape
    # sigmoid outputs in (0,1); bf16 intermediate tail
    np.testing.assert_allclose(out, ref, atol=0.04)
    assert np.median(np.abs(out - ref)) < 0.004


def test_fused_shape_stream_banded():
    m, v, taps, x = _setup(hw=32, seed=1)
    packed = m.apply(v, taps, x, method="shape_stream_inputs")
    whole = np.asarray(shape_stream_fused(
        packed, v["params"], v["batch_stats"], interpret=True), np.float32)
    banded = np.asarray(shape_stream_fused(
        packed, v["params"], v["batch_stats"], band_rows=8,
        interpret=True), np.float32)
    np.testing.assert_allclose(banded, whole, atol=0.02)


def test_decode_accepts_precomputed_edge():
    m, v, taps, x = _setup(seed=2)
    edge_ref, _ = m.apply(v, taps, x, False, method="shape_stream")
    seg_a, edge_a = m.apply(v, taps, x, False, False, edge_ref,
                            method="decode")
    seg_b, edge_b = m.apply(v, taps, x, False, method="decode")
    np.testing.assert_array_equal(np.asarray(seg_a), np.asarray(seg_b))
    np.testing.assert_array_equal(np.asarray(edge_a), np.asarray(edge_b))
