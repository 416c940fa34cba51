"""Packed decoder-trunk oracles: PDualAttBlock and its primitives must
match the dense DualAttBlock exactly — same parameter tree, same outputs,
same BatchNorm statistics, same gradients — under identical parameters.

Reference role: the decoder half of SAUNet.forward
(/root/reference/models/models.py:371-384, attention_blocks.py:175-238).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from saunet_tpu.models.blocks import DualAttBlock
from saunet_tpu.models.packed_stream import PDualAttBlock, chained_pack
from saunet_tpu.ops.packed import (
    conv3x3_dense_to_packed,
    pack,
    packed_channel_mean,
    unpack,
)


def _rand(*shape, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32))


@pytest.mark.parametrize("p", [1, 2, 4])
def test_conv3x3_dense_to_packed_matches_dense(p):
    x = _rand(2, 6, 8, 10, seed=1)
    k = _rand(3, 3, 10, 4, seed=2) * 0.3
    b = _rand(4, seed=3)[..., 0:4].reshape(4) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = ref + b
    got = conv3x3_dense_to_packed(x, k, p, 4, bias=b)
    assert got.shape == (2, 6, 8 // p, p * 4)
    np.testing.assert_allclose(unpack(got, 4), ref, rtol=1e-5, atol=1e-5)


def test_conv3x3_dense_to_packed_split_parts():
    """conv(concat(a, b)) == split-kernel sum — the decoder's skip/up
    fusion without the concat."""
    a = _rand(2, 6, 8, 6, seed=4)
    bb = _rand(2, 6, 8, 4, seed=5)
    k = _rand(3, 3, 10, 4, seed=6) * 0.3
    x = jnp.concatenate([a, bb], axis=-1)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_dense_to_packed([(a, 6), (bb, 4)], k, 2, 4)
    np.testing.assert_allclose(unpack(got, 4), ref, rtol=1e-5, atol=1e-5)


def test_packed_channel_mean():
    x = _rand(3, 4, 8, 5, seed=7)
    ref = jnp.mean(x, axis=(1, 2))
    got = packed_channel_mean(pack(x, 2), 5)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_chained_pack():
    assert chained_pack(112, 16, 2) == 8
    assert chained_pack(112, 1, 8) == 112
    assert chained_pack(2, 128, 1) == 1
    assert chained_pack(16, 1, 8) == 16
    # always a multiple of base that divides w, with c*p <= 128
    for w, c, base in [(56, 32, 4), (28, 64, 2), (14, 1, 1), (30, 16, 2)]:
        p = chained_pack(w, c, base)
        assert p % base == 0 and w % p == 0 and c * p <= 128


@pytest.mark.parametrize("p", [1, 2])
def test_pdualattblock_matches_dense(p):
    # dec2-shaped geometry scaled down: coarse 16ch @4x8, skip 16ch @8x16
    coarse = _rand(2, 4, 8, 16, seed=10)
    skip = _rand(2, 8, 16, 16, seed=11)
    dense = DualAttBlock(16)
    v = dense.init(jax.random.PRNGKey(0), [coarse, skip], True)

    packed = PDualAttBlock(16, c_in=32, coarse_channels=16)
    v_p = packed.init(jax.random.PRNGKey(0), [coarse, skip], p, True)
    # identical parameter trees (structure AND values: same init paths)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        v, v_p)

    (ref, att_r), mut_r = dense.apply(v, [coarse, skip], True,
                                      mutable=["batch_stats"])
    (got, (att_p, p_cue)), mut_p = packed.apply(
        v, [coarse, skip], p, True, mutable=["batch_stats"])
    np.testing.assert_allclose(unpack(got, 16), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(unpack(att_p, 1), att_r, rtol=1e-4,
                               atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        mut_r["batch_stats"], mut_p["batch_stats"])

    # eval mode (running stats)
    stats = {"params": v["params"], "batch_stats": mut_r["batch_stats"]}
    ref_e, _ = dense.apply(stats, [coarse, skip], False)
    got_e, _ = packed.apply(stats, [coarse, skip], p, False)
    np.testing.assert_allclose(unpack(got_e, 16), ref_e, rtol=1e-4,
                               atol=1e-4)


def test_pdualattblock_param_gradients_match():
    coarse = _rand(1, 4, 8, 16, seed=12)
    skip = _rand(1, 8, 16, 16, seed=13)
    dense = DualAttBlock(16)
    v = dense.init(jax.random.PRNGKey(1), [coarse, skip], True)
    packed = PDualAttBlock(16, c_in=32, coarse_channels=16)

    def loss_d(params):
        (out, att), _ = dense.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            [coarse, skip], True, mutable=["batch_stats"])
        return jnp.mean(out ** 2) + jnp.mean(att)

    def loss_p(params):
        (out, (att, _)), _ = packed.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            [coarse, skip], 2, True, mutable=["batch_stats"])
        return jnp.mean(out ** 2) + jnp.mean(att)

    np.testing.assert_allclose(loss_p(v["params"]), loss_d(v["params"]),
                               rtol=1e-5, atol=1e-6)
    gd = jax.grad(loss_d)(v["params"])
    gp = jax.grad(loss_p)(v["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4),
        gd, gp)
