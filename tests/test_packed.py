"""Lane-packed layout ops (ops/packed.py): every packed op must match its
dense-layout counterpart exactly (same math, different layout)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from saunet_tpu.ops.packed import (
    broadcast_1ch,
    choose_pack,
    pack,
    packed_bn_stats,
    packed_conv1x1,
    packed_conv3x3,
    packed_scale_bias,
    repack,
    resize_bilinear_packed,
    unpack,
)
from saunet_tpu.ops.resize import resize_bilinear


def _rand(*shape, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32))


def dense_conv(x, k, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_choose_pack():
    assert choose_pack(224, 1) == 112
    assert choose_pack(256, 1) == 128
    assert choose_pack(224, 8) == 16
    assert choose_pack(224, 16) == 8
    assert choose_pack(224, 32) == 4
    assert choose_pack(224, 64) == 2
    assert choose_pack(224, 33) == 2
    assert choose_pack(224, 17) == 7
    assert choose_pack(224, 9) == 14
    assert choose_pack(10, 7) == 10  # any divisor up to the lane budget
    assert choose_pack(13, 64) == 1  # prime width: no packing


def test_pack_unpack_roundtrip():
    x = _rand(2, 4, 12, 3)
    for p in (1, 2, 3, 4, 6):
        xp = pack(x, p)
        assert xp.shape == (2, 4, 12 // p, p * 3)
        np.testing.assert_array_equal(unpack(xp, 3), x)


def test_pack_lane_order():
    # lane l = p*C + c: adjacent pixels are adjacent C-blocks of the lane dim
    x = _rand(1, 1, 4, 2)
    xp = pack(x, 2)
    np.testing.assert_array_equal(xp[0, 0, 0, :2], x[0, 0, 0])
    np.testing.assert_array_equal(xp[0, 0, 0, 2:], x[0, 0, 1])
    np.testing.assert_array_equal(xp[0, 0, 1, :2], x[0, 0, 2])


@pytest.mark.parametrize("cin,cout,pin,pout", [
    (4, 4, 2, 2),    # same pack
    (8, 4, 2, 4),    # narrowing, pack increase
    (8, 2, 2, 8),    # pack increase x4
    (2, 8, 8, 2),    # widening, pack decrease
    (4, 5, 4, 2),    # awkward C_out, pack decrease
    (1, 3, 8, 4),    # from a cue-like 1-ch map
])
def test_packed_conv1x1(cin, cout, pin, pout):
    x = _rand(2, 3, 16, cin, seed=1)
    k = _rand(1, 1, cin, cout, seed=2)
    bias = _rand(cout, seed=3)
    ref = dense_conv(x, k) + bias
    got = unpack(packed_conv1x1(pack(x, pin), k, cin, pin, cout, pout,
                                bias=bias), cout)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cin,cout,p", [
    (4, 4, 2),
    (2, 2, 8),
    (4, 6, 4),
    (3, 1, 4),
    (4, 4, 1),   # degenerate: must equal the dense conv construction
])
def test_packed_conv3x3(cin, cout, p):
    x = _rand(2, 5, 16, cin, seed=4)
    k = _rand(3, 3, cin, cout, seed=5)
    ref = dense_conv(x, k)
    got = unpack(packed_conv3x3(pack(x, p), k, cin, p, cout), cout)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cin,cout,p", [
    (4, 4, 2),    # the res1 shape class (P=2, full lanes at C*P)
    (2, 2, 8),
    (4, 6, 4),
    (3, 1, 4),
    (64, 64, 2),  # the real res1 geometry
])
def test_packed_conv3x3_split(cin, cout, p):
    from saunet_tpu.ops.packed import packed_conv3x3_split

    x = _rand(2, 5, 16, cin, seed=4)
    k = _rand(3, 3, cin, cout, seed=5)
    bias = _rand(cout, seed=8)
    ref = dense_conv(x, k) + bias
    got = unpack(packed_conv3x3_split(pack(x, p), k, cin, p, cout,
                                      bias=bias), cout)
    # atol covers f32 reassociation at C=64 (576-product sums): measured
    # max abs diff 4.6e-5 on O(10) outputs
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_packed_conv3x3_split_gradients_flow_to_dense_kernel():
    from saunet_tpu.ops.packed import packed_conv3x3_split

    x = _rand(1, 4, 8, 2, seed=6)
    k = _rand(3, 3, 2, 2, seed=7)

    def loss_split(k):
        return jnp.sum(packed_conv3x3_split(pack(x, 4), k, 2, 4) ** 2)

    def loss_dense(k):
        return jnp.sum(dense_conv(x, k) ** 2)

    gp = jax.grad(loss_split)(k)
    gd = jax.grad(loss_dense)(k)
    np.testing.assert_allclose(gp, gd, rtol=1e-4, atol=1e-4)


def test_packed_conv3x3_gradients_flow_to_dense_kernel():
    x = _rand(1, 4, 8, 2, seed=6)
    k = _rand(3, 3, 2, 2, seed=7)

    def loss_packed(k):
        return jnp.sum(packed_conv3x3(pack(x, 4), k, 2, 4) ** 2)

    def loss_dense(k):
        return jnp.sum(dense_conv(x, k) ** 2)

    gp = jax.grad(loss_packed)(k)
    gd = jax.grad(loss_dense)(k)
    np.testing.assert_allclose(gp, gd, rtol=1e-4, atol=1e-4)


def test_repack():
    x = _rand(2, 3, 16, 4, seed=8)
    xp = pack(x, 2)
    np.testing.assert_allclose(unpack(repack(xp, 4, 2, 4), 4), x,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(unpack(repack(pack(x, 8), 4, 8, 2), 4), x,
                               rtol=1e-6, atol=1e-6)


def test_broadcast_1ch():
    x = _rand(2, 3, 16, 1, seed=9)
    for pin, cout, pout in [(16, 4, 4), (8, 4, 8), (16, 5, 2)]:
        got = unpack(broadcast_1ch(pack(x, pin), pin, cout, pout), cout)
        ref = jnp.broadcast_to(x, x.shape[:3] + (cout,))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_packed_bn_stats():
    x = _rand(3, 5, 16, 6, seed=10)
    mean, var = packed_bn_stats(pack(x, 4), 6)
    np.testing.assert_allclose(mean, jnp.mean(x, axis=(0, 1, 2)),
                               rtol=1e-5, atol=1e-6)
    ref_var = jnp.mean(x ** 2, axis=(0, 1, 2)) - jnp.mean(
        x, axis=(0, 1, 2)) ** 2
    np.testing.assert_allclose(var, ref_var, rtol=1e-4, atol=1e-5)


def test_packed_scale_bias():
    x = _rand(2, 3, 8, 4, seed=11)
    s = _rand(4, seed=12)
    b = _rand(4, seed=13)
    got = unpack(packed_scale_bias(pack(x, 2), s, b, 4), 4)
    np.testing.assert_allclose(got, x * s + b, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw_in,hw_out,c,p", [
    ((8, 8), (32, 32), 3, 4),
    ((16, 12), (16, 24), 2, 8),
    ((7, 9), (21, 36), 1, 12),
])
def test_resize_bilinear_packed(hw_in, hw_out, c, p):
    x = _rand(2, hw_in[0], hw_in[1], c, seed=14)
    ref = resize_bilinear(x, hw_out)
    got = unpack(resize_bilinear_packed(x, hw_out, p), c)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cin,cout,p", [(4, 2, 2), (2, 4, 4), (48, 32, 2),
                                        (3, 5, 1)])
def test_packed_convtr4x2(cin, cout, p):
    from flax import linen as nn
    from saunet_tpu.ops.packed import packed_convtr4x2

    x = _rand(2, 6, 16, cin, seed=20)
    mod = nn.ConvTranspose(cout, (4, 4), strides=(2, 2), padding="SAME")
    v = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(v, x)
    got = unpack(packed_convtr4x2(pack(x, p), v["params"]["kernel"], cin, p,
                                  cout, bias=v["params"]["bias"]), cout)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_packed_argmax():
    from saunet_tpu.ops.packed import packed_argmax

    for c, p, seed in [(4, 8, 21), (3, 4, 22), (5, 2, 23)]:
        x = _rand(2, 3, 8 * p // p * p, c, seed=seed)  # W divisible by p
        ref = jnp.argmax(x, axis=-1)
        got = packed_argmax(pack(x, p), c)
        np.testing.assert_array_equal(got, ref)
    # ties resolve to the first (lowest) class, like jnp.argmax
    t = jnp.zeros((1, 1, 4, 3))
    np.testing.assert_array_equal(packed_argmax(pack(t, 2), 3),
                                  jnp.argmax(t, axis=-1))
