"""Fused Pallas dense-block kernel == the XLA DenseBlock in eval mode
(interpret mode on CPU; compiled path exercised on TPU by bench/infer)."""
import numpy as np

import jax
import jax.numpy as jnp

from saunet_tpu.models.densenet import DenseBlock
from saunet_tpu.ops.pallas.dense_block import (
    dense_block_fused,
    pick_band_rows,
)


def _make_block(num_layers=3, c0=64, hw=16, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(2, hw, hw, c0).astype(np.float32))
    block = DenseBlock(num_layers, dtype=jnp.bfloat16)
    variables = block.init(jax.random.PRNGKey(seed), x, True)
    # randomise running stats so BN folding is non-trivial
    stats = jax.tree.map(lambda a: a, variables["batch_stats"])
    params = variables["params"]

    def rand_stats(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rand_stats(v)
            elif k == "mean":
                out[k] = jnp.asarray(rs.randn(*v.shape).astype(np.float32)
                                     * 0.3)
            else:  # var
                out[k] = jnp.asarray(
                    (0.5 + rs.rand(*v.shape)).astype(np.float32))
        return out

    stats = rand_stats(stats)
    return block, params, stats, x


def test_fused_matches_xla_eval():
    block, params, stats, x = _make_block()
    ref = block.apply({"params": params, "batch_stats": stats}, x, False)
    out = dense_block_fused(x, params, stats, num_layers=3, interpret=True)
    assert out.shape == ref.shape == (2, 16, 16, 64 + 3 * 32)
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    tol = 0.05 * np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=tol)
    # typical agreement should be much tighter than the bf16 tail tolerance
    assert np.median(np.abs(out - ref)) < tol / 10


def test_fused_banded_matches_whole_map():
    block, params, stats, x = _make_block(num_layers=2, c0=64, hw=16,
                                          seed=1)
    whole = np.asarray(dense_block_fused(x, params, stats, num_layers=2,
                                         interpret=True), np.float32)
    banded = np.asarray(dense_block_fused(x, params, stats, num_layers=2,
                                          band_rows=4, interpret=True),
                        np.float32)
    # identical math modulo bf16 accumulation grouping at band boundaries
    np.testing.assert_allclose(banded, whole,
                               atol=0.02 * np.abs(whole).max())


def test_fused_encoder_matches_xla_encoder():
    """encoder_apply_fused (Pallas blocks, interpret mode) == the flax
    DenseNetEncoder in eval mode, on the same param/stats pytrees."""
    from saunet_tpu.models.densenet import DenseNetEncoder
    from saunet_tpu.models.fused_encoder import encoder_apply_fused

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, 32, 32, 3).astype(np.float32))
    enc = DenseNetEncoder(dtype=jnp.bfloat16)
    v = enc.init(jax.random.PRNGKey(0), x, True)
    ref = enc.apply(v, x, False)
    out = encoder_apply_fused(v["params"], v["batch_stats"], x,
                              interpret=True)
    assert len(out) == 5
    for i, (o, r) in enumerate(zip(out, ref)):
        o = np.asarray(o, np.float32)
        r = np.asarray(r, np.float32)
        assert o.shape == r.shape, i
        tol = 0.06 * max(np.abs(r).max(), 1e-3)
        np.testing.assert_allclose(o, r, atol=tol, err_msg=f"tap f{i+1}")


def test_decode_method_matches_full_forward():
    """SAUNet.decode fed the XLA encoder's taps == SAUNet.__call__ — the
    seam the fused-encoder inference path relies on."""
    from saunet_tpu.models import SAUNet

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(1, 32, 32, 3).astype(np.float32))
    m = SAUNet(num_classes=4, edge_kernel="xla")
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    seg_full, edge_full = m.apply(v, x, train=False)
    taps = m.apply(v, x, False, method=lambda s, xx, t: s.encoder(xx, t))
    seg_dec, edge_dec = m.apply(v, taps[1:], x, False, method="decode")
    np.testing.assert_array_equal(np.asarray(seg_dec),
                                  np.asarray(seg_full))
    np.testing.assert_array_equal(np.asarray(edge_dec),
                                  np.asarray(edge_full))


def test_pick_band_rows():
    # block1 @224² input (112²) needs banding; deep small blocks don't
    b1 = pick_band_rows(112, 112, 64, 6)
    assert b1 is not None and 112 % b1 == 0 and b1 < 112
    assert pick_band_rows(28, 28, 256, 24) == 28
    assert pick_band_rows(14, 14, 512, 16) == 14


def test_pick_band_rows_alignment_contract():
    """Every banded pick must satisfy dense_block_fused's DMA alignment
    guards (band*W and the halo'd scratch extent both 8-aligned); when no
    divisor qualifies (e.g. 250² input -> 125² block1, all-odd divisors),
    return None instead of a band that would raise."""
    # 125²: divisors 1/5/25/125 all give odd band*W -> no banded config
    assert pick_band_rows(125, 125, 64, 6) is None
    for h, w, c0, n in [(112, 112, 64, 6), (126, 126, 64, 6),
                        (120, 90, 64, 6), (64, 33, 64, 6),
                        (112, 112, 128, 12)]:
        band = pick_band_rows(h, w, c0, n)
        if band is None or band == h:
            continue
        assert (band * w) % 8 == 0, (h, w, band)
        assert ((band + 2 * n) * w) % 8 == 0, (h, w, band)
        # must not raise:
        halo_ok = h % band == 0
        assert halo_ok


def test_fused_banded_rejects_misaligned_scratch():
    """band*W 8-aligned but (band+2*halo)*W not -> clean ValueError (the
    staging DMA copies the full halo'd extent)."""
    import pytest

    block, params, stats, x = _make_block(num_layers=2, c0=64, hw=16,
                                          seed=5)
    x15 = x[:, :, :15, :]  # W=15: band 8 -> 120 px ok, (8+4)*15=180 not
    with pytest.raises(ValueError, match="halo'd scratch"):
        dense_block_fused(x15, params, stats, num_layers=2, band_rows=8,
                          interpret=True)


def test_fused_encoder_xla_fallback_when_no_band(monkeypatch):
    """pick_band_rows -> None must fall back to the XLA dense block (not
    whole-map mode, the configuration already known not to fit)."""
    from saunet_tpu.models.densenet import DenseNetEncoder
    from saunet_tpu.models import fused_encoder as fe
    from saunet_tpu.ops.pallas import dense_block as db

    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.rand(1, 32, 32, 3).astype(np.float32))
    enc = DenseNetEncoder(dtype=jnp.bfloat16)
    v = enc.init(jax.random.PRNGKey(0), x, True)
    ref = enc.apply(v, x, False)

    monkeypatch.setattr(db, "pick_band_rows", lambda *a, **k: None)
    out = fe.encoder_apply_fused(v["params"], v["batch_stats"], x,
                                 interpret=True)
    for i, (o, r) in enumerate(zip(out, ref)):
        o = np.asarray(o, np.float32)
        r = np.asarray(r, np.float32)
        tol = 0.06 * max(np.abs(r).max(), 1e-3)
        np.testing.assert_allclose(o, r, atol=tol, err_msg=f"tap f{i+1}")


def test_fused_encoder_f32_dtype():
    """encoder_apply_fused(dtype=f32) must not dtype-mismatch at the
    transition convs (the kernel emits bf16; output is cast back)."""
    from saunet_tpu.models.densenet import DenseNetEncoder
    from saunet_tpu.models.fused_encoder import encoder_apply_fused

    rs = np.random.RandomState(6)
    x = jnp.asarray(rs.rand(1, 16, 16, 3).astype(np.float32))
    enc = DenseNetEncoder()
    v = enc.init(jax.random.PRNGKey(0), x, True)
    out = encoder_apply_fused(v["params"], v["batch_stats"], x,
                              dtype=jnp.float32, interpret=True)
    assert all(o.dtype == jnp.float32 for o in out)


def test_fused_encoder_dispatch_gate():
    """'auto' never engages the Pallas encoder on CPU (or for f32
    models); explicit True always does."""
    from saunet_tpu.models import SAUNet
    from saunet_tpu.train.state import _use_fused_encoder

    assert jax.default_backend() == "cpu"
    bf16 = SAUNet(num_classes=4, dtype=jnp.bfloat16)
    f32 = SAUNet(num_classes=4)
    assert _use_fused_encoder(bf16, "auto") is False  # cpu backend
    assert _use_fused_encoder(f32, True) is True
    assert not _use_fused_encoder(f32, "auto")
    assert not _use_fused_encoder(bf16, False)


def test_fused_whole_map_pixel_padding():
    """H*W not a multiple of 8 exercises the flat-pixel padding path
    (8-aligned DMA extents, masked pad rows, output slice)."""
    block, params, stats, x = _make_block(num_layers=2, c0=64, hw=6,
                                          seed=3)
    ref = block.apply({"params": params, "batch_stats": stats}, x, False)
    out = dense_block_fused(x, params, stats, num_layers=2,
                            interpret=True)
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=0.05 * np.abs(ref).max())
