"""Data layer tests: NIfTI codec roundtrip, crop/uncrop inverses, k-fold
semantics, edge ground truth vs the reference's scipy EDT formula, on-device
augmentation invariants, and a synthetic-dataset end-to-end load
(the reference's smoke-test pattern, SURVEY.md §4)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saunet_tpu.data import (
    ACDCDataset, edge_ground_truth, kfold_split, make_augment_fn,
    normalize_for_eval, pad_center_crop, resample_to_orig, undo_crop,
)
from saunet_tpu.data import nifti
from saunet_tpu.data.acdc import Volume


def test_nifti_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    for dtype in (np.float32, np.int16, np.uint8):
        vol = (rs.rand(7, 9, 4) * 100).astype(dtype)
        for ext in (".nii", ".nii.gz"):
            p = str(tmp_path / f"t{np.dtype(dtype).name}{ext}")
            nifti.save(vol, p, pixdim=(1.37, 1.37, 10.0))
            img = nifti.load(p)
            np.testing.assert_array_equal(img.data, vol)
            np.testing.assert_allclose(img.pixdim[1:4], [1.37, 1.37, 10.0],
                                       rtol=1e-6)


def test_nifti_scl_slope(tmp_path):
    # hand-build a header with slope/intercept
    import struct
    vol = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    p = str(tmp_path / "scaled.nii")
    nifti.save(vol, p)
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<f", raw, 112, 2.0)   # scl_slope
    struct.pack_into("<f", raw, 116, 1.0)   # scl_inter
    open(p, "wb").write(bytes(raw))
    img = nifti.load(p)
    np.testing.assert_allclose(img.data, vol * 2.0 + 1.0)


@pytest.mark.parametrize("shape", [(300, 280), (200, 180), (256, 300)])
def test_pad_center_crop_and_undo(shape):
    rs = np.random.RandomState(1)
    img = rs.randint(0, 4, size=shape).astype(np.uint8)
    cropped = pad_center_crop(img, 256, round_up=True)
    assert cropped.shape == (256, 256)
    restored = undo_crop(cropped, shape)
    assert restored.shape == shape
    # region present in both must roundtrip exactly
    h, w = shape
    ys = slice(max((h - 256) // 2, 0) + 2, min(h, max((h - 256) // 2, 0) + 250))
    xs = slice(max((w - 256) // 2, 0) + 2, min(w, max((w - 256) // 2, 0) + 250))
    np.testing.assert_array_equal(restored[ys, xs], img[ys, xs])


def test_kfold_split():
    series = [(i, 1) for i in range(200)]
    tr = kfold_split(series, "train", k=5, k_split=1)
    va = kfold_split(series, "val", k=5, k_split=1)
    assert len(tr) == 160 and len(va) == 40
    assert {s[0] for s in va} == set(range(40))
    va3 = kfold_split(series, "val", k=5, k_split=3)
    assert {s[0] for s in va3} == set(range(80, 120))
    assert not set(map(tuple, tr)) & set(map(tuple, va))


def test_edge_ground_truth_matches_scipy_edt():
    """Disk-2 morphology == the reference EDT rule
    (ac17_dataloader.py:236-252)."""
    from scipy.ndimage import distance_transform_edt

    rs = np.random.RandomState(3)
    label = np.zeros((32, 32), np.int32)
    label[8:20, 10:22] = 1
    label[12:16, 12:18] = 2
    label[24:30, 2:8] = 3
    label[0:4, 28:32] = 1  # touches the border

    ours = np.asarray(edge_ground_truth(jnp.asarray(label[None]),
                                        num_classes=4))[0, :, :, 0]

    # reference formula
    edgemap = np.zeros((32, 32))
    for c in range(1, 4):
        m = (label == c).astype(np.float64)
        mp = np.pad(m, 1, mode="constant")
        dist = distance_transform_edt(mp) + distance_transform_edt(1 - mp)
        dist = dist[1:-1, 1:-1]
        dist[dist > 2] = 0
        edgemap += dist
    ref = (edgemap > 0).astype(np.float32)

    np.testing.assert_array_equal(ours, ref)


def test_augment_shapes_and_stats():
    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.rand(2, 64, 64).astype(np.float32) * 200),
        "label": jnp.asarray(rs.randint(0, 4, size=(2, 64, 64))),
    }
    aug = make_augment_fn(num_classes=4)
    out = jax.jit(aug)(jax.random.PRNGKey(0), batch)
    assert out["image"].shape == (2, 64, 64, 3)
    assert out["label"].shape == (2, 64, 64)
    assert out["edge"].shape == (2, 64, 64, 1)
    img = np.asarray(out["image"])
    # z-scored per-sample
    np.testing.assert_allclose(img.mean(axis=(1, 2, 3)), 0, atol=1e-4)
    np.testing.assert_allclose(img.std(axis=(1, 2, 3)), 1, atol=1e-2)
    # labels stay in range, channels identical
    assert set(np.unique(out["label"])) <= {0, 1, 2, 3}
    np.testing.assert_array_equal(img[..., 0], img[..., 1])
    # deterministic under the same key
    out2 = jax.jit(aug)(jax.random.PRNGKey(0), batch)
    np.testing.assert_array_equal(np.asarray(out2["image"]), img)
    # different under a different key
    out3 = jax.jit(aug)(jax.random.PRNGKey(1), batch)
    assert not np.array_equal(np.asarray(out3["image"]), img)


def test_lowres_elastic_field_statistics():
    """The stride-4 elastic field (draw + blur at 1/4 res, bilinear
    upsample, 1/s amplitude rescale) matches the full-resolution
    reference pipeline's per-pixel std and smoothness."""
    from saunet_tpu.data.augment import (
        ELASTIC_ALPHA,
        ELASTIC_SIGMA,
        _gaussian_filter2d,
    )

    h = w = 128
    s = 4
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)

    def full_res(k):
        f = jax.random.uniform(k, (1, h, w)) * 2 - 1
        return _gaussian_filter2d(f, ELASTIC_SIGMA)[0] * ELASTIC_ALPHA

    def low_res(k):
        f = jax.random.uniform(k, (1, h // s, w // s)) * 2 - 1
        g = _gaussian_filter2d(f, ELASTIC_SIGMA / s)[0]
        return jax.image.resize(g, (h, w), "linear") * (ELASTIC_ALPHA / s)

    fr = np.asarray(jax.vmap(full_res)(ks))
    lr = np.asarray(jax.vmap(low_res)(ks))
    # interior only: the two pipelines handle borders differently
    c = slice(32, 96)
    std_fr = fr[:, c, c].std()
    std_lr = lr[:, c, c].std()
    assert abs(std_lr - std_fr) / std_fr < 0.15, (std_fr, std_lr)
    # same smoothness: neighbour-difference std scales with 1/correlation
    d_fr = np.diff(fr[:, c, c], axis=-1).std()
    d_lr = np.diff(lr[:, c, c], axis=-1).std()
    assert abs(d_lr - d_fr) / d_fr < 0.25, (d_fr, d_lr)


def test_packed_warp_matches_reference_samplers():
    """The single-gather packed warp == the independent bilinear/nearest
    samplers (bf16 taps give <= 2^-8 relative error on the image; labels
    must be bit-exact), including far-out-of-bounds coordinates."""
    from saunet_tpu.data.augment import (
        _sample_bilinear_batched,
        _sample_nearest_batched,
        _warp_image_label_packed,
    )

    rs = np.random.RandomState(7)
    n, h, w = 2, 33, 37
    imgs = jnp.asarray(rs.randn(n, h, w).astype(np.float32) * 3)
    labels = jnp.asarray(rs.randint(0, 4, size=(n, h, w)).astype(np.int32))
    sy = jnp.asarray((rs.rand(n, h, w) * (h + 10) - 5).astype(np.float32))
    sx = jnp.asarray((rs.rand(n, h, w) * (w + 10) - 5).astype(np.float32))

    img_ref = np.asarray(_sample_bilinear_batched(imgs, sy, sx))
    lab_ref = np.asarray(_sample_nearest_batched(labels, sy, sx))
    img_p, lab_p = jax.jit(_warp_image_label_packed,
                           static_argnums=4)(imgs, labels, sy, sx, 4)

    scale = np.abs(np.asarray(imgs)).max()
    np.testing.assert_allclose(np.asarray(img_p), img_ref,
                               atol=2 ** -7 * scale)
    np.testing.assert_array_equal(np.asarray(lab_p), lab_ref)


def test_normalize_for_eval():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(3, 16, 16).astype(np.float32) * 50)
    out = np.asarray(normalize_for_eval(img))
    assert out.shape == (3, 16, 16, 3)
    np.testing.assert_allclose(out.mean(axis=(1, 2, 3)), 0, atol=1e-5)


def _make_synthetic_acdc(root, n_patients=3, frames=(1, 12)):
    rs = np.random.RandomState(0)
    for p in range(1, n_patients + 1):
        pdir = os.path.join(root, "training", f"patient{p:03d}")
        os.makedirs(pdir, exist_ok=True)
        for fr in frames:
            h, w, z = 40 + p, 44, 3
            img = (rs.rand(h, w, z) * 300).astype(np.float32)
            seg = rs.randint(0, 4, size=(h, w, z)).astype(np.uint8)
            base = os.path.join(pdir, f"patient{p:03d}_frame{fr:02d}")
            nifti.save(img, base + ".nii.gz", pixdim=(1.5, 1.5, 10))
            nifti.save(seg, base + "_gt.nii.gz", pixdim=(1.5, 1.5, 10))


def test_acdc_dataset_end_to_end(tmp_path):
    root = str(tmp_path)
    _make_synthetic_acdc(root)
    ds = ACDCDataset(root, split="train", k=3, k_split=1, target_size=64)
    # 3 patients x 2 frames = 6; k=3 -> 2 in val fold, 4 in train
    assert len(ds) == 4
    imgs, labs, names = ds.load_slices()
    assert imgs.shape == (4 * 3, 64, 64)
    assert labs.shape == imgs.shape
    assert imgs.dtype == np.float32
    assert len(names) == len(imgs)
    # rescale happened (1.5mm -> 1.25mm upscales)
    v = ds.load_volume(0)
    assert v.post_scale_shape[0] > v.orig_shape[0]


def test_resample_to_orig_roundtrip():
    rs = np.random.RandomState(5)
    vol = Volume(name="t", image=np.zeros((64, 64, 3), np.float32),
                 label=None, orig_shape=(50, 52, 3),
                 post_scale_shape=(60, 62, 3), spacing=1.3)
    pred = rs.randint(0, 4, size=(64, 64, 3)).astype(np.uint8)
    out = resample_to_orig(pred, vol)
    assert out.shape == (50, 52, 3)
    assert set(np.unique(out)) <= set(np.unique(pred))
