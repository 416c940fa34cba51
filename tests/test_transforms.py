"""On-device transform library + n-d spatial utilities
(SURVEY.md §2.2 full augmentation inventory)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saunet_tpu.data import transforms as T
from saunet_tpu.data import spatial as S


@pytest.fixture
def pair():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(32, 32).astype(np.float32))
    mask = jnp.asarray(rs.randint(0, 4, size=(32, 32)))
    return img, mask


def test_flips_deterministic_effect(pair):
    img, mask = pair
    t = T.random_horizontally_flip(p=1.0)
    im2, m2 = t(jax.random.PRNGKey(0), img, mask)
    np.testing.assert_array_equal(np.asarray(im2), np.asarray(img)[:, ::-1])
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(mask)[:, ::-1])
    t0 = T.random_vertically_flip(p=0.0)
    im3, _ = t0(jax.random.PRNGKey(0), img, mask)
    np.testing.assert_array_equal(np.asarray(im3), np.asarray(img))


def test_rotate_preserves_labels_and_shape(pair):
    img, mask = pair
    t = T.random_rotate(180.0)
    im2, m2 = t(jax.random.PRNGKey(3), img, mask)
    assert im2.shape == img.shape and m2.shape == mask.shape
    assert set(np.unique(np.asarray(m2))) <= {0, 1, 2, 3}


def test_crops_and_scales(pair):
    img, mask = pair
    for t, out_shape in [
        (T.center_crop(16), (16, 16)),
        (T.random_crop(16), (16, 16)),
        (T.free_scale((20, 24)), (20, 24)),
        (T.random_sized_crop(16), (16, 16)),
        (T.random_sized(16), (16, 16)),
        (T.scale_shorter_side(16, (16, 16)), (16, 16)),
    ]:
        im2, m2 = t(jax.random.PRNGKey(1), img, mask)
        assert im2.shape[:2] == out_shape
        assert m2.shape == out_shape


def test_center_crop_matches_slice(pair):
    img, mask = pair
    im2, m2 = T.center_crop(16)(jax.random.PRNGKey(0), img, mask)
    np.testing.assert_allclose(np.asarray(im2),
                               np.asarray(img)[8:24, 8:24], rtol=1e-6)


def test_random_erasing(pair):
    img, mask = pair
    im2, m2 = T.random_erasing(p=1.0, fill=0.0)(jax.random.PRNGKey(0),
                                                img, mask)
    # some pixels erased, mask untouched
    assert (np.asarray(im2) == 0).sum() > (np.asarray(img) == 0).sum()
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(mask))


def test_photometric(pair):
    img, mask = pair
    for t in [T.adjust_gamma(0.5), T.adjust_brightness(10),
              T.adjust_contrast(0.3)]:
        im2, m2 = t(jax.random.PRNGKey(2), img, mask)
        assert im2.shape == img.shape
        np.testing.assert_array_equal(np.asarray(m2), np.asarray(mask))
    # hue/saturation identity on single-channel
    im3, _ = T.adjust_hue(0.1)(jax.random.PRNGKey(0), img, mask)
    np.testing.assert_array_equal(np.asarray(im3), np.asarray(img))
    rgb = jnp.stack([img] * 3, -1)
    im4, _ = T.adjust_saturation(0.5)(jax.random.PRNGKey(1), rgb, mask)
    assert im4.shape == rgb.shape


def test_compose_chains(pair):
    img, mask = pair
    c = T.Compose([T.random_horizontally_flip(1.0),
                   T.center_crop(16)])
    im2, m2 = c(jax.random.PRNGKey(0), img, mask)
    assert im2.shape == (16, 16)
    np.testing.assert_allclose(
        np.asarray(im2), np.asarray(img)[8:24, 23:7:-1], rtol=1e-5)


# --- n-d spatial utilities ------------------------------------------------

def test_resize_segmentation_no_new_labels():
    seg = np.zeros((20, 20), np.uint8)
    seg[5:15, 5:15] = 2
    out = S.resize_segmentation(seg, (40, 40), order=1)
    assert out.shape == (40, 40)
    assert set(np.unique(out)) <= {0, 2}
    out0 = S.resize_segmentation(seg, (10, 10), order=0)
    assert set(np.unique(out0)) <= {0, 2}


def test_pad_nd_image_and_slicer():
    x = np.ones((3, 5))
    padded, slicer = S.pad_nd_image(x, new_shape=(8, 8), return_slicer=True)
    assert padded.shape == (8, 8)
    np.testing.assert_array_equal(padded[slicer], x)
    div = S.pad_nd_image(np.ones((5, 6)), shape_must_be_divisible_by=(4, 4))
    assert div.shape == (8, 8)


def test_nd_crops():
    x = np.arange(64).reshape(8, 8).astype(float)
    c = S.center_crop_nd(x, (4, 4))
    np.testing.assert_array_equal(c, x[2:6, 2:6])
    r = S.random_crop_nd(x, (4, 4), np.random.RandomState(0))
    assert r.shape == (4, 4)
    # channel-leading data
    x3 = np.stack([x, x])
    c3 = S.center_crop_nd(x3, (4, 4))
    assert c3.shape == (2, 4, 4)
    # pad path when smaller
    small = S.center_crop_nd(np.ones((2, 2)), (4, 4))
    assert small.shape == (4, 4) and small.sum() == 4


def test_rotation_matrices_orthonormal():
    r2 = S.rotation_matrix_2d(0.7)
    np.testing.assert_allclose(r2 @ r2.T, np.eye(2), atol=1e-12)
    r3 = S.rotation_matrix_3d(0.3, -0.5, 1.1)
    np.testing.assert_allclose(r3 @ r3.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(r3), 1.0, atol=1e-12)


def test_one_hot_and_bbox():
    seg = np.zeros((6, 6), np.uint8)
    seg[2:4, 3:5] = 1
    oh = S.one_hot(seg, classes=[0, 1])
    assert oh.shape == (2, 6, 6)
    np.testing.assert_array_equal(oh.sum(0), np.ones((6, 6)))
    bb = S.bounding_box_from_mask(seg == 1)
    assert bb == ((2, 4), (3, 5))
    assert S.bounding_box_from_mask(np.zeros((3, 3))) == ((0, 0), (0, 0))


def test_step_timer():
    from saunet_tpu.utils.profiling import StepTimer
    t = StepTimer(skip=1)
    for _ in range(3):
        with t:
            pass
    s = t.summary(items_per_step=4)
    assert s["steps"] == 2 and s["items_per_sec"] > 0
