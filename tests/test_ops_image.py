"""Golden tests for color / resize / gaussian / warp ops vs OpenCV."""

import cv2
import numpy as np
import jax.numpy as jnp

from drone_image_stitch_cpp_tpu.ops import color, gaussian, resize, warp
from drone_image_stitch_cpp_tpu.ops import transform as tf


def test_bgr_to_gray_matches_cv(ortho):
    ours = np.asarray(color.bgr_to_gray(jnp.asarray(ortho)))
    ref = cv2.cvtColor(ortho.astype(np.uint8), cv2.COLOR_BGR2GRAY)
    ours_u8 = np.asarray(
        color.bgr_to_gray(jnp.asarray(ortho.astype(np.uint8).astype(
            np.float32))))
    assert np.abs(ours_u8 - ref.astype(np.float32)).max() <= 1.0
    assert ours.shape == ortho.shape[:2]


def test_resize_area_integer_factor(ortho):
    small = np.asarray(resize.resize_area(jnp.asarray(ortho), 384, 512))
    ref = cv2.resize(ortho, (512, 384), interpolation=cv2.INTER_AREA)
    assert np.abs(small - ref).max() < 1e-2


def test_gaussian_blur_matches_cv(ortho):
    g = ortho[..., 0]
    sigma = 1.6
    ours = np.asarray(gaussian.gaussian_blur(jnp.asarray(g), sigma))
    r = max(1, int(round(4.0 * sigma)))
    ref = cv2.GaussianBlur(g, (2 * r + 1, 2 * r + 1), sigma,
                           borderType=cv2.BORDER_REFLECT_101)
    assert np.abs(ours - ref).max() < 1e-2


def test_pyr_down_up_roundtrip(ortho):
    x = jnp.asarray(ortho[:256, :256])
    d = gaussian.pyr_down(x)
    assert d.shape == (128, 128, 3)
    u = gaussian.pyr_up(d, 256, 256)
    assert u.shape == (256, 256, 3)
    # low-frequency content survives the round trip
    assert np.abs(np.asarray(u) - np.asarray(
        gaussian.gaussian_blur(x, 2.0))).mean() < 12.0


def test_pyr_down_matches_cv(ortho):
    x = ortho[:256, :256, 0]
    ours = np.asarray(gaussian.pyr_down(jnp.asarray(x)))
    ref = cv2.pyrDown(x)
    assert ours.shape == ref.shape
    # interior matches exactly (border handling differs slightly)
    assert np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2]).max() < 1e-2


def test_laplacian_collapse_identity(ortho):
    x = jnp.asarray(ortho[:128, :128])
    pyr = gaussian.laplacian_pyramid(x, 4)
    rec = gaussian.collapse_laplacian(pyr)
    assert np.abs(np.asarray(rec) - np.asarray(x)).max() < 1e-2


def test_warp_affine_matches_cv(ortho):
    a = np.asarray([[0.98, 0.05, 12.3], [-0.04, 1.01, -7.7]], np.float32)
    ours = np.asarray(warp.warp_affine(jnp.asarray(ortho), jnp.asarray(a),
                                       700, 900))
    ref = cv2.warpAffine(ortho, a, (900, 700), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT)
    # mask out the 1-px frontier where border handling differs
    diff = np.abs(ours - ref)
    assert np.quantile(diff, 0.999) < 1.0
    assert diff.mean() < 0.1


def test_warp_perspective_matches_cv(ortho):
    h = np.asarray([[1.0, 0.02, 5.0], [0.01, 0.99, -3.0],
                    [1e-5, -2e-5, 1.0]], np.float32)
    ours = np.asarray(warp.warp_perspective(jnp.asarray(ortho),
                                            jnp.asarray(h), 768, 1024))
    ref = cv2.warpPerspective(ortho, h, (1024, 768), flags=cv2.INTER_LINEAR)
    diff = np.abs(ours - ref)
    assert np.quantile(diff, 0.999) < 1.0


def test_warp_content_mask_footprint(ortho):
    mask = np.ones(ortho.shape[:2], np.float32)
    mask[:, :50] = 0.0  # black wedge on the left
    a = jnp.asarray([[1.0, 0.0, 10.0], [0.0, 1.0, 5.0]])
    wm = np.asarray(warp.warp_content_mask(jnp.asarray(mask), a, 800, 1100))
    assert wm[400, 500]           # interior content survives
    assert not wm[400, 30]        # shifted-out region excluded
    assert not wm[2, 2]           # wedge region excluded


def test_transform_roundtrip():
    a = jnp.asarray([[1.2, 0.1, 5.0], [-0.1, 0.9, 3.0]])
    inv = tf.invert_affine(a)
    comp = tf.compose_affine(a, inv)
    assert np.allclose(np.asarray(comp), np.asarray(tf.identity_affine()),
                       atol=1e-5)


def test_similarity_decompose():
    m = tf.make_similarity(3.0, -2.0, 1.1, 20.0)
    tx, ty, s, r = tf.similarity_params(m)
    assert np.allclose([tx, ty, s, r], [3.0, -2.0, 1.1, 20.0], atol=1e-4)


def test_transformed_bbox():
    a = jnp.asarray([[1.0, 0.0, 100.0], [0.0, 1.0, -50.0]])
    x0, y0, x1, y1 = tf.transformed_bbox(a, 480, 640)
    assert np.allclose([x0, y0, x1, y1], [100.0, -50.0, 739.0, 429.0])
