"""Feature detector/descriptor + matcher tests on synthetic imagery.

The acceptance metric is end-to-end: features from two views related by a
known transform must match and feed RANSAC to recover that transform within
sub-pixel tolerance (the mosaic-RMSE-level parity SURVEY.md §7 calls for —
not per-keypoint equality with OpenCV).
"""

import cv2
import jax
import numpy as np
import jax.numpy as jnp

from drone_image_stitch_cpp_tpu.ops import features, match, ransac
from drone_image_stitch_cpp_tpu.ops.color import bgr_to_gray

K = 512


def _detect(gray_np):
    return features.detect_and_describe(jnp.asarray(gray_np), K)


def test_detect_finds_keypoints(ortho):
    gray = np.asarray(bgr_to_gray(jnp.asarray(ortho[:256, :320])))
    f = _detect(gray)
    n = int(f.valid.sum())
    assert n > 100, n
    xy = np.asarray(f.xy)[np.asarray(f.valid)]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 320
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 256
    assert np.isfinite(np.asarray(f.desc)).all()


def test_keypoints_overlap_with_cv_sift(ortho):
    gray = np.asarray(bgr_to_gray(jnp.asarray(ortho[:256, :320])))
    f = _detect(gray)
    ours = np.asarray(f.xy)[np.asarray(f.valid)]
    sift = cv2.SIFT_create(nfeatures=K)
    kps = sift.detect(gray.astype(np.uint8), None)
    ref = np.asarray([k.pt for k in kps], np.float32)
    # at least half of cv2's keypoints have one of ours within 2 px
    d = np.linalg.norm(ref[:, None, :] - ours[None, :, :], axis=-1)
    frac = (d.min(axis=1) < 2.0).mean()
    assert frac > 0.5, frac


def _affine_warp_np(img, a23, shape):
    return cv2.warpAffine(img, a23, (shape[1], shape[0]),
                          flags=cv2.INTER_LINEAR)


def _recover_similarity(img_a, img_b, true_pts_a, true_pts_b):
    fa = _detect(img_a)
    fb = _detect(img_b)
    m = match.knn2_ratio(fa.desc, fa.valid, fb.desc, fb.valid, 0.8)
    src, dst, good = match.gather_correspondences(fa.xy, fb.xy, m)
    assert int(m.good.sum()) > 30, int(m.good.sum())
    res = ransac.ransac(src, dst, good, jax.random.PRNGKey(0), "similarity",
                        thresh=4.0, n_hyp=512)
    assert bool(res.ok)
    proj = np.asarray(jnp.concatenate(
        [true_pts_a, jnp.ones((len(true_pts_a), 1))], -1) @ res.model.T)
    proj = proj[:, :2] / proj[:, 2:]
    return np.linalg.norm(proj - true_pts_b, axis=-1)


def test_match_and_recover_translation(ortho):
    gray = np.asarray(bgr_to_gray(jnp.asarray(ortho)))
    a = gray[100:356, 100:420]
    b = gray[140:396, 160:480]  # shift (+60, +40) in (x, y)
    pts_a = np.asarray([[50.0, 50.0], [250.0, 200.0], [150.0, 100.0]],
                       np.float32)
    pts_b = pts_a - np.asarray([[60.0, 40.0]], np.float32)
    err = _recover_similarity(a, b, jnp.asarray(pts_a), pts_b)
    assert err.max() < 0.5, err


def test_match_and_recover_rot_scale(ortho):
    gray = np.asarray(bgr_to_gray(jnp.asarray(ortho)))
    a = gray[100:356, 100:420]
    ang, scale = 15.0, 0.95
    m = cv2.getRotationMatrix2D((160.0, 128.0), ang, scale)
    b = _affine_warp_np(a, m, a.shape)
    pts_a = np.asarray([[120.0, 120.0], [200.0, 150.0], [100.0, 80.0]],
                       np.float32)
    ph = np.concatenate([pts_a, np.ones((3, 1), np.float32)], -1)
    pts_b = ph @ m.T.astype(np.float32)
    err = _recover_similarity(a, b, jnp.asarray(pts_a), pts_b)
    assert err.max() < 1.5, err


def test_adaptive_ratio_values():
    assert np.isclose(float(match.adaptive_ratio(0.35)), 0.80)
    assert np.isclose(float(match.adaptive_ratio(0.48)), 0.92)
    assert np.isclose(float(match.adaptive_ratio(0.05)), 0.65)


def test_cross_check_mutual():
    da = jnp.asarray(np.eye(4, 128, dtype=np.float32) * 100)
    db = jnp.asarray(np.eye(4, 128, dtype=np.float32)[::-1] * 100)
    va = jnp.ones(4, bool)
    mab = match.knn2_ratio(da, va, db, va, 0.9)
    mba = match.knn2_ratio(db, va, da, va, 0.9)
    cc = match.cross_check(mab, mba)
    assert np.asarray(mab.idx).tolist() == [3, 2, 1, 0]
    assert bool(cc.all())


def test_pair_confidence():
    assert np.isclose(float(match.pair_confidence(16, 40)), 16 / (8 + 12.0))


def test_mirror_features_involution(ortho):
    """mirror(mirror(f)) == f exactly (pure permutation + coordinate map)."""
    gray = np.asarray(bgr_to_gray(jnp.asarray(ortho[:256, :320])))
    f = _detect(gray)
    f2 = features.mirror_features(features.mirror_features(f, 320), 320)
    assert np.allclose(np.asarray(f2.desc), np.asarray(f.desc))
    assert np.allclose(np.asarray(f2.xy), np.asarray(f.xy), atol=1e-4)
    assert np.allclose(np.mod(np.asarray(f2.angle), 2 * np.pi),
                       np.mod(np.asarray(f.angle), 2 * np.pi), atol=1e-5)


def test_mirror_features_matches_flip_detect(ortho):
    """Mirrored features must match features detected on the flipped image
    at (nearly) identical positions with small descriptor distances —
    validates the closed-form flip transport used by the global stage's
    reversed-strip hypothesis (reference: stitch_global.cpp:401-421)."""
    gray = np.asarray(bgr_to_gray(jnp.asarray(ortho[:256, :320])))
    f = _detect(gray)
    fm = features.mirror_features(f, gray.shape[1])
    ff = _detect(np.ascontiguousarray(gray[:, ::-1]))
    m = match.knn2_ratio(fm.desc, fm.valid, ff.desc, ff.valid, 0.8)
    src, dst, good = match.gather_correspondences(fm.xy, ff.xy, m)
    n_good = int(np.asarray(m.good).sum())
    assert n_good > 100, n_good
    g = np.asarray(good)
    d = np.linalg.norm(np.asarray(src)[g] - np.asarray(dst)[g], axis=-1)
    # matches land on the same physical keypoints (identity mapping)
    assert float(np.median(d)) < 1.0, float(np.median(d))
    # and descriptors are near-identical (distances tiny vs the 512 scale)
    assert float(np.median(np.asarray(m.dist)[g])) < 60.0
