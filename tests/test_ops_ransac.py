"""RANSAC bank tests: known models + outliers + invalid-row padding."""

import jax
import numpy as np
import jax.numpy as jnp

from drone_image_stitch_cpp_tpu.ops import ransac
from drone_image_stitch_cpp_tpu.ops.transform import apply_homography_pts


def _make_problem(kind, n=256, n_out=80, n_invalid=32, seed=3):
    r = np.random.default_rng(seed)
    src = r.uniform(0, 2000, (n, 2)).astype(np.float32)
    if kind == "similarity":
        th = np.radians(12.0)
        s = 1.05
        model = np.asarray([
            [s * np.cos(th), -s * np.sin(th), 55.0],
            [s * np.sin(th), s * np.cos(th), -33.0],
            [0, 0, 1]], np.float32)
    elif kind == "affine":
        model = np.asarray([[1.02, 0.08, 40.0], [-0.05, 0.97, 21.0],
                            [0, 0, 1]], np.float32)
    else:
        model = np.asarray([[1.01, 0.03, 25.0], [0.02, 0.99, -12.0],
                            [1e-5, -8e-6, 1.0]], np.float32)
    ones = np.ones((n, 1), np.float32)
    ph = np.concatenate([src, ones], -1) @ model.T
    dst = ph[:, :2] / ph[:, 2:]
    dst += r.normal(0, 0.4, dst.shape).astype(np.float32)
    # outliers
    out_idx = r.choice(n, n_out, replace=False)
    dst[out_idx] += r.uniform(60, 400, (n_out, 2)).astype(np.float32)
    good = np.ones(n, bool)
    good[-n_invalid:] = False  # fixed-K padding rows
    dst[-n_invalid:] = 0.0
    return src, dst, good, model


def _check(kind, thresh):
    src, dst, good, model = _make_problem(kind)
    res = ransac.ransac(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(good),
                        jax.random.PRNGKey(0), kind, thresh=thresh,
                        n_hyp=512)
    assert bool(res.ok)
    # reprojection error of the recovered model on true inliers
    true_in = np.ones(len(src), bool)
    true_in[np.abs(dst - np.asarray(
        apply_homography_pts(jnp.asarray(model), jnp.asarray(src)))).max(
            -1) > 5] = False
    true_in &= good
    proj = np.asarray(apply_homography_pts(res.model, jnp.asarray(src)))
    err = np.linalg.norm(proj[true_in] - dst[true_in], axis=-1)
    assert np.median(err) < 1.0, (kind, np.median(err))
    assert int(res.n_inliers) > 0.8 * true_in.sum()


def test_similarity_bank():
    _check("similarity", 4.0)


def test_affine_bank():
    _check("affine", 4.0)


def test_homography_bank():
    _check("homography", 3.0)


def test_ransac_rejects_garbage():
    r = np.random.default_rng(0)
    src = r.uniform(0, 1000, (128, 2)).astype(np.float32)
    dst = r.uniform(0, 1000, (128, 2)).astype(np.float32)
    good = np.ones(128, bool)
    res = ransac.ransac(jnp.asarray(src), jnp.asarray(dst),
                        jnp.asarray(good), jax.random.PRNGKey(1),
                        "similarity", thresh=4.0, n_hyp=256, min_inliers=20)
    assert not bool(res.ok)


def test_ransac_too_few_points():
    src = jnp.zeros((16, 2), jnp.float32)
    dst = jnp.zeros((16, 2), jnp.float32)
    good = jnp.zeros(16, bool)
    res = ransac.ransac(src, dst, good, jax.random.PRNGKey(0), "affine")
    assert not bool(res.ok)


def test_ransac_jits_and_vmaps():
    src, dst, good, _ = _make_problem("affine", n=128, n_out=30, n_invalid=8)
    fn = jax.jit(lambda s, d, g, k: ransac.ransac(s, d, g, k, "affine"))
    res = fn(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(good),
             jax.random.PRNGKey(0))
    assert bool(res.ok)
    # batched over pairs
    bs = jnp.stack([jnp.asarray(src)] * 3)
    bd = jnp.stack([jnp.asarray(dst)] * 3)
    bg = jnp.stack([jnp.asarray(good)] * 3)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    vres = jax.vmap(lambda s, d, g, k: ransac.ransac(s, d, g, k, "affine"))(
        bs, bd, bg, keys)
    assert bool(vres.ok.all())


def test_bundle_adjust_rejects_poisoned_edge():
    """A falsely-verified pair model (coherent wrong offset, plausible
    inlier count) must not drag the solution: the IRLS edge weights cut
    it by ~(rms/tau)^-2 (periodic texture locks RANSAC onto such offsets
    in real sorties)."""
    import numpy as np
    import jax.numpy as jnp

    from drone_image_stitch_cpp_tpu.pipeline.bundle import (
        bundle_adjust_similarity_jit, params_from_affine)

    r = np.random.default_rng(0)
    n, k = 6, 120
    pairs = [(i, i + 1) for i in range(5)] + [(0, 4)]
    pts_a, pts_b, w = [], [], []
    for (i, j) in pairs[:5]:
        p_i = np.stack([r.uniform(1000, 3800, k), r.uniform(0, 2000, k)],
                       -1)
        pts_a.append(p_i)
        pts_b.append(p_i - [1000.0, 0.0])
        w.append(np.ones(k))
    # poisoned edge (0, 4): claims tx 1500 instead of the true 4000
    p_i = np.stack([r.uniform(2000, 3800, k), r.uniform(0, 2000, k)], -1)
    pts_a.append(p_i)
    pts_b.append(p_i - [1500.0, 0.0])
    w.append(np.ones(k))

    init = np.zeros((n, 2, 3), np.float32)
    for i in range(n):
        init[i] = [[1, 0, 1000.0 * i], [0, 1, 0]]
    out = np.asarray(bundle_adjust_similarity_jit(
        jnp.asarray(np.asarray(pairs, np.int32)),
        jnp.asarray(np.stack(pts_a), jnp.float32),
        jnp.asarray(np.stack(pts_b), jnp.float32),
        jnp.asarray(np.stack(w), jnp.float32),
        params_from_affine(jnp.asarray(init))))
    tx = out[:, 0, 2]
    assert np.abs(tx - 1000.0 * np.arange(6)).max() < 5.0, tx
