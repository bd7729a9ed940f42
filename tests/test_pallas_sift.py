"""Fused Pallas SIFT kernel: interpret-mode correctness vs the vmapped
reference path (ops/features.py _orientation_one/_descriptor_one).

The kernel is selected automatically whenever the backend is TPU
(features.py detect_and_describe_batched), so CI must execute it; these
tests run it in interpret mode on the CPU backend. Documented numerics
delta: the kernel's polynomial atan2 (|err| < 1.2e-4 rad) and the
float-order of reductions — both far below the 10-deg orientation bin and
the descriptor hat widths, so descriptors should agree to a small L2
distance on the 0..255 (512-scaled) descriptor range.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drone_image_stitch_cpp_tpu.ops import features as F
from drone_image_stitch_cpp_tpu.ops import pallas_sift as PS
from drone_image_stitch_cpp_tpu.ops.color import bgr_to_gray


def _test_stack(h=128, w=384, n_layers=3, seed=0):
    """Octave-0 Gaussian stack of a random textured image (aligned dims)."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    octs = F.build_scale_space(jnp.asarray(img), n_layers, 1,
                               upsample=False)
    return octs[0][0]  # (n_layers+3, h, w)


def _ref_ori_desc(gauss, li, yf, xf, sig, n_layers=3):
    """The vmapped per-keypoint reference path from detect_and_describe."""
    sig_max = 1.6 * 2.0 ** ((n_layers + 0.5) / n_layers)
    patch_r = int(math.ceil(4.5 * sig_max))
    ang = jax.vmap(
        lambda l_, y_, x_, s_: F._orientation_one(gauss, l_, y_, x_, s_,
                                                  patch_r))(li, yf, xf, sig)
    desc = jax.vmap(
        lambda l_, y_, x_, s_, a_: F._descriptor_one(gauss, l_, y_, x_, s_,
                                                     a_))(li, yf, xf, sig,
                                                          ang)
    return np.asarray(ang), np.asarray(desc)


def _ang_diff(a, b):
    d = np.abs(np.mod(a - b + np.pi, 2 * np.pi) - np.pi)
    return d


def test_kernel_matches_reference_interior_and_edge():
    gauss = _test_stack()
    h, w = gauss.shape[1], gauss.shape[2]
    # interior keypoints at several scales + border keypoints on every side
    pts = [(60.0, 190.0, 1.6), (55.3, 122.7, 2.1), (70.9, 301.2, 3.2),
           (64.0, 64.0, 1.8), (90.0, 250.0, 2.6),
           (6.0, 200.0, 1.6), (121.0, 150.0, 1.6),   # top / bottom edges
           (60.0, 5.5, 1.6), (66.0, 377.0, 1.6)]     # left / right edges
    yf = jnp.asarray([p[0] for p in pts], jnp.float32)
    xf = jnp.asarray([p[1] for p in pts], jnp.float32)
    sig = jnp.asarray([p[2] for p in pts], jnp.float32)
    li = jnp.full((len(pts),), 2, jnp.int32)

    ang_k, desc_k = PS.orientation_descriptor(gauss, li, yf, xf, sig,
                                              interpret=True)
    ang_k, desc_k = np.asarray(ang_k), np.asarray(desc_k)
    ang_r, desc_r = _ref_ori_desc(gauss, li, yf, xf, sig)

    assert np.isfinite(desc_k).all() and np.isfinite(ang_k).all()
    dang = _ang_diff(ang_k, ang_r)
    l2 = np.linalg.norm(desc_k - desc_r, axis=-1)
    # allow one orientation-peak flip among the border cases; everything
    # else must agree tightly (descriptor scale is 512, norm ~512)
    close = (dang < 0.02) & (l2 < 20.0)
    assert close.sum() >= len(pts) - 1, (dang.tolist(),
                                         np.round(l2, 1).tolist())
    # interior keypoints must ALL agree
    assert close[:5].all(), (dang[:5].tolist(), l2[:5].tolist())


def test_batched_detect_pallas_matches_vmapped(ortho):
    """End-to-end detect_and_describe_batched: the pallas(interpret) path
    against the pure-XLA vmapped path on the same frames — the candidate/
    selection phases are shared, so keypoints line up 1:1 and only the
    fused orientation+descriptor stage differs (multi-octave, flat-stack
    indexing, tiny top octaves included)."""
    gray = np.asarray(bgr_to_gray(jnp.asarray(ortho[:128, :256])))
    grays = jnp.asarray(gray[None])
    k = 96
    f_ref = F.detect_and_describe_batched(grays, k, use_pallas=False)
    f_pal = F.detect_and_describe_batched(grays, k, use_pallas=True,
                                          interpret=True)

    v_ref = np.asarray(f_ref.valid[0])
    v_pal = np.asarray(f_pal.valid[0])
    assert (v_ref == v_pal).all()
    assert np.allclose(np.asarray(f_ref.xy[0])[v_ref],
                       np.asarray(f_pal.xy[0])[v_ref], atol=1e-3)

    dang = _ang_diff(np.asarray(f_ref.angle[0])[v_ref],
                     np.asarray(f_pal.angle[0])[v_ref])
    l2 = np.linalg.norm(np.asarray(f_ref.desc[0])[v_ref]
                        - np.asarray(f_pal.desc[0])[v_ref], axis=-1)
    # orientation must agree everywhere (shared histogram semantics)
    assert (dang < 0.02).all(), np.sort(dang)[-5:]
    # descriptors: the vmapped path truncates the support patch to the
    # octave's min dim (features.py _descriptor_one), so large-sigma
    # keypoints in tiny octaves legitimately diverge; every small-sigma
    # keypoint must be numerically identical up to the atan2 delta
    sig = np.asarray(f_ref.sigma[0])[v_ref]
    small = sig < 6.0
    assert small.sum() > 30, small.sum()
    assert (l2[small] < 25.0).all(), np.sort(l2[small])[-5:]
    assert np.median(l2[small]) < 5.0, np.median(l2[small])
