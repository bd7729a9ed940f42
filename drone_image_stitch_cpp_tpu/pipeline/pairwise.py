"""Two-frame stitch: detect -> match -> RANSAC -> warp -> feather blend.

The minimum end-to-end slice (BASELINE.md config 1) and the analog of the
reference's 2-image path: computePairDiagnostics prefilter (SIFT -> knn2 ->
Lowe 0.75 -> findHomography RANSAC 3.0 -> inlier count, reference:
stitch_robust.cpp:76-142) gated by min_good_matches / min_inliers
(stitch_robust.cpp:233-243), then stitch.

Host code only orchestrates; detection/matching/RANSAC/warp/blend are jitted
device stages shared with the strip and global pipelines.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.tuning import StitchTuning
from ..ops import match as M
from ..ops import ransac as R
from ..ops.blend import border_feather_weight, feather_blend
from ..ops.crop import auto_crop_black_border
from ..ops.transform import (affine_to_h3, apply_homography_pts,
                             image_corners)
from ..ops.warp import warp_affine, warp_perspective
from ..runtime.logging import get_logger
from .registration import detect_features

_LOWE_RATIO = 0.75   # fixed pair-diagnostics ratio (stitch_robust.cpp:110)
_HOMOG_THRESH = 3.0  # findHomography reproj thresh (stitch_robust.cpp:135)


@dataclass
class PairDiagnostics:
    """Reference: PairDiagnostics struct (stitch_robust.cpp:23-30)."""

    kp_a: int
    kp_b: int
    good_matches: int
    inliers: int

    @property
    def inlier_ratio(self) -> float:
        return self.inliers / max(1, self.good_matches)


def compute_pair_diagnostics(img_a: np.ndarray, img_b: np.ndarray,
                             tuning: StitchTuning,
                             seed: int = 0):
    """Pair health check; returns (diag, model 3x3 or None, res, feats,
    scale).

    Mirrors computePairDiagnostics (stitch_robust.cpp:76-142): features,
    knn2 with fixed 0.75 ratio, RANSAC homography at 3 px. The features
    and work scale are returned so callers can refit other model classes
    without re-running detection (the dominant cost of a 2-frame job).
    """
    feats, scale = detect_features([img_a, img_b], tuning.sift_features,
                                   tuning.registration_resol_mpx)
    m = M.knn2_ratio(feats.desc[0], feats.valid[0], feats.desc[1],
                     feats.valid[1], _LOWE_RATIO)
    src, dst, good = M.gather_correspondences(feats.xy[0], feats.xy[1], m)
    res = R.find_homography(src, dst, good, jax.random.PRNGKey(seed),
                            thresh=_HOMOG_THRESH / scale)
    diag = PairDiagnostics(
        kp_a=int(feats.valid[0].sum()), kp_b=int(feats.valid[1].sum()),
        good_matches=int(m.good.sum()), inliers=int(res.n_inliers))
    model = np.asarray(res.model) if bool(res.ok) else None
    return diag, model, res, feats, scale


def pair_gates_pass(diag: PairDiagnostics, tuning: StitchTuning) -> bool:
    """Health gates (stitch_robust.cpp:233-243)."""
    return (diag.good_matches >= tuning.min_good_matches
            and diag.inliers >= tuning.min_inliers)


def stitch_pair(img_a: np.ndarray, img_b: np.ndarray,
                tuning: Optional[StitchTuning] = None,
                model_kind: str = "similarity",
                autocrop: bool = True, seed: int = 0) -> np.ndarray:
    """Stitch two frames into one panorama (feather blend).

    ``model_kind``: "similarity" (SCANS-mode affine family, the reference's
    default geometry) or "homography" (full perspective).
    """
    log = get_logger()
    tuning = tuning or StitchTuning()
    diag, _, res, feats, scale = compute_pair_diagnostics(
        img_a, img_b, tuning, seed)
    log.log("Pair", "diagnostics", kp_a=diag.kp_a, kp_b=diag.kp_b,
            good=diag.good_matches, inliers=diag.inliers)
    if not pair_gates_pass(diag, tuning):
        raise RuntimeError(
            f"pair gates failed: good={diag.good_matches} "
            f"inliers={diag.inliers} (need {tuning.min_good_matches}/"
            f"{tuning.min_inliers})")

    if model_kind != "homography":
        # re-fit the chosen model class on the SAME features (one detect
        # per pair; detection dominates the 2-frame config's cost)
        m = M.knn2_ratio(feats.desc[0], feats.valid[0], feats.desc[1],
                         feats.valid[1], _LOWE_RATIO)
        src, dst, good = M.gather_correspondences(feats.xy[0], feats.xy[1],
                                                  m)
        res = R.ransac(src, dst, good, jax.random.PRNGKey(seed), model_kind,
                       thresh=4.0 / scale)
        if not bool(res.ok):
            raise RuntimeError("model estimation failed")

    # model maps A -> B frame; we compose on a canvas containing both
    h_ab = jnp.asarray(res.model)  # A -> B
    h_ba = jnp.linalg.inv(h_ab)    # B -> A frame

    ha, wa = img_a.shape[:2]
    hb, wb = img_b.shape[:2]
    corners_b = apply_homography_pts(h_ba, image_corners(hb, wb))
    # integer origin keeps frame A pixel-aligned on the canvas
    x0 = float(np.floor(float(jnp.minimum(corners_b[:, 0].min(), 0.0))))
    y0 = float(np.floor(float(jnp.minimum(corners_b[:, 1].min(), 0.0))))
    x1 = float(jnp.maximum(corners_b[:, 0].max(), wa - 1.0))
    y1 = float(jnp.maximum(corners_b[:, 1].max(), ha - 1.0))
    out_w = int(np.ceil(x1 - x0)) + 1
    out_h = int(np.ceil(y1 - y0)) + 1
    shift = jnp.asarray([[1.0, 0.0, -x0], [0.0, 1.0, -y0], [0.0, 0.0, 1.0]])

    a32 = jnp.asarray(img_a.astype(np.float32))
    b32 = jnp.asarray(img_b.astype(np.float32))
    wa_map = border_feather_weight(ha, wa)
    wb_map = border_feather_weight(hb, wb)

    t_a = shift  # A -> canvas
    t_b = shift @ h_ba  # B -> canvas
    warped_a = warp_perspective(a32, t_a, out_h, out_w)
    warped_b = warp_perspective(b32, t_b, out_h, out_w)
    wwa = warp_perspective(wa_map, t_a, out_h, out_w)
    wwb = warp_perspective(wb_map, t_b, out_h, out_w)
    out, _ = feather_blend([warped_a, warped_b], [wwa, wwb])
    pano = np.asarray(out).astype(np.uint8)
    if autocrop:
        pano = auto_crop_black_border(pano)
    log.log("Pair", "stitched", h=pano.shape[0], w=pano.shape[1])
    return pano
