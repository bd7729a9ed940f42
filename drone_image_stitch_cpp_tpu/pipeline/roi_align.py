"""Banked ROI x flip strip alignment: one device launch, one fetch.

Capability parity: estimatePairAffineWithRoiSearch + the flip hypothesis
(reference: stitch_global.cpp:226-289 ROI grid, :401-421 flip choice). The
reference evaluates up to 4x4 ROI pairs as separate SIFT+match+RANSAC runs,
then repeats the whole search on the horizontally flipped strip — up to 32
sequential estimator invocations per strip pair.

TPU-first design (this module):
  * features are detected ONCE per strip; an ROI hypothesis is a validity
    mask over the fixed-K keypoint set (zero extra detect work), and the
    flipped variant is a closed-form permutation of the same features
    (ops/features.py:mirror_features) — zero extra detect work there too;
  * one (K, K) MXU distance matmul per variant is shared by all ROI
    hypotheses; masked top-2 + ratio + RANSAC run as a vmapped bank over
    (variant=2, hypothesis<=16) in a single jitted launch;
  * one host fetch retrieves every hypothesis's (model, inliers, matches,
    ok); scoring/gating/argmax are trivial host work on 32 scalars.

ROI candidate rects mirror the reference exactly: full frame, left-heavy
(0..0.68 x, 0.05..0.95 y), right-heavy (0.32..1.0 x), center (0.16..0.84 x),
deduplicated, dropped when narrower/shorter than 120 px
(stitch_global.cpp:226-259).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.tuning import StitchTuning
from ..ops import match as M
from ..ops import ransac as R

_ROI_MIN_PX = 120     # reference :243-245
N_HYP_MAX = 16        # 4 ref ROIs x 4 cur ROIs

# fractional ROI grid (x0, x1, y0, y1) — reference :236-239
_ROI_FRACTIONS = (
    (0.00, 1.00, 0.00, 1.00),   # full
    (0.00, 0.68, 0.05, 0.95),   # left-heavy
    (0.32, 1.00, 0.05, 0.95),   # right-heavy
    (0.16, 0.84, 0.05, 0.95),   # center
)


@dataclass
class PairAffineEstimate:
    """Reference: PairAffineEstimate (stitch_global.cpp:32-39)."""

    ok: bool
    model: Optional[np.ndarray]  # (3,3) cur -> ref, full-res strip coords
    inliers: int = 0
    matches: int = 0
    ratio: float = 0.0

    @property
    def score(self) -> float:
        return self.inliers + 20.0 * self.ratio + 0.02 * self.matches


def roi_candidates(shape) -> List[Tuple[float, float, float, float]]:
    """Reference-faithful ROI rects as (x0, x1, y0, y1) in image pixels.

    Reference: buildStripRoiCandidates (stitch_global.cpp:226-259) —
    floor/ceil rounding, >=120 px both dims, dedup by rect.
    """
    h, w = int(shape[0]), int(shape[1])
    rois: List[Tuple[float, float, float, float]] = []
    for fx0, fx1, fy0, fy1 in _ROI_FRACTIONS:
        x = min(max(int(np.floor(w * fx0)), 0), max(0, w - 1))
        y = min(max(int(np.floor(h * fy0)), 0), max(0, h - 1))
        r = min(max(int(np.ceil(w * fx1)), x + 1), w)
        b = min(max(int(np.ceil(h * fy1)), y + 1), h)
        if r - x < _ROI_MIN_PX or b - y < _ROI_MIN_PX:
            continue
        rect = (float(x), float(r), float(y), float(b))
        if rect not in rois:
            rois.append(rect)
    if not rois:  # degenerate tiny strip: full frame only
        rois.append((0.0, float(w), 0.0, float(h)))
    return rois


def build_hyp_bank(cur_shape, ref_shape) -> Tuple[np.ndarray, int]:
    """((N_HYP_MAX, 8) rows [cx0,cx1,cy0,cy1, rx0,rx1,ry0,ry1], n_real).

    The grid is ref x cur like the reference's nested loop (:271-272);
    unused rows repeat the (full, full) pair to keep the launch shape
    static. Padded rows draw their own RANSAC keys on device, so they are
    NOT score-equivalent to row 0 — callers must ignore rows >= n_real
    (otherwise padding acts as extra restarts biased toward the
    full-frame hypothesis and the pick varies with how many ROIs
    survived dedup).
    """
    cur_rois = roi_candidates(cur_shape)
    ref_rois = roi_candidates(ref_shape)
    rows = [np.asarray(list(c) + list(r), np.float32)
            for r in ref_rois for c in cur_rois]
    rows = rows[:N_HYP_MAX]
    n_real = len(rows)
    while len(rows) < N_HYP_MAX:
        rows.append(rows[0])
    return np.stack(rows), n_real


@jax.jit
def _banked_align(desc_c, xy_c, valid_c,      # (V, K, 128), (V, K, 2), (V, K)
                  desc_r, xy_r, valid_r,      # (K, 128), (K, 2), (K,)
                  hyp,                        # (H, 8) float32
                  key, ratio, thresh):
    """All (variant, hypothesis) alignments in one launch.

    Returns (model (V,H,3,3), n_inliers (V,H), n_matches (V,H), ok (V,H)).
    """

    def variant(desc_cv, xy_cv, valid_cv, key_v):
        d2 = M.distance_sq(desc_cv, desc_r, valid_cv, valid_r)
        keys = jax.random.split(key_v, hyp.shape[0])

        def one(hb, k):
            vc = (valid_cv
                  & (xy_cv[:, 0] >= hb[0]) & (xy_cv[:, 0] < hb[1])
                  & (xy_cv[:, 1] >= hb[2]) & (xy_cv[:, 1] < hb[3]))
            vr = (valid_r
                  & (xy_r[:, 0] >= hb[4]) & (xy_r[:, 0] < hb[5])
                  & (xy_r[:, 1] >= hb[6]) & (xy_r[:, 1] < hb[7]))
            m = M.knn2_ratio_from_d2(d2, vc, vr, ratio)
            src, dst, good = M.gather_correspondences(xy_cv, xy_r, m)
            n_good = jnp.sum(m.good.astype(jnp.int32))
            res = R.ransac(src, dst, good, k, "affine", thresh=thresh)
            return res.model, res.n_inliers, n_good, res.ok

        return jax.vmap(one)(hyp, keys)

    keys_v = jax.random.split(key, desc_c.shape[0])
    return jax.vmap(variant)(desc_c, xy_c, valid_c, keys_v)


def _pick_best(models, n_inl, n_good, ok, min_good: int,
               min_inl: int) -> PairAffineEstimate:
    """Best-score hypothesis of one variant under the halved gates
    (reference :170 matches, :201 inliers)."""
    best = PairAffineEstimate(ok=False, model=None,
                              matches=int(n_good.max(initial=0)),
                              inliers=int(n_inl.max(initial=0)))
    for h in range(len(ok)):
        if not ok[h]:
            continue
        if n_good[h] < max(2, min_good) or n_inl[h] < max(2, min_inl):
            continue
        est = PairAffineEstimate(
            ok=True, model=np.asarray(models[h]), inliers=int(n_inl[h]),
            matches=int(n_good[h]),
            ratio=float(n_inl[h]) / max(1, int(n_good[h])))
        if not best.ok or est.score > best.score:
            best = est
    return best


def align_pair_banked(f_ref, s_ref, f_cur, f_cur_flip, ref_shape, cur_shape,
                      tuning: StitchTuning, seed: int
                      ) -> Tuple[PairAffineEstimate, PairAffineEstimate]:
    """(direct, flipped) best-ROI estimates for one strip pair.

    One jitted launch covers the full 2 x <=16 hypothesis grid; one fetch
    brings back all scores. ``f_cur_flip`` is the mirrored feature set
    (coordinates in the flipped strip's frame), so the flipped model maps
    flipped-cur coordinates into ref — exactly what compose applies to the
    flipped image.
    """
    hyp_np, n_real = build_hyp_bank(cur_shape, ref_shape)
    hyp = jnp.asarray(hyp_np)
    desc_c = jnp.stack([f_cur.desc[0], f_cur_flip.desc[0]])
    xy_c = jnp.stack([f_cur.xy[0], f_cur_flip.xy[0]])
    valid_c = jnp.stack([f_cur.valid[0], f_cur_flip.valid[0]])
    ratio = M.adaptive_ratio(tuning.match_conf)
    thresh = jnp.float32(4.0 / max(s_ref, 1e-6))
    models, n_inl, n_good, ok = _banked_align(
        desc_c, xy_c, valid_c, f_ref.desc[0], f_ref.xy[0], f_ref.valid[0],
        hyp, jax.random.PRNGKey(seed), ratio, thresh)
    models, n_inl, n_good, ok = jax.device_get(
        (models, n_inl, n_good, ok))  # ONE sync for all 32 hypotheses
    mg = tuning.min_good_matches // 2
    mi = tuning.min_inliers // 2
    # rows >= n_real are shape padding (see build_hyp_bank) — never score
    direct = _pick_best(models[0][:n_real], n_inl[0][:n_real],
                        n_good[0][:n_real], ok[0][:n_real], mg, mi)
    flip = _pick_best(models[1][:n_real], n_inl[1][:n_real],
                      n_good[1][:n_real], ok[1][:n_real], mg, mi)
    return direct, flip
