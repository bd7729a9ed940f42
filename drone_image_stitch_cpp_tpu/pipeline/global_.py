"""Global inter-strip composition: custom mosaic composer.

Capability parity: stitchInterStripsCustom (reference: stitch_global.cpp:
386-675) — explicitly NOT a cv::Stitcher pipeline:
  (a) pairwise strip alignment: grayscale + non-black masks (>2), <=2800 px
      downscale, SIFT with the global feature budget, knn2 with adaptive
      ratio, halved match/inlier minima, affine RANSAC(4.0) (:100-224);
  (b) 4-candidate ROI grid per strip (full/left/right/center, >=120 px,
      dedup) -> up-to-16 ROI-pair search keeping the best score, with
      ROI-translation composition (:226-289);
  (c) horizontal-flip hypothesis for reversed flight lines, chosen by
      inliers then ratio (:401-421); hard error with diagnostics if neither
      direct nor flipped alignment works (:422-428);
  (d) transform chaining onto a global canvas (:430-458) and per-strip
      warps with corner-relative affines (:463-486);
  (e) warped content masks with the 0.999 bilinear-footprint rule
      (:353-383);
  (f) radiometric pre-equalization: per-overlap per-channel mean-ratio
      gains clamped [0.8, 1.25], cumulative chaining, gain inheritance when
      the overlap is too small, geometric-mean normalization, apply
      skipping gains ~1 (:497-573);
  (g) canvas-size-adaptive exposure compensation (:307-326);
  (h) seam finding at <=8 MP (:583-630) — graph-cut min-cut first (native
      Boykov-Kolmogorov solver at full seam resolution via banded
      refinement, COST_COLOR_GRAD analog) with the DP seam as fallback,
      the reference's own ladder (:616-627);
  (i) blend bands max(max(5, cfg), ceil(log2(maxdim))-1) capped 12, and
      multiband blending with soft (sigma=10) feathered seam masks
      (:632-666);
  (j) wall-clock stage timing (:390, :667-670).

TPU-first structure: the whole (direct + flipped) x ROI hypothesis grid is
one banked device launch + one host fetch per strip pair (pipeline/
roi_align.py; the flip variant is a closed-form feature permutation, not a
re-detect); all radiometric / seam work happens once on a <=8 MP seam-scale
canvas; full resolution is touched only by streamed ROI warps feeding the
shared canvas pyramid.
"""

from __future__ import annotations

import functools
import math
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.tuning import StitchTuning
from ..ops import blend as B
from ..ops import exposure as E
from ..ops import features as F
from ..ops import seam as S
from ..ops.color import bgr_to_gray, nonblack_mask
from ..ops.resize import resize_area, scale_for_max_dim
from ..ops.warp import warp_affine, warp_content_mask
from ..runtime.logging import get_logger
from .registration import _detect_batch, bucket_shape, detect_features
from . import compose_feed as CF
from .roi_align import PairAffineEstimate, align_pair_banked

_MAX_ALIGN_DIM = 2800       # reference :119
_SEAM_CANVAS_MP = 8.0       # reference :585
_GAIN_CLAMP = (0.8, 1.25)   # reference :497-549
_GAIN_MIN_OVERLAP = 1000    # full-res valid-px inheritance threshold (:529)
_SOFT_MASK_SIGMA = 10.0     # reference :345


class GlobalStitchError(RuntimeError):
    pass


_STRIP_BUCKET = 512  # full-res strip pad grid (one program per bucket)


def _snap_strip(d: int) -> int:
    return -(-d // _STRIP_BUCKET) * _STRIP_BUCKET


@functools.partial(jax.jit, static_argnames=("max_kp", "out_h", "out_w",
                                             "bh", "bw"))
def _detect_strip_u8(img_u8: jnp.ndarray, true_hw: jnp.ndarray, max_kp: int,
                     out_h: int, out_w: int, bh: int, bw: int):
    """Fused u8 ingest -> gray -> area resize -> edge-extend -> detect for
    one bucket-padded strip. All shapes are bucket-derived, so every strip
    of a sortie runs the SAME compiled program.

    The input's pad region is ZERO (the same device copy feeds the
    compose stages, whose >2-nonblack content masks require black pad),
    so after the resize the work image is edge-extended by clamp-sampling
    from the last fully-interior content row/column — a hard zero
    frontier would otherwise flood the fixed keypoint budget with
    content-to-black edge responses.
    """
    gray = bgr_to_gray(img_u8.astype(jnp.float32))
    work = resize_area(gray, out_h, out_w)
    # clamp bounds cwh-2/cww-2: the LAST content row/col mixes zeros from
    # the full-res pad into its area average (darkened by the partial
    # footprint); replicating the last fully-interior one instead leaves
    # no gradient at or near the frontier
    ri = jnp.clip(jnp.arange(bh), 0, jnp.maximum(true_hw[0] - 2, 0))
    ci = jnp.clip(jnp.arange(bw), 0, jnp.maximum(true_hw[1] - 2, 0))
    work = work[ri[:, None], ci[None, :]]
    return _detect_batch(work[None], true_hw[None], max_kp, bh, bw)


def _detect_strip_dev(dev_img, true_hw, n_feats: int):
    """Features for one PADDED device-resident strip (see _detect_strip).

    ``dev_img``: (HP, WP, 3) uint8 device array, content at the origin
    with true dims ``true_hw``. Shapes are bucket-derived, so every strip
    of a mosaic runs one compiled program. Keypoints come back in
    full-res strip coordinates via the exact per-axis resize scales.
    """
    hp, wp = int(dev_img.shape[0]), int(dev_img.shape[1])
    h, w = true_hw
    sc = scale_for_max_dim(hp, wp, _MAX_ALIGN_DIM)
    out_h = max(1, int(round(hp * sc)))
    out_w = max(1, int(round(wp * sc)))
    sy = out_h / float(hp)        # exact content scales of the resize
    sx = out_w / float(wp)
    cwh = min(int(round(h * sy)), out_h)
    cww = min(int(round(w * sx)), out_w)
    bh, bw = bucket_shape(cwh, cww)
    feats = _detect_strip_u8(dev_img, jnp.asarray([cwh, cww], jnp.int32),
                             n_feats, out_h, out_w, bh, bw)
    xy = jnp.stack([(feats.xy[..., 0] + 0.5) / sx - 0.5,
                    (feats.xy[..., 1] + 0.5) / sy - 0.5], axis=-1)
    return feats._replace(xy=xy, sigma=feats.sigma / sc), sc


def _pad_strip_u8(img: np.ndarray, hp: int, wp: int) -> np.ndarray:
    if img.dtype != np.uint8:
        img = np.clip(img, 0.0, 255.0).astype(np.uint8)
    h, w = img.shape[:2]
    if (h, w) == (hp, wp):
        return img
    return np.pad(img, ((0, hp - h), (0, wp - w), (0, 0)))


@jax.jit
def _flip_padded(img, true_w):
    """Horizontal flip of the CONTENT of a padded strip, in place on
    device: flip the full padded array, then roll the content (now at the
    right edge) back to the origin. One compiled program for any true
    width."""
    return jnp.roll(img[:, ::-1], true_w - img.shape[1], axis=1)


def _detect_strip(img: np.ndarray, tuning: StitchTuning):
    """Full-frame features for one strip at the <=2800 px work scale.

    The strip crosses the relay as uint8 (4x less traffic than f32,
    ~200 MB for a 10x20-sortie strip) after a host pad to a 512-snapped
    bucket: autocropped strip panoramas all differ by a few pixels, and
    without the pad every strip costs its own server-side XLA compile of
    the ~670 MB gray/resize program (the dominant cost of the 312 s align
    stage in flagship run 3). The compose path shares ONE padded device
    copy per strip across align + seam warps + blend feeds
    (stitch_inter_strips_custom); this host-input variant serves
    standalone align_strips callers.
    """
    h, w = img.shape[:2]
    padded = _pad_strip_u8(img, _snap_strip(h), _snap_strip(w))
    return _detect_strip_dev(jnp.asarray(padded), (h, w),
                             tuning.global_sift_features)


def align_strips(strips: List[np.ndarray], tuning: StitchTuning,
                 seed: int = 0):
    """Chained global transforms + per-strip orientation (:400-437).

    Returns (transforms, oriented, flipped): ``oriented[i]`` is the strip
    with the flip hypothesis applied when chosen, and ``transforms[i]``
    maps oriented-strip coordinates into the global (strip-0) frame, so
    the whole chain lives in oriented frames and composition warps the
    oriented images.

    Per strip pair: ONE detect (current strip), features mirrored in
    closed form for the flip hypothesis, and the whole (direct + flipped)
    x ROI grid solved as one banked launch + one fetch (pipeline/
    roi_align.py) — vs the reference's up-to-32 sequential SIFT re-runs
    (stitch_global.cpp:261-289,401-421).
    """
    shapes = [st.shape[:2] for st in strips]
    dev_padded = [jnp.asarray(_pad_strip_u8(st, _snap_strip(st.shape[0]),
                                            _snap_strip(st.shape[1])))
                  for st in strips]
    transforms, oriented_dev, flipped = _align_strips_dev(
        dev_padded, shapes, tuning, seed)
    # materialize oriented host strips at their true dims (standalone
    # callers; the compose path uses _align_strips_dev directly and keeps
    # everything device-resident)
    oriented = [np.asarray(d[:h, :w]) for d, (h, w) in zip(oriented_dev,
                                                           shapes)]
    return transforms, oriented, flipped


def _align_strips_dev(dev_padded, shapes, tuning: StitchTuning,
                      seed: int = 0):
    """align_strips on PADDED device-resident uint8 strips.

    ``dev_padded[i]``: (HP, WP, 3) uint8, content at origin with true
    dims ``shapes[i]``. Returns (transforms, oriented_dev, flipped) where
    ``oriented_dev`` entries keep the same padded layout (a chosen flip
    runs on device: full flip + content roll back to the origin)."""
    log = get_logger()
    n = len(dev_padded)
    transforms = [np.eye(3, dtype=np.float32)]
    flipped = [False]
    oriented = [dev_padded[0]]
    f_prev, s_prev = _detect_strip_dev(dev_padded[0], shapes[0],
                                       tuning.global_sift_features)
    for i in range(1, n):
        cur_w = shapes[i][1]
        f_cur, _ = _detect_strip_dev(dev_padded[i], shapes[i],
                                     tuning.global_sift_features)
        f_flip = F.mirror_features(f_cur, cur_w)
        direct, flip_est = align_pair_banked(
            f_prev, s_prev, f_cur, f_flip, shapes[i - 1], shapes[i],
            tuning, seed + i)
        # choose by inliers then ratio (:406-421)
        use_flip = flip_est.ok and (
            not direct.ok
            or (flip_est.inliers, flip_est.ratio) > (direct.inliers,
                                                     direct.ratio))
        est = flip_est if use_flip else direct
        if not est.ok:
            raise GlobalStitchError(
                f"strip {i} alignment failed: direct(inl={direct.inliers}, "
                f"m={direct.matches}) flipped(inl={flip_est.inliers}, "
                f"m={flip_est.matches})")
        log.log("GlobalCustom", f"strip {i} aligned", flipped=use_flip,
                inliers=est.inliers, matches=est.matches,
                ratio=round(est.ratio, 3))
        # est.model maps oriented-cur -> oriented-prev coords
        chained = (transforms[i - 1] @ est.model).astype(np.float32)
        if not np.isfinite(chained).all():  # NaN guard (SURVEY section 5)
            raise GlobalStitchError(
                f"strip {i} chained transform is non-finite")
        transforms.append(chained)
        flipped.append(bool(use_flip))
        oriented.append(_flip_padded(dev_padded[i], cur_w) if use_flip
                        else dev_padded[i])
        f_prev = f_flip if use_flip else f_cur
    return transforms, oriented, flipped


@jax.jit
def _mask_union(masks):
    """Union of the seam-scale content masks (ONE fetch for the streamed-
    write crop box instead of one per strip)."""
    return jnp.stack(masks).any(axis=0)


@jax.jit
def _pair_gain_stats(img_ref: jnp.ndarray, img_cur: jnp.ndarray,
                     mask_ref: jnp.ndarray, mask_cur: jnp.ndarray
                     ) -> jnp.ndarray:
    """Overlap stats for one strip pair: [count, sum_ref(3), sum_cur(3)].

    All seam-scale images share the canvas shape, so this compiles once;
    the gain chain dispatches it per pair asynchronously and fetches the
    stacked (n-1, 7) table in a single host round-trip (the relay charges
    ~80 ms per fetch, so 3 fetches/pair was the old cost structure).
    """
    overlap = mask_ref & mask_cur
    cnt = jnp.sum(overlap).astype(jnp.float32)
    of = overlap[..., None]
    s_ref = jnp.sum(jnp.where(of, img_ref, 0.0), axis=(0, 1))
    s_cur = jnp.sum(jnp.where(of, img_cur, 0.0), axis=(0, 1))
    return jnp.concatenate([cnt[None], s_ref, s_cur])


def _gain_chain(seam_imgs: List[jnp.ndarray], seam_masks: List[jnp.ndarray],
                n: int, seam_scale: float = 1.0) -> np.ndarray:
    """Cumulative clamped mean-ratio gains + geo-mean norm (:497-573).

    Matches the reference exactly: the *pairwise* ratio of raw overlap
    means is clamped to [0.8, 1.25] (only when both channel means exceed
    the 5.0 dark-overlap guard), the cumulative product is left unclamped,
    inheritance triggers below 1000 valid overlap pixels (full-res count —
    our masks live at seam scale, so the count is rescaled), and the
    geo-mean normalization divides only when the mean exceeds 0.01.

    Device work is one async dispatch per pair + ONE fetch of the stacked
    stat table; the chain/inheritance recurrence runs on host numpy.
    """
    log = get_logger()
    gains = np.ones((n, 3), np.float32)
    inv_area = 1.0 / max(seam_scale * seam_scale, 1e-12)
    stats = np.asarray(jnp.stack(
        [_pair_gain_stats(seam_imgs[i - 1], seam_imgs[i],
                          seam_masks[i - 1], seam_masks[i])
         for i in range(1, n)])) if n > 1 else np.zeros((0, 7), np.float32)
    for i in range(1, n):
        cnt = float(stats[i - 1, 0])
        if cnt * inv_area < _GAIN_MIN_OVERLAP:
            gains[i] = gains[i - 1]  # inheritance (:507-529)
            log.log("GlobalCustom", f"gain inherit strip {i}",
                    overlap=int(cnt))
            continue
        ref_mean = stats[i - 1, 1:4] / cnt
        cur_mean = stats[i - 1, 4:7] / cnt
        pw = np.ones(3, np.float32)
        bright = (ref_mean > 5.0) & (cur_mean > 5.0)  # dark guard (:538)
        pw[bright] = np.clip(ref_mean[bright] / cur_mean[bright],
                             *_GAIN_CLAMP)
        gains[i] = gains[i - 1] * pw
        log.log("GlobalCustom", f"gain strip {i}",
                pw=np.round(pw, 3).tolist(),
                cum=np.round(gains[i], 3).tolist(), overlap=int(cnt))
    # geometric-mean normalization (:551-560)
    geo = np.exp(np.log(np.maximum(gains, 1e-6)).mean(axis=0))
    gains = gains / np.where(geo > 0.01, geo, 1.0)
    return gains


def stitch_inter_strips_custom(strips: List[np.ndarray],
                               tuning: Optional[StitchTuning] = None,
                               seed: int = 0, mesh=None,
                               row_sink=None) -> np.ndarray:
    """Compose strip panoramas into one mosaic (reference :386-675).

    ``mesh``: optional device mesh — a tiled compose distributes its
    independent canvas tiles over it (ops/blend.mb_compose_tiled).
    ``row_sink``: optional runtime.writer.StreamedMosaicWriter-protocol
    object. On the tiled path the mosaic's finished row bands stream into
    it while later tiles still blend (begin/on_rows/finish); the crop box
    passed to begin() is the content bbox from the seam-scale content
    masks, padded outward by the upscale quantum — it contains the
    pixel-exact autocrop box with at most a few rows of black margin.
    """
    log = get_logger()
    t_start = time.perf_counter()
    tuning = tuning or StitchTuning()
    n = len(strips)
    if n < 2:
        raise GlobalStitchError("need at least 2 strips")

    # ONE padded uint8 device copy per strip, shared by align detect, the
    # seam-scale warps, and every blend feed (each full pass over ten
    # 4K-tall strips costs ~30-40 s of relay transfer). All strips share
    # the common 512-snapped max dims so every stage runs one compiled
    # program; the pad is black, which the >2-nonblack content masks
    # exclude exactly like the reference's black wedges
    # (stitch_global.cpp:109-117), and canvas geometry keeps the TRUE dims.
    # DeviceStrip inputs (runtime/handoff.py) are ALREADY in HBM from the
    # strip stage — they re-pad on device and skip the upload entirely
    # (~70-100 s for ten 4K-tall strips on the ~25 MB/s relay).
    from ..runtime.handoff import DeviceStrip
    shapes = [(tuple(st.hw) if isinstance(st, DeviceStrip)
               else st.shape[:2]) for st in strips]
    hp_ = B.align_up(max(h for h, _ in shapes), _STRIP_BUCKET)
    wp_ = B.align_up(max(w for _, w in shapes), _STRIP_BUCKET)
    home = jax.devices()[0]  # strip canvases may sit on other mesh chips
    dev_strips = [st.device_padded(hp_, wp_, device=home)
                  if isinstance(st, DeviceStrip)
                  else jnp.asarray(_pad_strip_u8(st, hp_, wp_))
                  for st in strips]
    for st in strips:
        if isinstance(st, DeviceStrip):
            # the padded copy above is the compose's working set; release
            # the original strip canvas as soon as its host copy is cached
            # (otherwise both coexist in HBM for the whole global stage)
            st.mark_consumed()
    transforms, dev_strips, _flips = _align_strips_dev(
        dev_strips, shapes, tuning, seed)
    t_aligned = time.perf_counter()
    log.log("GlobalCustom", "align done",
            seconds=round(t_aligned - t_start, 2))

    # canvas bbox over transformed corners (:439-458) — host numpy (a
    # device dispatch per strip for (2,3) geometry is pure relay latency)
    boxes = []
    for (ih, iw), t in zip(shapes, transforms):
        t2 = np.asarray(t[:2, :], np.float32)
        corners = np.asarray([[0.0, 0.0], [iw - 1.0, 0.0],
                              [iw - 1.0, ih - 1.0], [0.0, ih - 1.0]],
                             np.float32)
        pts = corners @ t2[:, :2].T + t2[:, 2]
        boxes.append((float(pts[:, 0].min()), float(pts[:, 1].min()),
                      float(pts[:, 0].max()), float(pts[:, 1].max())))
    # integer origin: keep strip 0 pixel-aligned (see pipeline/strip.py)
    x0 = float(math.floor(min(b[0] for b in boxes)))
    y0 = float(math.floor(min(b[1] for b in boxes)))
    x1 = max(b[2] for b in boxes)
    y1 = max(b[3] for b in boxes)
    canvas_w = int(math.ceil(x1 - x0)) + 1
    canvas_h = int(math.ceil(y1 - y0)) + 1
    log.log("GlobalCustom", "canvas", h=canvas_h, w=canvas_w)
    t_canvas = []
    for t in transforms:
        tc = np.asarray(t[:2, :], np.float32).copy()
        tc[0, 2] -= x0
        tc[1, 2] -= y0
        t_canvas.append(tc)

    # ---- seam-scale canvas (<=8 MP) --------------------------------------
    seam_scale = min(1.0, math.sqrt(_SEAM_CANVAS_MP * 1e6
                                    / (canvas_h * canvas_w)))
    sh = max(1, int(round(canvas_h * seam_scale)))
    sw = max(1, int(round(canvas_w * seam_scale)))
    ssc = np.diag([seam_scale, seam_scale]).astype(np.float32)
    log.log("GlobalCustom", "seam scale", scale=round(seam_scale, 4),
            h=sh, w=sw)

    # Warping straight from the full-res padded strip costs ~4 s/strip on
    # the relay TPU (an XLA gather over a ~67 MP source, with ~7x
    # minification aliasing to boot — measured 72 s for this loop on the
    # 200-frame flagship); area-downscaling the strip to seam scale FIRST
    # (reduction-structured, fast) and warping from the ~1.4 MP result is
    # an order of magnitude cheaper and anti-aliased. The reference
    # likewise seam-finds on resized images, not full-res warps
    # (stitch_global.cpp:601-603). Content semantics match the old path
    # to <1 seam-px at edges: the full-res >2-gray mask area-averages to
    # fractional coverage, binarized at full coverage (0.999) before the
    # footprint-thresholded mask warp.
    hp_s = max(1, int(round(hp_ * seam_scale)))
    wp_s = max(1, int(round(wp_ * seam_scale)))
    s_x, s_y = wp_s / wp_, hp_s / hp_
    import os as _os
    fullres_seam = _os.environ.get("TM_SEAM_WARP") == "fullres"

    @jax.jit
    def _to_seam(strip_u8, t_small):
        img32 = strip_u8.astype(jnp.float32)
        small = resize_area(img32, hp_s, wp_s)
        cov = resize_area(nonblack_mask(img32, 2.0).astype(jnp.float32),
                          hp_s, wp_s)
        simg = warp_affine(small, t_small, sh, sw)
        smask = warp_content_mask(cov >= 0.999, t_small, sh, sw,
                                  footprint_thresh=0.999)
        return simg, smask

    @jax.jit
    def _to_seam_fullres(strip_u8, t_seam):
        # ablation reference path (TM_SEAM_WARP=fullres): warp the seam
        # canvas straight from the full-res padded strip (the pre-9002d56
        # behavior — ~10x slower and minification-aliased, kept to isolate
        # the pre-scaled path's quality contribution)
        img32 = strip_u8.astype(jnp.float32)
        simg = warp_affine(img32, t_seam, sh, sw)
        smask = warp_content_mask(nonblack_mask(img32, 2.0), t_seam,
                                  sh, sw, footprint_thresh=0.999)
        return simg, smask

    seam_imgs, seam_masks = [], []
    for i in range(n):
        if fullres_seam:
            tsm = (ssc @ t_canvas[i]).astype(np.float32)
            simg, smask = _to_seam_fullres(dev_strips[i], jnp.asarray(tsm))
        else:
            tsm = (ssc @ t_canvas[i]).astype(np.float32).copy()
            tsm[:, 0] /= s_x            # pre-scaled source -> seam canvas
            tsm[:, 1] /= s_y
            simg, smask = _to_seam(dev_strips[i], jnp.asarray(tsm))
        seam_imgs.append(simg)
        seam_masks.append(smask)

    t_seamwarp = time.perf_counter()
    from ..runtime import hbm
    hbm.sample("global-seam-warps")
    log.log("GlobalCustom", "seam-scale warps done",
            seconds=round(t_seamwarp - t_aligned, 2))

    # ---- radiometric pre-equalization (:497-573) -------------------------
    gains = _gain_chain(seam_imgs, seam_masks, n, seam_scale)

    # ---- canvas-size-adaptive exposure compensation (:307-326) -----------
    # ChannelsCompensator(2) up to 120 MP, scalar GainCompensator(1) for
    # ANY larger canvas (the reference returns NO only for negative area).
    canvas_mp = canvas_h * canvas_w / 1e6
    comp_gains = np.ones((n, 3), np.float32)
    if canvas_mp <= 120.0:
        comp = E.channels_compensate(
            jnp.stack([im * jnp.asarray(g) for im, g in zip(seam_imgs,
                                                            gains)]),
            jnp.stack(seam_masks), similarity_thresh=0.95)
        comp_gains = np.asarray(comp)
        log.log("GlobalCustom", "exposure", kind="channels",
                gains=np.round(comp_gains, 3).tolist())
    else:
        comp = E.gain_compensate_scalar(
            jnp.stack([(im * jnp.asarray(g)).mean(axis=-1)
                       for im, g in zip(seam_imgs, gains)]),
            jnp.stack(seam_masks), similarity_thresh=0.95)
        comp_gains = np.repeat(np.asarray(comp)[:, None], 3, axis=1)
        log.log("GlobalCustom", "exposure", kind="gain")

    total_gains = gains * comp_gains

    # ---- seams on the seam-scale canvas (:583-630) -----------------------
    comp_imgs = [im * jnp.asarray(g) for im, g in zip(seam_imgs,
                                                      total_gains)]
    axes = []
    for i in range(n - 1):
        dt = t_canvas[i + 1][:, 2] - t_canvas[i][:, 2]
        axes.append("vertical" if abs(dt[0]) >= abs(dt[1])
                    else "horizontal")
    t_gain = time.perf_counter()
    log.log("GlobalCustom", "gains+exposure done",
            seconds=round(t_gain - t_seamwarp, 2))
    # graph-cut seams with DP fallback (reference ladder :616-627);
    # TM_SEAM_METHOD=dp isolates the graph-cut's quality contribution
    seam_out = S.find_seams_sequential(
        comp_imgs, list(seam_masks), axes,
        method=_os.environ.get("TM_SEAM_METHOD", "graphcut"))
    t_seams = time.perf_counter()
    log.log("GlobalCustom", "seams done",
            seconds=round(t_seams - t_gain, 2))
    # streamed-output crop box: content bbox at seam scale, upscaled with
    # an outward margin of the scale quantum (+2 px guard). It CONTAINS
    # the pixel autocrop box: any full-res content pixel lands in some
    # seam-scale mask cell, so the upscaled bbox only over-covers.
    crop_box = None
    if row_sink is not None:
        union = np.asarray(_mask_union(seam_masks))
        r = union.any(axis=1)
        c = union.any(axis=0)
        if r.any():
            margin = int(math.ceil(1.0 / max(seam_scale, 1e-6))) + 2
            ry0, ry1 = int(np.argmax(r)), len(r) - int(np.argmax(r[::-1]))
            cx0, cx1 = int(np.argmax(c)), len(c) - int(np.argmax(c[::-1]))
            crop_box = (max(0, int(ry0 / seam_scale) - margin),
                        min(canvas_h, int(ry1 / seam_scale) + margin),
                        max(0, int(cx0 / seam_scale) - margin),
                        min(canvas_w, int(cx1 / seam_scale) + margin))
    # free the 8 MP seam-scale images/masks before the blend allocates
    # tile pyramids (HBM headroom on a single chip)
    del comp_imgs, seam_imgs, seam_masks

    # ---- multiband blend with soft masks (:632-666) ----------------------
    bands = B.num_blend_bands(tuning.blend_bands, canvas_h, canvas_w)
    use_tiled = (B.pyramid_bytes(canvas_h, canvas_w, bands)
                 > B.TILED_THRESHOLD_BYTES)
    if use_tiled:
        bands = B.tiled_bands(canvas_h, canvas_w, bands)
    log.log("GlobalCustom", "blend", bands=bands, tiled=use_tiled)
    _on_dev, _drop_frame = CF.device_colocator()

    def feed_roi(cv, i, oy, ox, ch_, cw_):
        """Feed strip i into a canvas pyramid with origin (ox, oy) — ONE
        fused dispatch (pipeline/compose_feed.py): warp + 0.999-footprint
        content mask + sigma=10 soft seam mask (:332-351) + accumulate."""
        bx0, by0 = boxes[i][0] - x0 - ox, boxes[i][1] - y0 - oy
        bx1, by1 = boxes[i][2] - x0 - ox, boxes[i][3] - y0 - oy
        # fixed-size window buckets, shifted to fit (ops/blend.py): bounds
        # the fused-feed compile variants (see pipeline/strip.py feed_roi)
        tlx, tly, rh_b, rw_b = B.bucketed_window(bx0, by0, bx1, by1,
                                                 bands, ch_, cw_)
        gx, gy = ox + tlx, oy + tly
        t_full = t_canvas[i].copy()
        t_full[0, 2] -= gx
        t_full[1, 2] -= gy
        img = _on_dev(("img", i), dev_strips[i], cv.wacc[0])
        sm = _on_dev(("seam", i), seam_out[i], cv.wacc[0])
        return CF.feed_frame(cv, img, sm, t_full, tlx, tly, gx, gy,
                             seam_scale, rh_b, rw_b, mode="global",
                             chan_gain=total_gains[i])

    def feed_many(cv, sel, oy, ox, ch_, cw_):
        """Whole-tile feed: every intersecting strip in as few fused
        dispatches as the window buckets allow (pipeline/compose_feed
        ._feed_many_prog; per-feed dispatches cost ~200-300 ms of relay
        round-trip each)."""
        entries = []
        for i in sel:
            bx0, by0 = boxes[i][0] - x0 - ox, boxes[i][1] - y0 - oy
            bx1, by1 = boxes[i][2] - x0 - ox, boxes[i][3] - y0 - oy
            tlx, tly, rh_b, rw_b = B.bucketed_window(bx0, by0, bx1, by1,
                                                     bands, ch_, cw_)
            gx, gy = ox + tlx, oy + tly
            t_full = t_canvas[i].copy()
            t_full[0, 2] -= gx
            t_full[1, 2] -= gy
            entries.append(dict(
                img=_on_dev(("img", i), dev_strips[i], cv.wacc[0]),
                seam_mask=_on_dev(("seam", i), seam_out[i], cv.wacc[0]),
                t_full=t_full, tlx=tlx, tly=tly, gx=gx, gy=gy,
                rh=rh_b, rw=rw_b, chan_gain=total_gains[i]))
        return CF.feed_frames_grouped(cv, entries, seam_scale, "global")

    if use_tiled:
        frame_boxes = [(b[0] - x0, b[1] - y0, b[2] - x0, b[3] - y0)
                       for b in boxes]

        def retire(i):
            # drop the strip's device residence once no later tile can
            # touch it (HBM headroom: ten 4K-tall strips are ~1.7 GB)
            dev_strips[i] = None
            seam_out[i] = None
            _drop_frame(i)

        on_rows = None
        if row_sink is not None and crop_box is not None:
            try:
                row_sink.begin(canvas_h, canvas_w, crop_box)
                on_rows = row_sink.on_rows
                log.log("GlobalCustom", "streaming mosaic write",
                        crop=crop_box)
            except Exception as err:
                log.log("GlobalCustom", "streamed write unavailable",
                        error=str(err))
        result = B.mb_compose_tiled(
            canvas_h, canvas_w, bands, frame_boxes, feed_roi,
            devices=(list(mesh.devices.flat) if mesh is not None
                     else None), on_frame_retired=retire,
            feed_tile_many=feed_many, on_rows=on_rows,
            fetch_packed=_os.environ.get("TM_FETCH_PACKED", "1") != "0")
        if on_rows is not None:
            try:
                hw = row_sink.finish()
                log.log("GlobalCustom", "streamed mosaic written",
                        h=hw[0], w=hw[1])
            except Exception as err:
                log.log("GlobalCustom", "streamed write failed",
                        error=str(err))
    else:
        canvas = B.mb_prepare(canvas_h, canvas_w, bands)
        for i in range(n):
            canvas = feed_roi(canvas, i, 0, 0,
                              canvas.wacc[0].shape[0],
                              canvas.wacc[0].shape[1])
        out, _ = B.mb_blend(canvas, canvas_h, canvas_w)
        result = np.asarray(B.clip_u8(out))
    log.log("GlobalCustom", "blend done",
            seconds=round(time.perf_counter() - t_seams, 2))
    log.log("GlobalCustom", "composed",
            seconds=round(time.perf_counter() - t_start, 2))
    return result
