"""N-frame strip stitching: the cv::Stitcher SCANS-mode pipeline, rebuilt.

Capability parity: stitchRobustly / stitchWithMode / createConfiguredStitcher
(reference: stitch_robust.cpp:174-271,337-376): banded pair schedule
(range_width), pair confidence graph + biggest-component filter
(pano_conf_thresh), affine-partial bundle adjustment, affine warping, DP
seams at seam resolution, blocks-gain exposure compensation, multiband
blending — plus the robustness ladder: pair-diagnostics gates for 2-frame
jobs, a sequential anchor-window fallback (stitch_robust.cpp:273-334), and
score-based gating instead of exception sniffing.

TPU-first structure: one batched detect over all frames, one chunked-vmapped
match+RANSAC over the banded schedule, one linear-LS bundle adjust, then a
streamed compose (per-frame ROI warp -> shared canvas pyramid) that never
materializes per-frame canvases.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config.tuning import StitchTuning
from ..ops import blend as B
from ..ops import exposure as E
from ..ops import match as M
from ..ops import seam as S
from ..ops.color import apply_channel_gains, nonblack_mask, yuv420_to_bgr
from ..ops.resize import resize_area, resize_linear, scale_for_megapixels
from ..ops.warp import warp_affine, warp_perspective
from ..ops.pallas_warp import warp_affine as fast_warp
from ..runtime.logging import get_logger
from . import compose_feed as CF
from .bundle import bundle_adjust_similarity_jit, params_from_affine
from .pairgraph import (PairGraph, banded_pairs, all_pairs,
                        biggest_component, chain_init, register_pairs)
from .registration import detect_features

_LOWE_RATIO = 0.75


@functools.partial(jax.jit, static_argnames=("sh", "sw", "persp"))
def _seam_warp_batch(imgs: jnp.ndarray, ts: jnp.ndarray, sh: int, sw: int,
                     persp: bool):
    """All frames' seam-scale warps (image + content mask) in ONE dispatch.

    ``imgs``: (N, H, W, 3) uint8/f32 same-sized frames; ``ts``: (N, 2, 3)
    frame->seam-canvas affines. A host per-frame loop costs 2N relay
    round-trips (~80 ms each); this program costs one. lax.map (not vmap)
    keeps the N full-res f32 conversions SEQUENTIAL inside the program —
    a vmapped body lets XLA materialize all N converted frames at once
    (~4 GB at 40 4K frames), re-creating the HBM spike the uint8
    residency work avoids.
    """

    def one(img, t):
        # 2-D rows are the FrameStore's packed I420 wire format
        img32 = (yuv420_to_bgr(img) if img.ndim == 2
                 else img.astype(jnp.float32))
        mask32 = nonblack_mask(img32, -1.0).astype(jnp.float32)
        if persp:
            h33 = jnp.concatenate(
                [t, jnp.asarray([[0.0, 0.0, 1.0]], t.dtype)])
            simg = warp_perspective(img32, h33, sh, sw)
            smask = warp_perspective(mask32, h33, sh, sw)
        else:
            simg = warp_affine(img32, t, sh, sw)
            smask = warp_affine(mask32, t, sh, sw)
        return simg, smask >= 0.5

    return jax.lax.map(lambda a: one(*a), (imgs, ts))


class StripStitchError(RuntimeError):
    """Raised when both the joint and the sequential paths fail."""


def _scale_transform(t33: np.ndarray, s: float) -> np.ndarray:
    """Rescale a transform estimated at work scale to full resolution."""
    sc = np.diag([s, s, 1.0]).astype(np.float32)
    return sc @ t33 @ np.linalg.inv(sc)


def estimate_strip_transforms(images: List[np.ndarray],
                              tuning: StitchTuning,
                              range_width: Optional[int] = None,
                              matching_mask: Optional[np.ndarray] = None,
                              stage: str = "Strip", seed: int = 0,
                              mesh=None, store=None,
                              indices: Optional[List[int]] = None):
    """Registration: features -> banded pair graph -> component -> BA.

    Returns (kept_indices, transforms (n_kept, 2, 3) frame->frame0, graph).
    ``mesh``: optional device mesh — the pair-registration chunk axis is
    data-parallel across it (see pairgraph.register_pairs).
    """
    log = get_logger()
    n = len(images) if images is not None else len(indices)
    rw = range_width if range_width is not None else tuning.range_width
    feats, scale = detect_features(images, tuning.sift_features,
                                   tuning.registration_resol_mpx,
                                   store=store, indices=indices)
    if matching_mask is not None:
        pairs = [(i, j) for i in range(n) for j in range(i + 1, n)
                 if matching_mask[i, j] or matching_mask[j, i]]
    elif tuning.use_range_matcher:
        pairs = banded_pairs(n, rw)
    else:
        pairs = all_pairs(n)
    if not pairs:
        raise StripStitchError(f"{stage}: empty pair schedule")

    graph = register_pairs(feats, pairs, _LOWE_RATIO, thresh=4.0 / scale,
                           kind="similarity", seed=seed, mesh=mesh)
    conf = np.asarray(graph.conf)
    ok = np.asarray(graph.ok)
    keep = ok & (conf >= tuning.pano_conf_thresh)
    log.log(stage, "pair graph", pairs=len(pairs), kept=int(keep.sum()),
            mean_conf=float(conf[ok].mean()) if ok.any() else 0.0)

    if n == 2:
        # 2-image pair-diagnostics gate (stitchWithMode,
        # stitch_robust.cpp:233-243): every 2-image job must pass the
        # min_good_matches / min_inliers health gates, with a full
        # diagnostics dump on failure (logPairDiagnostics :144-172).
        ng = int(np.asarray(graph.n_good)[0])
        ni = int(np.asarray(graph.n_inliers)[0])
        okp = bool(ok[0])
        if (not okp) or ng < tuning.min_good_matches \
                or ni < tuning.min_inliers:
            kp_l = int(np.asarray(feats.valid[0]).sum())
            kp_r = int(np.asarray(feats.valid[1]).sum())
            sh_l = (images[0].shape if images is not None
                    else tuple(store.shape0))
            sh_r = (images[1].shape if images is not None
                    else tuple(store.shape0))
            log.log(stage, "failure diagnostics", idx=1,
                    left=f"{sh_l}", right=f"{sh_r}",
                    kp_left=kp_l, kp_right=kp_r,
                    good_matches=f"{ng}(min={tuning.min_good_matches})",
                    model=("failed" if not okp else
                           f"inliers/good_matches={ni}/{ng}"
                           f"(min={tuning.min_inliers})"))
            raise StripStitchError(
                f"{stage}: pair gates failed (good={ng} inliers={ni}, "
                f"need {tuning.min_good_matches}/{tuning.min_inliers})")

    comp = biggest_component(n, graph.pairs, keep)
    if len(comp) < 2:
        raise StripStitchError(
            f"{stage}: pair graph too weak (component={len(comp)})")
    comp_set = set(comp)

    # chain init over kept edges, then bundle adjust on inlier matches
    models = np.asarray(graph.model)
    init_t = chain_init(n, graph.pairs, models, keep, conf)

    if tuning.use_affine_bundle:
        pair_keep = [k for k, (i, j) in enumerate(graph.pairs)
                     if keep[k] and int(i) in comp_set and int(j) in comp_set]
        pk = jnp.asarray(np.asarray(pair_keep, np.int32))
        init_params = params_from_affine(
            jnp.asarray(init_t[:, :2, :]))
        refined = bundle_adjust_similarity_jit(
            jnp.asarray(graph.pairs)[pk], graph.pts_a[pk], graph.pts_b[pk],
            graph.w[pk], init_params)
        transforms = np.asarray(refined)
        if not np.isfinite(transforms).all():  # NaN guard (SURVEY sec. 5)
            log.log(stage, "bundle adjust produced non-finite transforms; "
                           "keeping chain init")
            transforms = init_t[:, :2, :]
    else:
        transforms = init_t[:, :2, :]
    if not np.isfinite(transforms).all():
        raise StripStitchError(f"{stage}: non-finite transforms")

    kept = sorted(comp_set)
    return kept, transforms[np.asarray(kept)], graph


def _axes_from_transforms(transforms: np.ndarray) -> List[str]:
    """Seam axis per adjacent pair from the dominant translation."""
    axes = []
    for i in range(len(transforms) - 1):
        dt = transforms[i + 1][:, 2] - transforms[i][:, 2]
        axes.append("vertical" if abs(dt[0]) >= abs(dt[1]) else "horizontal")
    return axes


def compose_strip(images: List[np.ndarray], transforms: np.ndarray,
                  tuning: StitchTuning, stage: str = "Strip",
                  mesh=None, store=None,
                  indices: Optional[List[int]] = None,
                  return_device: bool = False):
    """Warp + seam + gain + multiband blend at compositing resolution.

    ``transforms``: (N, 2, 3) frame->reference affines (full-res units).
    ``compositing_resol_mpx`` > 0 composes at the configured megapixel
    budget (setCompositingResol analog, stitch_robust.cpp:185); -1 keeps
    full resolution. ``use_affine_warper=False`` routes every compose warp
    through the perspective (plane-warper family) kernel instead of the
    affine fast path (stitch_robust.cpp:203-205). ``mesh``: optional
    device mesh — tiled composes round-robin their independent tiles over
    it (ops/blend.mb_compose_tiled).

    ``return_device=True`` (tiled path): the blended panorama stays in
    HBM as a runtime.handoff.DeviceStrip — no pixel fetch at all. The
    host copy (strip JPEG, checkpoint) is fetched lazily on the caller's
    writer thread, and the global compose consumes the device canvas
    directly instead of re-uploading ~1.7 GB of strips over the relay.
    Small (non-tiled) canvases still return a host array.
    """
    log = get_logger()
    if images is None:
        # streaming path: host pixels only materialize on the (rare)
        # compositing-rescale branch; shapes come from the store contract
        n = len(indices)
        h, w = store.shape0[:2]
    else:
        n = len(images)
        h, w = images[0].shape[:2]

    cs = scale_for_megapixels(h, w, tuning.compositing_resol_mpx)
    if cs < 1.0:
        if images is None:
            images = [store.host_frame(i) for i in indices]
        log.log(stage, "compositing scale", scale=round(cs, 4))
        images = [np.asarray(resize_area(
            jnp.asarray(im.astype(np.float32)),
            max(1, int(round(im.shape[0] * cs))),
            max(1, int(round(im.shape[1] * cs))))) for im in images]
        transforms = np.stack([
            _scale_transform(np.vstack([t, [0.0, 0.0, 1.0]]).astype(
                np.float32), cs)[:2] for t in np.asarray(transforms)])
        h, w = images[0].shape[:2]

    persp = not tuning.use_affine_warper

    def _warp(img, t23, oh, ow, fast=False):
        """Warper-family dispatch: affine fast path or perspective kernel."""
        t23 = np.asarray(t23, np.float32)
        if persp:
            h33 = jnp.asarray(np.vstack([t23, [0.0, 0.0, 1.0]]))
            return warp_perspective(img, h33, oh, ow)
        if fast:
            return fast_warp(img, t23, oh, ow)
        return warp_affine(img, jnp.asarray(t23), oh, ow)

    # device-resident frames: transferred ONCE and kept UINT8 (the fused
    # feed converts on the fly), reused by the seam stage and every tile
    # feed — re-uploading per (frame, tile) moved ~95 MB per 4K frame per
    # tile over the host link and dominated compose wall-clock
    if store is not None and indices is not None and cs >= 1.0:
        # frames already crossed the relay at ingest; reuse the HBM copies
        dev_imgs = [store.frame(i) for i in indices]
    else:
        dev_imgs = [jnp.asarray(im) for im in images]
    # 2-D arrays are the FrameStore's packed I420 wire format
    to_f32 = jax.jit(lambda a: (yuv420_to_bgr(a) if a.ndim == 2
                                else a.astype(jnp.float32)))
    _on_dev, _ = CF.device_colocator()

    # canvas bbox over all transformed corners — host numpy throughout
    # (a per-frame device dispatch for (2,3) geometry costs an ~80 ms relay
    # round-trip each; N frames x 2 loops was seconds of pure latency)
    tf = np.asarray(transforms, np.float32)
    shapes = ([im.shape[:2] for im in images] if images is not None
              else [(h, w)] * n)
    boxes = []
    for t, (ih, iw) in zip(tf, shapes):
        corners = np.asarray([[0.0, 0.0], [iw - 1.0, 0.0],
                              [iw - 1.0, ih - 1.0], [0.0, ih - 1.0]],
                             np.float32)
        pts = corners @ t[:, :2].T + t[:, 2]
        boxes.append((pts[:, 0].min(), pts[:, 1].min(),
                      pts[:, 0].max(), pts[:, 1].max()))
    # integer canvas origin: a fractional shift would resample every frame
    # (frame 0 included) and blur the whole mosaic by a sub-pixel offset
    x0 = float(np.floor(min(b[0] for b in boxes)))
    y0 = float(np.floor(min(b[1] for b in boxes)))
    x1 = max(float(b[2]) for b in boxes)
    y1 = max(float(b[3]) for b in boxes)
    canvas_w = int(np.ceil(x1 - x0)) + 1
    canvas_h = int(np.ceil(y1 - y0)) + 1
    shift3 = np.asarray([[1, 0, -x0], [0, 1, -y0], [0, 0, 1]], np.float32)
    t_canvas = [(shift3 @ np.vstack([t, [0.0, 0.0, 1.0]]))[:2].astype(
        np.float32) for t in tf]
    log.log(stage, "canvas", h=canvas_h, w=canvas_w)

    # ---- seam scale work -------------------------------------------------
    seam_scale = scale_for_megapixels(h, w, tuning.seam_estimation_resol_mpx)
    # seam-canvas dims snapped up to a 64 grid: they track the strip's
    # data-dependent canvas height, and every distinct (sh, sw) recompiles
    # the seam-warp batch AND the fused compose feed (whose seam-mask /
    # gain-map inputs have these dims) — minutes per strip on the remote
    # relay. The pad rows/cols are mask-empty: warps land zeros there, and
    # in the feed's hat-matmul upsample a zero column contributes exactly
    # what a missing column does, so the blend is bit-identical.
    sh = B.align_up(max(1, int(round(canvas_h * seam_scale))), 64)
    sw = B.align_up(max(1, int(round(canvas_w * seam_scale))), 64)
    ssc = np.diag([seam_scale, seam_scale]).astype(np.float32)

    if len(set(shapes)) == 1 and n > 1:
        ts_all = jnp.asarray(np.stack(
            [(ssc @ t_canvas[i]).astype(np.float32) for i in range(n)]))
        simgs, smasks = _seam_warp_batch(jnp.stack(dev_imgs), ts_all,
                                         sh, sw, persp)
        seam_imgs = [simgs[i] for i in range(n)]
        seam_masks = [smasks[i] for i in range(n)]
    else:
        seam_imgs = []
        seam_masks = []
        for i in range(n):
            ts = (ssc @ t_canvas[i]).astype(np.float32)
            img32 = to_f32(dev_imgs[i])
            simg = _warp(img32, ts, sh, sw)
            smask = _warp(nonblack_mask(img32, -1.0).astype(jnp.float32),
                          ts, sh, sw) >= 0.5
            seam_imgs.append(simg)
            seam_masks.append(smask)
            del img32

    # exposure compensation at seam scale: BlocksGainCompensator analog —
    # scalar gains solved globally, modulated by per-block brightness
    # ratio surfaces (ops/exposure.block_gain_maps)
    gain_maps = None
    if tuning.use_blocks_gain:
        intens = jnp.stack([im.mean(axis=-1) for im in seam_imgs])
        masks = jnp.stack(seam_masks)
        gain_maps = E.block_gain_maps(intens, masks,
                                      block=max(8, 32 * sh // 1024))
        log.log(stage, "gains",
                gains=[round(float(g), 3)
                       for g in np.asarray(gain_maps.mean(axis=(1, 2)))])

    axes = _axes_from_transforms(np.asarray(transforms))
    from ..runtime import hbm
    hbm.sample(f"{stage}-seam-warps")
    with log.timer(stage, "seams"):
        seam_masks = S.find_seams_sequential(seam_imgs, seam_masks, axes)

    # ---- full-res compose: ROI warp -> canvas pyramid --------------------
    # strip stage uses the configured band count directly (the adaptive
    # canvas formula is a global-stage behavior, stitch_global.cpp:632-635)
    bands = max(1, tuning.blend_bands)
    use_tiled = (B.pyramid_bytes(canvas_h, canvas_w, bands)
                 > B.TILED_THRESHOLD_BYTES)
    if use_tiled:
        bands = B.tiled_bands(canvas_h, canvas_w, bands)
        log.log(stage, "tiled compose",
                tiles=len(B.mb_tile_grid(canvas_h, canvas_w, bands)[0]),
                bands=bands)
    # (gain - 1) maps sliced once per strip: the fused feed warps them so
    # the constant border resolves to gain 1
    gain_m1_list = ([gain_maps[i] - 1.0 for i in range(n)]
                    if gain_maps is not None else None)

    def feed_roi(cv, i, oy, ox, ch_, cw_):
        """Feed frame i into a canvas pyramid with origin (ox, oy) —
        ONE fused dispatch (pipeline/compose_feed.py)."""
        bx0, by0 = boxes[i][0] - x0 - ox, boxes[i][1] - y0 - oy
        bx1, by1 = boxes[i][2] - x0 - ox, boxes[i][3] - y0 - oy
        # fixed-size window buckets, shifted to fit (ops/blend.py): every
        # new (rh, rw) bucket costs a full compile of the fused feed
        # program on the relay
        tlx, tly, rh_b, rw_b = B.bucketed_window(
            float(bx0), float(by0), float(bx1), float(by1), bands,
            ch_, cw_)

        gx, gy = ox + tlx, oy + tly     # global canvas offsets of the ROI
        t_full = np.vstack([t_canvas[i], [0.0, 0.0, 1.0]]).astype(np.float32)
        t_full[0, 2] -= gx
        t_full[1, 2] -= gy
        t_full = t_full[:2]
        img32 = _on_dev(("img", i), dev_imgs[i], cv.wacc[0])
        sm = _on_dev(("seam", i), seam_masks[i], cv.wacc[0])
        gm = (_on_dev(("gain", i), gain_m1_list[i], cv.wacc[0])
              if gain_m1_list is not None else None)
        return CF.feed_frame(
            cv, img32, sm, t_full, tlx, tly, gx, gy, seam_scale,
            rh_b, rw_b, mode="strip", gain_m1=gm, persp=persp,
            h33=(np.vstack([t_full, [0.0, 0.0, 1.0]]).astype(np.float32)
                 if persp else None))

    def feed_entry(i, oy, ox, ch_, cw_, like):
        """Per-frame feed parameters for the grouped tile feed."""
        bx0, by0 = boxes[i][0] - x0 - ox, boxes[i][1] - y0 - oy
        bx1, by1 = boxes[i][2] - x0 - ox, boxes[i][3] - y0 - oy
        tlx, tly, rh_b, rw_b = B.bucketed_window(
            float(bx0), float(by0), float(bx1), float(by1), bands,
            ch_, cw_)
        gx, gy = ox + tlx, oy + tly
        t_full = np.vstack([t_canvas[i], [0.0, 0.0, 1.0]]).astype(np.float32)
        t_full[0, 2] -= gx
        t_full[1, 2] -= gy
        t_full = t_full[:2]
        return dict(
            img=_on_dev(("img", i), dev_imgs[i], like),
            seam_mask=_on_dev(("seam", i), seam_masks[i], like),
            gain_m1=(_on_dev(("gain", i), gain_m1_list[i], like)
                     if gain_m1_list is not None else None),
            t_full=t_full, tlx=tlx, tly=tly, gx=gx, gy=gy,
            rh=rh_b, rw=rw_b, persp=persp,
            h33=(np.vstack([t_full, [0.0, 0.0, 1.0]]).astype(np.float32)
                 if persp else None))

    uniform = len(set(shapes)) == 1

    def feed_many(cv, sel, oy, ox, ch_, cw_):
        """Whole-tile feed: every intersecting frame in as few fused
        dispatches as the window buckets allow (per-feed dispatches cost
        ~200-300 ms of relay round-trip each)."""
        entries = [feed_entry(i, oy, ox, ch_, cw_, cv.wacc[0])
                   for i in sel]
        return CF.feed_frames_grouped(cv, entries, seam_scale, "strip")

    if use_tiled:
        frame_boxes = [(b[0] - x0, b[1] - y0, b[2] - x0, b[3] - y0)
                       for b in boxes]
        if return_device:
            # panorama stays in HBM (runtime/handoff.DeviceStrip): tiles
            # commit into a device canvas, ZERO pixel fetches here. Tiles
            # stay on the caller's current default device — strip-level
            # round-robin over the mesh is the parallel axis instead.
            from ..runtime.handoff import DeviceStrip
            with log.timer(stage, "tiled blend"):
                dev_out, bbox = B.mb_compose_tiled(
                    canvas_h, canvas_w, bands, frame_boxes, feed_roi,
                    feed_tile_many=(feed_many if uniform else None),
                    want_bbox=True, assemble="device")
            if bbox is None:
                raise StripStitchError(f"{stage}: blended canvas is empty")
            return DeviceStrip(dev_out, bbox)
        with log.timer(stage, "tiled blend"):
            out, bbox = B.mb_compose_tiled(
                canvas_h, canvas_w, bands, frame_boxes, feed_roi,
                devices=(list(mesh.devices.flat) if mesh is not None
                         else None),
                feed_tile_many=(feed_many if uniform else None),
                want_bbox=True)
        # autocrop via the per-tile device content flags: a pure numpy
        # slice here, and the app's auto_crop_black_border becomes a
        # border check instead of a 1-core gray pass over ~60 MP that
        # serialized against the background JPEG encoder
        if bbox is not None and bbox != (0, canvas_h, 0, canvas_w):
            by0, by1, bx0, bx1 = bbox
            out = np.ascontiguousarray(out[by0:by1, bx0:bx1])
        return out

    with log.timer(stage, "blend"):
        canvas = B.mb_prepare(canvas_h, canvas_w, bands)
        for i in range(n):
            canvas = feed_roi(canvas, i, 0, 0,
                              canvas.wacc[0].shape[0],
                              canvas.wacc[0].shape[1])
        out, valid = B.mb_blend(canvas, canvas_h, canvas_w)
        # same contract as the tiled path: the returned strip panorama is
        # autocropped (small canvases — the host gray pass is cheap here)
        from ..ops.crop import auto_crop_black_border
        return auto_crop_black_border(np.asarray(B.clip_u8(out)))


def stitch_strip(images: List[np.ndarray],
                 tuning: Optional[StitchTuning] = None,
                 stage: str = "Strip",
                 range_width_override: Optional[int] = None,
                 image_tags: Optional[Sequence[str]] = None,
                 matching_mask: Optional[np.ndarray] = None,
                 seed: int = 0, mesh=None, store=None,
                 indices: Optional[List[int]] = None,
                 return_device: bool = False):
    """Robust strip stitch with the reference's fallback ladder.

    Reference: stitchRobustly (stitch_robust.cpp:337-376): joint stitch
    first; on failure (and only when no matching mask was supplied,
    stitch_robust.cpp:360-364) fall back to sequential incremental
    stitching with an anchor window.

    ``return_device=True``: large panoramas come back as a
    runtime.handoff.DeviceStrip (HBM-resident; see compose_strip) —
    small/fallback results may still be host arrays, so callers handle
    both.
    """
    log = get_logger()
    tuning = tuning or StitchTuning()
    n = len(images) if images is not None else len(indices)
    if n == 0:
        raise StripStitchError(f"{stage}: need at least one image")
    if n == 1:
        return (images[0].copy() if images is not None
                else store.host_frame(indices[0]).copy())
    if image_tags:
        plan = ", ".join(f"{a}->{b}" for a, b in zip(image_tags,
                                                     image_tags[1:]))
        log.log(stage, "plan", pairs=plan)

    try:
        with log.timer(stage, "register"):
            kept, transforms, _ = estimate_strip_transforms(
                images, tuning, range_width_override, matching_mask, stage,
                seed, mesh, store=store, indices=indices)
        imgs = None if images is None else [images[i] for i in kept]
        if len(kept) < n:
            log.log(stage, "dropped weak frames",
                    dropped=[i for i in range(n) if i not in set(kept)])
        return compose_strip(imgs, transforms, tuning, stage, mesh=mesh,
                             store=store,
                             indices=([indices[i] for i in kept]
                                      if indices is not None else None),
                             return_device=return_device)
    except StripStitchError as err:
        log.log(stage, "joint stitch failed", error=str(err))
        if matching_mask is not None:
            raise  # reference: no fallback when a mask was supplied
        # the sequential fallback is UNCONDITIONAL on joint failure
        # (stitch_robust.cpp:366-375); use_anchor_fallback only gates the
        # anchor-batch attempt inside it (:297)
    log.log(stage, "falling back to sequential stitch")
    if images is None:
        # the sequential ladder works on host frames (mixed growing-
        # mosaic sizes); materialize them from the store
        images = [store.host_frame(i) for i in indices]
    return _stitch_sequential(images, tuning, stage, seed,
                              range_width_override)


def _pair_diagnostics_dump(left: np.ndarray, right: np.ndarray,
                           tuning: StitchTuning, stage: str,
                           idx: int) -> None:
    """Post-failure diagnostics on a bare pair (logPairDiagnostics analog,
    reference: stitch_robust.cpp:144-172,319-325): SIFT -> knn2(0.75) ->
    homography RANSAC(3.0), with kp counts for BOTH sides dumped."""
    from ..ops import ransac as R

    log = get_logger()
    try:
        feats, scale = detect_features([left, right], tuning.sift_features,
                                       tuning.registration_resol_mpx)
        m = M.knn2_ratio(feats.desc[0], feats.valid[0], feats.desc[1],
                         feats.valid[1], _LOWE_RATIO)
        src, dst, good = M.gather_correspondences(feats.xy[0], feats.xy[1],
                                                  m)
        ng = int(np.asarray(jnp.sum(good)))
        res = R.find_homography(src, dst, good, jax.random.PRNGKey(idx),
                                thresh=3.0 / max(scale, 1e-6))
        ni = int(res.n_inliers)
        okh = bool(res.ok)
        log.log(stage, "failure diagnostics", idx=idx,
                left=f"{left.shape}", right=f"{right.shape}",
                kp_left=int(np.asarray(feats.valid[0]).sum()),
                kp_right=int(np.asarray(feats.valid[1]).sum()),
                good_matches=f"{ng}(min={tuning.min_good_matches})",
                model=("failed" if not okh else
                       f"inliers/good_matches={ni}/{ng}"
                       f"(min={tuning.min_inliers})"))
    except Exception as diag_err:  # diagnostics must never mask the error
        log.log(stage, "failure diagnostics unavailable",
                error=str(diag_err))


def _stitch_sequential(images: List[np.ndarray], tuning: StitchTuning,
                       stage: str, seed: int,
                       range_width_override: Optional[int] = None
                       ) -> np.ndarray:
    """Left-fold incremental stitch with a sliding anchor window.

    Reference: stitchSequentially (stitch_robust.cpp:273-334): anchors seed
    with the FIRST image (:285); try an anchor batch
    [current, anchors..., next] with local range width
    max(2, min(len(batch), range_width)) (:305-310), then the bare pair;
    on total step failure dump pair diagnostics for [current, next]
    (:319-325) and abort.
    """
    from collections import deque

    log = get_logger()
    current = images[0]
    anchors: deque = deque([images[0]], maxlen=max(1, tuning.anchor_window))
    rw = (range_width_override if range_width_override
          and range_width_override > 0 else tuning.range_width)
    for i in range(1, len(images)):
        batch = None
        if tuning.use_anchor_fallback and anchors:
            batch = [current, *list(anchors), images[i]]
        done = False
        attempts = ([batch] if batch else []) + [[current, images[i]]]
        for attempt, imgs in enumerate(attempts):
            local_rw = (max(2, min(len(imgs), rw)) if len(imgs) > 2
                        else rw)
            try:
                kept, transforms, _ = estimate_strip_transforms(
                    imgs, tuning, range_width=local_rw,
                    stage=f"{stage}/seq{i}", seed=seed + i)
                current = compose_strip([imgs[k] for k in kept], transforms,
                                        tuning, f"{stage}/seq{i}")
                done = True
                break
            except StripStitchError as err:
                log.log(f"{stage}/seq{i}", "attempt failed",
                        attempt=attempt, n_images=len(imgs),
                        error=str(err))
                continue
        if not done:
            _pair_diagnostics_dump(current, images[i], tuning,
                                   f"{stage}/seq{i}", i)
            raise StripStitchError(
                f"{stage}: sequential stitch failed at frame {i}")
        anchors.append(images[i])
    return current
