"""Seam finding: dynamic-programming optimal seams on overlap regions.

Capability parity targets:
  - detail::DpSeamFinder(COLOR_GRAD) (reference: stitch_robust.cpp:207 strip
    pipeline; stitch_global.cpp:624-626 global fallback)
  - detail::GraphCutSeamFinder(COST_COLOR_GRAD) at <=8MP seam scale
    (reference: stitch_global.cpp:585-619). The DP seam below is the
    always-available path (the reference itself falls back to it on
    cv::Exception); a host graph-cut refinement can slot in behind the same
    interface.

TPU-first design: the forward DP recurrence over scanlines is a lax.scan
whose per-row body is a vectorized 3-neighbor min; backtracking is a reverse
scan with one dynamic gather per row. Cost = color difference + gradient
difference (COLOR_GRAD analog). The seam axis (per-row vertical seam vs
per-column horizontal seam) is a *static* argument decided by the caller
from transform geometry, so both variants are one transposed kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIGCOST = 1e7


def _color_grad_cost(img_a: jnp.ndarray, img_b: jnp.ndarray,
                     overlap: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel seam cost inside the overlap; huge elsewhere."""
    diff = jnp.sqrt(jnp.sum((img_a - img_b) ** 2, axis=-1) + 1e-6)
    ga = img_a.mean(axis=-1)
    gb = img_b.mean(axis=-1)

    def grad_mag(g):
        gx = jnp.zeros_like(g).at[:, 1:-1].set(
            0.5 * (g[:, 2:] - g[:, :-2]))
        gy = jnp.zeros_like(g).at[1:-1, :].set(
            0.5 * (g[2:, :] - g[:-2, :]))
        return jnp.abs(gx) + jnp.abs(gy)

    gdiff = jnp.abs(grad_mag(ga) - grad_mag(gb))
    cost = diff + gdiff
    return jnp.where(overlap, cost, _BIGCOST)


def _vertical_seam_path(cost: jnp.ndarray) -> jnp.ndarray:
    """Min-cost top-to-bottom path; returns per-row x index (H,) int32."""
    h, w = cost.shape
    inf = jnp.float32(3e38)

    def fwd(carry, row_cost):
        prev = carry
        left = jnp.concatenate([jnp.full((1,), inf), prev[:-1]])
        right = jnp.concatenate([prev[1:], jnp.full((1,), inf)])
        stacked = jnp.stack([left, prev, right])  # offsets -1, 0, +1
        best = jnp.min(stacked, axis=0)
        off = jnp.argmin(stacked, axis=0).astype(jnp.int8) - 1
        cur = row_cost + best
        return cur, (cur, off)

    init = cost[0]
    _, (acc, offs) = jax.lax.scan(fwd, init, cost[1:])
    acc = jnp.concatenate([cost[0][None], acc])      # (H, W)
    offs = jnp.concatenate([jnp.zeros((1, w), jnp.int8), offs])  # (H, W)

    x_end = jnp.argmin(acc[h - 1]).astype(jnp.int32)

    def bwd(x, row_off):
        x_prev = jnp.clip(x + row_off[x].astype(jnp.int32), 0, w - 1)
        return x_prev, x

    # walk rows H-1 .. 1; the final carry is row 0's x
    x0, xs_rev = jax.lax.scan(bwd, x_end, offs[::-1][:-1])
    xs = xs_rev[::-1]
    return jnp.concatenate([x0[None], xs])


@functools.partial(jax.jit, static_argnames=("axis",))
def pairwise_seam(img_a: jnp.ndarray, img_b: jnp.ndarray,
                  mask_a: jnp.ndarray, mask_b: jnp.ndarray,
                  axis: str = "vertical"):
    """Partition the overlap of two canvas-frame images with a DP seam.

    Jitted (one dispatch per call): eager execution pays ~80 ms of remote-
    relay overhead PER OP, ~2.4 s per pair.

    img_*: (H, W, 3) float32 (canvas frame, zeros outside masks)
    mask_*: (H, W) bool
    axis: "vertical" (one x per row; use when images are side-by-side) or
          "horizontal" (one y per column; stacked images). Static.

    Returns (new_mask_a, new_mask_b): disjoint on the overlap, unchanged
    elsewhere. If there is no overlap, masks pass through.
    """
    if axis == "horizontal":
        na, nb = pairwise_seam(
            jnp.swapaxes(img_a, 0, 1), jnp.swapaxes(img_b, 0, 1),
            jnp.swapaxes(mask_a, 0, 1), jnp.swapaxes(mask_b, 0, 1),
            axis="vertical")
        return jnp.swapaxes(na, 0, 1), jnp.swapaxes(nb, 0, 1)

    h, w = mask_a.shape
    overlap = mask_a & mask_b
    has_overlap = jnp.any(overlap)
    cost = _color_grad_cost(img_a, img_b, overlap)
    seam_x = _vertical_seam_path(cost)  # (H,)

    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # which side of the seam belongs to A: compare x-centroids of the masks
    ca = jnp.sum(xs * mask_a.astype(jnp.float32)) / jnp.maximum(
        mask_a.sum(), 1)
    cb = jnp.sum(xs * mask_b.astype(jnp.float32)) / jnp.maximum(
        mask_b.sum(), 1)
    a_left = ca <= cb
    left_of = xs <= seam_x[:, None]
    a_side = jnp.where(a_left, left_of, ~left_of)

    only_a = mask_a & ~mask_b
    only_b = mask_b & ~mask_a
    new_a = jnp.where(has_overlap, only_a | (overlap & a_side), mask_a)
    new_b = jnp.where(has_overlap, only_b | (overlap & ~a_side), mask_b)
    return new_a, new_b


def _gc_problem(a, b, ma, mb):
    """Build (cap_src, cap_snk, cap_h, cap_v) for one min-cut seam problem
    (COST_COLOR_GRAD analog), or None when no exclusive region anchors a
    terminal (fully nested masks — callers fall back to the DP seam)."""
    import numpy as np

    diff = np.sqrt(((a - b) ** 2).sum(-1) + 1e-6)
    gray_a = a.mean(-1)
    gray_b = b.mean(-1)

    def grad(g):
        gx = np.zeros_like(g)
        gy = np.zeros_like(g)
        gx[:, 1:-1] = 0.5 * np.abs(g[:, 2:] - g[:, :-2])
        gy[1:-1, :] = 0.5 * np.abs(g[2:, :] - g[:-2, :])
        return gx + gy

    gsum = grad(gray_a) + grad(gray_b)

    big = np.float32(1e8)
    cap_src = np.where(ma & ~mb, big, 0.0).astype(np.float32)
    cap_snk = np.where(mb & ~ma, big, 0.0).astype(np.float32)
    if cap_src.max() == 0.0 or cap_snk.max() == 0.0:
        return None
    # COST_COLOR_GRAD: color difference damped by local gradient so the
    # seam prefers running along real edges
    cost = (diff / (1.0 + 0.5 * gsum) + 1e-3).astype(np.float32)
    inb = (ma & mb).astype(np.float32)
    cap_h = ((cost[:, :-1] + cost[:, 1:]) * 0.5
             * np.maximum(inb[:, :-1], inb[:, 1:])).astype(np.float32)
    cap_v = ((cost[:-1, :] + cost[1:, :]) * 0.5
             * np.maximum(inb[:-1, :], inb[1:, :])).astype(np.float32)
    # outside-the-union pixels carry no edges
    union = (ma | mb).astype(np.float32)
    cap_h *= np.minimum(union[:, :-1], union[:, 1:])
    cap_v *= np.minimum(union[:-1, :], union[1:, :])
    return cap_src, cap_snk, cap_h, cap_v


def _seam_band(lab, band):
    """Bool mask of pixels within `band` px (chebyshev) of a label edge."""
    import numpy as np
    import cv2

    bm = np.zeros(lab.shape, np.uint8)
    dh = lab[:, :-1] != lab[:, 1:]
    bm[:, :-1] |= dh
    bm[:, 1:] |= dh
    dv = lab[:-1, :] != lab[1:, :]
    bm[:-1, :] |= dv
    bm[1:, :] |= dv
    k = 2 * band + 1
    return cv2.dilate(bm, np.ones((k, k), np.uint8)).astype(bool)


def _cut_touches(lab, pinned):
    """True when any label discontinuity has a pinned endpoint."""
    dh = lab[:, :-1] != lab[:, 1:]
    if (dh & (pinned[:, :-1] | pinned[:, 1:])).any():
        return True
    dv = lab[:-1, :] != lab[1:, :]
    return bool((dv & (pinned[:-1, :] | pinned[1:, :])).any())


def graphcut_pairwise_seam(img_a, img_b, mask_a, mask_b):
    """Min-cut seam on the overlap (GraphCutSeamFinder COST_COLOR_GRAD
    analog; reference: stitch_global.cpp:616-619).

    Host-side numpy + the native Boykov-Kolmogorov max-flow
    (native/graphcut.cpp). The cut is solved AT FULL SEAM RESOLUTION, like
    the reference (which min-cuts the whole <=8 MP seam canvas,
    stitch_global.cpp:585-619), via hierarchical banded refinement: a
    coarse solve picks the seam corridor, then an exact full-resolution
    re-solve runs with every pixel farther than the band from the coarse
    seam pinned to its coarse side. Pinning densifies the terminals, which
    is what makes BK fast here (sparse-terminal corridors make its search
    trees deep and adoption superlinear); on validation problems the banded
    cut is bit-identical to the direct full-res cut, and a band-touch check
    widens + re-solves once if the refined seam presses against the band
    wall.

    Returns (new_mask_a, new_mask_b) as numpy bool, or None when the native
    library is unavailable or there is no overlap — callers fall back to
    the DP seam, mirroring the reference's GraphCut -> DpSeamFinder ladder.
    """
    import numpy as np

    from ..utils.native import graphcut_native

    import cv2

    a = np.asarray(img_a, np.float32)
    b = np.asarray(img_b, np.float32)
    ma = np.asarray(mask_a, bool)
    mb = np.asarray(mask_b, bool)
    overlap = ma & mb
    if not overlap.any():
        return None
    ys, xs = np.where(ma | mb)
    y0, y1 = int(ys.min()), int(ys.max()) + 1
    x0, x1 = int(xs.min()), int(xs.max()) + 1
    a_, b_ = a[y0:y1, x0:x1], b[y0:y1, x0:x1]
    ma_, mb_ = ma[y0:y1, x0:x1], mb[y0:y1, x0:x1]

    # Solve the cut at the FULL seam resolution (like the reference's
    # GraphCutSeamFinder on the <=8 MP canvas). Above GC_COARSE_NODES the
    # cut is hierarchical: coarse solve -> pin far-from-seam pixels ->
    # exact full-res re-solve inside the band (see docstring).
    GC_COARSE_NODES = 100_000
    fh, fw = a_.shape[:2]
    full_ma, full_mb = ma_, mb_
    both_full = full_ma & full_mb
    if not both_full.any():
        return None
    if fh * fw <= GC_COARSE_NODES:
        prob = _gc_problem(a_, b_, ma_, mb_)
        if prob is None:
            return None
        labels = graphcut_native(*prob)
        if labels is None:
            return None
        lab = labels.astype(bool)
    else:
        sc = (GC_COARSE_NODES / float(fh * fw)) ** 0.5
        nh = max(2, int(fh * sc))
        nw = max(2, int(fw * sc))
        ac = cv2.resize(a_, (nw, nh), interpolation=cv2.INTER_AREA)
        bc = cv2.resize(b_, (nw, nh), interpolation=cv2.INTER_AREA)
        mac = cv2.resize(ma_.astype(np.uint8), (nw, nh),
                         interpolation=cv2.INTER_NEAREST).astype(bool)
        mbc = cv2.resize(mb_.astype(np.uint8), (nw, nh),
                         interpolation=cv2.INTER_NEAREST).astype(bool)
        if not (mac & mbc).any():
            return None
        prob_c = _gc_problem(ac, bc, mac, mbc)
        if prob_c is None:
            return None
        lab_c = graphcut_native(*prob_c)
        if lab_c is None:
            return None
        lab_up = cv2.resize(lab_c.astype(np.uint8), (fw, fh),
                            interpolation=cv2.INTER_NEAREST).astype(bool)
        prob_f = _gc_problem(a_, b_, ma_, mb_)
        if prob_f is None:
            return None
        cap_src, cap_snk, cap_h, cap_v = prob_f
        big = np.float32(1e8)
        # band wide enough to cover >=3 coarse pixels of NN quantization
        band = max(32, int(round(3.0 / sc)))
        lab = lab_up
        for attempt in range(2):
            in_band = _seam_band(lab_up, band)
            pin_a = both_full & ~in_band & lab_up
            pin_b = both_full & ~in_band & ~lab_up
            cs2 = cap_src.copy()
            ck2 = cap_snk.copy()
            cs2[pin_a] = big
            ck2[pin_b] = big
            labels = graphcut_native(cs2, ck2, cap_h, cap_v)
            if labels is None:
                return None
            lab = labels.astype(bool)
            # band-touch check: a label discontinuity adjacent to a pinned
            # pixel means the optimum pressed against the band wall; widen
            # once and re-solve (the coarse seam sits at the band center,
            # so an interior optimum never touches the pins)
            if attempt == 0 and _cut_touches(lab, pin_a | pin_b):
                band *= 2
                continue
            break
    new_a = ma.copy()
    new_b = mb.copy()
    na_ = (full_ma & ~full_mb) | (both_full & lab)
    nb_ = (full_mb & ~full_ma) | (both_full & ~lab)
    new_a[y0:y1, x0:x1] = na_
    new_b[y0:y1, x0:x1] = nb_
    return new_a, new_b


@jax.jit
def _bbox_reduce(mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Row/col occupancy vectors of one mask — tiny device-side footprint."""
    return mask.any(axis=1), mask.any(axis=0)


def _mask_bboxes(masks) -> list[tuple[int, int, int, int] | None]:
    """Bounding boxes for N same-shape canvas masks with ONE host fetch.

    Fetching each full seam-scale mask costs ~8 MB x N over the remote
    relay; reducing to (h,) + (w,) occupancy vectors on device and
    fetching the stacked pair once keeps the transfer in the kilobytes.
    """
    import numpy as np

    reduced = [_bbox_reduce(m) for m in masks]
    rows = np.asarray(jnp.stack([r for r, _ in reduced]))
    cols = np.asarray(jnp.stack([c for _, c in reduced]))
    boxes: list[tuple[int, int, int, int] | None] = []
    for r, c in zip(rows, cols):
        ys = np.flatnonzero(r)
        if ys.size == 0:
            boxes.append(None)
            continue
        xs = np.flatnonzero(c)
        boxes.append((int(ys[0]), int(ys[-1]) + 1,
                      int(xs[0]), int(xs[-1]) + 1))
    return boxes


def _align_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@jax.jit
def _clip_u8(img: jnp.ndarray) -> jnp.ndarray:
    """Round-and-saturate to uint8 on device before a host fetch."""
    return jnp.clip(jnp.round(img), 0.0, 255.0).astype(jnp.uint8)


def find_seams_sequential(images: list[jnp.ndarray],
                          masks: list[jnp.ndarray],
                          axes: list[str] | None = None,
                          method: str = "dp"):
    """Pairwise-sequential seam assignment over N canvas-frame images.

    Mirrors the pairwise strategy of OpenCV's seam finders: for each ordered
    pair (i, j), i < j, carve the overlap between the current masks. The
    caller supplies per-adjacent-pair seam axes (from transform geometry);
    non-adjacent pairs reuse the dominant axis.

    Overlap-aware scheduling (matching OpenCV, which only processes
    overlapping pairs on overlap ROIs — stitch_global.cpp:583-630): pairs
    whose mask bounding boxes do not intersect are skipped on the host, and
    the DP seam runs on the intersection bbox only (padded to a 64-px grid
    so jit recompiles stay bounded), not the whole canvas — without this a
    20-frame strip pays 190 full-canvas DP scans and a 200-frame sortie
    makes seams a top-line cost.

    ``method="graphcut"`` uses the native min-cut solver per pair and falls
    back to the DP seam when unavailable (the reference's ladder).
    """
    import numpy as np

    n = len(images)
    masks = list(masks)
    h, w = images[0].shape[:2]
    boxes = _mask_bboxes(masks)
    for i in range(n - 1):
        for j in range(i + 1, n):
            bi, bj = boxes[i], boxes[j]
            if bi is None or bj is None:
                continue
            y0 = max(bi[0], bj[0])
            y1 = min(bi[1], bj[1])
            x0 = max(bi[2], bj[2])
            x1 = min(bi[3], bj[3])
            if y0 >= y1 or x0 >= x1:
                continue  # bboxes disjoint -> no overlap, no work
            if method == "graphcut":
                # fetch only the UNION bbox of the two masks (the solver
                # needs the exclusive regions as terminals), bucketed to a
                # 256 grid to bound shape variants, and as UINT8 (the
                # float32 canvases are 4x the bytes; the min-cut costs are
                # insensitive to the <=0.5-level rounding) — fetching full
                # f32 canvases moved ~200 MB per pair over the remote relay
                uy0 = min(bi[0], bj[0])
                ux0 = min(bi[2], bj[2])
                uy1 = min(h, uy0 + _align_up(max(bi[1], bj[1]) - uy0, 256))
                ux1 = min(w, ux0 + _align_up(max(bi[3], bj[3]) - ux0, 256))
                usl = (slice(uy0, uy1), slice(ux0, ux1))
                got = graphcut_pairwise_seam(
                    np.asarray(_clip_u8(images[i][usl])),
                    np.asarray(_clip_u8(images[j][usl])),
                    np.asarray(masks[i][usl]), np.asarray(masks[j][usl]))
                if got is not None:
                    masks[i] = masks[i].at[usl].set(jnp.asarray(got[0]))
                    masks[j] = masks[j].at[usl].set(jnp.asarray(got[1]))
                    # boxes stay at their pre-carve extents (masks only
                    # shrink; see the DP note below)
                    continue
            ax = "vertical"
            if axes is not None:
                ax = axes[min(j - 1, len(axes) - 1)]
            # crop to the intersection bbox, bucketed to limit recompiles
            y1b = min(h, y0 + _align_up(y1 - y0, 64))
            x1b = min(w, x0 + _align_up(x1 - x0, 64))
            sl = (slice(y0, y1b), slice(x0, x1b))
            na, nb = pairwise_seam(
                images[i][sl], images[j][sl], masks[i][sl], masks[j][sl],
                axis=ax)
            masks[i] = masks[i].at[sl].set(na)
            masks[j] = masks[j].at[sl].set(nb)
            # boxes stay at their initial (pre-carve) extents: masks only
            # shrink, so the schedule is conservative-correct, and
            # recomputing would fetch the full mask from the device per
            # pair (~0.5 s each over the remote relay)
    return masks
