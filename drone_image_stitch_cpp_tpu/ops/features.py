"""SIFT-class feature detection + 128-d descriptors, TPU-native.

Capability parity target: cv::SIFT::create(nfeatures) used throughout the
reference (stitch_robust.cpp:91,188; stitch_global.cpp:141;
visual_flight_grouper.cpp:122) — repeatable scale/rotation-invariant
keypoints with a per-image feature budget.

Architecture (TPU-first, NOT a port of OpenCV's dynamic-shape code):
  * fixed-capacity top-K keypoints per image + validity masks so every
    downstream consumer (matcher, RANSAC, bundle adjust) sees static shapes;
  * the scale-space (Gaussian + DoG stacks) is pure XLA convs (MXU-friendly);
  * extrema detection is a 3x3x3 max/min-pool + compare over the whole stack
    (vectorized, no per-pixel control flow);
  * sub-pixel refinement, orientation histograms, and descriptors run as
    vmapped per-candidate gather kernels (K candidates, static K).

Descriptor: Lowe/OpenCV-style 4x4 spatial x 8 orientation bins computed by
iterating the NATIVE pixels of one contiguous support-patch slice and
soft-assigning each into rotated bins (trilinear hats) — no rotated
resampling, hence no in-patch gathers; the accumulation is 16 masked
vector-matrix products. Descriptors are L2-normalized, clipped at 0.2,
renormalized, scaled by 512 (OpenCV's distance scale).

Note: orientation assignment keeps a single dominant peak per keypoint
(OpenCV may emit multiple keypoints for secondary peaks >= 0.8*max; with a
fixed-K budget a single peak keeps shapes static; mosaic-level parity is the
metric, per-keypoint parity is not).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import gaussian_blur
from .resize import resize_linear

# --- constants (OpenCV SIFT-compatible where applicable) -------------------
_SIGMA0 = 1.6                 # base scale of octave layer 0
_INIT_SIGMA = 0.5             # assumed blur of the input image
_ORI_RADIUS_FACTOR = 4.5      # orientation patch radius = 4.5 * scale
_ORI_SIG_FACTOR = 1.5         # orientation gaussian sigma = 1.5 * scale
_ORI_BINS = 36
_DESC_D = 4                   # 4x4 spatial bins
_DESC_BINS = 8                # orientation bins
_DESC_SAMPLES = 16            # 16x16 sample grid
_DESC_HIST_WIDTH_FACTOR = 3.0  # bin width = 3 * scale (pixels)
_DESC_MAG_CLIP = 0.2
_DESC_SCALE = 512.0
_MAX_REFINE_ITERS = 5


class Features(NamedTuple):
    """Fixed-capacity keypoint set for one image (or a batch, leading dims)."""

    xy: jnp.ndarray        # (K, 2) float32 — x, y in input-image pixels
    sigma: jnp.ndarray     # (K,) float32 — scale in input-image pixels
    angle: jnp.ndarray     # (K,) float32 — orientation, radians, y-up
    response: jnp.ndarray  # (K,) float32 — |refined DoG contrast|
    desc: jnp.ndarray      # (K, 128) float32
    valid: jnp.ndarray     # (K,) bool


_MAX_OCTAVES = 4  # caps compile size; octave>=4 keypoints are rare and
                  # huge-scale (they contribute almost nothing to aerial
                  # registration at our working resolutions)


def num_octaves(h: int, w: int, upsample: bool) -> int:
    """Octave count from image size (OpenCV formula, capped)."""
    m = min(h, w) * (2 if upsample else 1)
    n = int(round(math.log2(max(m, 4)))) - 2
    return max(1, min(n, _MAX_OCTAVES))


def _layer_sigmas(n_layers: int) -> np.ndarray:
    """Incremental blur to go from layer i to layer i+1 within an octave."""
    k = 2.0 ** (1.0 / n_layers)
    sig = np.zeros(n_layers + 3, dtype=np.float64)
    sig[0] = _SIGMA0
    out = np.zeros(n_layers + 3, dtype=np.float64)
    for i in range(1, n_layers + 3):
        prev = _SIGMA0 * (k ** (i - 1))
        total = prev * k
        out[i] = math.sqrt(total * total - prev * prev)
    return out


def build_scale_space(img: jnp.ndarray, n_layers: int, n_oct: int,
                      upsample: bool):
    """Return per-octave (gauss_stack, dog_stack).

    gauss_stack: (n_layers+3, Ho, Wo); dog_stack: (n_layers+2, Ho, Wo).
    """
    h, w = img.shape
    x = img.astype(jnp.float32)
    if upsample:
        x = resize_linear(x, h * 2, w * 2)
        d = math.sqrt(max(_SIGMA0 ** 2 - (2 * _INIT_SIGMA) ** 2, 0.01))
    else:
        d = math.sqrt(max(_SIGMA0 ** 2 - _INIT_SIGMA ** 2, 0.01))
    base = gaussian_blur(x, d)
    incr = _layer_sigmas(n_layers)
    octaves = []
    for o in range(n_oct):
        layers = [base]
        for i in range(1, n_layers + 3):
            layers.append(gaussian_blur(layers[-1], float(incr[i])))
        g = jnp.stack(layers)
        dog = g[1:] - g[:-1]
        octaves.append((g, dog))
        base = layers[n_layers][::2, ::2]
    return octaves


# --------------------------------------------------------------------------
# candidate extraction
# --------------------------------------------------------------------------

def _extrema_candidates(dog: jnp.ndarray, prelim_thresh: float, k: int,
                        lim=None):
    """Top-k 3D extrema of a DoG stack (S, H, W) -> (idx (k,3), score, valid).

    A pixel is a candidate iff it equals the 3x3x3 neighborhood max (or min)
    and |value| exceeds the preliminary contrast threshold. Border layers /
    rows / cols are excluded so refinement gathers stay in-bounds.

    ``lim``: optional (2,) float (h_lim, w_lim) in octave pixels — pixels at
    or beyond it are excluded BEFORE the top-k, so padded image regions
    cannot consume the keypoint budget (batched detection pads frames to a
    shared bucket shape).
    """
    s, h, w = dog.shape
    mx = jax.lax.reduce_window(dog, -jnp.inf, jax.lax.max, (3, 3, 3),
                               (1, 1, 1), "SAME")
    mn = jax.lax.reduce_window(dog, jnp.inf, jax.lax.min, (3, 3, 3),
                               (1, 1, 1), "SAME")
    is_ext = ((dog >= mx) | (dog <= mn)) & (jnp.abs(dog) > prelim_thresh)
    # exclude borders (1 px + first/last layer), matching refinement bounds
    li = jax.lax.broadcasted_iota(jnp.int32, (s, h, w), 0)
    yi = jax.lax.broadcasted_iota(jnp.int32, (s, h, w), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (s, h, w), 2)
    border = ((li >= 1) & (li <= s - 2) & (yi >= 1) & (yi <= h - 2)
              & (xi >= 1) & (xi <= w - 2))
    if lim is not None:
        border &= ((yi.astype(jnp.float32) < lim[0])
                   & (xi.astype(jnp.float32) < lim[1]))
    score = jnp.where(is_ext & border, jnp.abs(dog), -1.0)
    flat = score.reshape(-1)
    k = min(k, flat.shape[0])  # tiny top octaves have fewer pixels than K
    if jax.default_backend() == "tpu" and flat.shape[0] > 4 * k:
        # exact top_k sorts the full octave (2.3M elements for a 0.45 MP
        # frame) and dominates the extrema stage on TPU; approx_max_k is
        # the TPU-native bucketed reduction. Candidates are thresholded
        # extrema far over-subscribing the budget, so ~2% recall loss on
        # the weakest candidates does not change the selected keypoints.
        top, idx = jax.lax.approx_max_k(flat, k, recall_target=0.98)
    else:
        top, idx = jax.lax.top_k(flat, k)
    ls = idx // (h * w)
    ys = (idx % (h * w)) // w
    xs = idx % w
    valid = top > 0.0
    return jnp.stack([ls, ys, xs], axis=-1).astype(jnp.int32), top, valid


def _dense_refine_fields(dog: jnp.ndarray, n_layers: int,
                         contrast_thresh: float, edge_thresh: float):
    """Dense per-pixel refinement fields over a DoG stack (S, H, W).

    TPU-first replacement for per-candidate (3,3,3) gather refinement:
    gathers run near one element/cycle on TPU (~80 ms per refine iteration
    for an 8-frame batch), while computing the Newton solve DENSELY at
    every pixel is pure VPU work that XLA fuses into a few HBM passes.

    Returns (jump, done, offx, offy, offl, contrast, gates):
      jump: (S*H*W,) int32 — flat index of the next iterate (self when
            converged or when the clipped step is a no-op);
      done: converged at this pixel (|offset| < 0.5 with a safe solve);
      offx/offy/offl: sub-pixel offset components at this pixel;
      contrast: c + 0.5 * g . offset;
      gates: contrast + edge-response tests (OpenCV's thresholds).
    """
    s, h, w = dog.shape

    # one zero-padded copy + static slices: every shifted "copy" below is
    # a view of this buffer that XLA fuses into the elementwise Newton
    # graph. (jnp.roll lowers to per-axis concatenates that materialize
    # ~20 full-stack intermediates — 3x the HBM traffic for this stage.)
    # Border pixels read zeros instead of wrapped values, but candidates
    # and jump targets are clipped to the interior, where all 27 taps hit
    # real data — consumed values are identical.
    padded = jnp.pad(dog, ((1, 1), (1, 1), (1, 1)))

    def sh(_a, dl, dy, dx):
        return jax.lax.slice(padded, (1 + dl, 1 + dy, 1 + dx),
                             (1 + dl + s, 1 + dy + h, 1 + dx + w))

    c = dog
    gx = 0.5 * (sh(c, 0, 0, 1) - sh(c, 0, 0, -1))
    gy = 0.5 * (sh(c, 0, 1, 0) - sh(c, 0, -1, 0))
    gl = 0.5 * (sh(c, 1, 0, 0) - sh(c, -1, 0, 0))
    dxx = sh(c, 0, 0, 1) + sh(c, 0, 0, -1) - 2 * c
    dyy = sh(c, 0, 1, 0) + sh(c, 0, -1, 0) - 2 * c
    dss = sh(c, 1, 0, 0) + sh(c, -1, 0, 0) - 2 * c
    dxy = 0.25 * (sh(c, 0, 1, 1) - sh(c, 0, 1, -1)
                  - sh(c, 0, -1, 1) + sh(c, 0, -1, -1))
    dxs = 0.25 * (sh(c, 1, 0, 1) - sh(c, 1, 0, -1)
                  - sh(c, -1, 0, 1) + sh(c, -1, 0, -1))
    dys = 0.25 * (sh(c, 1, 1, 0) - sh(c, 1, -1, 0)
                  - sh(c, -1, 1, 0) + sh(c, -1, -1, 0))

    # adjugate solve of [dxx dxy dxs; dxy dyy dys; dxs dys dss] off = -g
    co00 = dyy * dss - dys * dys
    co01 = dxs * dys - dxy * dss
    co02 = dxy * dys - dxs * dyy
    co11 = dxx * dss - dxs * dxs
    co12 = dxy * dxs - dxx * dys
    co22 = dxx * dyy - dxy * dxy
    det = dxx * co00 + dxy * co01 + dxs * co02
    safe = jnp.abs(det) > 1e-10
    inv_det = -1.0 / jnp.where(safe, det, 1.0)
    offx = jnp.where(safe, (co00 * gx + co01 * gy + co02 * gl) * inv_det,
                     10.0)
    offy = jnp.where(safe, (co01 * gx + co11 * gy + co12 * gl) * inv_det,
                     10.0)
    offl = jnp.where(safe, (co02 * gx + co12 * gy + co22 * gl) * inv_det,
                     10.0)

    done = ((jnp.abs(offx) < 0.5) & (jnp.abs(offy) < 0.5)
            & (jnp.abs(offl) < 0.5) & safe)

    li = jax.lax.broadcasted_iota(jnp.int32, (s, h, w), 0)
    yi = jax.lax.broadcasted_iota(jnp.int32, (s, h, w), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (s, h, w), 2)
    xn = jnp.clip(xi + jnp.round(offx).astype(jnp.int32), 1, w - 2)
    yn = jnp.clip(yi + jnp.round(offy).astype(jnp.int32), 1, h - 2)
    ln = jnp.clip(li + jnp.round(offl).astype(jnp.int32), 1, s - 2)
    jump = jnp.where(done, li * (h * w) + yi * w + xi,
                     ln * (h * w) + yn * w + xn).reshape(-1)

    contrast = c + 0.5 * (gx * offx + gy * offy + gl * offl)
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    r = edge_thresh
    gates = ((jnp.abs(contrast) * n_layers >= contrast_thresh)
             & (det2 > 0) & (tr * tr * r < (r + 1) * (r + 1) * det2)
             & (jnp.abs(offx) < 1.5) & (jnp.abs(offy) < 1.5)
             & (jnp.abs(offl) < 1.5))
    return (jump, done.reshape(-1), offx.reshape(-1), offy.reshape(-1),
            offl.reshape(-1), contrast.reshape(-1), gates.reshape(-1))


def _refine_dense(dog: jnp.ndarray, cand: jnp.ndarray, n_layers: int,
                  contrast_thresh: float, edge_thresh: float):
    """Refine all candidates via the dense jump field (same iteration as
    ``_refine_one``, expressed as 5 single-element pointer chases).

    ``cand``: (K, 3) int32 (layer, y, x). Returns (lf, yf, xf, contrast,
    ok) each (K,).
    """
    s, h, w = dog.shape
    jump, done, offx, offy, offl, contrast, gates = _dense_refine_fields(
        dog, n_layers, contrast_thresh, edge_thresh)
    p = cand[:, 0] * (h * w) + cand[:, 1] * w + cand[:, 2]
    for _ in range(_MAX_REFINE_ITERS):
        p = jnp.take(jump, p)
    ok = jnp.take(done, p) & jnp.take(gates, p)
    ox = jnp.take(offx, p)
    oy = jnp.take(offy, p)
    ol = jnp.take(offl, p)
    li = p // (h * w)
    yi = (p % (h * w)) // w
    xi = p % w
    lf = li.astype(jnp.float32) + jnp.where(ok, ol, 0.0)
    yf = yi.astype(jnp.float32) + jnp.where(ok, oy, 0.0)
    xf = xi.astype(jnp.float32) + jnp.where(ok, ox, 0.0)
    return lf, yf, xf, jnp.abs(jnp.take(contrast, p)), ok


def _gather_cube(dog: jnp.ndarray, s: jnp.ndarray, y: jnp.ndarray,
                 x: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3) neighborhood around (s, y, x) via one contiguous slice.

    Candidates and refinement moves are confined to the interior (1-px
    border excluded), so the clamped start never actually shifts.
    """
    s0 = jnp.clip(s - 1, 0, dog.shape[0] - 3)
    y0 = jnp.clip(y - 1, 0, dog.shape[1] - 3)
    x0 = jnp.clip(x - 1, 0, dog.shape[2] - 3)
    return jax.lax.dynamic_slice(dog, (s0, y0, x0), (3, 3, 3))


def _refine_one(dog: jnp.ndarray, cand: jnp.ndarray, n_layers: int,
                contrast_thresh: float, edge_thresh: float):
    """Iterative sub-pixel refinement of one candidate (OpenCV-style).

    Returns (layer f32, y f32, x f32, contrast, ok).
    """
    s0, y0, x0 = cand[0], cand[1], cand[2]
    smax = dog.shape[0] - 2
    ymax = dog.shape[1] - 2
    xmax = dog.shape[2] - 2

    def deriv(cube):
        g = jnp.stack([
            0.5 * (cube[1, 1, 2] - cube[1, 1, 0]),   # d/dx
            0.5 * (cube[1, 2, 1] - cube[1, 0, 1]),   # d/dy
            0.5 * (cube[2, 1, 1] - cube[0, 1, 1]),   # d/ds
        ])
        c = cube[1, 1, 1]
        dxx = cube[1, 1, 2] + cube[1, 1, 0] - 2 * c
        dyy = cube[1, 2, 1] + cube[1, 0, 1] - 2 * c
        dss = cube[2, 1, 1] + cube[0, 1, 1] - 2 * c
        dxy = 0.25 * (cube[1, 2, 2] - cube[1, 2, 0]
                      - cube[1, 0, 2] + cube[1, 0, 0])
        dxs = 0.25 * (cube[2, 1, 2] - cube[2, 1, 0]
                      - cube[0, 1, 2] + cube[0, 1, 0])
        dys = 0.25 * (cube[2, 2, 1] - cube[2, 0, 1]
                      - cube[0, 2, 1] + cube[0, 0, 1])
        hess = jnp.asarray([[dxx, dxy, dxs],
                            [dxy, dyy, dys],
                            [dxs, dys, dss]])
        return g, hess, c, dxx, dyy, dxy

    def solve3(hess, rhs):
        """Closed-form (adjugate) 3x3 solve: far lighter to compile and run
        than linalg.solve inside a K-way vmap."""
        a, b, c = hess[0, 0], hess[0, 1], hess[0, 2]
        d, e, f = hess[1, 0], hess[1, 1], hess[1, 2]
        g_, h_, i_ = hess[2, 0], hess[2, 1], hess[2, 2]
        co00 = e * i_ - f * h_
        co01 = c * h_ - b * i_
        co02 = b * f - c * e
        co10 = f * g_ - d * i_
        co11 = a * i_ - c * g_
        co12 = c * d - a * f
        co20 = d * h_ - e * g_
        co21 = b * g_ - a * h_
        co22 = a * e - b * d
        det = a * co00 + b * co10 + c * co20
        sol = jnp.stack([
            co00 * rhs[0] + co01 * rhs[1] + co02 * rhs[2],
            co10 * rhs[0] + co11 * rhs[1] + co12 * rhs[2],
            co20 * rhs[0] + co21 * rhs[1] + co22 * rhs[2],
        ])
        return sol, det

    def body(_, st):
        s, y, x, off, conv = st
        cube = _gather_cube(dog, s, y, x)
        g, hess, _, _, _, _ = deriv(cube)
        sol, det = solve3(hess, g)
        safe = jnp.abs(det) > 1e-10
        new_off = jnp.where(
            safe, -sol / jnp.where(safe, det, 1.0), 10.0)
        done = jnp.all(jnp.abs(new_off) < 0.5) & safe
        step = jnp.where(conv, 0, jnp.round(new_off).astype(jnp.int32))
        sn = jnp.clip(x + step[0], 1, xmax)
        yn = jnp.clip(y + step[1], 1, ymax)
        ln = jnp.clip(s + step[2], 1, smax)
        return (jnp.where(conv | done, s, ln),
                jnp.where(conv | done, y, yn),
                jnp.where(conv | done, x, sn),
                jnp.where(conv, off, new_off),
                conv | done)

    init = (s0, y0, x0, jnp.zeros(3, jnp.float32), jnp.asarray(False))
    s, y, x, off, conv = jax.lax.fori_loop(0, _MAX_REFINE_ITERS, body, init)

    cube = _gather_cube(dog, s, y, x)
    g, hess, c, dxx, dyy, dxy = deriv(cube)
    contrast = c + 0.5 * jnp.dot(g, off)
    ok = conv
    ok &= jnp.abs(contrast) * n_layers >= contrast_thresh
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    r = edge_thresh
    ok &= (det2 > 0) & (tr * tr * r < (r + 1) * (r + 1) * det2)
    xf = x.astype(jnp.float32) + off[0]
    yf = y.astype(jnp.float32) + off[1]
    lf = s.astype(jnp.float32) + off[2]
    ok &= (jnp.abs(off) < 1.5).all()
    return lf, yf, xf, jnp.abs(contrast), ok


# --------------------------------------------------------------------------
# orientation
# --------------------------------------------------------------------------

def _orientation_one(gauss: jnp.ndarray, layer: jnp.ndarray, y: jnp.ndarray,
                     x: jnp.ndarray, scale: jnp.ndarray,
                     patch_r: int) -> jnp.ndarray:
    """Dominant gradient orientation (radians, y-up) for one keypoint.

    ``gauss``: (S, H, W) octave Gaussian stack; coordinates in octave pixels.
    Histogram = 36 bins, gaussian-weighted magnitudes within radius
    4.5*scale, smoothed with the [1,4,6,4,1]/16 circular kernel; dominant
    peak refined by parabolic interpolation.

    TPU note: the patch is fetched as ONE contiguous dynamic_slice per
    keypoint (vmapped slices vectorize; per-element gathers at K x 35 x 35
    indices dominated the whole detector). Border keypoints get a clamped
    (shifted) slice; all weights/masks use the actual slice coordinates.
    The histogram is 36 masked reductions — no scatter, no (P,P,36) one-hot.
    """
    h, w = gauss.shape[1], gauss.shape[2]
    # +1 ring for central differences; tiny top octaves clamp to image size
    p2 = min(2 * patch_r + 3, h, w)
    radius = jnp.round(_ORI_RADIUS_FACTOR * scale)
    xi = jnp.round(x).astype(jnp.int32)
    yi = jnp.round(y).astype(jnp.int32)
    li = jnp.clip(layer, 0, gauss.shape[0] - 1)
    y0 = jnp.clip(yi - patch_r - 1, 0, h - p2)
    x0 = jnp.clip(xi - patch_r - 1, 0, w - p2)
    patch = jax.lax.dynamic_slice(gauss, (li, y0, x0), (1, p2, p2))[0]
    gx = 0.5 * (patch[1:-1, 2:] - patch[1:-1, :-2])
    gy = 0.5 * (patch[:-2, 1:-1] - patch[2:, 1:-1])  # y-up
    # actual offsets of the gradient grid relative to the keypoint
    gy_rows = (y0 + 1 + jnp.arange(p2 - 2)) - yi
    gx_cols = (x0 + 1 + jnp.arange(p2 - 2)) - xi
    dy_off = gy_rows[:, None].astype(jnp.float32)
    dx_off = gx_cols[None, :].astype(jnp.float32)
    inb = ((jnp.abs(dy_off) <= radius) & (jnp.abs(dx_off) <= radius))
    mag = jnp.sqrt(gx * gx + gy * gy)
    sig = _ORI_SIG_FACTOR * scale
    wgt = jnp.exp(-(dy_off ** 2 + dx_off ** 2) / (2.0 * sig * sig))
    contrib = jnp.where(inb, mag * wgt, 0.0)
    ang = jnp.arctan2(gy, gx)  # y-up, [-pi, pi]
    binf = (ang / (2.0 * jnp.pi)) * _ORI_BINS
    bini = jnp.round(binf).astype(jnp.int32) % _ORI_BINS
    hist = jnp.stack([jnp.sum(jnp.where(bini == b, contrib, 0.0))
                      for b in range(_ORI_BINS)])
    # circular smooth [1,4,6,4,1]/16
    hs = (jnp.roll(hist, 2) + jnp.roll(hist, -2)
          + 4.0 * (jnp.roll(hist, 1) + jnp.roll(hist, -1))
          + 6.0 * hist) / 16.0
    b = jnp.argmax(hs)
    l_ = hs[(b - 1) % _ORI_BINS]
    c_ = hs[b]
    r_ = hs[(b + 1) % _ORI_BINS]
    denom = l_ - 2.0 * c_ + r_
    interp = jnp.where(jnp.abs(denom) > 1e-12,
                       0.5 * (l_ - r_) / jnp.where(
                           jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
    bin_pos = (b.astype(jnp.float32) + interp) % _ORI_BINS
    return bin_pos * (2.0 * jnp.pi / _ORI_BINS)


# --------------------------------------------------------------------------
# descriptor
# --------------------------------------------------------------------------
def _spatial_weights(n: int = _DESC_SAMPLES, d: int = _DESC_D) -> np.ndarray:
    """Fixed (n*n, d*d) trilinear-spatial x gaussian weight matrix."""
    step = d / float(n)  # bin units per sample
    coords = (np.arange(n) + 0.5) * step - 0.5  # bin coordinate of sample
    exp_scale = -2.0 / (d * d)  # OpenCV: -1/(d*d*0.5)
    w = np.zeros((n * n, d * d), dtype=np.float32)
    for iy in range(n):
        for ix in range(n):
            rb, cb = coords[iy], coords[ix]
            # gaussian in bin units, centered
            rc = rb - (d - 1) / 2.0
            cc = cb - (d - 1) / 2.0
            g = math.exp((rc * rc + cc * cc) * exp_scale)
            for by in range(d):
                for bx in range(d):
                    wy = max(0.0, 1.0 - abs(rb - by))
                    wx = max(0.0, 1.0 - abs(cb - bx))
                    w[iy * n + ix, by * d + bx] = g * wy * wx
    return w


_DESC_PATCH_R = 39  # covers hist_width*sqrt(2)*(d+1)/2 ~= 10.6*sigma_max


def _descriptor_one(gauss: jnp.ndarray, layer: jnp.ndarray, y: jnp.ndarray,
                    x: jnp.ndarray, scale: jnp.ndarray,
                    angle: jnp.ndarray) -> jnp.ndarray:
    """128-d descriptor, one keypoint — OpenCV-style native-pixel binning.

    TPU design: one contiguous dynamic_slice fetches the support patch;
    gradients come from static shifts of that patch; each NATIVE pixel is
    soft-assigned to rotated spatial bins and orientation bins (trilinear
    hats), so there is no rotated resampling and therefore no in-patch
    gather at all. The (4x4 spatial) x (8 orientation) accumulation is 16
    masked vector-matrix products — MXU/VPU work.
    """
    h, w = gauss.shape[1], gauss.shape[2]
    d = _DESC_D
    hist_width = _DESC_HIST_WIDTH_FACTOR * scale
    ca = jnp.cos(angle)
    sa = jnp.sin(angle)
    li = jnp.clip(layer, 0, gauss.shape[0] - 1)

    # tiny top octaves clamp the patch to the octave's min dim: keypoints
    # whose support exceeds it get a TRUNCATED descriptor here, while the
    # Pallas kernel's (96, 128) window covers the full support — for
    # sigma ~> 6 full-res px the two backends legitimately diverge (the
    # kernel is the more OpenCV-faithful one); see tests/test_pallas_sift
    pd = min(2 * _DESC_PATCH_R + 3, h, w)
    py0 = jnp.clip(jnp.round(y).astype(jnp.int32) - _DESC_PATCH_R - 1, 0,
                   h - pd)
    px0 = jnp.clip(jnp.round(x).astype(jnp.int32) - _DESC_PATCH_R - 1, 0,
                   w - pd)
    sup = jax.lax.dynamic_slice(gauss, (li, py0, px0), (1, pd, pd))[0]

    gx = 0.5 * (sup[1:-1, 2:] - sup[1:-1, :-2])
    gy = 0.5 * (sup[:-2, 1:-1] - sup[2:, 1:-1])  # y-up
    mag = jnp.sqrt(gx * gx + gy * gy)
    theta = jnp.arctan2(gy, gx)  # y-up

    # native-pixel offsets from the (sub-pixel) keypoint position
    rows = (py0 + 1 + jnp.arange(pd - 2)).astype(jnp.float32)
    colsx = (px0 + 1 + jnp.arange(pd - 2)).astype(jnp.float32)
    dx = colsx[None, :] - x
    dy_down = rows[:, None] - y
    # rotate into the keypoint frame (angle is y-up)
    u = (ca * dx - sa * dy_down) / hist_width   # along orientation
    v = (sa * dx + ca * dy_down) / hist_width   # perpendicular (y-down)
    rbin = v + (d - 1) / 2.0
    cbin = u + (d - 1) / 2.0

    obin = ((theta - angle) / (2.0 * jnp.pi)) * _DESC_BINS
    obin = jnp.mod(obin, _DESC_BINS)

    # gaussian window + support mask (OpenCV exp_scale = -2/d^2 in bin u)
    gw = jnp.exp(-(u * u + v * v) * (2.0 / (d * d)))
    inside = ((rbin > -1.0) & (rbin < d) & (cbin > -1.0) & (cbin < d))
    m = jnp.where(inside, mag * gw, 0.0).reshape(-1)

    rb = rbin.reshape(-1)
    cb = cbin.reshape(-1)
    ob = obin.reshape(-1)
    # orientation hats with circular distance: (P, 8)
    odiff = jnp.abs(ob[:, None] - jnp.arange(_DESC_BINS,
                                             dtype=jnp.float32))
    wo = jnp.maximum(0.0, 1.0 - jnp.minimum(odiff, _DESC_BINS - odiff))

    # accumulate as d row-bin passes of one (d, P)x(P, 8) matmul each:
    # half the memory passes of 16 separate masked vector dots, and the
    # contraction runs on the MXU
    wx_all = jnp.maximum(
        0.0, 1.0 - jnp.abs(cb[:, None]
                           - jnp.arange(d, dtype=jnp.float32)))  # (P, 4)
    descs = []
    for by in range(d):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(rb - by)) * m
        z = wx_all * wy[:, None]                                 # (P, 4)
        descs.append(jnp.dot(z.T, wo,
                             preferred_element_type=jnp.float32))  # (4, 8)
    desc = jnp.concatenate(descs).reshape(-1)
    nrm = jnp.sqrt(jnp.sum(desc * desc) + 1e-12)
    desc = jnp.minimum(desc / nrm, _DESC_MAG_CLIP)
    nrm2 = jnp.sqrt(jnp.sum(desc * desc) + 1e-12)
    return jnp.minimum(desc / nrm2 * _DESC_SCALE, 255.0)


def mirror_features(feats: Features, width) -> Features:
    """Exact horizontal-flip transport of a feature set.

    Replaces re-detecting SIFT on the flipped image for the reversed-strip
    hypothesis (reference: stitch_global.cpp:401-421 re-runs the whole
    estimator on cv::flip'd strips): with our own descriptor layout the
    flipped image's features are a closed-form permutation of the
    original's. Derivation (horizontal flip x' = w-1-x):
      * gradients: gx' = -gx, gy' = gy, so theta' = pi - theta and the
        dominant orientation maps angle' = pi - angle (the 36-bin histogram
        mirrors exactly; smoothing and parabolic peak refine are symmetric);
      * descriptor frame: u' = u, v' = -v, obin' = -obin (mod 8), so
        desc'[by, bx, ob] = desc[D-1-by, bx, (8-ob) % 8] on the
        (row=4, col=4, ori=8) bin grid;
      * the DoG stacks/extrema/refinement are flip-equivariant (symmetric
        kernels), so the keypoint set maps to (w-1-x, y) with identical
        sigma/response.
    ``width`` is the true image width in the same (full-res) coordinate
    space as ``feats.xy``. Works for any leading batch dims.
    """
    xy = jnp.stack([jnp.asarray(width, jnp.float32) - 1.0
                    - feats.xy[..., 0], feats.xy[..., 1]], axis=-1)
    angle = jnp.mod(jnp.pi - feats.angle, 2.0 * jnp.pi)
    lead = feats.desc.shape[:-1]
    d = feats.desc.reshape(*lead, _DESC_D, _DESC_D, _DESC_BINS)
    d = d[..., ::-1, :, :]                                   # by -> D-1-by
    d = jnp.concatenate([d[..., :1], d[..., 1:][..., ::-1]],
                        axis=-1)                             # ob -> -ob mod 8
    return feats._replace(xy=xy, angle=angle,
                          desc=d.reshape(*lead, _DESC_D * _DESC_D
                                         * _DESC_BINS))


# --------------------------------------------------------------------------
# top-level detect + describe
# --------------------------------------------------------------------------

def detect_and_describe(img: jnp.ndarray, max_kp: int,
                        contrast_thresh: float = 0.04,
                        edge_thresh: float = 10.0,
                        n_layers: int = 3,
                        upsample: bool = False,
                        true_hw=None) -> Features:
    """Detect up to ``max_kp`` keypoints and compute descriptors.

    ``img``: (H, W) float32 grayscale in [0, 255]. Returns Features with
    static shapes (max_kp rows; invalid rows masked). ``true_hw``: optional
    (2,) int/float array with the true (h, w) when ``img`` carries padding
    to a bucket shape — candidates in the pad region are excluded before
    any budget selection.
    """
    h, w = img.shape
    n_oct = num_octaves(h, w, upsample)
    prelim = 0.5 * contrast_thresh / n_layers * 255.0
    contrast_abs = contrast_thresh * 255.0
    octs = build_scale_space(img, n_layers, n_oct, upsample)
    scale0 = 0.5 if upsample else 1.0

    per_oct = []
    # orientation patch radius for the largest within-octave scale
    sig_max = _SIGMA0 * 2.0 ** ((n_layers + 0.5) / n_layers)
    patch_r = int(math.ceil(_ORI_RADIUS_FACTOR * sig_max))
    for o, (g, dog) in enumerate(octs):
        # higher octaves hold quadratically fewer pixels -> smaller budget
        # (shrinks both the compiled graph and the per-call gather volume)
        k_oct = max(max_kp >> o, min(128, max_kp))
        mult_o = scale0 * (2.0 ** o)
        lim = (jnp.asarray(true_hw, jnp.float32) / mult_o
               if true_hw is not None else None)
        cand, _, cvalid = _extrema_candidates(dog, prelim, k_oct, lim)
        lf, yf, xf, resp, ok = _refine_dense(dog, cand, n_layers,
                                             contrast_abs, edge_thresh)
        ok = ok & cvalid
        sig_loc = _SIGMA0 * 2.0 ** (lf / n_layers)
        li = jnp.clip(jnp.round(lf).astype(jnp.int32), 1, n_layers)
        ang = jax.vmap(
            lambda l_, y_, x_, s_: _orientation_one(g, l_, y_, x_, s_,
                                                    patch_r))(
            li, yf, xf, sig_loc)
        desc = jax.vmap(
            lambda l_, y_, x_, s_, a_: _descriptor_one(g, l_, y_, x_, s_,
                                                       a_))(
            li, yf, xf, sig_loc, ang)
        mult = scale0 * (2.0 ** o)
        xy = jnp.stack([xf, yf], axis=-1) * mult
        sigma = sig_loc * mult
        per_oct.append((xy, sigma, ang, resp, desc, ok))

    xy = jnp.concatenate([p[0] for p in per_oct])
    sigma = jnp.concatenate([p[1] for p in per_oct])
    ang = jnp.concatenate([p[2] for p in per_oct])
    resp = jnp.concatenate([p[3] for p in per_oct])
    desc = jnp.concatenate([p[4] for p in per_oct])
    ok = jnp.concatenate([p[5] for p in per_oct])

    return _select_top(xy, sigma, ang, resp, desc, ok, max_kp)


def _select_top(xy, sigma, ang, resp, desc, ok, max_kp: int) -> Features:
    """Top-max_kp by response over the concatenated octave candidates."""
    score = jnp.where(ok, resp, -1.0)
    k_sel = min(max_kp, score.shape[0])
    _, idx = jax.lax.top_k(score, k_sel)
    feats = Features(
        xy=xy[idx], sigma=sigma[idx], angle=ang[idx],
        response=resp[idx], desc=desc[idx],
        valid=ok[idx] & (score[idx] > 0.0))
    if k_sel < max_kp:  # pad to the static budget with invalid rows
        pad = max_kp - k_sel
        feats = Features(
            xy=jnp.pad(feats.xy, ((0, pad), (0, 0))),
            sigma=jnp.pad(feats.sigma, (0, pad)),
            angle=jnp.pad(feats.angle, (0, pad)),
            response=jnp.pad(feats.response, (0, pad)),
            desc=jnp.pad(feats.desc, ((0, pad), (0, 0))),
            valid=jnp.pad(feats.valid, (0, pad)))
    return feats


def detect_and_describe_batched(grays: jnp.ndarray, max_kp: int,
                                contrast_thresh: float = 0.04,
                                edge_thresh: float = 10.0,
                                n_layers: int = 3,
                                upsample: bool = False,
                                true_hw=None,
                                use_pallas: bool | None = None,
                                interpret: bool = False) -> Features:
    """Batched detect+describe over (B, H, W) frames.

    On TPU the orientation+descriptor stage runs as ONE fused Pallas kernel
    over all B*K keypoints per octave (ops/pallas_sift.py) instead of
    per-keypoint vmapped gathers; elsewhere it falls back to vmapping
    ``detect_and_describe``. ``true_hw``: optional (B, 2) true sizes when
    frames are padded to a bucket.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        if true_hw is None:
            return jax.vmap(lambda g: detect_and_describe(
                g, max_kp, contrast_thresh, edge_thresh, n_layers,
                upsample))(grays)
        return jax.vmap(lambda g, hw: detect_and_describe(
            g, max_kp, contrast_thresh, edge_thresh, n_layers, upsample,
            true_hw=hw))(grays, true_hw)

    from . import pallas_sift as PS

    b, h, w = grays.shape
    n_oct = num_octaves(h, w, upsample)
    prelim = 0.5 * contrast_thresh / n_layers * 255.0
    contrast_abs = contrast_thresh * 255.0
    scale0 = 0.5 if upsample else 1.0

    octs = jax.vmap(
        lambda im: build_scale_space(im, n_layers, n_oct, upsample))(grays)

    # phase 1: candidates + dense refinement per octave (descriptors NOT
    # yet computed — selection happens first, so the kernel only ever
    # describes the surviving max_kp keypoints per frame, roughly half
    # the candidate count, in ONE launch instead of one per octave)
    cand_fields = []     # per octave: (yf, xf, resp, ok, li, sig)
    for o, (g, dog) in enumerate(octs):
        # g: (B, S, Ho, Wo); dog: (B, S-1, Ho, Wo)
        k_oct = max(max_kp >> o, min(128, max_kp))
        mult_o = scale0 * (2.0 ** o)

        if true_hw is not None:
            lims = jnp.asarray(true_hw, jnp.float32) / mult_o     # (B, 2)
            cand, _, cvalid = jax.vmap(
                lambda d, l: _extrema_candidates(d, prelim, k_oct, l))(
                dog, lims)
        else:
            cand, _, cvalid = jax.vmap(
                lambda d: _extrema_candidates(d, prelim, k_oct))(dog)

        lf, yf, xf, resp, ok = jax.vmap(
            lambda d, c: _refine_dense(d, c, n_layers, contrast_abs,
                                       edge_thresh))(dog, cand)
        ok = ok & cvalid
        sig_loc = _SIGMA0 * 2.0 ** (lf / n_layers)
        li = jnp.clip(jnp.round(lf).astype(jnp.int32), 1, n_layers)
        cand_fields.append((yf, xf, resp, ok, li, sig_loc))

    n_layers_tot = n_layers + 3
    yf = jnp.concatenate([c[0] for c in cand_fields], axis=1)
    xf = jnp.concatenate([c[1] for c in cand_fields], axis=1)
    resp = jnp.concatenate([c[2] for c in cand_fields], axis=1)
    ok = jnp.concatenate([c[3] for c in cand_fields], axis=1)
    li = jnp.concatenate([c[4] for c in cand_fields], axis=1)
    sig = jnp.concatenate([c[5] for c in cand_fields], axis=1)
    oct_id = jnp.concatenate([
        jnp.full((b, c[0].shape[1]), o, jnp.int32)
        for o, c in enumerate(cand_fields)], axis=1)

    # phase 2: per-frame top-k selection by refined response
    score = jnp.where(ok, resp, -1.0)
    k_sel = min(max_kp, score.shape[1])
    top, idx = jax.lax.top_k(score, k_sel)              # (B, k_sel)

    def takei(a):
        return jnp.take_along_axis(a, idx, axis=1)

    yf_s, xf_s, resp_s, sig_s = takei(yf), takei(xf), takei(resp), takei(sig)
    li_s, oct_s = takei(li), takei(oct_id)
    valid_s = takei(ok) & (top > 0.0)

    # phase 3: ONE fused kernel launch over the selected keypoints.
    # All octave stacks pad (edge mode: flat content -> zero gradients)
    # to octave 0's aligned dims so one flat (B*NO*S, H, W) array serves
    # every keypoint; flat index = (b*NO + octave)*S + layer.
    h0p = max(PS.PR, -(-octs[0][0].shape[2] // 8) * 8)
    w0p = max(PS.PC, -(-octs[0][0].shape[3] // 128) * 128)
    gps = []
    for (g, _) in octs:
        ho, wo = g.shape[2], g.shape[3]
        gps.append(jnp.pad(
            g, ((0, 0), (0, 0), (0, h0p - ho), (0, w0p - wo)),
            mode="edge") if (h0p, w0p) != (ho, wo) else g)
    gauss_flat = jnp.stack(gps, axis=1).reshape(
        b * n_oct * n_layers_tot, h0p, w0p)
    frame = jnp.arange(b, dtype=jnp.int32)[:, None]
    flat_layer = (frame * n_oct + oct_s) * n_layers_tot + li_s
    # gradient bounds per keypoint = its octave's RAW dims: the vmapped
    # reference path clamps support patches at each octave array's edge,
    # so taps into the inter-octave pad (edge-replicated rows/cols with
    # nonzero cross-gradients) must be masked out here or descriptors of
    # keypoints near small-octave borders diverge from the XLA path
    own_h = jnp.asarray([g.shape[2] for g, _ in octs], jnp.float32)
    own_w = jnp.asarray([g.shape[3] for g, _ in octs], jnp.float32)
    ang_s, desc_s = PS.orientation_descriptor_flat(
        gauss_flat, flat_layer, yf_s, xf_s, sig_s,
        true_hw=(own_h[oct_s], own_w[oct_s]), interpret=interpret)

    mult = scale0 * (2.0 ** oct_s.astype(jnp.float32))
    xy_s = jnp.stack([xf_s, yf_s], axis=-1) * mult[..., None]
    feats = Features(xy=xy_s, sigma=sig_s * mult, angle=ang_s,
                     response=resp_s, desc=desc_s, valid=valid_s)
    if k_sel < max_kp:
        pad = max_kp - k_sel
        feats = Features(
            xy=jnp.pad(feats.xy, ((0, 0), (0, pad), (0, 0))),
            sigma=jnp.pad(feats.sigma, ((0, 0), (0, pad))),
            angle=jnp.pad(feats.angle, ((0, 0), (0, pad))),
            response=jnp.pad(feats.response, ((0, 0), (0, pad))),
            desc=jnp.pad(feats.desc, ((0, 0), (0, pad), (0, 0))),
            valid=jnp.pad(feats.valid, ((0, 0), (0, pad))))
    return feats
