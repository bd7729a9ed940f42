"""Synthetic sortie generation with exact ground truth.

Shared by the test suite (tests/conftest.py) and bench.py: a textured fake
ortho image; boustrophedon sorties rendered as crops with known positions
(the reference ships no sample data — .gitignore excludes images/, SURVEY
section 4 — so all validation runs on synthetic ground truth).
"""

from __future__ import annotations

import numpy as np


def fractal_ortho(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Aperiodic multi-octave value-noise 'terrain' ortho (uint8-range f32).

    For LARGE sorties use this instead of ``synthetic_ortho``: the latter's
    sin/cos base has a constant phase across the whole image, so a big
    ortho contains near-identical texture every ~230 px and matchers can
    lock onto coherent WRONG offsets with inlier counts that pass every
    confidence gate (observed as false strip-pair models on the 200-frame
    sortie). Real aerial imagery — and this generator — has no such
    global periodicity.
    """
    import cv2

    r = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    for cell in (512, 128, 32, 8):
        gh = -(-h // cell) + 1
        gw = -(-w // cell) + 1
        amp = 90.0 * (cell / 512.0) ** 0.6
        grid = r.normal(0, 1.0, (gh, gw, 3)).astype(np.float32)
        up = cv2.resize(grid, (gw * cell, gh * cell),
                        interpolation=cv2.INTER_CUBIC)[:h, :w]
        img += amp * up
    img = 118.0 + img * 0.55
    # sharp man-made-ish rectangles: strong corners at SIFT scales
    for _ in range(max(600, h * w // 1300)):
        cy, cx = int(r.integers(0, h)), int(r.integers(0, w))
        rh_, rw_ = int(r.integers(3, 16)), int(r.integers(3, 16))
        col = r.uniform(0, 255, 3).astype(np.float32)
        y0, y1 = max(0, cy - rh_), min(h, cy + rh_)
        x0, x1 = max(0, cx - rw_), min(w, cx + rw_)
        img[y0:y1, x0:x1] = 0.35 * img[y0:y1, x0:x1] + 0.65 * col
    img += r.normal(0, 3.0, (h, w, 3)).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.float32)


def synthetic_ortho(h=768, w=1024, seed=0):
    """A textured 'ground truth ortho' image with structure at many scales.

    Used to render synthetic sorties: crops of this image related by known
    transforms give exact expected registration results. NOTE: the sin/cos
    base is globally periodic (~230 px) — fine at test sizes, but use
    ``fractal_ortho`` for sorties larger than a few frames per axis.
    """
    r = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    # low-frequency base
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for c in range(3):
        img[..., c] = (
            96 + 60 * np.sin(xx / (37 + 11 * c)) * np.cos(yy / (29 + 7 * c)))
    # mid-frequency blobs
    for _ in range(400):
        cy, cx = r.integers(0, h), r.integers(0, w)
        rad = int(r.integers(4, 24))
        col = r.uniform(0, 255, 3).astype(np.float32)
        y0, y1 = max(0, cy - rad), min(h, cy + rad)
        x0, x1 = max(0, cx - rad), min(w, cx + rad)
        py, px = np.mgrid[y0:y1, x0:x1]
        m = ((py - cy) ** 2 + (px - cx) ** 2) <= rad * rad
        img[y0:y1, x0:x1][m] = 0.5 * img[y0:y1, x0:x1][m] + 0.5 * col
    # sharp-cornered rectangles: strong DoG extrema at SIFT scales
    for _ in range(600):
        cy, cx = int(r.integers(0, h)), int(r.integers(0, w))
        rh_, rw_ = int(r.integers(3, 14)), int(r.integers(3, 14))
        col = r.uniform(0, 255, 3).astype(np.float32)
        y0, y1 = max(0, cy - rh_), min(h, cy + rh_)
        x0, x1 = max(0, cx - rw_), min(w, cx + rw_)
        img[y0:y1, x0:x1] = 0.35 * img[y0:y1, x0:x1] + 0.65 * col
    # band-limited texture that survives sigma~1.6 blur
    try:
        from scipy.ndimage import gaussian_filter
        bl = gaussian_filter(r.normal(0, 1.0, (h, w)), 2.5) * 55.0
        img += bl[..., None].astype(np.float32)
    except ImportError:
        pass
    img += r.normal(0, 4.0, (h, w, 3)).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.float32)


def render_sortie(ortho, rows, cols, frame_h=160, frame_w=208,
                  overlap=0.5, y0=40, x0=40, jitter=0, seed=7,
                  overlap_y=None):
    """Boustrophedon sortie: crops of the ortho with known positions.

    Returns (images uint8, ids, positions [(y, x)] in ortho coords).
    Even rows left->right, odd rows right->left (reversed order).
    ``overlap`` is the along-track (x) overlap; ``overlap_y`` the
    side (between-line) overlap (defaults to ``overlap``).
    """
    r = np.random.default_rng(seed)
    if overlap_y is None:
        overlap_y = overlap
    step_x = int(frame_w * (1 - overlap))
    step_y = int(frame_h * (1 - overlap_y))
    images, ids, pos = [], [], []
    k = 0
    for row in range(rows):
        xs = list(range(cols))
        if row % 2 == 1:
            xs = xs[::-1]
        for c in xs:
            y = y0 + row * step_y
            x = x0 + c * step_x
            if jitter:
                y += int(r.integers(-jitter, jitter + 1))
                x += int(r.integers(-jitter, jitter + 1))
            img = ortho[y:y + frame_h, x:x + frame_w].astype(np.uint8)
            images.append(img)
            ids.append(f"IMG{k:03d}")
            pos.append((y, x))
            k += 1
    return images, ids, pos


def blurred_rmse(a, b):
    """RMSE after a mild blur: robust to subpixel resampling of texture."""
    import cv2
    aa = cv2.GaussianBlur(a.astype(np.float32), (9, 9), 2.0)
    bb = cv2.GaussianBlur(b.astype(np.float32), (9, 9), 2.0)
    return float(np.sqrt(np.mean((aa - bb) ** 2)))
