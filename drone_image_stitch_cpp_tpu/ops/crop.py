"""Black-border autocrop.

Capability parity: autoCropBlackBorder (reference: stitch_common.cpp:4-27) —
gray threshold > 1, largest content bounding box, clone crop. For a mosaic
the content is a single connected region, so the bounding box of all
above-threshold pixels (row/col any-reductions) is the same rectangle the
reference's largest-contour search returns; reductions vectorize on device
where contour tracing would not.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .color import bgr_to_gray


def content_bbox(img: jnp.ndarray, thresh: float = 1.0):
    """Bounding box (y0, y1, x0, x1) of pixels with gray > thresh.

    Returns traced int32 scalars; exclusive upper bounds. If the image is
    entirely black, returns the full frame.
    """
    gray = bgr_to_gray(img) if img.ndim == 3 else img
    mask = gray > thresh
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    h, w = mask.shape
    ridx = jnp.arange(h, dtype=jnp.int32)
    cidx = jnp.arange(w, dtype=jnp.int32)
    any_content = jnp.any(mask)
    y0 = jnp.where(any_content, jnp.min(jnp.where(rows, ridx, h)), 0)
    y1 = jnp.where(any_content, jnp.max(jnp.where(rows, ridx, -1)) + 1, h)
    x0 = jnp.where(any_content, jnp.min(jnp.where(cols, cidx, w)), 0)
    x1 = jnp.where(any_content, jnp.max(jnp.where(cols, cidx, -1)) + 1, w)
    return y0, y1, x0, x1


def auto_crop_black_border(img_np: np.ndarray, thresh: float = 1.0
                           ) -> np.ndarray:
    """Host-side crop (dynamic output shape => runs after device fetch).

    Pure numpy: the input already lives in host RAM, and the reductions
    are trivially bandwidth-bound — shipping a gigabyte-scale mosaic back
    to the device over the remote relay just to find a bbox costs minutes.
    """
    def gray_mask(a):
        if a.ndim == 3:
            # fixed-point BT.601 gray (cv::cvtColor uses the same 8-bit
            # fixed-point path), NOT an any-channel test: a (2,0,0) border
            # pixel has gray 0.23 and must be cropped like the reference's
            # gray>thresh does (stitch_common.cpp:9)
            b, g, r = (a[..., 0].astype(np.uint32),
                       a[..., 1].astype(np.uint32),
                       a[..., 2].astype(np.uint32))
            return ((29 * b + 150 * g + 77 * r + 128) >> 8) > thresh
        return a > thresh

    # fast path: every border edge already carries content => the bbox is
    # the full frame (pre-cropped inputs — e.g. the tiled strip compose
    # crops from device-computed content flags); O(perimeter) vs a full
    # gray pass over a ~60 MP panorama on this 1-core host
    if img_np.shape[0] > 2 and img_np.shape[1] > 2 and \
            gray_mask(img_np[0]).any() and gray_mask(img_np[-1]).any() \
            and gray_mask(img_np[:, 0]).any() \
            and gray_mask(img_np[:, -1]).any():
        return np.ascontiguousarray(img_np)

    mask = gray_mask(img_np)
    rows = mask.any(axis=1)
    cols = mask.any(axis=0)
    if not rows.any():
        return np.ascontiguousarray(img_np)
    y0, y1 = np.argmax(rows), len(rows) - np.argmax(rows[::-1])
    x0, x1 = np.argmax(cols), len(cols) - np.argmax(cols[::-1])
    return np.ascontiguousarray(img_np[y0:y1, x0:x1])
