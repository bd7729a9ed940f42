"""Resize ops: linear and area-average downscale.

Capability parity with the reference's cv::resize calls
(visual_flight_grouper.cpp:116-117 INTER_AREA downscale; stitch_global.cpp:
133-136,601-603,651 INTER_AREA/LINEAR/NEAREST). Static output shapes are
required under jit, so callers pick the output size on the host (bucketed to
limit recompiles) and pass it in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_linear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of (..., H, W) or (..., H, W, C)."""
    if img.ndim == 2:
        shape = (out_h, out_w)
    elif img.ndim == 3:
        shape = (out_h, out_w, img.shape[-1])
    else:
        shape = img.shape[:-3] + (out_h, out_w, img.shape[-1])
    return jax.image.resize(img.astype(jnp.float32), shape, method="linear")


def resize_nearest(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    if img.ndim == 2:
        shape = (out_h, out_w)
    else:
        shape = img.shape[:-3] + (out_h, out_w, img.shape[-1])
    return jax.image.resize(img, shape, method="nearest")


def resize_area(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Area-average downscale (cv INTER_AREA analog).

    For integer decimation factors this is an exact box filter (matches
    OpenCV); otherwise falls back to jax.image.resize linear with
    antialiasing, which is close enough for registration-scale work.
    """
    h = img.shape[-3] if img.ndim >= 3 else img.shape[-2]
    w = img.shape[-2] if img.ndim >= 3 else img.shape[-1]
    if img.ndim == 2:
        h, w = img.shape
    if h % out_h == 0 and w % out_w == 0:
        fy, fx = h // out_h, w // out_w
        x = img.astype(jnp.float32)
        if img.ndim == 2:
            x = x.reshape(out_h, fy, out_w, fx)
            return x.mean(axis=(1, 3))
        x = x.reshape(img.shape[:-3] + (out_h, fy, out_w, fx, img.shape[-1]))
        return x.mean(axis=(-4, -2))
    return resize_linear(img, out_h, out_w)


def scale_for_megapixels(h: int, w: int, mpx: float) -> float:
    """Work-scale factor so that h*w*scale^2 ~= mpx * 1e6; never upscales.

    Mirrors cv::Stitcher's registration/seam resol semantics
    (stitch_robust.cpp:183-185): negative mpx means full resolution.
    """
    if mpx is None or mpx <= 0:
        return 1.0
    return min(1.0, (mpx * 1e6 / float(h * w)) ** 0.5)


def scale_for_max_dim(h: int, w: int, max_dim: int) -> float:
    """Work-scale so max(h, w) <= max_dim; never upscales.

    Mirrors the grouper's <=1800 px (visual_flight_grouper.cpp:104-117) and
    the global aligner's <=2800 px (stitch_global.cpp:119-136) downscales.
    """
    m = max(h, w)
    return 1.0 if m <= max_dim else max_dim / float(m)
