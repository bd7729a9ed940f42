"""Lens undistortion with the 8-coefficient rational model.

Capability parity: cv::undistort with rational-model coefficients
(reference: undistortImagesIfReady, stitch_app.cpp:38-80, calls cv::undistort
at :73 when the calibration placeholders are filled). The distortion maps
are built in closed form on device and sampled with the shared bilinear
remap kernel (ops/warp.py), so a batch of frames undistorts as one vmapped
gather program.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config.tuning import CameraCalibration
from .warp import remap


def distortion_maps(calib: CameraCalibration, h: int, w: int):
    """Maps (map_x, map_y): for each undistorted pixel, the distorted source.

    Rational model (OpenCV ordering k1 k2 p1 p2 k3 k4 k5 k6):
      x' = x (1 + k1 r^2 + k2 r^4 + k3 r^6) / (1 + k4 r^2 + k5 r^4 + k6 r^6)
           + 2 p1 x y + p2 (r^2 + 2 x^2)
      (y' analogous), in normalized camera coordinates.
    """
    assert calib.is_ready(), "calibration placeholders not filled"
    fx, fy, cx, cy = calib.fx, calib.fy, calib.cx, calib.cy
    k1, k2, p1, p2, k3, k4, k5, k6 = calib.dist
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    x = (xs - cx) / fx
    y = (ys - cy) / fy
    x = jnp.broadcast_to(x, (h, w))
    y = jnp.broadcast_to(y, (h, w))
    r2 = x * x + y * y
    num = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    den = 1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))
    scale = num / den
    xd = x * scale + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * scale + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return xd * fx + cx, yd * fy + cy


def undistort(img: jnp.ndarray, calib: CameraCalibration) -> jnp.ndarray:
    """Undistort one (H, W[, C]) image (vmap over a leading axis to batch)."""
    h, w = img.shape[0], img.shape[1]
    map_x, map_y = distortion_maps(calib, h, w)
    return remap(img, map_x, map_y)
