"""Affine / homography image warping with bilinear sampling.

Capability parity targets:
  - cv::warpAffine INTER_LINEAR + BORDER_CONSTANT(0)
    (reference: stitch_global.cpp:369-376,479-480, affine warper path of
    cv::Stitcher at stitch_robust.cpp:203-205)
  - warped content masks with the 0.999 bilinear-footprint rule that excludes
    black wedges (reference: buildWarpedContentMask, stitch_global.cpp:353-383)
  - undistort remap consumes the same sampler (see ops/undistort.py)

Implementation notes (TPU): the dst->src coordinate grid is computed in
closed form; the 4-tap bilinear fetch lowers to XLA gathers. Images are
(H, W) or (H, W, C) float32. Transforms are src->dst like OpenCV; we invert
internally. Out-of-bounds samples return the constant border (0).
"""

from __future__ import annotations

import jax.numpy as jnp

from .transform import affine_to_h3, invert_affine


def _bilinear_sample(img: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray,
                     border_value: float = 0.0) -> jnp.ndarray:
    """Sample img at float coords (sx, sy); coords shape (Ho, Wo)."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def fetch(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = img[yc, xc]
        if img.ndim == 3:
            inb_ = inb[..., None]
        else:
            inb_ = inb
        return jnp.where(inb_, v, jnp.asarray(border_value, img.dtype))

    v00 = fetch(y0i, x0i)
    v01 = fetch(y0i, x0i + 1)
    v10 = fetch(y0i + 1, x0i)
    v11 = fetch(y0i + 1, x0i + 1)
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def _dst_grid(out_h: int, out_w: int, dtype=jnp.float32):
    ys = jnp.arange(out_h, dtype=dtype)[:, None]
    xs = jnp.arange(out_w, dtype=dtype)[None, :]
    return jnp.broadcast_to(xs, (out_h, out_w)), jnp.broadcast_to(
        ys, (out_h, out_w))


def warp_affine(img: jnp.ndarray, a23: jnp.ndarray, out_h: int, out_w: int,
                border_value: float = 0.0) -> jnp.ndarray:
    """Warp with a src->dst (2,3) affine, bilinear, constant border."""
    inv = invert_affine(a23.astype(jnp.float32))
    dx, dy = _dst_grid(out_h, out_w)
    sx = inv[0, 0] * dx + inv[0, 1] * dy + inv[0, 2]
    sy = inv[1, 0] * dx + inv[1, 1] * dy + inv[1, 2]
    return _bilinear_sample(img.astype(jnp.float32), sx, sy, border_value)


def warp_perspective(img: jnp.ndarray, h33: jnp.ndarray, out_h: int,
                     out_w: int, border_value: float = 0.0) -> jnp.ndarray:
    """Warp with a src->dst (3,3) homography, bilinear, constant border."""
    inv = jnp.linalg.inv(h33.astype(jnp.float32))
    dx, dy = _dst_grid(out_h, out_w)
    den = inv[2, 0] * dx + inv[2, 1] * dy + inv[2, 2]
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    sx = (inv[0, 0] * dx + inv[0, 1] * dy + inv[0, 2]) / den
    sy = (inv[1, 0] * dx + inv[1, 1] * dy + inv[1, 2]) / den
    return _bilinear_sample(img.astype(jnp.float32), sx, sy, border_value)


def warp_content_mask(content_mask: jnp.ndarray, a23: jnp.ndarray,
                      out_h: int, out_w: int,
                      footprint_thresh: float = 0.999) -> jnp.ndarray:
    """Warp a bool/float content mask; keep only near-full footprints.

    Reference: buildWarpedContentMask (stitch_global.cpp:353-383) warps a
    0/1 mask bilinearly and keeps pixels whose interpolated footprint is
    >= 0.999, excluding both out-of-bounds wedges and interior black pixels.
    Returns bool (out_h, out_w).
    """
    m = content_mask.astype(jnp.float32)
    warped = warp_affine(m, a23, out_h, out_w)
    return warped >= footprint_thresh


def remap(img: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray,
          border_value: float = 0.0) -> jnp.ndarray:
    """cv::remap analog: sample img at per-pixel float coords."""
    return _bilinear_sample(img.astype(jnp.float32), map_x, map_y,
                            border_value)
