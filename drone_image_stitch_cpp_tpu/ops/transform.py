"""2-D transform algebra: affine/similarity/homography helpers.

Capability parity with the reference's transform plumbing:
  - affine(2x3) <-> homogeneous(3x3) lifts (reference: stitch_global.cpp:41-69)
  - similarity decomposition into tx/ty/scale/rotation
    (reference: visual_flight_grouper.cpp:190-199)
  - transformed-corner bounding boxes for canvas sizing
    (reference: stitch_global.cpp:71-98)

All functions are pure jnp, shape-static, and jit/vmap friendly. Matrices act
on column vectors of pixel coordinates ``(x, y, 1)`` with x = column,
y = row (OpenCV convention, kept so goldens from cv2 match directly).
"""

from __future__ import annotations

import jax.numpy as jnp


def affine_to_h3(a23: jnp.ndarray) -> jnp.ndarray:
    """Lift a (..., 2, 3) affine to a (..., 3, 3) homogeneous matrix."""
    batch = a23.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype=a23.dtype), batch + (1, 3))
    return jnp.concatenate([a23, bottom], axis=-2)


def h3_to_affine(h33: jnp.ndarray) -> jnp.ndarray:
    """Drop the homogeneous row of a (..., 3, 3) affine-form matrix."""
    return h33[..., :2, :]


def compose_affine(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Return the (2,3) affine equal to applying ``b`` then ``a``."""
    return h3_to_affine(affine_to_h3(a) @ affine_to_h3(b))


def invert_affine(a23: jnp.ndarray) -> jnp.ndarray:
    """Invert a (..., 2, 3) affine transform."""
    lin = a23[..., :, :2]
    t = a23[..., :, 2:]
    inv_lin = jnp.linalg.inv(lin)
    inv_t = -(inv_lin @ t)
    return jnp.concatenate([inv_lin, inv_t], axis=-1)


def similarity_params(a23: jnp.ndarray):
    """Decompose a (2,3) similarity-ish affine into (tx, ty, scale, rot_deg).

    Matches the reference decomposition (visual_flight_grouper.cpp:190-199):
    scale = mean column norm of the linear part, rotation from atan2 of the
    first column.
    """
    a, b = a23[..., 0, 0], a23[..., 1, 0]
    c, d = a23[..., 0, 1], a23[..., 1, 1]
    tx, ty = a23[..., 0, 2], a23[..., 1, 2]
    s0 = jnp.sqrt(a * a + b * b)
    s1 = jnp.sqrt(c * c + d * d)
    scale = 0.5 * (s0 + s1)
    rot = jnp.degrees(jnp.arctan2(b, a))
    return tx, ty, scale, rot


def make_similarity(tx, ty, scale, rot_deg, dtype=jnp.float32) -> jnp.ndarray:
    """Build a (2,3) similarity transform from parameters."""
    th = jnp.radians(jnp.asarray(rot_deg, dtype=dtype))
    c = scale * jnp.cos(th)
    s = scale * jnp.sin(th)
    return jnp.stack([
        jnp.stack([c, -s, jnp.asarray(tx, dtype=dtype)]),
        jnp.stack([s, c, jnp.asarray(ty, dtype=dtype)]),
    ])


def apply_affine_pts(a23: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a (2,3) affine to (..., N, 2) points (x, y)."""
    lin = a23[..., :, :2]
    t = a23[..., :, 2]
    return pts @ jnp.swapaxes(lin, -1, -2) + t[..., None, :]


def apply_homography_pts(h33: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a (3,3) homography to (..., N, 2) points with perspective divide."""
    ones = jnp.ones(pts.shape[:-1] + (1,), dtype=pts.dtype)
    ph = jnp.concatenate([pts, ones], axis=-1)
    out = ph @ jnp.swapaxes(h33, -1, -2)
    return out[..., :2] / jnp.maximum(jnp.abs(out[..., 2:]), 1e-12) * jnp.sign(
        out[..., 2:])


def image_corners(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Corner points (4, 2) as (x, y) of an h x w image."""
    return jnp.asarray(
        [[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]],
        dtype=dtype)


def transformed_bbox(a23: jnp.ndarray, h: int, w: int):
    """Axis-aligned bbox of the affine-transformed image corners.

    Returns (x0, y0, x1, y1) floats, inclusive-ish bounds. Capability parity
    with transformedBoundingRect (reference: stitch_global.cpp:71-98).
    """
    pts = apply_affine_pts(a23, image_corners(h, w, a23.dtype))
    x0 = jnp.min(pts[..., 0])
    y0 = jnp.min(pts[..., 1])
    x1 = jnp.max(pts[..., 0])
    y1 = jnp.max(pts[..., 1])
    return x0, y0, x1, y1


def translation(tx, ty, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray([[1.0, 0.0, tx], [0.0, 1.0, ty]], dtype=dtype)


def identity_affine(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=dtype)
