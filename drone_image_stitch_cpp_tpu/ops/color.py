"""Color-space and radiometric elementwise ops.

Capability parity targets:
  - BGR -> gray (reference calls cv::cvtColor at stitch_robust.cpp:83,88,
    stitch_global.cpp:111-112,358, visual_flight_grouper.cpp:65,
    stitch_common.cpp:6). Uses BT.601 weights to match OpenCV exactly.
  - per-channel gain apply (reference: applyChannelGainInPlace,
    stitch_global.cpp:291-305).

All ops are jit/vmap friendly; images are float32 in [0, 255] unless noted,
layout (H, W, 3) channel-last BGR (kept BGR so cv2-produced goldens compare
bit-for-bit without channel shuffles).
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV BT.601: gray = 0.299 R + 0.587 G + 0.114 B; channel order is BGR.
_BGR_WEIGHTS = jnp.asarray([0.114, 0.587, 0.299], dtype=jnp.float32)


def bgr_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) BGR -> (..., H, W) luma, same scale as input."""
    return img.astype(jnp.float32) @ _BGR_WEIGHTS


def apply_channel_gains(img: jnp.ndarray, gains: jnp.ndarray) -> jnp.ndarray:
    """Multiply (..., H, W, C) by per-channel gains (..., C), clip to [0,255].

    Reference: applyChannelGainInPlace (stitch_global.cpp:291-305) — saturating
    uint8 semantics reproduced via clip.
    """
    out = img.astype(jnp.float32) * gains[..., None, None, :]
    return jnp.clip(out, 0.0, 255.0)


def to_uint8(img: jnp.ndarray) -> jnp.ndarray:
    """Round-and-saturate to uint8 (OpenCV convertTo semantics)."""
    return jnp.clip(jnp.round(img), 0.0, 255.0).astype(jnp.uint8)


def nonblack_mask(img: jnp.ndarray, thresh: float = 2.0) -> jnp.ndarray:
    """Mask of pixels whose gray level exceeds ``thresh``.

    Reference: grayscale threshold > 2 for strip content masks
    (stitch_global.cpp:109-117) and > 1 for autocrop (stitch_common.cpp:9).
    Returns bool (..., H, W).
    """
    gray = bgr_to_gray(img) if img.shape[-1] == 3 else img
    return gray > thresh
