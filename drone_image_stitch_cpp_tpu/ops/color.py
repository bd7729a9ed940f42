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


def yuv420_luma(packed: jnp.ndarray) -> jnp.ndarray:
    """Y plane of a packed I420 frame: (..., H*3/2, W) -> (..., H, W) f32.

    JPEG Y is exactly the BT.601 luma the gray conversion computes (full
    range), so detect stages read it directly — no color math at all.
    """
    h = packed.shape[-2] * 2 // 3
    return packed[..., :h, :].astype(jnp.float32)


def _fancy_up2(c: jnp.ndarray, axis: int) -> jnp.ndarray:
    """2x chroma upsample along ``axis`` with libjpeg's triangle filter
    (h2v2 fancy upsampling): out[2i] = 3/4 c[i] + 1/4 c[i-1],
    out[2i+1] = 3/4 c[i] + 1/4 c[i+1], edges replicated."""
    c = jnp.moveaxis(c, axis, -1)
    prev = jnp.concatenate([c[..., :1], c[..., :-1]], axis=-1)
    nxt = jnp.concatenate([c[..., 1:], c[..., -1:]], axis=-1)
    even = 0.75 * c + 0.25 * prev
    odd = 0.75 * c + 0.25 * nxt
    out = jnp.stack([even, odd], axis=-1).reshape(*c.shape[:-1],
                                                  2 * c.shape[-1])
    return jnp.moveaxis(out, -1, axis)


def yuv420_to_bgr(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed I420 (..., H*3/2, W) uint8 -> (..., H, W, 3) BGR float32.

    The FrameStore ships frames across the host->device link in the
    JPEG's native 4:2:0 planar form (1.5 bytes/px instead of 3 — the
    relay transfer is the ingest bottleneck); consuming fused programs
    convert here. Chroma upsampling matches libjpeg's fancy (triangle)
    filter; the JFIF full-range BT.601 matrix matches its YCbCr->RGB.
    """
    h = packed.shape[-2] * 2 // 3
    w = packed.shape[-1]
    lead = packed.shape[:-2]
    y = packed[..., :h, :].astype(jnp.float32)
    u = packed[..., h:h + h // 4, :].reshape(*lead, h // 2, w // 2)
    v = packed[..., h + h // 4:, :].reshape(*lead, h // 2, w // 2)
    u = _fancy_up2(_fancy_up2(u.astype(jnp.float32), -1), -2) - 128.0
    v = _fancy_up2(_fancy_up2(v.astype(jnp.float32), -1), -2) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136286 * u - 0.714136286 * v
    b = y + 1.772 * u
    return jnp.clip(jnp.stack([b, g, r], axis=-1), 0.0, 255.0)


def bgr_to_yuv420(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) BGR uint8/f32 -> packed I420 (H*3/2, W) uint8. H % 4 == 0,
    W % 2 == 0 (compose windows are 256-aligned).

    The device->host counterpart of :func:`yuv420_to_bgr`: blended mosaics
    and strip panoramas cross the ~25 MB/s relay link as 1.5 B/px instead
    of 3, with box (2x2 mean) chroma downsampling — the same treatment
    libjpeg's h2v2 downsampler applies during the JPEG encode these
    fetches feed. The matrix is VIDEO-RANGE BT.601 (Y in [16, 235]),
    the exact inverse of the host-side unpack cv2.COLOR_YUV2BGR_I420
    (runtime/handoff.py) — unlike the INGEST direction, whose peer is
    libjpeg's full-range JFIF math (:func:`yuv420_to_bgr`).
    """
    h, w = img.shape[0], img.shape[1]
    f = img.astype(jnp.float32)
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    y = 0.256788 * r + 0.504129 * g + 0.097906 * b + 16.0
    cb = -0.148223 * r - 0.290993 * g + 0.439216 * b + 128.0
    cr = 0.439216 * r - 0.367788 * g - 0.071427 * b + 128.0
    # box-average chroma over 2x2 blocks, then ravel each (H/2, W/2) plane
    # into W-wide rows (cv2 / libjpeg I420 layout)
    cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    to_u8 = lambda p: jnp.clip(jnp.round(p), 0.0, 255.0).astype(jnp.uint8)
    return jnp.concatenate([to_u8(y), to_u8(cb).reshape(h // 4, w),
                            to_u8(cr).reshape(h // 4, w)], axis=0)


def nonblack_mask(img: jnp.ndarray, thresh: float = 2.0) -> jnp.ndarray:
    """Mask of pixels whose gray level exceeds ``thresh``.

    Reference: grayscale threshold > 2 for strip content masks
    (stitch_global.cpp:109-117) and > 1 for autocrop (stitch_common.cpp:9).
    Returns bool (..., H, W).
    """
    gray = bgr_to_gray(img) if img.shape[-1] == 3 else img
    return gray > thresh
