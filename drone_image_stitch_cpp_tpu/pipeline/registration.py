"""Shared registration front-end: downscale -> pad -> batched detect.

Maps the reference's per-stage working resolutions onto static-shape TPU
batches: frames are scaled to the registration resolution
(registration_resol_mpx, reference: stitch_robust.cpp:183), padded to a
bucketed work shape (multiple of 128 for MXU/VPU tiling), and run through
the batched feature detector. Keypoint coordinates are returned in full-
resolution frame coordinates; pad-region keypoints are masked out.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import features as F
from ..ops.color import bgr_to_gray
from ..ops.resize import resize_area, scale_for_megapixels

_PAD = 128


def bucket_shape(h: int, w: int) -> tuple[int, int]:
    return (-(-h // _PAD) * _PAD, -(-w // _PAD) * _PAD)


@functools.partial(jax.jit, static_argnames=("max_kp", "out_h", "out_w"))
def _detect_batch(grays: jnp.ndarray, true_hw: jnp.ndarray, max_kp: int,
                  out_h: int, out_w: int) -> F.Features:
    """vmapped detect over (B, H, W) padded grays; mask pad keypoints."""
    feats = jax.vmap(lambda g: F.detect_and_describe(g, max_kp))(grays)
    ok = (feats.valid
          & (feats.xy[..., 0] < true_hw[:, None, 1].astype(jnp.float32))
          & (feats.xy[..., 1] < true_hw[:, None, 0].astype(jnp.float32)))
    return feats._replace(valid=ok)


def detect_features(images: List[np.ndarray], n_features: int,
                    resol_mpx: float) -> tuple[F.Features, float]:
    """Batched feature extraction for same-sized frames.

    Returns (Features with leading batch axis, work_scale). Keypoint
    coordinates are in *full-resolution* pixels.
    """
    h, w = images[0].shape[:2]
    scale = scale_for_megapixels(h, w, resol_mpx)
    wh = max(1, int(round(h * scale)))
    ww = max(1, int(round(w * scale)))
    bh, bw = bucket_shape(wh, ww)

    grays = []
    for img in images:
        g = bgr_to_gray(jnp.asarray(img.astype(np.float32)))
        if (wh, ww) != (h, w):
            g = resize_area(g, wh, ww)
        # edge-replicate pad: no fake gradients at the pad frontier
        g = jnp.pad(g, ((0, bh - wh), (0, bw - ww)), mode="edge")
        grays.append(g)
    batch = jnp.stack(grays)
    true_hw = jnp.asarray([[wh, ww]] * len(images), jnp.int32)
    feats = _detect_batch(batch, true_hw, n_features, bh, bw)
    # back to full-res coordinates; the +-0.5 terms account for the pixel-
    # center shift of area resampling (x_full = (x_work + 0.5)/s - 0.5)
    feats = feats._replace(xy=(feats.xy + 0.5) / scale - 0.5,
                           sigma=feats.sigma / scale)
    return feats, scale
