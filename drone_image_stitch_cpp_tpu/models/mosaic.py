"""Flagship jittable model steps: the fused registration forward.

The "model" of this framework is the registration pipeline itself:
detect (DoG scale-space + descriptors) -> match (MXU distance matmuls) ->
robust fit (vmapped RANSAC bank). These wrappers expose it as single jitted
functions for compile checks, benchmarking, and the driver's entry point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import match as M
from ..ops import ransac as R
from ..ops.features import detect_and_describe


@functools.partial(jax.jit, static_argnames=("max_kp", "n_hyp", "kind"))
def pairwise_register(frames: jnp.ndarray, max_kp: int = 512,
                      n_hyp: int = 512, kind: str = "similarity",
                      ratio: float = 0.75, thresh: float = 4.0):
    """Register frames[1] onto frames[0].

    frames: (2, H, W) float32 grayscale in [0, 255].
    Returns (model (3,3), n_good, n_inliers, ok).
    """
    feats = jax.vmap(lambda g: detect_and_describe(g, max_kp))(frames)
    m = M.knn2_ratio(feats.desc[0], feats.valid[0], feats.desc[1],
                     feats.valid[1], ratio)
    src, dst, good = M.gather_correspondences(feats.xy[0], feats.xy[1], m)
    res = R.ransac(src, dst, good, jax.random.PRNGKey(0), kind,
                   thresh=thresh, n_hyp=n_hyp)
    return res.model, jnp.sum(good.astype(jnp.int32)), res.n_inliers, res.ok


@functools.partial(jax.jit, static_argnames=("max_kp",))
def batched_detect(frames: jnp.ndarray, max_kp: int = 512):
    """Batched feature extraction: (B, H, W) -> Features (leading B)."""
    return jax.vmap(lambda g: detect_and_describe(g, max_kp))(frames)
