"""Exposure / gain compensation via overlap-statistics least squares.

Capability parity targets:
  - detail::GainCompensator(1) and detail::ChannelsCompensator(2) with
    similarity threshold 0.95, selected adaptively by canvas area
    (reference: makeSafeExposureCompensator, stitch_global.cpp:307-326)
  - detail::BlocksGainCompensator (reference: stitch_robust.cpp:209-211) —
    block-level gains + bilinear gain surface.

The gain solve is OpenCV's formulation: minimize
  sum_ij N_ij [ alpha (g_i I_ij - g_j I_ji)^2 + beta (1 - g_i)^2 ]
with alpha=0.01, beta=100 — a tiny (n_images x n_images) linear system,
fully jittable. Overlap statistics are masked reductions on device; the
solve itself is a jnp.linalg.solve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_ALPHA = 0.01
_BETA = 100.0


def overlap_stats(intens_i: jnp.ndarray, intens_j: jnp.ndarray,
                  mask_i: jnp.ndarray, mask_j: jnp.ndarray,
                  similarity_thresh: float = 1.0):
    """Mean intensities of i and j over their overlap + overlap pixel count.

    ``intens_*``: (H, W) mean-channel intensity in a shared (canvas) frame.
    Pixels whose relative difference exceeds the similarity threshold are
    excluded (OpenCV's setSimilarityThreshold analog, reference uses 0.95).
    """
    both = mask_i & mask_j
    if similarity_thresh < 1.0:
        denom = jnp.maximum(jnp.maximum(intens_i, intens_j), 1.0)
        sim = 1.0 - jnp.abs(intens_i - intens_j) / denom
        both = both & (sim >= similarity_thresh)
    n = jnp.sum(both)
    nf = jnp.maximum(n.astype(jnp.float32), 1.0)
    mi = jnp.sum(jnp.where(both, intens_i, 0.0)) / nf
    mj = jnp.sum(jnp.where(both, intens_j, 0.0)) / nf
    return mi, mj, n


def solve_gains(i_mat: jnp.ndarray, n_mat: jnp.ndarray) -> jnp.ndarray:
    """Solve the OpenCV gain system.

    ``i_mat``: (N, N) where i_mat[i, j] = mean intensity of image i over
    overlap(i, j); ``n_mat``: (N, N) overlap pixel counts (symmetric).
    Returns (N,) gains.
    """
    n = i_mat.shape[0]
    nf = n_mat.astype(jnp.float32)
    a = jnp.zeros((n, n), jnp.float32)
    # OpenCV iterates ordered pairs, so each unordered overlap contributes
    # its alpha term twice; the beta prior appears once per (i, j).
    diag = jnp.sum(nf * (2.0 * _ALPHA * i_mat ** 2 + _BETA), axis=1)
    a = a.at[jnp.arange(n), jnp.arange(n)].set(diag)
    off = -2.0 * _ALPHA * nf * i_mat * i_mat.T
    a = a + off - jnp.diag(jnp.diag(off))
    b = jnp.sum(nf * _BETA, axis=1)
    # guard: isolated images (no overlap) get gain 1 via the beta prior
    a = a + 1e-6 * jnp.eye(n)
    return jnp.linalg.solve(a, b)


def gain_compensate_scalar(intens: jnp.ndarray, masks: jnp.ndarray,
                           similarity_thresh: float = 0.95) -> jnp.ndarray:
    """Single-gain-per-image solve (GainCompensator(1) analog).

    ``intens``: (N, H, W) shared-frame intensities; ``masks``: (N, H, W).
    Returns (N,) gains.
    """
    # batched pair programs: the previous N^2 Python loop of .at[].set
    # device calls paid quadratic dispatch overhead (~80 ms each on the
    # remote-TPU relay); chunking bounds the vmapped gather memory — all
    # N^2 pairs at once materializes (P, H, W) copies (~11 GB for 13
    # seam-scale strips) and OOMs the chip
    import numpy as np

    n = intens.shape[0]
    idx = np.arange(n)
    ii = np.repeat(idx, n)
    jj = np.tile(idx, n)
    chunk = _EXPOSURE_PAIR_CHUNK
    p = len(ii)
    pad = (-p) % chunk
    if pad:
        ii = np.concatenate([ii, np.zeros(pad, np.int64)])
        jj = np.concatenate([jj, np.zeros(pad, np.int64)])
    mi_parts, cnt_parts = [], []
    for c0 in range(0, len(ii), chunk):
        mi_c, cnt_c = _pair_stats_chunk(
            intens, masks, jnp.asarray(ii[c0:c0 + chunk]),
            jnp.asarray(jj[c0:c0 + chunk]), similarity_thresh)
        mi_parts.append(mi_c)
        cnt_parts.append(cnt_c)
    mi = jnp.concatenate(mi_parts)[:p].reshape(n, n)
    cnt = jnp.concatenate(cnt_parts)[:p].reshape(n, n)
    off_diag = 1.0 - jnp.eye(n, dtype=jnp.float32)
    return solve_gains(mi * off_diag, cnt * off_diag)


_EXPOSURE_PAIR_CHUNK = 8


@functools.partial(jax.jit, static_argnames=("similarity_thresh",))
def _pair_stats_chunk(intens, masks, ii, jj, similarity_thresh: float):
    def one(i, j):
        mi, _, cnt = overlap_stats(intens[i], intens[j], masks[i],
                                   masks[j], similarity_thresh)
        return mi, cnt.astype(jnp.float32)

    return jax.vmap(one)(ii, jj)


def channels_compensate(images: jnp.ndarray, masks: jnp.ndarray,
                        similarity_thresh: float = 0.95) -> jnp.ndarray:
    """Per-channel gains (ChannelsCompensator(2) analog). Returns (N, 3)."""
    gains = []
    for c in range(images.shape[-1]):
        gains.append(gain_compensate_scalar(images[..., c], masks,
                                            similarity_thresh))
    return jnp.stack(gains, axis=-1)


def block_gain_maps(images: jnp.ndarray, masks: jnp.ndarray,
                    block: int = 32,
                    similarity_thresh: float = 0.95) -> jnp.ndarray:
    """BlocksGainCompensator analog: per-pixel gain surfaces.

    Solves scalar gains globally, then modulates each image's gain toward
    the local (block-mean) brightness ratio of the blended consensus,
    producing a smooth per-pixel gain map. Returns (N, H, W) float32.

    This matches the *capability* (spatially varying exposure correction);
    OpenCV's exact block partitioning is approximated by block-mean pooling
    + bilinear upsampling of the ratio surface, clamped to [0.5, 2].
    """
    import jax

    n, h, w = images.shape[:3] if images.ndim == 3 else (
        images.shape[0], images.shape[1], images.shape[2])
    intens = images if images.ndim == 3 else images.mean(axis=-1)
    base = gain_compensate_scalar(intens, masks, similarity_thresh)

    mf = masks.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(mf, axis=0), 1e-6)
    consensus = jnp.sum(intens * base[:, None, None] * mf, axis=0) / wsum

    bh = max(1, h // block)
    bw = max(1, w // block)
    ph = bh * block
    pw = bw * block

    def pool(x):
        xp = x[:ph, :pw].reshape(bh, block, bw, block)
        return xp.mean(axis=(1, 3))

    maps = []
    for i in range(n):
        num = pool(jnp.where(masks[i], consensus, 0.0))
        den = pool(jnp.where(masks[i], intens[i] * base[i], 0.0))
        cnt = pool(mf[i])
        ratio = jnp.where(cnt > 0.05,
                          num / jnp.maximum(den, 1e-6), 1.0)
        ratio = jnp.clip(ratio, 0.5, 2.0)
        up = jax.image.resize(ratio, (h, w), method="linear")
        maps.append(base[i] * up)
    return jnp.stack(maps)
