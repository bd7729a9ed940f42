"""Separable Gaussian filtering and image pyramids.

Used by: feature-detection scale space (DoG), soft blend masks (reference:
buildSoftBlendMask sigma=10 GaussianBlur, stitch_global.cpp:332-351), and the
Laplacian pyramids of the multiband blender (reference: MultiBandBlender at
stitch_robust.cpp:213, stitch_global.cpp:636-638).

Everything compiles to XLA convolutions, which the TPU backend maps onto the
MXU; kernels are built host-side (static sigma) so jit caches per sigma.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def gaussian_kernel1d(sigma: float, radius: int | None = None) -> np.ndarray:
    """1-D Gaussian taps. Radius defaults to OpenCV-ish round(4*sigma)."""
    if radius is None:
        radius = max(1, int(round(4.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def _conv1d_along(img: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    """Depthwise 1-D convolution with REFLECT_101 (OpenCV default) padding.

    TPU note: implemented as STATIC shifted slices + scalar FMAs (XLA fuses
    them into one vectorized pass). The earlier single-channel
    ``lax.conv_general_dilated`` formulation lowers to near-scalar code on
    TPU and made every pyramid level of the compose feeds cost ~seconds on
    10 MP tile windows; the shift-and-add form is bandwidth-bound.
    """
    taps_np = np.asarray(taps, np.float32)
    r = taps_np.shape[0] // 2
    x = img.astype(jnp.float32)
    # reflect-101 padding ("abc|cb" style) along the chosen axis
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    x = jnp.pad(x, pad, mode="reflect")
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1] - 2 * r
    y = taps_np[0] * jax.lax.slice_in_dim(x, 0, n, axis=-1)
    for k in range(1, 2 * r + 1):
        y = y + taps_np[k] * jax.lax.slice_in_dim(x, k, k + n, axis=-1)
    return jnp.moveaxis(y, -1, axis)


@functools.lru_cache(maxsize=256)
def _blur_matrix(sigma: float, n: int, radius: int | None) -> np.ndarray:
    """(n, n) banded Toeplitz blur matrix with REFLECT_101 edges folded in.

    y = T @ x equals the 1-D Gaussian conv with OpenCV border handling.
    """
    k = gaussian_kernel1d(sigma, radius)
    r = k.shape[0] // 2
    t = np.zeros((n, n), np.float32)
    for i in range(n):
        for dj, w in zip(range(-r, r + 1), k):
            j = i + dj
            if j < 0:
                j = -j              # reflect-101: -1 -> 1
            elif j >= n:
                j = 2 * n - 2 - j   # n -> n-2
            j = min(max(j, 0), n - 1)
            t[i, j] += w
    return t


_BLUR_MATMUL_MAX = 2048  # above this the (n, n) band matrix wastes HBM


def gaussian_blur(img: jnp.ndarray, sigma: float,
                  radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur over the trailing (H, W[, C]) dims.

    TPU note: for scale-space-sized images both 1-D passes run as banded
    Toeplitz MATMULS (rows @ T_w^T, T_h @ cols) — single-channel
    conv_general_dilated lowers to near-scalar code on TPU, while the
    matmul keeps the MXU busy (the band wastes FLOPs, but MXU FLOPs are
    free next to a bad conv). Larger images (sigma=10 soft masks over
    mosaic canvases) keep the conv path.
    """
    hax = img.ndim - 2 if img.ndim == 2 else img.ndim - 3
    wax = hax + 1
    h, w = img.shape[hax], img.shape[wax]
    x = img.astype(jnp.float32)
    if max(h, w) <= _BLUR_MATMUL_MAX:
        th = jnp.asarray(_blur_matrix(float(sigma), h, radius))
        tw = jnp.asarray(_blur_matrix(float(sigma), w, radius))
        # x is (..., H, W) or (..., H, W, C): contract H with th, W with tw
        # HIGHEST precision: default MXU bf16 rounding (~0.4%) swamps the
        # DoG contrast thresholds (~0.2% of range) downstream
        hp = jax.lax.Precision.HIGHEST
        x = jnp.tensordot(x, th, axes=([hax], [1]),
                          precision=hp)                  # H moves to last
        x = jnp.moveaxis(x, -1, hax)
        x = jnp.tensordot(x, tw, axes=([wax], [1]), precision=hp)
        x = jnp.moveaxis(x, -1, wax)
        return x
    taps = gaussian_kernel1d(sigma, radius)
    x = _conv1d_along(x, taps, axis=hax)
    x = _conv1d_along(x, taps, axis=wax)
    return x


# cv::pyrDown 5-tap kernel
_PYR_TAPS = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """Blur with the 5-tap binomial kernel and decimate by 2 (cv::pyrDown)."""
    taps = _PYR_TAPS
    hax = img.ndim - 2 if img.ndim == 2 else img.ndim - 3
    wax = hax + 1
    x = img.astype(jnp.float32)
    x = _conv1d_along(x, taps, axis=hax)
    x = _conv1d_along(x, taps, axis=wax)
    idx_h = [slice(None)] * x.ndim
    idx_h[hax] = slice(0, None, 2)
    idx_h[wax] = slice(0, None, 2)
    return x[tuple(idx_h)]


def pyr_up(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Zero-stuff upsample x2 then blur with 2x kernel (cv::pyrUp)."""
    hax = img.ndim - 2 if img.ndim == 2 else img.ndim - 3
    wax = hax + 1
    x = img.astype(jnp.float32)
    shape = list(x.shape)
    shape[hax] = out_h
    shape[wax] = out_w
    up = jnp.zeros(shape, dtype=x.dtype)
    src_idx = [slice(None)] * x.ndim
    src_idx[hax] = slice(0, (out_h + 1) // 2)
    src_idx[wax] = slice(0, (out_w + 1) // 2)
    dst_idx = [slice(None)] * x.ndim
    dst_idx[hax] = slice(0, out_h, 2)
    dst_idx[wax] = slice(0, out_w, 2)
    up = up.at[tuple(dst_idx)].set(x[tuple(src_idx)])
    taps = _PYR_TAPS * 2.0
    up = _conv1d_along(up, taps, axis=hax)
    up = _conv1d_along(up, taps, axis=wax)
    return up


def gaussian_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """[img, pyrDown(img), ...] with ``levels + 1`` entries."""
    out = [img.astype(jnp.float32)]
    for _ in range(levels):
        out.append(pyr_down(out[-1]))
    return out


def laplacian_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """Band-pass pyramid; last entry is the low-pass residual."""
    gp = gaussian_pyramid(img, levels)
    out = []
    for i in range(levels):
        hi = gp[i]
        hax = hi.ndim - 2 if hi.ndim == 2 else hi.ndim - 3
        wax = hax + 1
        up = pyr_up(gp[i + 1], hi.shape[hax], hi.shape[wax])
        out.append(hi - up)
    out.append(gp[levels])
    return out


def collapse_laplacian(pyr: list[jnp.ndarray]) -> jnp.ndarray:
    """Reconstruct the image from its Laplacian pyramid."""
    x = pyr[-1]
    for lvl in reversed(pyr[:-1]):
        hax = lvl.ndim - 2 if lvl.ndim == 2 else lvl.ndim - 3
        wax = hax + 1
        x = pyr_up(x, lvl.shape[hax], lvl.shape[wax]) + lvl
    return x
