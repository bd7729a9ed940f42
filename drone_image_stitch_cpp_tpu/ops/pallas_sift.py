"""Fused Pallas TPU kernel: SIFT orientation + descriptor per keypoint.

Replaces the vmapped per-keypoint ``_orientation_one``/``_descriptor_one``
programs of ops/features.py on the TPU hot path. Those lower to XLA gathers
((81, 81) dynamic_slice per keypoint), which execute near scalar speed on
TPU and dominated round 1's detect stage (~1 s of a ~1.6 s 8-frame 4K
batch; reference workload: cv::SIFT at stitch_robust.cpp:188).

Design (one kernel instance per keypoint, grid over B*K):
  * the support patch is DMA'd HBM->VMEM as ONE aligned (PR, PC) block per
    keypoint (starts come in via scalar prefetch), double-buffered across
    grid steps so the next patch streams in while the current one computes;
  * a dynamic lane roll re-centers the keypoint at lane CTR, and all math
    runs on a static (PR, CW) window — pure VPU vector ops, no gathers;
  * gradients are static sublane/lane rolls of the window; the orientation
    histogram is 36 masked row-reductions; the 4x4x8 descriptor accumulates
    via per-bin hat weights and row/lane reductions (no scatter);
  * taps outside the true image (or wrapped by the roll) get zero weight
    via absolute-coordinate masks, so arbitrary image sizes are exact.

Numerics match ops/features.py within float tolerance except arctan2: the
kernel uses a polynomial atan2 (|err| < 1.2e-4 rad, far below the 10-deg
orientation bin width and the 45-deg descriptor bin width).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

PR = 96        # patch rows DMA'd per keypoint (8-aligned)
PC = 256       # patch cols DMA'd (128-aligned; covers 81-px support + slack)
CW = 128       # compute window lanes after the roll re-centers the keypoint
CTR = 64       # keypoint lane within the window
ROW_OFF = 44   # nominal rows above the keypoint in the patch
_ORI_BINS = 36
_D = 4         # spatial bins per axis
_OBINS = 8     # orientation bins
_INTERPRET = False


def _atan2(y, x):
    """Polynomial atan2 (radians, [-pi, pi]); Mosaic-safe (no arctan2).

    atan(z) on |z|<=1 via a degree-8 even-odd polynomial (|err|<1.2e-4),
    extended by the usual octant identities.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, 1e-30)
    z2 = z * z
    # minimax-ish coefficients for atan(z), z in [0, 1]
    p = z * (0.9998660 + z2 * (-0.3302995 + z2 * (0.1801410 + z2 * (
        -0.0851330 + z2 * 0.0208351))))
    p = jnp.where(ay > ax, (math.pi / 2.0) - p, p)
    p = jnp.where(x < 0.0, math.pi - p, p)
    return jnp.where(y < 0.0, -p, p)


KB = 8  # keypoints per grid step (outputs must tile to (8, 128))


def _kernel(starts_ref, fparams_ref, src_hbm, desc_ref, meta_ref,
            patch, sem):
    kblk = pl.program_id(0)
    total = pl.num_programs(0) * KB

    # prefetch arrays are (field, K): SMEM pads each ROW to 128 lanes, so
    # a (K, 3) layout would waste 128/3 x the SMEM budget (hard 1 MB cap)
    def dma(slot, idx):
        return pltpu.make_async_copy(
            src_hbm.at[starts_ref[0, idx],
                       pl.ds(pl.multiple_of(starts_ref[1, idx], 8), PR),
                       pl.ds(pl.multiple_of(starts_ref[2, idx], 128), PC)],
            patch.at[slot], sem.at[slot])

    @pl.when(kblk == 0)
    def _():
        dma(0, 0).start()

    def body(i, carry):
        k = kblk * KB + i

        @pl.when(k + 1 < total)
        def _():
            dma((k + 1) % 2, k + 1).start()

        dma(k % 2, k).wait()
        # dynamic-slot read: select between the two buffers (VMEM reads
        # are cheap; a dynamic leading index on scratch is not supported)
        p = jnp.where((k % 2) == 0, patch[0], patch[1])    # (PR, PC)

        y0 = starts_ref[1, k]
        x0 = starts_ref[2, k]
        yf = fparams_ref[0, k]
        xf = fparams_ref[1, k]
        scale = fparams_ref[2, k]
        # per-keypoint gradient bounds: the indexed image's (aligned) true
        # dims — images of different sizes (octaves) share one flat padded
        # stack, and taps beyond an image's own extent must not contribute
        h_img = fparams_ref[3, k]
        w_img = fparams_ref[4, k]

        # re-center: window lane j holds source column x0 + sh + j
        xi = jnp.round(xf).astype(jnp.int32)
        sh = xi - x0 - CTR
        win = pltpu.roll(p, shift=jnp.mod(-sh, PC), axis=1)[:, :CW]

        rows_abs = (y0.astype(jnp.float32)
                    + jax.lax.broadcasted_iota(jnp.int32, (PR, CW), 0)
                    .astype(jnp.float32))
        cols_abs = ((x0 + sh).astype(jnp.float32)
                    + jax.lax.broadcasted_iota(jnp.int32, (PR, CW), 1)
                    .astype(jnp.float32))

        # central differences via static rolls (y-up convention)
        # pltpu.roll requires non-negative shifts: -1 == size-1 (cyclic)
        gx = 0.5 * (pltpu.roll(win, shift=CW - 1, axis=1)
                    - pltpu.roll(win, shift=1, axis=1))
        gy = 0.5 * (pltpu.roll(win, shift=1, axis=0)
                    - pltpu.roll(win, shift=PR - 1, axis=0))

        # gradient valid: 1 px inside the true image AND inside the window
        # (absolute bounds also kill lanes the roll wrapped: wrapped taps
        # always land outside [0, w_true))
        ri = jax.lax.broadcasted_iota(jnp.int32, (PR, CW), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (PR, CW), 1)
        gvalid = ((rows_abs >= 1.0) & (rows_abs <= h_img - 2.0)
                  & (cols_abs >= 1.0) & (cols_abs <= w_img - 2.0)
                  & (ri >= 1) & (ri <= PR - 2)
                  & (ci >= 1) & (ci <= CW - 2))

        mag = jnp.sqrt(gx * gx + gy * gy)
        theta = _atan2(gy, gx)

        dx = cols_abs - xf
        dy = rows_abs - yf                                  # y-down offset
        # orientation uses offsets from the ROUNDED center (integer patch
        # grid), matching ops/features._orientation_one / OpenCV; the
        # descriptor below uses the sub-pixel offsets dx/dy
        dxo = cols_abs - xi.astype(jnp.float32)
        dyo = rows_abs - jnp.round(yf)

        # ---- orientation histogram (36 bins, radius 4.5*scale) ---------------
        radius = jnp.round(4.5 * scale)
        sig = 1.5 * scale
        owgt = jnp.exp(-(dxo * dxo + dyo * dyo) / (2.0 * sig * sig))
        oin = (jnp.abs(dxo) <= radius) & (jnp.abs(dyo) <= radius) & gvalid
        ocontrib = jnp.where(oin, mag * owgt, 0.0)
        binf = (theta / (2.0 * math.pi)) * _ORI_BINS
        bini = jnp.mod(jnp.round(binf).astype(jnp.int32), _ORI_BINS)

        parts = [jnp.sum(jnp.where(bini == b, ocontrib, 0.0), axis=0,
                         keepdims=True)
                 for b in range(_ORI_BINS)]
        hrows = jnp.concatenate(parts, axis=0)              # (36, CW)
        hist = jnp.sum(hrows, axis=1, keepdims=True)        # (36, 1)

        # circular smooth [1,4,6,4,1]/16 via static sublane rolls
        def rollb(a, s):
            return pltpu.roll(a, shift=s % _ORI_BINS, axis=0)

        hs = (rollb(hist, 2) + rollb(hist, -2)
              + 4.0 * (rollb(hist, 1) + rollb(hist, -1)) + 6.0 * hist) / 16.0

        bidx = jax.lax.broadcasted_iota(jnp.int32, (_ORI_BINS, 1), 0)
        b = jnp.argmax(hs)                                  # flat argmax, (36,1)

        def at_bin(i):
            return jnp.sum(jnp.where(bidx == i, hs, 0.0))

        l_ = at_bin(jnp.mod(b - 1, _ORI_BINS))
        c_ = at_bin(b)
        r_ = at_bin(jnp.mod(b + 1, _ORI_BINS))
        denom = l_ - 2.0 * c_ + r_
        interp = jnp.where(jnp.abs(denom) > 1e-12,
                           0.5 * (l_ - r_) / jnp.where(jnp.abs(denom) > 1e-12,
                                                       denom, 1.0), 0.0)
        angle = (jnp.mod(b.astype(jnp.float32) + interp, float(_ORI_BINS))
                 * (2.0 * math.pi / _ORI_BINS))

        # ---- descriptor (4x4 spatial x 8 orientation bins) -------------------
        hist_width = 3.0 * scale
        ca = jnp.cos(angle)
        sa = jnp.sin(angle)
        u = (ca * dx - sa * dy) / hist_width
        v = (sa * dx + ca * dy) / hist_width
        rbin = v + (_D - 1) / 2.0
        cbin = u + (_D - 1) / 2.0
        obin = jnp.mod(((theta - angle) / (2.0 * math.pi)) * _OBINS,
                       float(_OBINS))

        gw = jnp.exp(-(u * u + v * v) * (2.0 / (_D * _D)))
        inside = ((rbin > -1.0) & (rbin < _D) & (cbin > -1.0) & (cbin < _D)
                  & gvalid)
        m = jnp.where(inside, mag * gw, 0.0)

        wys = [jnp.maximum(0.0, 1.0 - jnp.abs(rbin - by)) for by in range(_D)]
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(cbin - bx)) for bx in range(_D)]
        odiffs = [jnp.abs(obin - o) for o in range(_OBINS)]
        wos = [m * jnp.maximum(0.0, 1.0 - jnp.minimum(od, _OBINS - od))
               for od in odiffs]                            # (PR, CW) x 8

        # accumulate: for each spatial bin, row-reduce each orientation plane,
        # then one (16, CW) -> (16, 1) lane reduction at the end
        rowvecs = []                                        # 16*8 x (1, CW)
        for by in range(_D):
            for bx in range(_D):
                zs = wys[by] * wxs[bx]
                for o in range(_OBINS):
                    rowvecs.append(jnp.sum(zs * wos[o], axis=0, keepdims=True))
        dmat = jnp.concatenate(rowvecs, axis=0)             # (128, CW)
        desc = jnp.sum(dmat, axis=1, keepdims=True)         # (128, 1)
        desc = jnp.transpose(desc)                          # (1, 128)

        nrm = jnp.sqrt(jnp.sum(desc * desc) + 1e-12)
        desc = jnp.minimum(desc / nrm, 0.2)
        nrm2 = jnp.sqrt(jnp.sum(desc * desc) + 1e-12)
        desc = jnp.minimum(desc / nrm2 * 512.0, 255.0)

        desc_ref[pl.ds(i, 1), :] = desc
        meta_ref[pl.ds(i, 1), :] = jnp.full((1, 128), angle, jnp.float32)
        return carry

    jax.lax.fori_loop(0, KB, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(gauss_flat, starts, fparams, interpret=False):
    k = starts.shape[1]
    kpad = -(-k // KB) * KB
    if kpad != k:  # clamp pad cols to keypoint 0 (masked downstream)
        starts = jnp.concatenate(
            [starts, jnp.tile(starts[:, :1], (1, kpad - k))], axis=1)
        fparams = jnp.concatenate(
            [fparams, jnp.tile(fparams[:, :1], (1, kpad - k))], axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(kpad // KB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((KB, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, 128), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((2, PR, PC), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    desc, meta = pl.pallas_call(
        _kernel,
        out_shape=[jax.ShapeDtypeStruct((kpad, 128), jnp.float32),
                   jax.ShapeDtypeStruct((kpad, 128), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, fparams, gauss_flat)
    return desc[:k], meta[:k, 0]


def orientation_descriptor_flat(gauss_flat: jnp.ndarray,
                                flat_layer: jnp.ndarray,
                                yf: jnp.ndarray, xf: jnp.ndarray,
                                sigma: jnp.ndarray,
                                true_hw=None,
                                interpret: bool = False):
    """Fused orientation+descriptor over a FLAT stack of images.

    ``gauss_flat``: (L, H, W) — any mix of frames/octaves padded to one
    (8-, 128-aligned) shape; ``flat_layer``: (..., K) int32 index into L
    per keypoint; ``yf``/``xf``/``sigma`` same leading shape, in the
    indexed image's pixels. Lets the caller select keypoints ACROSS
    octaves first and run ONE kernel launch for the survivors (half the
    kernel work of describing every candidate, one compile instead of one
    per octave).

    Returns (angle (..., K), desc (..., K, 128)).
    """
    lead = flat_layer.shape[:-1]
    kk = flat_layer.shape[-1]
    l_, h_, w_ = gauss_flat.shape
    assert h_ % 8 == 0 and w_ % 128 == 0, (h_, w_)
    assert h_ >= PR and w_ >= PC, (h_, w_)

    yfl = yf.reshape(-1)
    xfl = xf.reshape(-1)
    yi = jnp.round(yfl).astype(jnp.int32)
    xi = jnp.round(xfl).astype(jnp.int32)
    y0 = jnp.clip((yi - ROW_OFF) & ~7, 0, h_ - PR)
    x0 = jnp.clip((xi - CTR) & ~127, 0, w_ - PC)
    starts = jnp.stack([jnp.clip(flat_layer.reshape(-1), 0, l_ - 1),
                        y0, x0], axis=0).astype(jnp.int32)
    if true_hw is None:
        th = jnp.full_like(yfl, float(h_))
        tw = jnp.full_like(yfl, float(w_))
    else:
        th = true_hw[0].reshape(-1).astype(jnp.float32)
        tw = true_hw[1].reshape(-1).astype(jnp.float32)
    fparams = jnp.stack([yfl, xfl, sigma.reshape(-1), th, tw],
                        axis=0).astype(jnp.float32)
    desc, angle = _run(gauss_flat, starts, fparams, interpret=interpret)
    return angle.reshape(lead + (kk,)), desc.reshape(lead + (kk, 128))


def orientation_descriptor(gauss: jnp.ndarray, li: jnp.ndarray,
                           yf: jnp.ndarray, xf: jnp.ndarray,
                           sigma: jnp.ndarray,
                           interpret: bool = False):
    """Fused orientation+descriptor for a batch of keypoints.

    ``gauss``: (S, H, W) or (B, S, H, W) octave Gaussian stack (H mult of
    8, W mult of 128 — detect feeds bucket-padded octaves). ``li``: (K,) or
    (B, K) int32 layer per keypoint; ``yf``/``xf``/``sigma``: same leading
    shape, float32 octave-pixel coordinates/scale. ``true_h``/``true_w``:
    scalar or (B,) true content size in octave pixels (pad excluded).

    Returns (angle, desc) with the input's leading shape: angle (..., K)
    radians y-up; desc (..., K, 128).
    """
    batched = gauss.ndim == 4
    if not batched:
        gauss = gauss[None]
        li, yf, xf, sigma = (a[None] for a in (li, yf, xf, sigma))
    b_, s_, h_, w_ = gauss.shape
    kk = li.shape[-1]
    assert h_ % 8 == 0 and w_ % 128 == 0, (h_, w_)
    assert h_ >= PR and w_ >= PC, (h_, w_)

    yi = jnp.round(yf).astype(jnp.int32)
    xi = jnp.round(xf).astype(jnp.int32)
    y0 = jnp.clip((yi - ROW_OFF) & ~7, 0, h_ - PR)
    x0 = jnp.clip((xi - CTR) & ~127, 0, w_ - PC)
    layer = jnp.clip(li, 0, s_ - 1)
    frame = jnp.broadcast_to(jnp.arange(b_, dtype=jnp.int32)[:, None],
                             (b_, kk))
    flat_layer = frame * s_ + layer
    starts = jnp.stack([flat_layer.reshape(-1), y0.reshape(-1),
                        x0.reshape(-1)], axis=0).astype(jnp.int32)

    bk = yf.reshape(-1).shape[0]
    fparams = jnp.stack([yf.reshape(-1), xf.reshape(-1), sigma.reshape(-1),
                         jnp.full((bk,), float(h_), jnp.float32),
                         jnp.full((bk,), float(w_), jnp.float32)],
                        axis=0).astype(jnp.float32)

    desc, angle = _run(gauss.reshape(b_ * s_, h_, w_), starts, fparams,
                       interpret=interpret)
    desc = desc.reshape(b_, kk, 128)
    angle = angle.reshape(b_, kk)
    if not batched:
        return angle[0], desc[0]
    return angle, desc


def pallas_sift_supported() -> bool:
    return jax.default_backend() == "tpu"
