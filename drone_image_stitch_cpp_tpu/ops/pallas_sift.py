"""Fused Pallas TPU kernel: SIFT orientation + descriptor per keypoint.

Replaces the vmapped per-keypoint ``_orientation_one``/``_descriptor_one``
programs of ops/features.py on the TPU hot path. Those lower to XLA gathers
((81, 81) dynamic_slice per keypoint), which execute near scalar speed on
TPU and dominated round 1's detect stage (~1 s of a ~1.6 s 8-frame 4K
batch; reference workload: cv::SIFT at stitch_robust.cpp:188).

Design (KP=2 keypoints per kernel step, grid over B*K/KB):
  * each keypoint's support patch is DMA'd HBM->VMEM as ONE aligned
    (PR, PC) block (starts come in via scalar prefetch), double-buffered
    across steps so the next pair streams in while the current computes;
  * a dynamic lane roll re-centers each keypoint at lane CTR of its own
    (PR, CW=128) window, and TWO windows pack side-by-side into one
    (PR, 256) compute array — the VPU's native lane width is 128, so the
    packed form halves the per-keypoint cost of every elementwise pass
    and reduction (pure VPU vector ops, no gathers);
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


KB = 8   # keypoints per grid step (outputs must tile to (8, 128))
KP = 2   # keypoints packed side-by-side per compute window: the VPU's
         # native lane width is 128, so a single-keypoint (PR, 128)
         # window leaves half of every (8, 256)-wide op idle; packing two
         # keypoints into (PR, 2*CW) lanes halves the per-keypoint cost
         # of every reduction and elementwise pass below.
CW2 = KP * CW


def _kernel(starts_ref, fparams_ref, src_hbm, desc_ref, meta_ref,
            patch, sem):
    kblk = pl.program_id(0)
    total_pairs = pl.num_programs(0) * (KB // KP)

    # prefetch arrays are (field, K): SMEM pads each ROW to 128 lanes, so
    # a (K, 3) layout would waste 128/3 x the SMEM budget (hard 1 MB cap)
    def dma(slot, half, idx):
        return pltpu.make_async_copy(
            src_hbm.at[starts_ref[0, idx],
                       pl.ds(pl.multiple_of(starts_ref[1, idx], 8), PR),
                       pl.ds(pl.multiple_of(starts_ref[2, idx], 128), PC)],
            patch.at[slot, half], sem.at[slot, half])

    @pl.when(kblk == 0)
    def _():
        dma(0, 0, 0).start()
        dma(0, 1, 1).start()

    def body(j, carry):
        q = kblk * (KB // KP) + j          # global pair index
        k = q * KP                         # first keypoint of the pair

        @pl.when(q + 1 < total_pairs)
        def _():
            dma((q + 1) % 2, 0, k + KP).start()
            dma((q + 1) % 2, 1, k + KP + 1).start()

        dma(q % 2, 0, k).wait()
        dma(q % 2, 1, k + 1).wait()
        # dynamic-slot read: select between the two buffers (VMEM reads
        # are cheap; a dynamic leading index on scratch is not supported)
        even = (q % 2) == 0
        p_a = jnp.where(even, patch[0, 0], patch[1, 0])    # (PR, PC)
        p_b = jnp.where(even, patch[0, 1], patch[1, 1])

        # lane region: lanes [0, CW) hold keypoint a, [CW, 2*CW) hold b
        ci = jax.lax.broadcasted_iota(jnp.int32, (PR, CW2), 1)
        is_b = ci >= CW

        def sel(field_row):
            a = fparams_ref[field_row, k]
            b = fparams_ref[field_row, k + 1]
            return jnp.where(is_b, b, a)

        y0i_a = starts_ref[1, k]
        y0i_b = starts_ref[1, k + 1]
        x0i_a = starts_ref[2, k]
        x0i_b = starts_ref[2, k + 1]
        yf = sel(0)
        xf = sel(1)
        scale = sel(2)
        # per-keypoint gradient bounds: the indexed image's (aligned) true
        # dims — images of different sizes (octaves) share one flat padded
        # stack, and taps beyond an image's own extent must not contribute
        h_img = sel(3)
        w_img = sel(4)

        # re-center each patch so its keypoint sits at lane CTR, then pack
        # the two (PR, CW) windows side by side
        xi_a = jnp.round(fparams_ref[1, k]).astype(jnp.int32)
        xi_b = jnp.round(fparams_ref[1, k + 1]).astype(jnp.int32)
        sh_a = xi_a - x0i_a - CTR
        sh_b = xi_b - x0i_b - CTR
        win = jnp.concatenate(
            [pltpu.roll(p_a, shift=jnp.mod(-sh_a, PC), axis=1)[:, :CW],
             pltpu.roll(p_b, shift=jnp.mod(-sh_b, PC), axis=1)[:, :CW]],
            axis=1)                                         # (PR, CW2)

        xi = jnp.where(is_b, xi_b, xi_a).astype(jnp.float32)
        y0 = jnp.where(is_b, y0i_b, y0i_a).astype(jnp.float32)
        ri = jax.lax.broadcasted_iota(jnp.int32, (PR, CW2), 0)
        lane = jnp.mod(ci, CW)                              # lane within window
        rows_abs = y0 + ri.astype(jnp.float32)
        x0sh = jnp.where(is_b, (x0i_b + sh_b), (x0i_a + sh_a))
        cols_abs = (x0sh + lane).astype(jnp.float32)

        # central differences via static rolls (y-up convention)
        # pltpu.roll requires non-negative shifts: -1 == size-1 (cyclic)
        # NB lane rolls cross the a|b seam at lanes CW-1/CW; the
        # within-window bound on ``lane`` below zero-weights those taps,
        # so the two packed keypoints never contaminate each other.
        gx = 0.5 * (pltpu.roll(win, shift=CW2 - 1, axis=1)
                    - pltpu.roll(win, shift=1, axis=1))
        gy = 0.5 * (pltpu.roll(win, shift=1, axis=0)
                    - pltpu.roll(win, shift=PR - 1, axis=0))

        # gradient valid: 1 px inside the true image AND inside the window
        # (absolute bounds also kill lanes the roll wrapped: wrapped taps
        # always land outside [0, w_true))
        gvalid = ((rows_abs >= 1.0) & (rows_abs <= h_img - 2.0)
                  & (cols_abs >= 1.0) & (cols_abs <= w_img - 2.0)
                  & (ri >= 1) & (ri <= PR - 2)
                  & (lane >= 1) & (lane <= CW - 2))

        mag = jnp.sqrt(gx * gx + gy * gy)
        theta = _atan2(gy, gx)

        dx = cols_abs - xf
        dy = rows_abs - yf                                  # y-down offset
        # orientation uses offsets from the ROUNDED center (integer patch
        # grid), matching ops/features._orientation_one / OpenCV; the
        # descriptor below uses the sub-pixel offsets dx/dy
        dxo = cols_abs - xi
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
        hrows = jnp.concatenate(parts, axis=0)              # (36, CW2)

        # circular smooth [1,4,6,4,1]/16 via static sublane rolls
        def rollb(a, s):
            return pltpu.roll(a, shift=s % _ORI_BINS, axis=0)

        bidx = jax.lax.broadcasted_iota(jnp.int32, (_ORI_BINS, 1), 0)

        def peak_angle(hist):
            """hist (36, 1) -> interpolated dominant angle (radians)."""
            hs = (rollb(hist, 2) + rollb(hist, -2)
                  + 4.0 * (rollb(hist, 1) + rollb(hist, -1))
                  + 6.0 * hist) / 16.0
            b = jnp.argmax(hs)

            def at_bin(i):
                return jnp.sum(jnp.where(bidx == i, hs, 0.0))

            l_ = at_bin(jnp.mod(b - 1, _ORI_BINS))
            c_ = at_bin(b)
            r_ = at_bin(jnp.mod(b + 1, _ORI_BINS))
            denom = l_ - 2.0 * c_ + r_
            interp = jnp.where(
                jnp.abs(denom) > 1e-12,
                0.5 * (l_ - r_) / jnp.where(jnp.abs(denom) > 1e-12,
                                            denom, 1.0), 0.0)
            return (jnp.mod(b.astype(jnp.float32) + interp,
                            float(_ORI_BINS))
                    * (2.0 * math.pi / _ORI_BINS))

        angle_a = peak_angle(jnp.sum(hrows[:, :CW], axis=1, keepdims=True))
        angle_b = peak_angle(jnp.sum(hrows[:, CW:], axis=1, keepdims=True))
        angle = jnp.where(is_b, angle_b, angle_a)           # (PR, CW2)

        # ---- descriptor (4x4 spatial x 8 orientation bins) -------------------
        hist_width = 3.0 * scale
        ca = jnp.where(is_b, jnp.cos(angle_b), jnp.cos(angle_a))
        sa = jnp.where(is_b, jnp.sin(angle_b), jnp.sin(angle_a))
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
        rowvecs = []                                        # 16*8 x (1, CW2)
        for by in range(_D):
            for bx in range(_D):
                zs = wys[by] * wxs[bx]
                for o in range(_OBINS):
                    rowvecs.append(jnp.sum(zs * wos[o], axis=0, keepdims=True))
        dmat = jnp.concatenate(rowvecs, axis=0)             # (128, CW2)

        def norm_desc(d128):
            """(128, 1) raw bins -> (1, 128) clipped SIFT descriptor."""
            d = jnp.transpose(d128)
            nrm = jnp.sqrt(jnp.sum(d * d) + 1e-12)
            d = jnp.minimum(d / nrm, 0.2)
            nrm2 = jnp.sqrt(jnp.sum(d * d) + 1e-12)
            return jnp.minimum(d / nrm2 * 512.0, 255.0)

        desc_a = norm_desc(jnp.sum(dmat[:, :CW], axis=1, keepdims=True))
        desc_b = norm_desc(jnp.sum(dmat[:, CW:], axis=1, keepdims=True))

        desc_ref[pl.ds(KP * j, 1), :] = desc_a
        desc_ref[pl.ds(KP * j + 1, 1), :] = desc_b
        meta_ref[pl.ds(KP * j, 1), :] = jnp.full((1, 128), angle_a,
                                                 jnp.float32)
        meta_ref[pl.ds(KP * j + 1, 1), :] = jnp.full((1, 128), angle_b,
                                                     jnp.float32)
        return carry

    jax.lax.fori_loop(0, KB // KP, body, 0)


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
        scratch_shapes=[pltpu.VMEM((2, KP, PR, PC), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, KP))],
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
