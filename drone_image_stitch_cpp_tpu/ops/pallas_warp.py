"""Pallas TPU kernel: bilinear affine warp without gathers.

Replaces the XLA gather lowering of ops/warp.warp_affine on the hot path
(cv::warpAffine analog; full-resolution compose warps dominate the
mosaicking pipeline: ~350 ms per 4K frame as XLA gathers on v5e).

Design (TPU-native, no per-element gathers):
  * the output is tiled (TILE x TILE); each tile's source preimage bounding
    box is DMA'd from HBM into a VMEM scratch block (per-tile starts come
    in via scalar prefetch);
  * mosaicking transforms are near-identity (|linear - I| <= _MAX_DEV), so
    within one output row the source row index spans only a few sublanes
    and the source column tracks the lane index with bounded drift.
    Bilinear sampling becomes a sum over a few STATIC row reads / column
    shifts weighted by per-lane hat weights (two nonzero per pixel) — pure
    VPU FMAs on contiguous vectors, no gathers;
  * the vertical-pass weight is evaluated per source column via the exact
    column->lane inverse for the row, so the two-pass approximation error
    is bounded by |i10| (<= _MAX_DEV) times one bilinear column offset —
    well under 0.1 px for mosaic warps;
  * out-of-image taps get zero weight, reproducing BORDER_CONSTANT(0).

The wrapper falls back to the XLA gather path when the transform is not
near-identity (or off-TPU), keeping full cv::warpAffine capability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .transform import invert_affine
from .warp import warp_affine as warp_affine_xla

TILE = 128
SRC_H = 192   # VMEM source block per tile (rows; start 8-aligned)
SRC_W = 384   # block cols; starts must be 128-aligned for HBM DMA, so the
              # in-block offset can reach ~128+; a dynamic lane roll
              # re-centers it before the static shift window
ROWS = 8      # output rows per loop iteration (full 8-sublane registers)
NV = 28       # vertical taps: bilinear + lane drift + 8-row group span
NH = 28       # static lane shifts after the dynamic roll re-centering
_MAX_DEV = 0.05  # max |linear - I| the static windows cover
_INTERPRET = False  # set True for CPU interpreter debugging


def _kernel(starts_ref, params_ref, src_hbm, out_ref, src_vmem, sem):
    """One output tile: DMA source block, two-pass shift-select bilinear.

    Processes ROWS output rows per iteration so every VPU op runs on full
    (8, lanes) registers instead of single sublanes.
    """
    t = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    # host guarantees HBM-DMA tile alignment; the hint lets Mosaic prove it
    sy0 = pl.multiple_of(starts_ref[t, 0], 8)
    sx0 = pl.multiple_of(starts_ref[t, 1], 128)
    oy0 = starts_ref[t, 2]
    ox0 = starts_ref[t, 3]

    i00 = params_ref[0]
    i01 = params_ref[1]
    i02 = params_ref[2]
    i10 = params_ref[3]
    i11 = params_ref[4]
    i12 = params_ref[5]
    hs = params_ref[6]
    ws = params_ref[7]

    dma = pltpu.make_async_copy(
        src_hbm.at[pl.ds(sy0, SRC_H), pl.ds(sx0, SRC_W)], src_vmem, sem)
    dma.start()
    dma.wait()

    lanes = jax.lax.broadcasted_iota(jnp.int32, (ROWS, TILE), 1).astype(
        jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ROWS, SRC_W), 1).astype(
        jnp.float32)
    rsub = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0).astype(
        jnp.float32)
    sy0f = sy0.astype(jnp.float32)
    sx0f = sx0.astype(jnp.float32)
    oy0f = oy0.astype(jnp.float32)
    ox0f = ox0.astype(jnp.float32)

    def row_body(g, carry):
        r0f = (g * ROWS).astype(jnp.float32)
        rows_f = r0f + rsub                      # (ROWS, 1)
        yterm = i11 * (oy0f + rows_f)            # (ROWS, 1)
        xterm = i01 * (oy0f + rows_f)

        # ---- vertical pass: blend NV consecutive source rows ------------
        # weights evaluated per source column via the exact column->lane
        # inverse for each row; one shared base for the whole row group
        lane_of_col = (cols + sx0f - i02 - xterm) / i00 - ox0f
        sy_col = i10 * (ox0f + lane_of_col) + yterm + i12 - sy0f
        rmidf = r0f + (ROWS - 1) * 0.5
        base_v = (jnp.floor(i10 * (ox0f + 63.5) + i11 * (oy0f + rmidf)
                            + i12 - sy0f).astype(jnp.int32) - NV // 2 + 1)
        tmp = jnp.zeros((ROWS, SRC_W), jnp.float32)
        for k in range(NV):
            row_idx = base_v + k
            rif = row_idx.astype(jnp.float32)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(sy_col - rif))
            yabs = sy0f + rif
            valid = ((yabs >= 0.0) & (yabs <= hs - 1.0)
                     & (rif >= 0.0) & (rif <= SRC_H - 1.0))
            w = jnp.where(valid, w, 0.0)
            safe_idx = jnp.clip(row_idx, 0, SRC_H - 1)
            tmp = tmp + w * src_vmem[pl.ds(safe_idx, 1), :]

        # ---- horizontal pass --------------------------------------------
        sx_loc = i00 * (ox0f + lanes) + xterm + i02 - sx0f
        mid = i00 * (ox0f + 63.5) + i01 * (oy0f + rmidf) + i02 - sx0f \
            - 63.5
        base_h = jnp.clip(jnp.floor(mid).astype(jnp.int32) - NH // 2 + 1,
                          -SRC_W, SRC_W)
        # pltpu.roll silently mis-rotates for dynamic NEGATIVE shifts on
        # TPU (verified on v5e: shift=-13 returns wrong lanes; positive
        # shifts are exact) — wrap into [0, SRC_W) first; roll is cyclic
        # with period SRC_W so the result is unchanged.
        rolled = pltpu.roll(tmp, shift=jnp.mod(-base_h, SRC_W), axis=1)
        acc = jnp.zeros((ROWS, TILE), jnp.float32)
        for k in range(NH):
            seg = rolled[:, k:k + TILE]
            colpos = (base_h + k).astype(jnp.float32) + lanes
            w = jnp.maximum(0.0, 1.0 - jnp.abs(sx_loc - colpos))
            xabs = sx0f + colpos
            valid = ((xabs >= 0.0) & (xabs <= ws - 1.0)
                     & (colpos >= 0.0) & (colpos <= SRC_W - 1.0))
            w = jnp.where(valid, w, 0.0)
            acc = acc + w * seg
        out_ref[pl.ds(g * ROWS, ROWS), :] = acc
        return carry

    jax.lax.fori_loop(0, TILE // ROWS, row_body, 0)


def _invert_affine_host(a23_np: np.ndarray) -> np.ndarray:
    """Host-numpy (2, 3) affine inverse.

    The plan path runs per (frame, tile) feed; routing this 2x2 inverse
    through the device (ops/transform.invert_affine) cost a full relay
    round-trip (~300 ms) per feed and dominated the tiled-blend stage.
    """
    a = np.asarray(a23_np, np.float32)
    inv_lin = np.linalg.inv(a[:, :2])
    inv_t = -inv_lin @ a[:, 2]
    return np.concatenate([inv_lin, inv_t[:, None]], axis=1)


def _tile_starts(inv: np.ndarray, out_h: int, out_w: int, src_h: int,
                 src_w: int):
    """Per-tile clamped source-block starts (host, vectorized numpy)."""
    ny = -(-out_h // TILE)
    nx = -(-out_w // TILE)
    oy = (np.arange(ny) * TILE)[:, None]                 # (ny, 1)
    ox = (np.arange(nx) * TILE)[None, :]                 # (1, nx)
    corners = np.asarray([[0.0, 0.0], [TILE - 1.0, 0.0], [0.0, TILE - 1.0],
                          [TILE - 1.0, TILE - 1.0]])
    sx = np.stack([inv[0, 0] * (ox + cx) + inv[0, 1] * (oy + cy)
                   + inv[0, 2] for cx, cy in corners]).min(axis=0)
    sy = np.stack([inv[1, 0] * (ox + cx) + inv[1, 1] * (oy + cy)
                   + inv[1, 2] for cx, cy in corners]).min(axis=0)
    # HBM DMA starts must be tile-aligned: rows 8, cols 128
    sy0 = (np.floor(sy).astype(np.int64) - 8) & ~7
    sx0 = (np.floor(sx).astype(np.int64) - 8) & ~127
    sy0 = np.clip(sy0, 0, (src_h - SRC_H) & ~7)
    sx0 = np.clip(sx0, 0, (src_w - SRC_W) & ~127)
    starts = np.stack(
        [np.broadcast_to(sy0, (ny, nx)), np.broadcast_to(sx0, (ny, nx)),
         np.broadcast_to(oy, (ny, nx)), np.broadcast_to(ox, (ny, nx))],
        axis=-1).reshape(ny * nx, 4).astype(np.int32)
    return starts, ny, nx


def tile_starts_traced(inv: jnp.ndarray, out_h: int, out_w: int,
                       src_h: int, src_w: int) -> jnp.ndarray:
    """Device-side twin of ``_tile_starts`` for traced transforms.

    Lets a caller fuse warp planning + the Pallas kernel into one program
    (no host round-trip for the transform). ``inv``: (2, 3) traced.
    """
    ny = -(-out_h // TILE)
    nx = -(-out_w // TILE)
    oy = (jnp.arange(ny, dtype=jnp.float32) * TILE)[:, None]
    ox = (jnp.arange(nx, dtype=jnp.float32) * TILE)[None, :]
    corners = [(0.0, 0.0), (TILE - 1.0, 0.0), (0.0, TILE - 1.0),
               (TILE - 1.0, TILE - 1.0)]
    sx = jnp.stack([inv[0, 0] * (ox + cx) + inv[0, 1] * (oy + cy)
                    + inv[0, 2] for cx, cy in corners]).min(axis=0)
    sy = jnp.stack([inv[1, 0] * (ox + cx) + inv[1, 1] * (oy + cy)
                    + inv[1, 2] for cx, cy in corners]).min(axis=0)
    # arithmetic shifts floor-align negative values like numpy's & ~mask
    sy0 = (jnp.floor(sy).astype(jnp.int32) - 8) >> 3 << 3
    sx0 = (jnp.floor(sx).astype(jnp.int32) - 8) >> 7 << 7
    sy0 = jnp.clip(sy0, 0, (src_h - SRC_H) & ~7)
    sx0 = jnp.clip(sx0, 0, (src_w - SRC_W) & ~127)
    oyi = jnp.broadcast_to(oy.astype(jnp.int32), (ny, nx))
    oxi = jnp.broadcast_to(ox.astype(jnp.int32), (ny, nx))
    return jnp.stack([jnp.broadcast_to(sy0, (ny, nx)),
                      jnp.broadcast_to(sx0, (ny, nx)), oyi, oxi],
                     axis=-1).reshape(ny * nx, 4)


def pallas_warp_supported(a23: np.ndarray, src_h: int = 0, src_w: int = 0
                          ) -> bool:
    """True when the static shift windows cover the transform.

    Source size no longer matters: the wrapper zero-pads any source up to
    the (8, 128)-aligned block grid, and the kernel masks taps beyond the
    true (hs, ws), so arbitrary sizes are exact.
    """
    lin = np.asarray(a23)[:2, :2]
    dev = np.abs(lin - np.eye(2)).max()
    return bool(dev <= _MAX_DEV)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "ny", "nx"))
def _run(img, starts, params, out_h: int, out_w: int, ny: int, nx: int):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ny, nx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SRC_H, SRC_W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    padded = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((ny * TILE, nx * TILE), jnp.float32),
        grid_spec=grid_spec,
        interpret=_INTERPRET,
    )(starts, params, img)
    return padded[:out_h, :out_w]


def _run_padded(img2d: jnp.ndarray, a23_np: np.ndarray, out_h: int,
                out_w: int) -> jnp.ndarray:
    """Pallas warp of one channel, zero-padding the source to the block
    grid first.

    The source is padded to (8, 128)-aligned dims >= (SRC_H, SRC_W) so
    every tile's clamped block start can reach the image's last rows and
    columns (unpadded, the 128-aligned start cap left up to 127 source
    columns unreachable and silently cropped from the mosaic). The kernel
    masks taps beyond the true (hs, ws), so zero padding is exact.
    """
    src_h, src_w = int(img2d.shape[0]), int(img2d.shape[1])
    ph = max(SRC_H, -(-src_h // 8) * 8)
    pw = max(SRC_W, -(-src_w // 128) * 128)
    if (ph, pw) != (src_h, src_w):
        img2d = jnp.pad(img2d, ((0, ph - src_h), (0, pw - src_w)))
    inv = _invert_affine_host(a23_np)
    starts, ny, nx = _tile_starts(inv, out_h, out_w, ph, pw)
    params = jnp.asarray([inv[0, 0], inv[0, 1], inv[0, 2],
                          inv[1, 0], inv[1, 1], inv[1, 2],
                          float(src_h), float(src_w)], jnp.float32)
    return _run(img2d.astype(jnp.float32), jnp.asarray(starts), params,
                out_h, out_w, ny, nx)


def warp_plan(a23_np: np.ndarray, out_h: int, out_w: int, src_h: int,
              src_w: int):
    """Host-side plan for one warp: (starts (T,4) i32, params (8,) f32).

    The tile grid (ny, nx) depends only on the output size, so plans for
    different transforms of equal-size frames can be stacked and executed
    in ONE jit program (see ``warp_affine_many``) — per-dispatch overhead
    on the remote-TPU relay is ~80 ms, 25x the 4K kernel itself.
    """
    ph = max(SRC_H, -(-src_h // 8) * 8)
    pw = max(SRC_W, -(-src_w // 128) * 128)
    inv = _invert_affine_host(a23_np)
    starts, ny, nx = _tile_starts(inv, out_h, out_w, ph, pw)
    params = np.asarray([inv[0, 0], inv[0, 1], inv[0, 2],
                         inv[1, 0], inv[1, 1], inv[1, 2],
                         float(src_h), float(src_w)], np.float32)
    return starts, params, ny, nx, ph, pw


def warp_affine_many(imgs: jnp.ndarray, transforms, out_h: int,
                     out_w: int) -> jnp.ndarray:
    """Warp N same-size frames by N transforms in ONE device program.

    ``imgs``: (N, H, W) float32; ``transforms``: host (N, 2, 3). Returns
    (N, out_h, out_w). Falls back to the XLA path off-TPU or for
    transforms outside the fast path's envelope.
    """
    n, src_h, src_w = imgs.shape
    tr = [np.asarray(t, np.float32) for t in transforms]
    on_tpu = jax.default_backend() == "tpu"
    if not ((on_tpu or _INTERPRET)
            and all(pallas_warp_supported(t) for t in tr)):
        return jnp.stack([warp_affine_xla(imgs[i], jnp.asarray(tr[i]),
                                          out_h, out_w) for i in range(n)])
    plans = [warp_plan(t, out_h, out_w, src_h, src_w) for t in tr]
    starts = jnp.asarray(np.stack([p[0] for p in plans]))
    params = jnp.asarray(np.stack([p[1] for p in plans]))
    _, _, ny, nx, ph, pw = plans[0]
    return _run_many(imgs, starts, params, out_h, out_w, ny, nx, ph, pw)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "ny", "nx",
                                             "ph", "pw"))
def _run_many(imgs, starts, params, out_h: int, out_w: int, ny: int,
              nx: int, ph: int, pw: int):
    outs = []
    for i in range(imgs.shape[0]):
        ip = imgs[i]
        if (ph, pw) != ip.shape:
            ip = jnp.pad(ip, ((0, ph - ip.shape[0]), (0, pw - ip.shape[1])))
        outs.append(_run(ip.astype(jnp.float32), starts[i], params[i],
                         out_h, out_w, ny, nx))
    return jnp.stack(outs)


def warp_affine_traced(img: jnp.ndarray, a23: jnp.ndarray, out_h: int,
                       out_w: int) -> jnp.ndarray:
    """In-jit Pallas warp with a TRACED (2, 3) transform.

    The whole plan (inverse, tile starts) stays on device, so callers can
    fuse registration + warp into one program. No fallback is possible on
    traced values: the caller must guarantee the near-identity envelope
    (|linear - I| <= _MAX_DEV) that the static shift windows cover, and
    TPU/interpret execution.
    """
    src_h, src_w = int(img.shape[0]), int(img.shape[1])
    ph = max(SRC_H, -(-src_h // 8) * 8)
    pw = max(SRC_W, -(-src_w // 128) * 128)
    if (ph, pw) != (src_h, src_w):
        img = jnp.pad(img, ((0, ph - src_h), (0, pw - src_w)))
    inv = invert_affine(a23)
    starts = tile_starts_traced(inv, out_h, out_w, ph, pw)
    params = jnp.stack([inv[0, 0], inv[0, 1], inv[0, 2],
                        inv[1, 0], inv[1, 1], inv[1, 2],
                        jnp.float32(src_h), jnp.float32(src_w)])
    ny = -(-out_h // TILE)
    nx = -(-out_w // TILE)
    return _run(img.astype(jnp.float32), starts, params, out_h, out_w,
                ny, nx)


def warp_affine(img: jnp.ndarray, a23, out_h: int, out_w: int
                ) -> jnp.ndarray:
    """Drop-in warp: Pallas fast path, XLA gather fallback.

    ``img``: (H, W) or (H, W, C) float32; ``a23``: (2, 3) src->dst affine
    (host-known values enable the fast path; traced arrays fall back).
    """
    try:
        a23_np = np.asarray(a23)
    except Exception:
        return warp_affine_xla(img, a23, out_h, out_w)
    on_tpu = jax.default_backend() == "tpu"
    if not ((on_tpu or _INTERPRET) and pallas_warp_supported(a23_np)):
        return warp_affine_xla(img, jnp.asarray(a23_np), out_h, out_w)

    if img.ndim == 2:
        return _run_padded(img, a23_np, out_h, out_w)
    chans = [_run_padded(img[..., c], a23_np, out_h, out_w)
             for c in range(img.shape[-1])]
    return jnp.stack(chans, axis=-1)
