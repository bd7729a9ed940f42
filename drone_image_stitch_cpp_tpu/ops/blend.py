"""Canvas blending: feather blend and tiled multiband (Laplacian) blend.

Capability parity targets:
  - detail::MultiBandBlender(try_gpu, bands) (reference: stitch_robust.cpp:213
    strip compose; stitch_global.cpp:636-660 global compose) including the
    band-count formula max(max(5, cfg), ceil(log2(max_dim)) - 1) capped at 12
    (stitch_global.cpp:632-635);
  - feather blending for the two-frame pairwise config (BASELINE.md config 1).

TPU-first design: the blender never materializes per-image canvases. Each
image is fed as an ROI patch whose top-left is aligned to the 2^bands grid;
its Laplacian pyramid accumulates into the shared canvas pyramid via
dynamic_update_slice at exactly-divisible offsets. HBM cost is one canvas
pyramid (4/3 x canvas) + one ROI pyramid, independent of image count.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussian import (collapse_laplacian, gaussian_pyramid,
                       laplacian_pyramid, pyr_up)


def num_blend_bands(cfg_bands: int, canvas_h: int, canvas_w: int) -> int:
    """Reference band formula (stitch_global.cpp:632-635).

    Only the canvas-derived auto term is capped at 12; a configured
    blend_bands above 12 is honored, matching the reference.
    """
    max_dim = max(canvas_h, canvas_w)
    auto = max(1, int(math.ceil(math.log2(max(max_dim, 2)))) - 1)
    return max(max(5, cfg_bands), min(auto, 12))


def align_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def align_down(v: int, m: int) -> int:
    return (v // m) * m


def aligned_roi(x0: float, y0: float, x1: float, y1: float, bands: int,
                canvas_h: int, canvas_w: int):
    """Host helper: expand a float bbox to the 2^bands grid, clip to canvas.

    Returns (tl_x, tl_y, w, h) ints, all multiples of 2^bands (w/h) with
    tl on the grid, so every pyramid level has integral offsets/sizes.
    """
    g = 1 << bands
    tlx = max(0, align_down(int(math.floor(x0)) - g, g))
    tly = max(0, align_down(int(math.floor(y0)) - g, g))
    brx = min(canvas_w, align_up(int(math.ceil(x1)) + g, g))
    bry = min(canvas_h, align_up(int(math.ceil(y1)) + g, g))
    brx = max(brx, tlx + g)
    bry = max(bry, tly + g)
    return tlx, tly, brx - tlx, bry - tly


FEED_SNAP = 1024  # feed-window dim quantum (compile-bucket control)


def bucketed_window(x0: float, y0: float, x1: float, y1: float,
                    bands: int, ch: int, cw: int,
                    snap: int = FEED_SNAP):
    """Fixed-size-bucketed feed window covering the float bbox.

    Window SIZES come from a tiny static set — multiples of ``snap``
    capped at the (2^bands-aligned) canvas dims — so every fused feed
    reuses one compiled program; POSITIONS shift left/up to keep the
    window in-canvas (positions are traced arguments, free to vary).
    Every new (h, w) bucket costs a full XLA compile of the feed program
    (minutes on a remote-TPU relay), which dominated cold-run composes.

    Returns (tl_x, tl_y, h, w); tl are multiples of 2^bands, h/w
    multiples of 2^bands capped at the aligned canvas dims.
    """
    g = 1 << bands
    tlx, tly, rw, rh = aligned_roi(x0, y0, x1, y1, bands, ch, cw)
    rw += tlx % 256
    tlx = align_down(tlx, 256)
    rh += tly % 256
    tly = align_down(tly, 256)
    caw = align_up(cw, g)   # accumulator dims (mb_prepare aligns up)
    cah = align_up(ch, g)
    rw_b = min(align_up(rw, snap), caw)
    rh_b = min(align_up(rh, snap), cah)
    tlx = min(tlx, caw - rw_b)
    tly = min(tly, cah - rh_b)
    return tlx, tly, rh_b, rw_b


class MultiBandCanvas(NamedTuple):
    """Shared canvas pyramid accumulators (a pytree; jit-friendly)."""

    acc: tuple    # per level: (Hl, Wl, 3) float32 weighted laplacians
    wacc: tuple   # per level: (Hl, Wl) float32 weights


def mb_prepare(canvas_h: int, canvas_w: int, bands: int) -> MultiBandCanvas:
    """Allocate zeroed canvas pyramids; dims padded to the 2^bands grid."""
    ch = align_up(canvas_h, 1 << bands)
    cw = align_up(canvas_w, 1 << bands)
    acc = []
    wacc = []
    for lvl in range(bands + 1):
        acc.append(jnp.zeros((ch >> lvl, cw >> lvl, 3), jnp.float32))
        wacc.append(jnp.zeros((ch >> lvl, cw >> lvl), jnp.float32))
    return MultiBandCanvas(acc=tuple(acc), wacc=tuple(wacc))


def mb_feed(canvas: MultiBandCanvas, img_roi: jnp.ndarray,
            weight_roi: jnp.ndarray, tl_x, tl_y,
            content_roi: jnp.ndarray | None = None) -> MultiBandCanvas:
    """Accumulate one image patch.

    ``img_roi``: (Hr, Wr, 3) float32, zeros outside content;
    ``weight_roi``: (Hr, Wr) float32 in [0, 1] (soft seam+content weight);
    ``content_roi``: (Hr, Wr) bool/float content footprint. When given, the
    Laplacian pyramid is built from the *mask-normalized* image pyramid
    (gp(img*m)/gp(m)), which extends content across its boundary instead of
    mixing black zero-padding into the coarse levels (OpenCV's blender
    avoids the same artifact with reflected borders);
    ``tl_x``/``tl_y``: canvas offsets (traced ints OK), multiples of 2^bands.
    Hr/Wr must be multiples of 2^bands (use ``aligned_roi``).
    """
    bands = len(canvas.acc) - 1
    if content_roi is not None:
        m = content_roi.astype(jnp.float32)
        gp_i = gaussian_pyramid(img_roi * m[..., None], bands)
        gp_m = gaussian_pyramid(m, bands)
        norm = [gi / jnp.maximum(gm, 1e-6)[..., None]
                for gi, gm in zip(gp_i, gp_m)]
        lap = []
        for lvl in range(bands):
            hi = norm[lvl]
            lap.append(hi - pyr_up(norm[lvl + 1], hi.shape[0], hi.shape[1]))
        lap.append(norm[bands])
    else:
        lap = laplacian_pyramid(img_roi, bands)
    wp = gaussian_pyramid(weight_roi.astype(jnp.float32), bands)
    acc = []
    wacc = []
    for lvl in range(bands + 1):
        ox = tl_x >> lvl if isinstance(tl_x, int) else tl_x // (1 << lvl)
        oy = tl_y >> lvl if isinstance(tl_y, int) else tl_y // (1 << lvl)
        w = wp[lvl]
        contrib = lap[lvl] * w[..., None]
        a = canvas.acc[lvl]
        cur = jax.lax.dynamic_slice(
            a, (oy, ox, 0), (contrib.shape[0], contrib.shape[1], 3))
        acc.append(jax.lax.dynamic_update_slice(a, cur + contrib,
                                                (oy, ox, 0)))
        wa = canvas.wacc[lvl]
        curw = jax.lax.dynamic_slice(wa, (oy, ox),
                                     (w.shape[0], w.shape[1]))
        wacc.append(jax.lax.dynamic_update_slice(wa, curw + w, (oy, ox)))
    return MultiBandCanvas(acc=tuple(acc), wacc=tuple(wacc))


def pyramid_bytes(canvas_h: int, canvas_w: int, bands: int) -> int:
    """HBM bytes of the mb_prepare accumulators for a canvas."""
    ch = align_up(canvas_h, 1 << bands)
    cw = align_up(canvas_w, 1 << bands)
    total = 0
    for lvl in range(bands + 1):
        total += (ch >> lvl) * (cw >> lvl) * 4 * 4  # acc (3ch) + wacc, f32
    return total


# canvases above this pyramid footprint stream through tiles (bounds HBM
# AND keeps compile counts down: tiles have ONE fixed shape, while every
# distinct whole-canvas pyramid shape costs a fresh feed/blend compile —
# minutes each over the remote-TPU relay, once per strip)
TILED_THRESHOLD_BYTES = 512 << 20
TILE = 4096
MAX_TILED_BANDS = 8  # halo is 8*2^bands: bands>8 would need multi-km halos
# per-tile ext-window pyramid budget. The halo grows with 2^bands, so high
# band counts inflate the ext window (tile + 2*halo): at bands=8 an 8192^2
# ext pyramid is ~1.4 GB and one fused feed's warp+pyramid transients run
# ~4x that — the 200-frame 4K sortie's 383 MP global canvas OOMed a 16 GB
# chip this way. Shrinking bands shrinks the halo quadratically; the
# band-count downgrade mirrors the reference's own canvas-size-adaptive
# degradation ladder (stitch_global.cpp:307-326).
TILE_PYR_BUDGET_BYTES = 640 << 20
# ext-window dim quantum: canvas dims are data-dependent (a strip's height
# varies by the registration drift), and every distinct ext shape recompiles
# the whole feed/blend program set (~3 min on the remote relay — 6 of 10
# flagship strips paid it, ~1200 s total). Snapping the ext dims up to this
# grid makes every strip share ONE compiled set for ≤ ~30% extra rows.
EXT_SNAP = 512


def _ext_dims(canvas_h: int, canvas_w: int, bands: int, tile: int):
    """Shared ext-window sizing for tiled_bands / mb_tile_grid."""
    g = 1 << bands
    halo = 8 << bands
    t = align_up(tile, g)
    ext_h = min(t + 2 * halo, align_up(canvas_h, max(g, EXT_SNAP)))
    ext_w = min(t + 2 * halo, align_up(canvas_w, max(g, EXT_SNAP)))
    return t, halo, ext_h, ext_w


def tiled_bands(canvas_h: int, canvas_w: int, bands: int,
                tile: int | None = None) -> int:
    """Largest band count whose per-tile ext-window pyramid fits budget."""
    bands = min(bands, MAX_TILED_BANDS)
    tile = tile if tile is not None else TILE
    while bands > 1:
        _, _, ext_h, ext_w = _ext_dims(canvas_h, canvas_w, bands, tile)
        if pyramid_bytes(ext_h, ext_w, bands) <= TILE_PYR_BUDGET_BYTES:
            break
        bands -= 1
    return bands


def mb_tile_grid(canvas_h: int, canvas_w: int, bands: int,
                 tile: int | None = None):
    """Tile decomposition for HBM-bounded multiband blending.

    Returns (tiles, halo): each tile is (core_y0, core_y1, core_x0,
    core_x1, ext_y0, ext_y1, ext_x0, ext_x1) — the core region is emitted
    to the output; the ext(ended) region (core + halo) is what the tile's
    canvas pyramid covers. The Laplacian pyramid's filters have compact
    support (~4*2^bands px at the coarsest level), so frames beyond the
    halo contribute nothing to the core: tiling is exact, not an
    approximation.

    Ext windows have a FIXED size per canvas (shifted, like the SIFT
    kernel's patch windows, rather than clipped at canvas edges), and the
    size itself is snapped to the EXT_SNAP grid: every tile of every
    strip/mosaic — across strips of *different* data-dependent canvas
    heights — then reuses one compiled feed/blend program. Rows/cols
    beyond the true canvas receive no content (warps resolve to zeros,
    weights to 0) and the core crop never reads them.
    """
    g = 1 << bands
    tile, halo, ext_h, ext_w = _ext_dims(canvas_h, canvas_w, bands,
                                         tile if tile is not None else TILE)
    ch = align_up(canvas_h, g)
    cw = align_up(canvas_w, g)
    tiles = []
    for cy0 in range(0, canvas_h, tile):
        cy1 = min(canvas_h, cy0 + tile)
        for cx0 in range(0, canvas_w, tile):
            cx1 = min(canvas_w, cx0 + tile)
            ey0 = min(max(0, align_down(cy0 - halo, g)),
                      max(0, ch - ext_h))
            ex0 = min(max(0, align_down(cx0 - halo, g)),
                      max(0, cw - ext_w))
            tiles.append((cy0, cy1, cx0, cx1, ey0, ey0 + ext_h,
                          ex0, ex0 + ext_w))
    return tiles, halo


def mb_compose_tiled(canvas_h: int, canvas_w: int, bands: int,
                     frame_boxes, feed_tile, tile: int | None = None,
                     devices=None, on_frame_retired=None,
                     feed_tile_many=None, on_rows=None,
                     want_bbox: bool = False, assemble: str = "host",
                     fetch_packed: bool = False):
    """Stream a multiband blend through canvas tiles (HBM-bounded).

    ``frame_boxes``: per-frame (x0, y0, x1, y1) canvas-space bounds (host
    floats); ``feed_tile(canvas_t, i, ey0, ex0, eh, ew) -> canvas_t``
    feeds frame i into a tile-local canvas whose origin is (ex0, ey0).
    Returns the blended (canvas_h, canvas_w, 3) uint8 numpy mosaic.

    The full-canvas pyramid of a 200-frame 4K sortie (~800 MP) needs
    ~17 GB of accumulators — over single-chip HBM. Tiles bound device
    memory at O(tile + halo) regardless of canvas size; the assembled
    mosaic lives in host RAM.

    Tiles are INDEPENDENT (the halo makes tiling exact), which is the
    compose stage's data-parallel axis: with ``devices`` (e.g.
    ``mesh.devices.flat``) tiles round-robin across chips and dispatch
    asynchronously; fetches are deferred a few tiles behind dispatch so
    device compute overlaps host-side mosaic assembly on any device count.

    ``on_frame_retired(i)``: called once no remaining tile intersects
    frame i — callers drop that frame's device residence (HBM headroom
    on wide mosaics where early strips finish long before the last tile).

    ``feed_tile_many(canvas_t, sel, ey0, ex0, eh, ew) -> canvas_t``:
    optional batched feed — one call per tile with every intersecting
    frame index, letting the caller fuse the whole tile's feeds into a
    single dispatch (per-feed dispatches cost ~200-300 ms of relay
    round-trip each).

    ``on_rows(y0, y1, rows)``: called, in increasing-y order, once every
    tile covering canvas rows [y0, y1) has materialized; ``rows`` is the
    finished ``out[y0:y1]`` view (never written again). Callers stream
    the mosaic out (e.g. incremental JPEG encode) while later tile rows
    are still blending on device.

    ``want_bbox``: also return the mosaic's autocrop bbox (y0, y1, x0,
    x1), exclusive upper bounds, assembled from per-tile device-side
    content flags (fixed-point gray > 1, the reference's test) — the
    caller's crop becomes a pure numpy slice instead of a host gray pass.
    Returns (mosaic, bbox) with bbox None when the canvas has no content.

    ``assemble="device"``: never fetch pixel data — blended tile cores
    commit into a DEVICE-resident uint8 canvas (dims snapped up to the
    ext grid) and the return is (device_canvas, bbox): the strip stage
    hands its panorama straight to the global compose without the
    ~90 s/sortie host round-trip (fetch here + re-upload there) the
    host path pays on the ~25 MB/s relay. Single-device (the caller's
    current default device); ``devices``/``on_rows`` are ignored.

    ``fetch_packed`` (host assembly): fetch tile windows as packed I420
    (ops/color.bgr_to_yuv420) — half the bytes over the relay link — and
    unpack with cv2 on host. Windows whose snapped dims break the 4|H,
    2|W packing contract fall back to raw BGR fetches.
    """
    import contextlib

    import numpy as np

    bands = tiled_bands(canvas_h, canvas_w, bands, tile)
    tiles, _ = mb_tile_grid(canvas_h, canvas_w, bands, tile)
    if assemble == "device":
        # single-device by design; host-assembly-only callbacks must not
        # be silently dropped (on_frame_retired IS honored below)
        assert devices is None and on_rows is None, \
            "assemble='device' supports neither devices nor on_rows"
        return _mb_compose_tiled_device(canvas_h, canvas_w, bands, tiles,
                                        frame_boxes, feed_tile,
                                        feed_tile_many, on_frame_retired)
    out = np.zeros((canvas_h, canvas_w, 3), np.uint8)
    devices = list(devices) if devices is not None else [None]
    # in-flight cap = device count: each pending entry keeps a whole
    # tile's feed transients allocatable ahead of execution; on a single
    # chip more than one queued tile risks RESOURCE_EXHAUSTED
    depth = max(1, len([d for d in devices if d is not None]))
    pending = []
    last_tile = {}
    for t_idx, (_, _, _, _, ey0, ey1, ex0, ex1) in enumerate(tiles):
        for i, (fx0, fy0, fx1, fy1) in enumerate(frame_boxes):
            if not (fx1 <= ex0 or fx0 >= ex1 or fy1 <= ey0 or fy0 >= ey1):
                last_tile[i] = t_idx

    # row-band completion tracking for on_rows: tiles are generated
    # row-major with a fixed column count per band
    n_cols = max(1, len({(t[2], t[3]) for t in tiles}))
    band_rows = sorted({(t[0], t[1]) for t in tiles})
    band_left = [n_cols] * len(band_rows)
    next_band = [0]  # boxed for closure mutation

    def _band_done(t_idx):
        if on_rows is None:
            return
        b = t_idx // n_cols
        band_left[b] -= 1
        while (next_band[0] < len(band_rows)
               and band_left[next_band[0]] == 0):
            y0, y1 = band_rows[next_band[0]]
            on_rows(y0, y1, out[y0:y1])
            next_band[0] += 1

    bbox = [canvas_h, -1, canvas_w, -1]     # y0, y1, x0, x1 accumulator

    def materialize(entry):
        # fetch uint8, not float32, and only the (snapped) core window —
        # the host link is the compose bottleneck and the ext halo is
        # ~30% extra bytes (see _blend_u8_core). (oy, ox) is the fetched
        # window's canvas origin.
        (t_idx, cy0, cy1, cx0, cx1, oy, ox, packed,
         (img, rows_any, cols_any)) = entry
        a = np.asarray(img)
        if packed:  # I420 wire format: half the fetch bytes
            import cv2
            a = cv2.cvtColor(a, cv2.COLOR_YUV2BGR_I420)
        out[cy0:cy1, cx0:cx1] = a[cy0 - oy:cy1 - oy, cx0 - ox:cx1 - ox]
        if want_bbox:
            # content flags trimmed to the core (exact there; the snap
            # margin belongs to neighbor tiles)
            ra = np.asarray(rows_any)[cy0 - oy:cy1 - oy]
            ca = np.asarray(cols_any)[cx0 - ox:cx1 - ox]
            if ra.any():
                bbox[0] = min(bbox[0], cy0 + int(np.argmax(ra)))
                bbox[1] = max(bbox[1], cy1 - int(np.argmax(ra[::-1])))
            if ca.any():
                bbox[2] = min(bbox[2], cx0 + int(np.argmax(ca)))
                bbox[3] = max(bbox[3], cx1 - int(np.argmax(ca[::-1])))
        _band_done(t_idx)

    for t_idx, (cy0, cy1, cx0, cx1, ey0, ey1, ex0, ex1) in \
            enumerate(tiles):
        dev = devices[t_idx % len(devices)]
        ctx = jax.default_device(dev) if dev is not None \
            else contextlib.nullcontext()
        eh, ew = ey1 - ey0, ex1 - ex0
        with ctx:
            canvas_t = mb_prepare(eh, ew, bands)
            sel = [i for i, (fx0, fy0, fx1, fy1) in enumerate(frame_boxes)
                   if not (fx1 <= ex0 or fx0 >= ex1 or fy1 <= ey0
                           or fy0 >= ey1)]
            fed = len(sel)
            if sel and feed_tile_many is not None:
                canvas_t = feed_tile_many(canvas_t, sel, ey0, ex0, eh, ew)
            else:
                for i in sel:
                    canvas_t = feed_tile(canvas_t, i, ey0, ex0, eh, ew)
            if fed:
                # fetch the core only, snapped to a few static shapes (the
                # halo is ~30% of the ext window's bytes; crop offsets
                # clamp so the snapped window stays inside the ext dims)
                crop_h = min(align_up(cy1 - cy0, 256), eh)
                crop_w = min(align_up(cx1 - cx0, 256), ew)
                crop_y = min(cy0 - ey0, eh - crop_h)
                crop_x = min(cx0 - ex0, ew - crop_w)
                oy, ox = ey0 + crop_y, ex0 + crop_x
                packed = (fetch_packed and crop_h % 4 == 0
                          and crop_w % 2 == 0)
                pending.append((t_idx, cy0, cy1, cx0, cx1, oy, ox, packed,
                                _blend_u8_core(canvas_t, crop_y, crop_x,
                                               cy0 - oy, cx0 - ox,
                                               cy1 - cy0, cx1 - cx0,
                                               out_h=eh, out_w=ew,
                                               crop_h=crop_h,
                                               crop_w=crop_w,
                                               pack=packed)))
            else:
                _band_done(t_idx)  # empty tile: rows are final zeros
        if fed:
            from ..runtime import hbm
            hbm.sample(f"compose-tile{t_idx}")
        if on_frame_retired is not None:
            # feeds are enqueued; JAX keeps donated/arg buffers alive until
            # execution, so the caller may drop its references now
            for i, lt in last_tile.items():
                if lt == t_idx:
                    on_frame_retired(i)
        while len(pending) > depth:
            materialize(pending.pop(0))
    for entry in pending:
        materialize(entry)
    if want_bbox:
        has = bbox[1] > bbox[0] and bbox[3] > bbox[2]
        return out, (tuple(bbox) if has else None)
    return out


@jax.jit
def clip_u8(img: jnp.ndarray) -> jnp.ndarray:
    """Device-side uint8 conversion: fetch 1/4 the bytes of float32
    (the host link is the compose bottleneck on the remote-TPU relay)."""
    return jnp.clip(img, 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("out_h", "out_w"))
def _blend_u8(canvas: MultiBandCanvas, *, out_h: int, out_w: int):
    """Fused normalize+collapse+clip+u8 as ONE dispatch (eager mb_blend is
    ~15 jnp ops = ~15 relay round-trips per tile); donates the canvas
    accumulators back to the allocator."""
    img, _ = mb_blend(canvas, out_h, out_w)
    return jnp.clip(img, 0.0, 255.0).astype(jnp.uint8)


def _blend_u8_core_body(canvas: MultiBandCanvas, crop_y, crop_x, core_y,
                        core_x, core_h, core_w, *, out_h: int, out_w: int,
                        crop_h: int, crop_w: int, pack: bool = False):
    """_blend_u8 followed by a device-side core crop.

    The caller fetches only the tile CORE (the ext window's halo is ~30%
    extra bytes over the relay link). Crop offsets are traced; crop dims
    are snapped by the caller so the handful of (crop_h, crop_w) buckets
    reuse compiled programs. ``pack`` returns the window as packed I420
    (ops/color.bgr_to_yuv420, half the fetch bytes; flags are computed
    from the BGR pixels BEFORE the pack).

    Also returns the window's content row/col flags (fixed-point BT.601
    gray > 1, the reference's autocrop test, stitch_common.cpp:9): two
    tiny bool vectors per tile that let the caller assemble the exact
    autocrop bbox WITHOUT a host-side gray pass over the mosaic (~5-10 s
    of 1-core numpy per strip panorama, serialized against the background
    JPEG encoder)."""
    img, _ = mb_blend(canvas, out_h, out_w)
    u8 = jnp.clip(img, 0.0, 255.0).astype(jnp.uint8)
    win = jax.lax.dynamic_slice(u8, (crop_y, crop_x, 0),
                                (crop_h, crop_w, 3))
    b, g, r = (win[..., 0].astype(jnp.uint32),
               win[..., 1].astype(jnp.uint32),
               win[..., 2].astype(jnp.uint32))
    content = ((29 * b + 150 * g + 77 * r + 128) >> 8) > 1
    # flags restricted to the CORE sub-window (exact values; the snap
    # margin is only halo-approximate), window-relative traced offsets
    ri = jnp.arange(crop_h)
    ci = jnp.arange(crop_w)
    content &= ((ri >= core_y) & (ri < core_y + core_h))[:, None]
    content &= ((ci >= core_x) & (ci < core_x + core_w))[None, :]
    if pack:
        from .color import bgr_to_yuv420
        win = bgr_to_yuv420(win)
    return win, jnp.any(content, axis=1), jnp.any(content, axis=0)


_blend_u8_core = functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("out_h", "out_w", "crop_h", "crop_w",
                     "pack"))(_blend_u8_core_body)


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("out_h", "out_w", "crop_h", "crop_w"))
def _blend_commit_core(canvas: MultiBandCanvas, dev_out, crop_y, crop_x,
                       core_y, core_x, core_h, core_w, oy, ox, *,
                       out_h: int, out_w: int, crop_h: int, crop_w: int):
    """_blend_u8_core that COMMITS the core into a device canvas.

    ``dev_out``: (CH, CW, 3) uint8 device canvas (donated). The blended
    window is written at canvas origin (oy, ox) but only inside the core
    sub-window [core_y, core_y+core_h) x [core_x, core_x+core_w) —
    outside it the existing canvas values are kept (the snap margin
    belongs to neighbor tiles, where the halo guarantee doesn't hold).
    Pixels never cross the host link; the strip stage's panorama stays
    device-resident for the global compose (runtime/handoff.py)."""
    win, rows_any, cols_any = _blend_u8_core_body(
        canvas, crop_y, crop_x, core_y, core_x, core_h, core_w,
        out_h=out_h, out_w=out_w, crop_h=crop_h, crop_w=crop_w)
    cur = jax.lax.dynamic_slice(dev_out, (oy, ox, 0),
                                (crop_h, crop_w, 3))
    ri = jnp.arange(crop_h)
    ci = jnp.arange(crop_w)
    core = (((ri >= core_y) & (ri < core_y + core_h))[:, None]
            & ((ci >= core_x) & (ci < core_x + core_w))[None, :])
    dev_out = jax.lax.dynamic_update_slice(
        dev_out, jnp.where(core[..., None], win, cur), (oy, ox, 0))
    return dev_out, rows_any, cols_any


def _mb_compose_tiled_device(canvas_h: int, canvas_w: int, bands: int,
                             tiles, frame_boxes, feed_tile,
                             feed_tile_many, on_frame_retired=None):
    """Device-assembly variant of mb_compose_tiled (assemble="device").

    Returns (dev_canvas, bbox): ``dev_canvas`` is a (CH, CW, 3) uint8
    DEVICE array with CH/CW the ext-snapped canvas dims (content in
    [0, canvas_h) x [0, canvas_w), zeros beyond), ``bbox`` the exact
    content box (y0, y1, x0, x1) or None. The only host fetch is one
    concatenated flags vector at the end (~KBs)."""
    import numpy as np

    g = 1 << bands
    ch_a = align_up(canvas_h, max(g, EXT_SNAP))
    cw_a = align_up(canvas_w, max(g, EXT_SNAP))
    dev_out = jnp.zeros((ch_a, cw_a, 3), jnp.uint8)
    flag_entries = []   # (cy0, cy1, cx0, cx1, oy, ox, rows_any, cols_any)
    last_tile = {}      # frame -> last tile index that touches it
    for t_idx, (_, _, _, _, ey0, ey1, ex0, ex1) in enumerate(tiles):
        for i, (fx0, fy0, fx1, fy1) in enumerate(frame_boxes):
            if not (fx1 <= ex0 or fx0 >= ex1 or fy1 <= ey0 or fy0 >= ey1):
                last_tile[i] = t_idx
    # backpressure: everything here is async dispatch with no pixel fetch
    # until the final flags read, so an unthrottled loop can enqueue many
    # tiles' feed transients ahead of execution — the same single-chip
    # RESOURCE_EXHAUSTED risk the host path caps with its pending queue.
    # Block on the previous tile's (tiny) flags output before dispatching
    # the one after next: at most 2 tiles' transients are ever allocatable.
    inflight = []
    for t_idx, (cy0, cy1, cx0, cx1, ey0, ey1, ex0, ex1) in \
            enumerate(tiles):
        eh, ew = ey1 - ey0, ex1 - ex0
        sel = [i for i, (fx0, fy0, fx1, fy1) in enumerate(frame_boxes)
               if not (fx1 <= ex0 or fx0 >= ex1 or fy1 <= ey0
                       or fy0 >= ey1)]
        if not sel:
            continue
        canvas_t = mb_prepare(eh, ew, bands)
        if feed_tile_many is not None:
            canvas_t = feed_tile_many(canvas_t, sel, ey0, ex0, eh, ew)
        else:
            for i in sel:
                canvas_t = feed_tile(canvas_t, i, ey0, ex0, eh, ew)
        crop_h = min(align_up(cy1 - cy0, 256), eh)
        crop_w = min(align_up(cx1 - cx0, 256), ew)
        crop_y = min(cy0 - ey0, eh - crop_h)
        crop_x = min(cx0 - ex0, ew - crop_w)
        oy, ox = ey0 + crop_y, ex0 + crop_x
        dev_out, rows_any, cols_any = _blend_commit_core(
            canvas_t, dev_out, crop_y, crop_x, cy0 - oy, cx0 - ox,
            cy1 - cy0, cx1 - cx0, oy, ox,
            out_h=eh, out_w=ew, crop_h=crop_h, crop_w=crop_w)
        flag_entries.append((cy0, cy1, cx0, cx1, oy, ox,
                             rows_any, cols_any))
        inflight.append(rows_any)
        if len(inflight) > 1:
            inflight.pop(0).block_until_ready()
        if on_frame_retired is not None:
            for i, lt in last_tile.items():
                if lt == t_idx:
                    on_frame_retired(i)
        from ..runtime import hbm
        hbm.sample(f"compose-tile{t_idx}")
    bbox = [canvas_h, -1, canvas_w, -1]
    if flag_entries:
        # ONE host fetch for every tile's flags (each round-trip through
        # the relay costs ~30-80 ms; a 70-tile sortie would pay seconds)
        flat = np.asarray(jnp.concatenate(
            [f for e in flag_entries for f in (e[6], e[7])]))
        pos = 0
        for cy0, cy1, cx0, cx1, oy, ox, ra_d, ca_d in flag_entries:
            ra = flat[pos:pos + ra_d.shape[0]][cy0 - oy:cy1 - oy]
            pos += ra_d.shape[0]
            ca = flat[pos:pos + ca_d.shape[0]][cx0 - ox:cx1 - ox]
            pos += ca_d.shape[0]
            if ra.any():
                bbox[0] = min(bbox[0], cy0 + int(np.argmax(ra)))
                bbox[1] = max(bbox[1], cy1 - int(np.argmax(ra[::-1])))
            if ca.any():
                bbox[2] = min(bbox[2], cx0 + int(np.argmax(ca)))
                bbox[3] = max(bbox[3], cx1 - int(np.argmax(ca[::-1])))
    has = bbox[1] > bbox[0] and bbox[3] > bbox[2]
    return dev_out, (tuple(bbox) if has else None)


def mb_blend(canvas: MultiBandCanvas, out_h: int, out_w: int):
    """Normalize, collapse, crop. Returns (img (H,W,3) f32, valid (H,W))."""
    eps = 1e-5
    pyr = [a / (w[..., None] + eps)
           for a, w in zip(canvas.acc, canvas.wacc)]
    out = collapse_laplacian(pyr)
    valid = canvas.wacc[0] > 1e-3
    out = jnp.where(valid[..., None], out, 0.0)
    return (jnp.clip(out[:out_h, :out_w], 0.0, 255.0),
            valid[:out_h, :out_w])


# --------------------------------------------------------------------------
# feather blend (pairwise config)
# --------------------------------------------------------------------------

def border_feather_weight(h: int, w: int, sharpness: float = 0.04
                          ) -> jnp.ndarray:
    """Source-frame weight: distance to the image border, saturating.

    OpenCV FeatherBlender builds weights from the distance transform of the
    mask; for a full rectangular source this is exactly min distance to the
    four edges. The weight is warped together with the image so it stays
    correct under any transform. ``sharpness`` matches cv2's 1/ramp-width
    semantics (0.04 -> 25 px ramp).
    """
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    d = jnp.minimum(jnp.minimum(ys + 1.0, h - ys),
                    jnp.minimum(xs + 1.0, w - xs))
    return jnp.clip(d * sharpness, 0.0, 1.0)


def feather_blend(images: list[jnp.ndarray], weights: list[jnp.ndarray]):
    """Weighted-average blend. images: (H,W,3); weights: (H,W) in [0,1]."""
    acc = jnp.zeros_like(images[0])
    wsum = jnp.zeros(images[0].shape[:2], jnp.float32)
    for img, w in zip(images, weights):
        acc = acc + img * w[..., None]
        wsum = wsum + w
    out = acc / jnp.maximum(wsum, 1e-6)[..., None]
    return jnp.where((wsum > 1e-6)[..., None], out, 0.0), wsum > 1e-6
