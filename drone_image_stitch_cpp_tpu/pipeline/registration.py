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
from ..ops.color import bgr_to_gray, yuv420_luma
from ..ops.resize import resize_area, scale_for_megapixels

def _bucket_dim(d: int) -> int:
    """Coarse shape buckets: pad is 256 below 2048, 512 above.

    Every distinct detect shape costs a full XLA compile (minutes on the
    CPU backend, a remote round-trip on TPU); coarse buckets collapse the
    near-identical strip/ROI sizes of a sortie onto a handful of programs.
    """
    m = 256 if d <= 2048 else 512
    return -(-d // m) * m


def bucket_shape(h: int, w: int) -> tuple[int, int]:
    return (_bucket_dim(h), _bucket_dim(w))


_DETECT_CHUNK = 8  # frames per compiled detect program


@functools.partial(jax.jit, static_argnames=("max_kp", "out_h", "out_w"))
def _detect_batch(grays: jnp.ndarray, true_hw: jnp.ndarray, max_kp: int,
                  out_h: int, out_w: int) -> F.Features:
    """Batched detect over (B, H, W) padded grays; pad regions are excluded
    from the per-frame keypoint budget via true_hw. On TPU the orientation+
    descriptor stage runs as a fused Pallas kernel (ops/pallas_sift.py)."""
    feats = F.detect_and_describe_batched(grays, max_kp, true_hw=true_hw)
    ok = (feats.valid
          & (feats.xy[..., 0] < true_hw[:, None, 1].astype(jnp.float32))
          & (feats.xy[..., 1] < true_hw[:, None, 0].astype(jnp.float32)))
    return feats._replace(valid=ok)


def _gray_detect_tail(gray: jnp.ndarray, max_kp: int, wh: int, ww: int,
                      bh: int, bw: int) -> F.Features:
    """Shared tail of the fused ingest+detect programs: resize to the work
    scale, edge-pad to the bucket, batched detect."""
    b = gray.shape[0]
    if (wh, ww) != gray.shape[1:]:
        gray = jax.vmap(lambda g: resize_area(g, wh, ww))(gray)
    gray = jnp.pad(gray, ((0, 0), (0, bh - wh), (0, bw - ww)), mode="edge")
    true_hw = jnp.broadcast_to(jnp.asarray([wh, ww], jnp.int32), (b, 2))
    return _detect_batch(gray, true_hw, max_kp, bh, bw)


@functools.partial(jax.jit, static_argnames=("max_kp", "wh", "ww", "bh",
                                             "bw"))
def _detect_batch_u8(frames_u8: jnp.ndarray, max_kp: int, wh: int, ww: int,
                     bh: int, bw: int) -> F.Features:
    """Fused ingest+detect for same-sized BGR uint8 frames (B, H, W, 3).

    Frames cross host->device as uint8 (4x less tunnel traffic than f32;
    a 200-frame 4K sortie moves 1.6 GB instead of 6.6 GB) and gray/resize/
    pad run inside the one compiled program instead of 3 dispatches per
    frame (~80 ms each on the remote relay).
    """
    gray = bgr_to_gray(frames_u8.astype(jnp.float32))
    return _gray_detect_tail(gray, max_kp, wh, ww, bh, bw)


@functools.partial(jax.jit, static_argnames=("max_kp", "wh", "ww", "bh",
                                             "bw"))
def _detect_batch_yuv(packed_u8: jnp.ndarray, max_kp: int, wh: int,
                      ww: int, bh: int, bw: int) -> F.Features:
    """Fused ingest+detect for packed I420 frames (B, H*3/2, W) uint8
    (the FrameStore's yuv420 wire format, 1.5 B/px): the JPEG Y plane IS
    the BT.601 luma the BGR path computes, so gray extraction is a slice."""
    gray = yuv420_luma(packed_u8)
    return _gray_detect_tail(gray, max_kp, wh, ww, bh, bw)


def detect_features(images: List[np.ndarray], n_features: int,
                    resol_mpx: float, store=None,
                    indices: List[int] | None = None,
                    coord_scale: float = 1.0
                    ) -> tuple[F.Features, float]:
    """Batched feature extraction; frames may differ in size.

    The work scale comes from the first image (cv::Stitcher computes
    work_scale from the first frame and applies it to all); every frame is
    scaled by it and padded to one common bucket so the batch stays a
    single static-shape program (mixed sizes arise on the sequential
    fallback path, where a growing mosaic registers against the next
    frame). Returns (Features with leading batch axis, work_scale).
    Keypoint coordinates are in each frame's *full-resolution* pixels.

    ``store``/``indices``: a runtime.feed.FrameStore serving frames that
    are already device-resident — detect chunks then stack on device
    instead of re-crossing the relay (the frames were transferred once,
    at ingest). Store frames are uniform uint8 BGR by contract (the app
    only builds a store for such inputs), so shape math comes from the
    store's shape0 — in streaming mode later frames may still be
    decoding when this runs.

    ``coord_scale``: the store frames' downscale factor vs the TRUE
    full-resolution frames (e.g. 2.0 for a half-res DCT-scaled decode
    store). Keypoint coordinates/sigmas come back in true full-res
    pixels and the returned work scale is relative to full resolution,
    so downstream geometry (RANSAC thresholds, transforms) is identical
    to a full-res detect at the same work resolution.
    """
    if store is not None:
        indices = list(indices if indices is not None
                       else range(len(store)))
        h0, w0 = store.shape0[:2]
        scale = scale_for_megapixels(h0, w0, resol_mpx)
        wh = max(1, int(round(h0 * scale)))
        ww = max(1, int(round(w0 * scale)))
        bh, bw = bucket_shape(wh, ww)
        n = len(indices)
        outs = []
        chunks = [indices[c0:c0 + _DETECT_CHUNK]
                  for c0 in range(0, n, _DETECT_CHUNK)]
        detect = (_detect_batch_yuv if getattr(store, "fmt", "bgr")
                  == "yuv420" else _detect_batch_u8)
        for ch in chunks:
            dev_chunk = store.batch(ch, pad_to=_DETECT_CHUNK
                                    if n > _DETECT_CHUNK else 0)
            fc = detect(dev_chunk, n_features, wh, ww, bh, bw)
            outs.append(jax.tree_util.tree_map(
                lambda a, t=len(ch): a[:t], fc))
        feats = (outs[0] if len(outs) == 1 else jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *outs))
        sx = ww / float(w0) / coord_scale
        sy = wh / float(h0) / coord_scale
        xy = jnp.stack([(feats.xy[..., 0] + 0.5) / sx - 0.5,
                        (feats.xy[..., 1] + 0.5) / sy - 0.5], axis=-1)
        eff = scale / coord_scale
        return feats._replace(xy=xy, sigma=feats.sigma / eff), eff
    h0, w0 = images[0].shape[:2]
    scale = scale_for_megapixels(h0, w0, resol_mpx)

    work_hw = []
    for img in images:
        h, w = img.shape[:2]
        work_hw.append((max(1, int(round(h * scale))),
                        max(1, int(round(w * scale)))))
    bh, bw = bucket_shape(max(hw[0] for hw in work_hw),
                          max(hw[1] for hw in work_hw))

    n = len(images)
    same_size = (len({im.shape[:2] for im in images}) == 1
                 and images[0].ndim == 3 and images[0].shape[2] == 3
                 and images[0].dtype == np.uint8)
    if same_size:
        # fast path: uint8 transfer + fused gray/resize/pad/detect, chunked
        # (a 200-frame sortie in ONE program needs ~10 GB of scale-space
        # intermediates and is rejected by the TPU compile helper).
        # Chunks arrive through the double-buffered DeviceFeed (SURVEY
        # §7.2): chunk k+1 stacks on a host thread and device_puts while
        # chunk k's detect program runs, so ingest overlaps compute —
        # unlike the reference's serial decode loop
        # (image_loader.cpp:52-59).
        from ..runtime.feed import DeviceFeed
        wh, ww = work_hw[0]
        outs = []
        feed = DeviceFeed(images, batch_size=_DETECT_CHUNK,
                          keep_uint8=True, pad_tail=True)
        for dev_chunk, take in feed:
            fc = _detect_batch_u8(dev_chunk, n_features, wh, ww, bh, bw)
            outs.append(jax.tree_util.tree_map(lambda a: a[:take], fc))
        feats = (outs[0] if len(outs) == 1 else jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *outs))
    else:
        grays = []
        for img, (wh, ww) in zip(images, work_hw):
            h, w = img.shape[:2]
            g = bgr_to_gray(jnp.asarray(img.astype(np.float32)))
            if (wh, ww) != (h, w):
                g = resize_area(g, wh, ww)
            # edge-replicate pad: no fake gradients at the pad frontier
            g = jnp.pad(g, ((0, bh - wh), (0, bw - ww)), mode="edge")
            grays.append(g)
        true_hw = jnp.asarray(work_hw, jnp.int32)
        if n <= _DETECT_CHUNK:
            feats = _detect_batch(jnp.stack(grays), true_hw, n_features,
                                  bh, bw)
        else:
            outs = []
            for c0 in range(0, n, _DETECT_CHUNK):
                chunk = grays[c0:c0 + _DETECT_CHUNK]
                thw = true_hw[c0:c0 + _DETECT_CHUNK]
                take = len(chunk)
                if take < _DETECT_CHUNK:
                    chunk = chunk + [chunk[-1]] * (_DETECT_CHUNK - take)
                    thw = jnp.concatenate(
                        [thw,
                         jnp.tile(thw[-1:], (_DETECT_CHUNK - take, 1))])
                fc = _detect_batch(jnp.stack(chunk), thw, n_features,
                                   bh, bw)
                outs.append(jax.tree_util.tree_map(lambda a: a[:take], fc))
            feats = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs), *outs)
    # back to full-res coordinates with EXACT per-axis scales (the rounded
    # work size makes the effective scale differ from the nominal one by
    # ~1e-3 — a pixel of systematic drift across a frame if ignored); the
    # +-0.5 terms are the pixel-center shift of area resampling
    sx = jnp.asarray([ww / float(img.shape[1])
                      for img, (wh, ww) in zip(images, work_hw)])
    sy = jnp.asarray([wh / float(img.shape[0])
                      for img, (wh, ww) in zip(images, work_hw)])
    xy = jnp.stack([(feats.xy[..., 0] + 0.5) / sx[:, None] - 0.5,
                    (feats.xy[..., 1] + 0.5) / sy[:, None] - 0.5], axis=-1)
    feats = feats._replace(xy=xy, sigma=feats.sigma / scale)
    return feats, scale
