"""Host -> HBM image feed: threaded decode + double-buffered device_put.

The TPU-native replacement for the reference's synchronous decode loop
(image_loader.cpp:52-59): JPEG decode runs on host threads (the native
libjpeg pool when built, else cv2), and each batch is device_put one step
ahead of consumption so the transfer overlaps device compute (device_put is
asynchronous in JAX; consuming the previous batch while the next is in
flight gives the double buffering).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
from typing import Iterable, Iterator, List, Optional, Sequence

import numpy as np


def _decode_host(paths: Sequence[str], n_threads: int,
                 scale_denom: int = 1) -> List[np.ndarray]:
    from ..utils.native import decode_batch_native
    out = decode_batch_native(list(paths), n_threads=n_threads,
                              scale_denom=scale_denom)
    if out is not None:
        return out
    import cv2

    def one(p):
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img is not None and scale_denom != 1:
            # fallback parity with libjpeg DCT scaling: full decode +
            # area downscale (slower, same low-pass semantics)
            img = cv2.resize(img, (max(1, img.shape[1] // scale_denom),
                                   max(1, img.shape[0] // scale_denom)),
                             interpolation=cv2.INTER_AREA)
        return img

    with cf.ThreadPoolExecutor(max_workers=n_threads) as ex:
        return list(ex.map(one, paths))


class FrameStoreError(RuntimeError):
    """A streaming FrameStore hit a decode failure / non-uniform shape.

    Callers fall back to the eager loader path, which reproduces the
    reference's skip-unreadable semantics (image_loader.cpp:52-59)."""


class FrameStore:
    """Transfer-once device cache of same-shape uint8 frames.

    The remote-TPU relay moves ~50 MB/s, so a 200-frame 4K sortie is
    ~5 GB as uint8 — every full pass over the frames costs ~100 s of
    pure host->device transfer. Grouping detect, strip registration, and
    the compose feeds all consume the SAME decoded frames; this store
    device_puts each 8-frame chunk once (uint8, aligned with the detect
    programs' chunking) and serves later passes by on-device slicing.
    ``batch(indices)`` stacks arbitrary frames (a strip's subset) from the
    cached chunks; ``frame(i)`` returns one device frame for the compose
    feed. device_put is asynchronous, so transfers run ahead of the
    consuming detect dispatches (SURVEY section 7.2).

    ``from_paths`` builds a STREAMING store: JPEG decode runs on a
    background thread chunk by chunk, so host decode (~60 s for a
    200-frame 4K sortie on one core) overlaps the grouping stage's device
    compute instead of serializing before it. A decode failure or a
    frame-shape mismatch surfaces as FrameStoreError on the first touch
    of that chunk — the app then falls back to the eager loader.
    """

    CHUNK = 8

    def __init__(self, images: Sequence[np.ndarray], fmt: str = "bgr"):
        self.images = list(images)
        self.fmt = fmt          # "bgr": (H, W, 3) u8 | "yuv420": packed I420
        self._chunks: dict = {}
        self._paths: Optional[List[str]] = None
        self._events: list = []
        self.failed: List[int] = []

    @classmethod
    def from_paths(cls, paths: Sequence[str],
                   n_threads: Optional[int] = None,
                   scale_denom: int = 1,
                   after: Optional["FrameStore"] = None,
                   fmt: str = "auto") -> "FrameStore":
        """``scale_denom``: decode at 1/denom resolution (libjpeg DCT
        scaling — the detect stages work at <=1800 px, so a half-res
        store quarters both decode time and relay transfer). ``after``:
        another streaming store whose decode must COMPLETE before this
        one starts (both threads share the single host core; the
        half-res grouping store must win that race).

        ``fmt="auto"`` probes the first file with the native raw 4:2:0
        decoder: when the sources are 4:2:0 YCbCr JPEGs (drone cameras
        and this repo's benches), frames are stored/shipped in the JPEG's
        NATIVE planar form — (H*3/2, W) uint8 packed I420 — which halves
        host->device transfer (1.5 B/px vs 3; the relay wire is the
        ingest bottleneck) AND skips libjpeg's upsample+color passes on
        the host. Consumers convert on device (ops/color.yuv420_to_bgr);
        detect reads the Y plane directly. Non-420 inputs keep the BGR
        path; a later frame failing the raw decode is marked failed and
        surfaces as FrameStoreError (the app's eager-loader fallback)."""
        import threading

        st = cls([])
        st._paths = list(paths)
        st.images = [None] * len(st._paths)
        n_chunks = -(-len(st._paths) // cls.CHUNK) if st._paths else 0
        st._events = [threading.Event() for _ in range(n_chunks)]
        nt = n_threads or min(8, (os.cpu_count() or 1) * 2)
        if fmt == "auto":
            # ablation override (artifacts/ABLATION_rmse_r5.md): force the
            # BGR wire to isolate the I420 ingest's quality contribution
            fmt = os.environ.get("TM_INGEST_FMT", "auto")
        if fmt == "auto":
            fmt = "bgr"
            if scale_denom == 1 and st._paths:
                from ..utils.native import decode_image_yuv420_native
                if decode_image_yuv420_native(st._paths[0]) is not None:
                    fmt = "yuv420"
        st.fmt = fmt

        def _decode(chunk):
            if st.fmt == "yuv420":
                from ..utils.native import decode_batch_yuv420_native
                out = decode_batch_yuv420_native(list(chunk), nt)
                if out is not None:
                    return out
            return _decode_host(chunk, nt, scale_denom)

        def _run():
            if after is not None:
                after.wait_all()
            # NB deliberately NO eager device_put here: the relay
            # executes transfers and compute FIFO, so enqueueing chunks
            # ahead of the consumer makes every detect dispatch queue
            # behind future transfers (measured: grouping detect 147 s
            # on-demand vs 157-220 s with eager enqueue). The consumer's
            # on-demand _chunk() is exactly 1-ahead of compute, which
            # already overlaps transfer and detect.
            for ci in range(n_chunks):
                c0 = ci * cls.CHUNK
                chunk = st._paths[c0:c0 + cls.CHUNK]
                for k, img in enumerate(_decode(chunk)):
                    if img is None or (st.images[0] is not None
                                       and c0 + k > 0
                                       and img.shape != st.images[0].shape):
                        st.failed.append(c0 + k)
                    else:
                        st.images[c0 + k] = img
                st._events[ci].set()

        threading.Thread(target=_run, daemon=True).start()
        return st

    def wait_all(self) -> None:
        for ev in self._events:
            ev.wait()

    @property
    def shape0(self):
        """Uniform LOGICAL frame shape — (H, W, 3) regardless of storage
        format (blocks on frame 0 in streaming mode)."""
        if self._events:
            self._events[0].wait()
        if self.images[0] is None:
            raise FrameStoreError("frame 0 unreadable")
        sh = self.images[0].shape
        if self.fmt == "yuv420":
            return (sh[0] * 2 // 3, sh[1], 3)
        return sh

    def _host_bgr(self, i: int) -> np.ndarray:
        """BGR view of a stored packed-I420 frame. Re-decodes the source
        JPEG through the standard BGR path so the result is BIT-EXACT with
        the eager loader (cv2's I420 conversion uses nearest-neighbor
        chroma, libjpeg fancy triangle — off by a few chroma levels).
        These are rare host-side paths (eager fallbacks, compositing
        rescale); the hot paths consume the device-side conversion."""
        if self._paths is not None:
            out = _decode_host([self._paths[i]], 1)[0]
            if out is not None:
                return out
        import cv2
        return cv2.cvtColor(self.images[i], cv2.COLOR_YUV2BGR_I420)

    def host_images(self) -> List[np.ndarray]:
        """All decoded frames as BGR uint8 (blocks); raises on any
        failure. In yuv420 mode each frame converts on demand (rare
        paths: eager fallbacks, compositing rescale)."""
        self.wait_all()
        if self.failed:
            raise FrameStoreError(
                f"unreadable/mismatched frames at indices {self.failed}")
        if self.fmt == "yuv420":
            return [self._host_bgr(i) for i in range(len(self.images))]
        return self.images

    def host_frame(self, i: int) -> np.ndarray:
        """One decoded host frame as BGR uint8 (blocks on its chunk in
        streaming mode); raises if that frame failed to decode."""
        if self._events:
            self._events[i // self.CHUNK].wait()
        if self.images[i] is None:
            raise FrameStoreError(f"unreadable frame at index {i}")
        if self.fmt == "yuv420":
            return self._host_bgr(i)
        return self.images[i]

    def __len__(self) -> int:
        return len(self.images)

    def _chunk(self, c0: int):
        if c0 not in self._chunks:
            import jax
            if self._events:
                self._events[c0 // self.CHUNK].wait()
                bad = [i for i in self.failed if c0 <= i < c0 + self.CHUNK]
                if bad:
                    raise FrameStoreError(
                        f"unreadable/mismatched frames at indices {bad}")
                if c0 in self._chunks:       # decode thread enqueued it
                    return self._chunks[c0]
            self._chunks[c0] = jax.device_put(
                np.stack(self.images[c0:c0 + self.CHUNK]))
            from . import hbm
            hbm.sample(f"framestore-chunk{c0}")
        return self._chunks[c0]

    def prefetch(self, i: int) -> None:
        if 0 <= i < len(self.images):
            self._chunk((i // self.CHUNK) * self.CHUNK)

    def frame(self, i: int):
        c0 = (i // self.CHUNK) * self.CHUNK
        return self._chunk(c0)[i - c0]

    def batch(self, indices: Sequence[int], pad_to: int = 0):
        """Device (B, H, W, 3) uint8 stack of ``indices`` (tail-padded by
        repeating the last frame up to ``pad_to`` so shapes stay static)."""
        import jax.numpy as jnp
        idx = list(indices)
        if pad_to and len(idx) < pad_to:
            idx = idx + [idx[-1]] * (pad_to - len(idx))
        # contiguous aligned chunks come straight from the cache
        c0 = (idx[0] // self.CHUNK) * self.CHUNK
        if idx == list(range(c0, c0 + self.CHUNK)):
            return self._chunk(c0)
        return jnp.stack([self.frame(i) for i in idx])

    def clear(self) -> None:
        self._chunks.clear()


class DeviceFeed:
    """Iterate decoded image batches as device arrays with 1-batch lookahead.

    ``items``: list of file paths (decoded on host threads) or ndarrays.
    Batches are stacked (same-shape frames). Yields (device_array, take)
    pairs when ``pad_tail`` (the tail batch repeats its last frame up to
    ``batch_size`` so every batch reuses ONE compiled shape; ``take`` is
    the real frame count), else bare device arrays of shape (B, H, W, 3).

    ``keep_uint8=True`` ships frames across host->device as uint8 — 4x
    less transfer than float32 (on the remote-TPU relay a 200-frame 4K
    sortie moves 1.6 GB instead of 6.6 GB); the consumer's jitted program
    converts on device. Default (float32 + gray option) serves ad-hoc use.
    """

    def __init__(self, items: Sequence, batch_size: int = 4,
                 n_threads: Optional[int] = None, to_gray: bool = False,
                 keep_uint8: bool = False, pad_tail: bool = False):
        self.items = list(items)
        self.batch_size = batch_size
        self.n_threads = n_threads or min(8, (os.cpu_count() or 1) * 2)
        self.to_gray = to_gray
        self.keep_uint8 = keep_uint8
        self.pad_tail = pad_tail

    def _host_batch(self, batch) -> np.ndarray:
        if batch and isinstance(batch[0], str):
            arrs = _decode_host(batch, self.n_threads)
        else:
            arrs = list(batch)
        if self.pad_tail and len(arrs) < self.batch_size < len(self.items):
            arrs = arrs + [arrs[-1]] * (self.batch_size - len(arrs))
        stacked = np.stack(arrs)
        if not self.keep_uint8:
            stacked = stacked.astype(np.float32)
        if self.to_gray and stacked.ndim == 4:
            stacked = (stacked[..., 0] * 0.114 + stacked[..., 1] * 0.587
                       + stacked[..., 2] * 0.299)
        return stacked

    def __iter__(self) -> Iterator:
        import jax

        batches = [self.items[i:i + self.batch_size]
                   for i in range(0, len(self.items), self.batch_size)]
        if not batches:
            return
        with cf.ThreadPoolExecutor(max_workers=1) as decode_pool:
            # pipeline: batch k+1 decodes/stacks on a host thread while
            # batch k's (async) device_put/compute proceeds
            pending = decode_pool.submit(self._host_batch, batches[0])
            for k in range(len(batches)):
                host = pending.result()
                if k + 1 < len(batches):
                    pending = decode_pool.submit(self._host_batch,
                                                 batches[k + 1])
                dev = jax.device_put(host)
                yield (dev, len(batches[k])) if self.pad_tail else dev
