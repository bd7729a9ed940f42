"""Device-resident strip panorama handoff (strip stage -> global compose).

The reference passes strip panoramas between its stages as host cv::Mats
(stitch_app.cpp:202-245) because everything lives in one address space. On
a remote TPU behind a ~25 MB/s relay that contract is the single most
expensive design decision possible: ten 4K-tall strip panoramas are
~1.7 GB, and a host-array handoff pays that TWICE (fetch after the strip
blend + re-upload before the global align) — ~150 s of pure wire on the
200-frame flagship sortie.

``DeviceStrip`` keeps the blended strip canvas in HBM and hands the global
compose a device reference. The host copy still exists — the reference
persists per-strip JPEGs (stitch_app.cpp:215-217) and the checkpoint/
degrade paths need host pixels — but it is fetched ONCE, as raw BGR
(LOSSLESS: the checkpoint must make a --resume run byte-identical to a
straight-through run, and the degrade ladder must not silently re-compose
from degraded pixels), lazily, on the background writer thread, overlapped
with the next strip's device compute. The fetch window is 256-snapped
around the exact content bbox so a handful of window shapes reuse one
compiled slice program.

HBM lifecycle: the global compose consumes ``device_padded()`` once and
then calls ``mark_consumed()`` — after that, as soon as the host copy is
cached the device canvas is RELEASED (strips would otherwise coexist in
HBM with their padded compose copies for the whole global stage, roughly
doubling strip residency on a single chip).
"""

from __future__ import annotations

import functools
import threading
from typing import Optional, Tuple

import numpy as np


def _align_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _fetch_prog(wh: int, ww: int):
    """Jitted canvas-window slice, cached per window bucket."""
    import jax

    @functools.partial(jax.jit, static_argnames=())
    def fetch(canvas, oy, ox):
        return jax.lax.dynamic_slice(canvas, (oy, ox, 0), (wh, ww, 3))

    return fetch


@functools.lru_cache(maxsize=None)
def _repad_prog(hp: int, wp: int, ch: int, cw: int, pad_h: int,
                pad_w: int):
    """Jitted content re-pad: slice the bbox window out of a (ch, cw, 3)
    canvas into a (hp, wp, 3) layout with content at the origin. The
    canvas is padded bottom/right (512-snapped amounts so the handful of
    pad buckets reuse compiled programs) so the slice never clamps — a
    clamped dynamic_slice would shift foreign content rows into the
    window. Cached per (strip-canvas bucket, target pad) pair."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=())
    def repad(canvas, oy, ox):
        padded = jnp.pad(canvas, ((0, pad_h), (0, pad_w), (0, 0)))
        return jax.lax.dynamic_slice(padded, (oy, ox, 0), (hp, wp, 3))

    return repad


class DeviceStrip:
    """A strip panorama living in device HBM.

    ``dev``: (CH, CW, 3) uint8 device canvas (CH/CW snapped dims);
    ``bbox``: (y0, y1, x0, x1) exact content box inside it (exclusive
    upper bounds, the autocrop box from ops/blend's device content flags —
    the reference's gray>1 test, stitch_common.cpp:4-27).

    ``host()`` fetches the cropped panorama as BGR uint8 (lossless raw
    wire, cached); ``device_padded(hp, wp)`` returns the cropped content
    re-laid-out at the origin of an (hp, wp, 3) device array — the global
    compose's shared padded-strip layout (pipeline/global_.py) — without
    any host round-trip.
    """

    def __init__(self, dev, bbox: Tuple[int, int, int, int]):
        y0, y1, x0, x1 = bbox
        assert 0 <= y0 < y1 and 0 <= x0 < x1, bbox
        self.dev = dev
        self.bbox = bbox
        self.hw = (y1 - y0, x1 - x0)
        self._host: Optional[np.ndarray] = None
        self._consumed = False
        self._lock = threading.Lock()

    @property
    def shape(self):  # np.ndarray-compatible (h, w, 3) of the CROP
        return (self.hw[0], self.hw[1], 3)

    def host(self) -> np.ndarray:
        """Cropped panorama as host BGR uint8 (fetched once, cached).

        Lossless: raw BGR of a 256-snapped window around the bbox. The
        window is 3 B/px over the relay link — ~2x a 4:2:0 pack, but the
        fetch runs on the background writer thread overlapped with the
        next strip's device compute, and the checkpoint/degrade contracts
        require the exact pixels the device canvas holds (a packed wire
        format made --resume runs chroma-degraded vs straight-through).
        """
        with self._lock:
            if self._host is not None:
                return self._host
            if self.dev is None:
                raise RuntimeError("DeviceStrip released without host copy")
            y0, y1, x0, x1 = self.bbox
            h, w = self.hw
            ch, cw = int(self.dev.shape[0]), int(self.dev.shape[1])
            wh = min(_align_up(h, 256), ch)
            ww = min(_align_up(w, 256), cw)
            oy = min(y0, ch - wh)
            ox = min(x0, cw - ww)
            win = np.asarray(_fetch_prog(wh, ww)(self.dev, oy, ox))
            self._host = np.ascontiguousarray(
                win[y0 - oy:y0 - oy + h, x0 - ox:x0 - ox + w])
            self._release_if_done()
            return self._host

    def host_cached(self) -> Optional[np.ndarray]:
        """The host copy if a fetch already happened, else None (degrade
        paths must not touch a possibly-dead device)."""
        with self._lock:
            return self._host

    def put_host(self, arr: np.ndarray) -> None:
        """Install a recovered host copy (degrade ladder: the device died
        before any fetch and the pixels came back from the strip JPEG on
        disk). Later ``host()`` calls — e.g. the background writer's —
        return this copy instead of touching the dead device."""
        assert arr.shape == self.shape, (arr.shape, self.shape)
        with self._lock:
            self._host = arr
            self._release_if_done()

    def mark_consumed(self) -> None:
        """The global compose has taken ``device_padded()``'s output; the
        device canvas may be released as soon as the host copy exists
        (it would otherwise coexist in HBM with the padded copy for the
        whole compose, doubling strip residency on a single chip)."""
        with self._lock:
            self._consumed = True
            self._release_if_done()

    def _release_if_done(self) -> None:
        # caller holds self._lock
        if self._consumed and self._host is not None:
            self.dev = None

    def device_padded(self, hp: int, wp: int, device=None):
        """Cropped content at the origin of an (hp, wp, 3) uint8 device
        array, black-padded — the global compose's strip layout. Requires
        hp >= crop h and wp >= crop w. ``device``: colocation target (the
        strip stage round-robins strips over the mesh, so each canvas may
        live on a different chip; the global compose pulls them onto its
        own device — ICI traffic, never the host link)."""
        assert hp >= self.hw[0] and wp >= self.hw[1], (hp, wp, self.hw)
        y0, _, x0, _ = self.bbox
        src = self.dev
        if src is None:
            # released canvas (resume-style callers): re-upload the host
            # copy — the pixels are identical, only the wire cost differs
            import jax.numpy as jnp
            host = self.host()
            pad = np.zeros((hp, wp, 3), np.uint8)
            pad[:self.hw[0], :self.hw[1]] = host
            arr = jnp.asarray(pad)
            if device is not None:
                import jax
                arr = jax.device_put(arr, device)
            return arr
        ch, cw = int(src.shape[0]), int(src.shape[1])
        pad_h = _align_up(max(0, y0 + hp - ch), 512)
        pad_w = _align_up(max(0, x0 + wp - cw), 512)
        if device is not None and next(iter(src.devices())) != device:
            import jax
            src = jax.device_put(src, device)
        return _repad_prog(hp, wp, ch, cw, pad_h, pad_w)(src, y0, x0)


def as_host_strips(strips) -> list:
    """Normalize a strips list (np.ndarray | DeviceStrip) to host arrays."""
    return [s.host() if isinstance(s, DeviceStrip) else s for s in strips]


def recover_host_strips(panos: list, ckpt_dir: str, log=None) -> None:
    """Degrade-ladder host recovery, in place (app.py's CPU retry).

    Device-resident strips must leave the (possibly dead) accelerator
    before a CPU retry. Ladder per strip: cached host copy (the
    background writer usually fetched it already) -> guarded live fetch
    (the fault may have been transient) -> the strip JPEG the writer
    saved to disk (lossy, but the device is gone). Only a strip that
    fails ALL three raises — a raw fetch failure must not abort a run
    whose pixels are recoverable (reference analog: the OpenCL -> CPU
    retry never loses completed strips, stitch_robust.cpp:259-270).
    """
    import os

    lost = []
    for k, p in enumerate(panos):
        if not isinstance(p, DeviceStrip):
            continue
        cached = p.host_cached()
        if cached is not None:
            panos[k] = cached
            continue
        try:
            panos[k] = p.host()
            continue
        except Exception as fetch_err:
            if log is not None:
                log.log("Main", "strip fetch failed during degrade",
                        strip=k, error=str(fetch_err))
        jp = os.path.join(ckpt_dir, f"strip_{k:02d}.jpg")
        img = None
        if os.path.exists(jp):
            import cv2
            img = cv2.imread(jp, cv2.IMREAD_COLOR)
        if img is not None and img.shape == p.shape:
            # install on the handle too: the background writer's pending
            # host() must not re-touch the dead device
            p.put_host(img)
            panos[k] = img
            if log is not None:
                log.log("Main", "strip recovered from saved JPEG", strip=k)
        else:
            lost.append(k)
    if lost:
        raise RuntimeError(
            f"strips {lost} lost with the failed accelerator (no cached "
            f"host copy, live fetch failed, no saved JPEG) — cannot "
            f"retry the stage on CPU")
