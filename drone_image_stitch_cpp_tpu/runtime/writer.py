"""Background output writers: async artifact saves + streamed JPEG encode.

The reference's output writes are serial tail work: each strip panorama is
encoded before the next strip starts (stitch_app.cpp:215-217) and the
final mosaic encode trails the blend (stitch_app.cpp:262-263). On a
200-frame 4K sortie that is ~110 s of per-strip JPEG/PNG encode plus
~60-100 s for the 380 MP mosaic — all host time the device spends idle.

Two pieces move that work off the critical path:

* ``BackgroundWriter``: a single worker thread running queued host-side
  save callables (strip JPEGs, the lossless resume checkpoint) while the
  device stitches the next strip. Errors are re-raised at ``join()`` —
  the run still fails loudly on a bad write, just later.
* ``StreamedMosaicWriter``: consumes the tiled blender's materialized row
  bands (ops/blend.mb_compose_tiled ``on_rows``) and feeds a scanline-
  incremental libjpeg encoder (native/encode.cpp) on a worker thread, so
  mosaic entropy coding overlaps the remaining tiles' device compute.
  The crop box comes from content geometry (the union of warped content
  masks) rather than a post-hoc pixel scan; it bounds the pixel-exact
  autocrop box from outside by at most a few pixels of black margin.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Optional, Tuple

import numpy as np


class BackgroundWriter:
    """Run save callables on a worker thread; re-raise failures on join."""

    def __init__(self, name: str = "bg-writer"):
        self._q: "queue.Queue[Optional[Tuple[Callable, tuple, dict]]]" = \
            queue.Queue()
        self._errors: list = []
        self._thread = threading.Thread(target=self._run, name=name,
                                        daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, args, kwargs = item
            try:
                fn(*args, **kwargs)
            except Exception as err:  # surfaced at join()
                self._errors.append(err)

    def submit(self, fn: Callable, *args, **kwargs) -> None:
        if self._errors:
            # fail fast instead of queueing more work behind a dead write
            self.join()
        self._q.put((fn, args, kwargs))

    def join(self) -> None:
        """Drain the queue, stop the worker, re-raise the first error."""
        if self._thread.is_alive():
            self._q.put(None)
            self._thread.join()
        if self._errors:
            err = self._errors[0]
            self._errors = []
            raise err


class StreamedMosaicWriter:
    """Row-band sink for mb_compose_tiled: crop + stream JPEG scanlines.

    Protocol (driven by pipeline/global_.py):
      begin(canvas_h, canvas_w, crop)  crop = (y0, y1, x0, x1) content box
      on_rows(y0, y1, rows)            canvas row band, fired in order
      finish() -> (h, w)               join + close; sets ``done``
      abort()                          cleanup on any failure
    Rows are views into the assembling mosaic; bands already fired are
    never written again, so the worker thread reads them race-free.
    """

    def __init__(self, path: str, quality: int = 95):
        self.path = path
        self.quality = quality
        self.done = False
        self._enc = None
        self._crop = None
        self._writer: Optional[BackgroundWriter] = None

    def begin(self, canvas_h: int, canvas_w: int,
              crop: Tuple[int, int, int, int]) -> None:
        from ..utils.native import NativeJpegEncoder
        y0, y1, x0, x1 = crop
        assert 0 <= y0 < y1 <= canvas_h and 0 <= x0 < x1 <= canvas_w, crop
        self._crop = crop
        self._enc = NativeJpegEncoder(self.path, x1 - x0, y1 - y0,
                                      self.quality)
        self._writer = BackgroundWriter(name="jpeg-stream")

    def on_rows(self, y0: int, y1: int, rows: np.ndarray) -> None:
        cy0, cy1, cx0, cx1 = self._crop
        lo, hi = max(y0, cy0), min(y1, cy1)
        if lo >= hi:
            return
        band = rows[lo - y0:hi - y0, cx0:cx1]
        self._writer.submit(self._enc.write, band)

    def finish(self) -> Tuple[int, int]:
        try:
            self._writer.join()
            self._enc.finish()
        except Exception:
            self.abort()
            raise
        self.done = True
        y0, y1, x0, x1 = self._crop
        return y1 - y0, x1 - x0

    def abort(self) -> None:
        if self._writer is not None:
            try:
                self._writer.join()
            except Exception:
                pass
            self._writer = None
        if self._enc is not None:
            self._enc.abort()
            self._enc = None
