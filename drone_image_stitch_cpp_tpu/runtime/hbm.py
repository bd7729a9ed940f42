"""Peak device-memory (HBM) tracking that works through the remote relay.

The reference has no analog (OpenCV's OpenCL pool is opaque); this exists
to validate the framework's own HBM-budget claims (ops/blend.py tile
budget) with a measured number in the flagship bench.

``device.memory_stats()`` returns None through the axon relay, so the
fallback estimate is the byte-sum of LIVE client-visible device buffers
(``jax.live_arrays()``) sampled at stage boundaries and inside the tile
loops. That is a lower bound on the true allocator high-water:
in-dispatch temporaries (XLA scratch, fusion buffers) are invisible to
the client — the recorded peak is tagged "live-buffers" vs
"allocator" so the bench artifact states which meter produced it.

Sampling is cheap (client-side metadata walk, no relay round-trips), but
not free on thousand-array programs; call sites sit at stage boundaries
and per-tile, not per-op.
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_peak_bytes = 0
_peak_tag = ""
_meter = "live-buffers"


def sample(tag: str = "") -> int:
    """Record the current device-memory footprint; returns bytes."""
    global _peak_bytes, _peak_tag, _meter
    import jax

    b = 0
    allocator = False
    try:
        st = jax.devices()[0].memory_stats()
    except Exception:
        st = None
    if st and st.get("peak_bytes_in_use"):
        b = int(st["peak_bytes_in_use"])
        allocator = True
    else:
        try:
            default_platform = jax.default_backend()
            for a in jax.live_arrays():
                try:
                    d = next(iter(a.devices()))
                except Exception:
                    continue
                # count accelerator buffers; on a cpu-only run (tests,
                # parity bench) count the default platform instead
                if d.platform != "cpu" or default_platform == "cpu":
                    b += a.nbytes
        except Exception:
            return 0
    with _lock:
        if b > _peak_bytes:
            _peak_bytes = b
            _peak_tag = tag
            _meter = "allocator" if allocator else "live-buffers"
    return b


def peak() -> dict:
    """{"peak_bytes", "peak_gb", "tag", "meter"} of the high-water so far."""
    with _lock:
        return {"peak_bytes": _peak_bytes,
                "peak_gb": round(_peak_bytes / 2 ** 30, 3),
                "tag": _peak_tag, "meter": _meter}


def reset() -> None:
    global _peak_bytes, _peak_tag
    with _lock:
        _peak_bytes = 0
        _peak_tag = ""
