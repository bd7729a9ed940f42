"""runtime/hbm.py: device-memory watermark (peak_hbm_gb in the flagship
bench; memory_stats() is None through the remote relay, so the fallback
meter sums live client-visible device buffers)."""

import jax.numpy as jnp
import numpy as np

from drone_image_stitch_cpp_tpu.runtime import hbm


def test_watermark_tracks_live_buffers():
    hbm.reset()
    a = jnp.ones((256, 1024), jnp.float32)   # 1 MB
    b1 = hbm.sample("small")
    assert b1 >= a.nbytes
    big = jnp.ones((4096, 1024), jnp.float32)  # 16 MB
    b2 = hbm.sample("big")
    assert b2 >= b1 + big.nbytes - a.nbytes - (1 << 20)
    p = hbm.peak()
    assert p["peak_bytes"] == max(b1, b2)
    assert p["tag"] == "big"
    assert p["meter"] in ("allocator", "live-buffers")
    del big
    # peak is monotone: dropping buffers must not lower it
    hbm.sample("after-free")
    assert hbm.peak()["peak_bytes"] == p["peak_bytes"]
    hbm.reset()
    assert hbm.peak()["peak_bytes"] == 0
    assert np.isfinite(p["peak_gb"])
