"""Attribute the tiled-blend wall-clock on the real TPU relay.

One flagship-scale strip (20x 4K frames, ~1150 px along-track steps) is
composed with compose_strip while per-feed timing splits the cost into:
  * host plan+stage time (warp_plan + small device_puts per feed),
  * dispatch-to-sync time per tile (device compute + relay latency).

Run: python tools/profile_blend.py          (uses the default backend)
Diagnostics to stderr; a final one-line summary to stdout.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from drone_image_stitch_cpp_tpu.config.tuning import StitchTuning
    from drone_image_stitch_cpp_tpu.pipeline import strip as SP
    from drone_image_stitch_cpp_tpu.pipeline import compose_feed as CF
    from drone_image_stitch_cpp_tpu.runtime.feed import FrameStore
    from drone_image_stitch_cpp_tpu.utils.synthetic import synthetic_ortho

    log("backend:", jax.default_backend())
    n, fh, fw, step = 20, 2160, 3840, 1152
    big = synthetic_ortho(h=fh + 8, w=fw + step * n, seed=7)
    frames = [np.ascontiguousarray(big[:fh, step * i:step * i + fw])
              .astype(np.uint8) for i in range(n)]
    transforms = np.stack([
        np.asarray([[1.0, 0.0, step * i], [0.0, 1.0, 0.0]], np.float32)
        for i in range(n)])
    tuning = StitchTuning()
    store = FrameStore(frames)

    # instrument feed_frame: host time vs (implicit) device time
    orig_feed = CF.feed_frame
    stats = {"feeds": 0, "host_s": 0.0}

    def timed_feed(*a, **k):
        t0 = time.perf_counter()
        out = orig_feed(*a, **k)
        stats["feeds"] += 1
        stats["host_s"] += time.perf_counter() - t0
        return out

    orig_many = CF.feed_frames_grouped

    def timed_many(*a, **k):
        t0 = time.perf_counter()
        out = orig_many(*a, **k)
        stats["feeds"] += 1
        stats["host_s"] += time.perf_counter() - t0
        return out

    CF.feed_frame = timed_feed
    CF.feed_frames_grouped = timed_many
    out = {}
    try:
        # flagship path: assemble="device" (return_device), then the host
        # fetch path for comparison; runs 0 absorb compiles
        from drone_image_stitch_cpp_tpu.runtime.logging import get_logger
        for variant, return_device in (("device", True), ("host", False)):
            for run in range(2):
                rec0 = len(get_logger()._records)
                t0 = time.perf_counter()
                stats.update(feeds=0, host_s=0.0)
                pano = SP.compose_strip(frames, transforms, tuning,
                                        stage="Prof", store=store,
                                        indices=list(range(n)),
                                        return_device=return_device)
                if return_device:
                    # the relay's block_until_ready is a no-op; a jitted
                    # checksum + scalar fetch is the only real sync
                    import jax.numpy as _jnp
                    chk = jax.jit(
                        lambda x: _jnp.sum(x.astype(_jnp.int32)))
                    float(np.asarray(chk(pano.dev)))
                wall = time.perf_counter() - t0
                stages = {r["msg"]: r["seconds"]
                          for r in get_logger()._records[rec0:]
                          if "seconds" in r}
                log(f"{variant} run{run}: compose {wall:.1f}s "
                    f"feed-calls={stats['feeds']} "
                    f"host-in-feed {stats['host_s']:.1f}s "
                    f"stages={stages}")
            out[variant] = dict(warm_s=round(wall, 2),
                                feed_calls=stats["feeds"],
                                host_in_feed_s=round(stats["host_s"], 2),
                                stages=stages)
    finally:
        CF.feed_frame = orig_feed
        CF.feed_frames_grouped = orig_many
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
