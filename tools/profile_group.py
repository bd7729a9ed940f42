"""Attribute the grouping-detect wall-clock on the real TPU relay.

Round-4 flagship split: VisualGroup:detect = 142.4 s for 200 4K frames.
The theoretical relay wire for the packed-I420 store is ~2.5 GB (~75 s
at the measured ~35 MB/s) — this probe accounts for the rest by timing
each leg separately on a 48-frame slice of the same shape:

  decode      host JPEG decode (native raw-4:2:0 pool), no device touch
  transfer    store chunk device_put + sync, decode already done
  detect      _detect_batch_yuv on RESIDENT chunks (device+dispatch only)
  production  detect_features on a FRESH store (decode/transfer/compute
              overlapped exactly as the app runs it)

Per-frame numbers x200 give the flagship estimate. Writes JSON to stdout.

Run: python tools/profile_group.py           (default = TPU backend)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _checksum():
    """Jitted scalar reduction used as the sync primitive: the axon
    relay's block_until_ready is a NO-OP (returns in one ~30 ms round
    trip without waiting for compute) — the only real sync is fetching
    a value derived from the computation. jit caches one program per
    input shape/dtype, so a probe loop pays one compile per shape."""
    import jax
    import jax.numpy as jnp
    return jax.jit(lambda x: jnp.sum(x.astype(jnp.int32))
                   if x.dtype.kind in "ub" else jnp.sum(x))


N, FH, FW = 48, 2160, 3840


def main():
    import cv2
    import jax

    from drone_image_stitch_cpp_tpu.config.tuning import load_stitch_tuning
    from drone_image_stitch_cpp_tpu.pipeline.registration import \
        detect_features
    from drone_image_stitch_cpp_tpu.runtime.device import \
        enable_compile_cache
    from drone_image_stitch_cpp_tpu.runtime.feed import FrameStore
    from drone_image_stitch_cpp_tpu.utils.synthetic import synthetic_ortho

    enable_compile_cache()
    log("backend:", jax.default_backend())

    frame_dir = "/tmp/profile_group_frames"
    paths = [os.path.join(frame_dir, f"f{t:03d}.jpg") for t in range(N)]
    if not all(os.path.exists(p) for p in paths):
        os.makedirs(frame_dir, exist_ok=True)
        big = synthetic_ortho(h=FH + 8, w=FW + 1152 * N, seed=9)
        for t, p in enumerate(paths):
            cv2.imwrite(p, big[:FH, 1152 * t:1152 * t + FW].astype(
                np.uint8), [cv2.IMWRITE_JPEG_QUALITY, 92])
        del big
    tuning = load_stitch_tuning("visible")
    n_feats = int(np.clip(tuning.strip_sift_features, 600, 1800))
    mdim = max(FH, FW)
    mpx = (FH * FW) * min(1.0, (1800 / mdim) ** 2) / 1e6

    out = {"frames": N, "frame_hw": [FH, FW]}

    # --- decode only -------------------------------------------------------
    st = FrameStore.from_paths(paths)
    t0 = time.perf_counter()
    st.wait_all()
    out["decode_s"] = round(time.perf_counter() - t0, 2)
    out["fmt"] = st.fmt
    bpf = st.images[0].nbytes
    out["wire_mb"] = round(bpf * N / 2**20, 1)
    log(f"decode: {out['decode_s']}s fmt={st.fmt} "
        f"wire={out['wire_mb']} MB")

    # --- transfer only -----------------------------------------------------
    chk = _checksum()
    float(np.asarray(chk(st._chunk(0))))  # absorb the checksum compile
    t0 = time.perf_counter()
    for c0 in range(FrameStore.CHUNK, N, FrameStore.CHUNK):
        float(np.asarray(chk(st._chunk(c0))))
    out["transfer_s"] = round(
        (time.perf_counter() - t0) * N / (N - FrameStore.CHUNK), 2)
    out["wire_mbps"] = round(out["wire_mb"] / max(out["transfer_s"], 1e-9),
                             1)
    log(f"transfer: {out['transfer_s']}s -> {out['wire_mbps']} MB/s")

    # --- detect on resident chunks (cold then warm) -------------------------
    # sync = fetching the (N, K) validity mask (small; its producing
    # program must finish before the fetch returns)
    for tag in ("detect_resident_cold_s", "detect_resident_warm_s"):
        t0 = time.perf_counter()
        feats, _ = detect_features(None, n_feats, mpx, store=st,
                                   indices=list(range(N)))
        _ = np.asarray(feats.valid)
        out[tag] = round(time.perf_counter() - t0, 2)
        log(f"{tag}: {out[tag]}s")

    # --- production: fresh store, everything overlapped ---------------------
    st2 = FrameStore.from_paths(paths)
    t0 = time.perf_counter()
    feats, _ = detect_features(None, n_feats, mpx, store=st2,
                               indices=list(range(N)))
    _ = np.asarray(feats.valid)
    out["production_s"] = round(time.perf_counter() - t0, 2)
    log(f"production (fresh store): {out['production_s']}s")

    for k in ("decode_s", "transfer_s", "detect_resident_warm_s",
              "production_s"):
        out[f"{k}_per200"] = round(out[k] * 200.0 / N, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
