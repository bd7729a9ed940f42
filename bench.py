"""Benchmark: detect+match+warp throughput at 4K (frames/sec).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- TPU path: this framework's batched registration (feature detect at the
  visible preset's 0.45 MP working resolution, banded knn2 matching,
  similarity RANSAC) + full-resolution 4K affine warp per frame.
- Baseline: the same pipeline through OpenCV's C++ kernels (cv2 bindings
  link the identical code the reference executable runs: SIFT,
  BFMatcher.knnMatch, estimateAffinePartial2D, warpAffine) at the same
  working resolutions, single process on this host's CPU.

vs_baseline = tpu_fps / opencv_cpu_fps (>1 means faster than reference).
All diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import os
import sys
import time

import numpy as np

N_FRAMES = 8
FRAME_H, FRAME_W = 2160, 3840          # 4K
SIFT_FEATURES = 2200                   # visible preset
REG_MPX = 0.45                         # visible preset registration resol
RATIO = 0.75


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_frames():
    """Overlapping 4K crops of one big textured synthetic ortho."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from conftest import synthetic_ortho
    big = synthetic_ortho(h=FRAME_H + 64 * N_FRAMES,
                          w=FRAME_W + 256 * N_FRAMES, seed=3)
    gray = (0.114 * big[..., 0] + 0.587 * big[..., 1]
            + 0.299 * big[..., 2]).astype(np.float32)
    return [gray[64 * i:64 * i + FRAME_H, 256 * i:256 * i + FRAME_W]
            for i in range(N_FRAMES)]


def bench_tpu(frames):
    import jax
    import jax.numpy as jnp
    from drone_image_stitch_cpp_tpu.ops.resize import (
        resize_area, scale_for_megapixels)
    from drone_image_stitch_cpp_tpu.ops.features import detect_and_describe
    from drone_image_stitch_cpp_tpu.ops import match as M
    from drone_image_stitch_cpp_tpu.ops import ransac as R
    from drone_image_stitch_cpp_tpu.ops.pallas_warp import warp_affine

    log(f"jax backend: {jax.default_backend()} devices: {jax.devices()}")
    scale = scale_for_megapixels(FRAME_H, FRAME_W, REG_MPX)
    wh = int(round(FRAME_H * scale))
    ww = int(round(FRAME_W * scale))
    bh = -(-wh // 128) * 128
    bw = -(-ww // 128) * 128
    log(f"work res: {wh}x{ww} padded {bh}x{bw} scale={scale:.4f}")

    frames_dev = jnp.asarray(np.stack(frames))

    @jax.jit
    def prep(f):
        small = jax.vmap(lambda x: resize_area(x, wh, ww))(f)
        return jnp.pad(small, ((0, 0), (0, bh - wh), (0, bw - ww)),
                       mode="edge")

    @jax.jit
    def register(small):
        feats = jax.vmap(
            lambda g: detect_and_describe(g, SIFT_FEATURES))(small)

        def one(i):
            m = M.knn2_ratio(feats.desc[i], feats.valid[i],
                             feats.desc[i + 1], feats.valid[i + 1], RATIO)
            src, dst, good = M.gather_correspondences(
                feats.xy[i], feats.xy[i + 1], m)
            res = R.ransac(src, dst, good, jax.random.PRNGKey(i),
                           "similarity", thresh=4.0, n_hyp=512)
            return res.model, res.n_inliers

        models = []
        ninls = []
        for i in range(N_FRAMES - 1):
            mo, ni = one(i)
            models.append(mo)
            ninls.append(ni)
        return jnp.stack(models), jnp.stack(ninls)

    def warp_all(f, models_np):
        outs = []
        for i in range(N_FRAMES - 1):
            outs.append(warp_affine(f[i + 1], models_np[i][:2, :],
                                    FRAME_H, FRAME_W))
        return outs

    # warmup / compile
    small = prep(frames_dev)
    models, ninl = register(small)
    models_np = np.asarray(models)
    warped = warp_all(frames_dev, models_np)
    float(np.asarray(warped[-1][0, 0]))  # force through the relay
    log(f"warmup inliers: {np.asarray(ninl).tolist()}")

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        small = prep(frames_dev)
        models, ninl = register(small)
        warped = warp_all(frames_dev, np.asarray(models))
        float(np.asarray(warped[-1][0, 0]))
    dt = (time.perf_counter() - t0) / reps
    fps = N_FRAMES / dt
    log(f"tpu: {dt*1000:.1f} ms/batch -> {fps:.2f} frames/s")
    return fps


def bench_opencv(frames):
    import cv2
    cv2.setNumThreads(os.cpu_count() or 1)
    scale = min(1.0, (REG_MPX * 1e6 / (FRAME_H * FRAME_W)) ** 0.5)
    sift = cv2.SIFT_create(nfeatures=SIFT_FEATURES)
    bf = cv2.BFMatcher()

    def one_pass():
        kps, descs = [], []
        for f in frames:
            small = cv2.resize(f, None, fx=scale, fy=scale,
                               interpolation=cv2.INTER_AREA)
            kp, de = sift.detectAndCompute(small.astype(np.uint8), None)
            kps.append(kp)
            descs.append(de)
        for i in range(N_FRAMES - 1):
            if descs[i] is None or descs[i + 1] is None:
                continue
            knn = bf.knnMatch(descs[i], descs[i + 1], k=2)
            good = [m for m, n in knn if m.distance < RATIO * n.distance]
            if len(good) < 4:
                continue
            src = np.float32([kps[i][m.queryIdx].pt for m in good])
            dst = np.float32([kps[i + 1][m.trainIdx].pt for m in good])
            mo, _ = cv2.estimateAffinePartial2D(
                src, dst, method=cv2.RANSAC, ransacReprojThreshold=4.0,
                maxIters=4000, confidence=0.995, refineIters=80)
            if mo is not None:
                cv2.warpAffine(frames[i + 1], mo.astype(np.float32),
                               (FRAME_W, FRAME_H))

    one_pass()  # warmup
    t0 = time.perf_counter()
    one_pass()
    dt = time.perf_counter() - t0
    fps = N_FRAMES / dt
    log(f"opencv cpu: {dt*1000:.1f} ms/batch -> {fps:.2f} frames/s "
        f"({os.cpu_count()} cores)")
    return fps


def main():
    frames = make_frames()
    fps_tpu = bench_tpu(frames)
    fps_cpu = bench_opencv(frames)
    print(json.dumps({
        "metric": "frames/sec detect+match+warp @4K",
        "value": round(fps_tpu, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps_tpu / fps_cpu, 3),
    }))


if __name__ == "__main__":
    main()
