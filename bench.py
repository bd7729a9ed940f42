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
The TPU fps is streaming throughput: several batches dispatched
back-to-back with one final fetch, so the remote relay's per-dispatch
round-trip amortizes like in the production feed (single-batch latency is
also logged). All diagnostics go to stderr; stdout carries only the JSON
line.
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
    from drone_image_stitch_cpp_tpu.utils.synthetic import synthetic_ortho
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
    from drone_image_stitch_cpp_tpu.ops.features import (
        detect_and_describe_batched)
    from drone_image_stitch_cpp_tpu.ops import match as M
    from drone_image_stitch_cpp_tpu.ops import ransac as R
    from drone_image_stitch_cpp_tpu.runtime.device import (
        enable_compile_cache)

    enable_compile_cache()
    log(f"jax backend: {jax.default_backend()} devices: {jax.devices()}")
    scale = scale_for_megapixels(FRAME_H, FRAME_W, REG_MPX)
    wh = int(round(FRAME_H * scale))
    ww = int(round(FRAME_W * scale))
    bh = -(-wh // 128) * 128
    bw = -(-ww // 128) * 128
    log(f"work res: {wh}x{ww} padded {bh}x{bw} scale={scale:.4f}")

    frames_dev = jnp.asarray(np.stack(frames))

    def _prep(f):
        small = jax.vmap(lambda x: resize_area(x, wh, ww))(f)
        return jnp.pad(small, ((0, 0), (0, bh - wh), (0, bw - ww)),
                       mode="edge")

    def _detect(small):
        return detect_and_describe_batched(small, SIFT_FEATURES)

    def _match_ransac(feats):
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

    # ONE fused program for the WHOLE batch: prep -> detect -> match ->
    # RANSAC -> all N-1 warps (traced transforms; planning on device).
    # Per-dispatch overhead on the remote-TPU relay is ~80 ms and large
    # multi-array jit outputs cost ~100x, so everything fuses and only
    # (models, inliers, per-frame warp sums) come back.
    from drone_image_stitch_cpp_tpu.ops import pallas_warp as PW

    def _full(f):
        feats = _detect(_prep(f))
        models, ninl = _match_ransac(feats)
        sums = []
        for i in range(N_FRAMES - 1):
            wrp = PW.warp_affine_traced(f[i + 1], models[i][:2, :],
                                        FRAME_H, FRAME_W)
            sums.append(wrp.sum())
        return models, ninl, jnp.stack(sums)

    full = jax.jit(_full)
    register = jax.jit(lambda f: _match_ransac(_detect(_prep(f))))
    probe_prep = jax.jit(lambda f: _prep(f).sum())
    probe_detect = jax.jit(lambda f: _detect(_prep(f)).desc.sum())

    def run_once():
        models, ninl, wsums = full(frames_dev)
        models_np = np.asarray(models)  # one blocking fetch
        return models_np, ninl

    def run_pipelined(reps):
        # Streaming throughput: dispatch ``reps`` batches back-to-back
        # (JAX dispatch is async; the device executes them in order) and
        # fetch only the last result. This amortizes the remote-relay
        # round-trip (~80 ms on the axon tunnel) the same way the
        # production loader feeds consecutive batches, so it measures
        # device throughput, not per-dispatch latency.
        outs = [full(frames_dev) for _ in range(reps)]
        np.asarray(outs[-1][0])  # forces completion of every batch

    # warmup / compile
    models_np, ninl = run_once()
    log(f"warmup inliers: {np.asarray(ninl).tolist()}")

    def timeit(fn, reps=3):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    # warm every probe BEFORE timing (first call = compile)
    float(np.asarray(probe_prep(frames_dev)))
    float(np.asarray(probe_detect(frames_dev)))
    np.asarray(register(frames_dev)[0])

    t_prep = timeit(lambda: float(np.asarray(probe_prep(frames_dev))))
    t_detect = timeit(lambda: float(np.asarray(probe_detect(frames_dev))))
    t_reg = timeit(lambda: np.asarray(register(frames_dev)[0]))
    t_total = timeit(run_once)
    t_warp = t_total - t_reg
    log(f"stage device+relay times per 8-frame batch: "
        f"prep {t_prep*1e3:.1f} ms | detect(+prep) {t_detect*1e3:.1f} ms | "
        f"register(prep+detect+match+ransac) {t_reg*1e3:.1f} ms | "
        f"warp x{N_FRAMES-1} {t_warp*1e3:.1f} ms | total {t_total*1e3:.1f} ms")

    pipe_reps = 5
    run_pipelined(1)  # prime any pipelined-dispatch path
    t_pipe = timeit(lambda: run_pipelined(pipe_reps)) / pipe_reps
    log(f"pipelined x{pipe_reps}: {t_pipe*1e3:.1f} ms/batch "
        f"(single-batch latency {t_total*1e3:.1f} ms; difference = "
        f"per-dispatch relay overhead)")
    t_total = min(t_total, t_pipe)

    # rough MFU: useful FLOPs of the pipeline's dense stages (blur matmul
    # band taps, matcher distance matmuls, warp FMAs; gathers/reductions
    # excluded) vs v5e peak 197 TFLOP/s bf16 / ~99 TFLOP/s fp32
    k = SIFT_FEATURES
    flops_match = (N_FRAMES - 1) * 2.0 * k * k * 128
    taps = 13
    flops_blur = N_FRAMES * sum(
        2 * 2 * taps * (bh >> o) * (bw >> o) * 6 for o in range(4))
    flops_warp = (N_FRAMES - 1) * 2.0 * FRAME_H * FRAME_W * 8
    flops_desc = N_FRAMES * 4125 * (96 * 128) * 60
    total_flops = flops_match + flops_blur + flops_warp + flops_desc
    mfu = total_flops / t_total / 99e12
    log(f"useful-FLOP estimate {total_flops/1e9:.1f} GFLOP -> "
        f"MFU ~{mfu*100:.2f}% of fp32 peak (pipeline is gather/"
        f"bandwidth-bound by nature, not matmul-bound)")

    fps = N_FRAMES / t_total
    log(f"tpu: {t_total*1000:.1f} ms/batch -> {fps:.2f} frames/s")
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
    best = float("inf")
    for _ in range(3):  # best-of-3: large run-to-run variance on this host
        t0 = time.perf_counter()
        one_pass()
        best = min(best, time.perf_counter() - t0)
    fps = N_FRAMES / best
    log(f"opencv cpu: {best*1000:.1f} ms/batch (best of 3) -> "
        f"{fps:.2f} frames/s ({os.cpu_count()} cores)")
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
