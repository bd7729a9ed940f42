"""Stage-level profile of the TPU detect path (VERDICT r02 weak #2).

Decomposes bench.py's detect(+prep) time into cumulative probes, each a
separately jitted prefix of the real pipeline (same shapes/dtypes as the
production 8-frame 4K batch at the visible preset):

  prep         resize to 0.45 MP work res + pad to the (8,128) bucket
  scale_space  + all-octave Gaussian/DoG stacks (matmul blurs)
  refine       + extrema candidates + dense refine fields + pointer chase
  select       + cross-octave top-k and gathers
  describe     + the fused Pallas orientation/descriptor kernel (full
                 detect_and_describe_batched)

Every probe returns a scalar (fetch = sync; the axon relay's
block_until_ready is a no-op). Differences between successive probes are
per-stage device+relay times. Writes JSON to stdout; run with the default
(TPU) backend.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from drone_image_stitch_cpp_tpu.ops import features as F
from drone_image_stitch_cpp_tpu.ops import pallas_sift as PS
from drone_image_stitch_cpp_tpu.ops.resize import (resize_area,
                                                   scale_for_megapixels)

N_FRAMES = 8
FRAME_H, FRAME_W = 2160, 3840
SIFT_FEATURES = 2200
REG_MPX = 0.45
N_LAYERS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from drone_image_stitch_cpp_tpu.runtime.device import (
        enable_compile_cache)
    from drone_image_stitch_cpp_tpu.utils.synthetic import synthetic_ortho

    enable_compile_cache()
    big = synthetic_ortho(h=FRAME_H + 64 * N_FRAMES,
                          w=FRAME_W + 256 * N_FRAMES, seed=3)
    gray = (0.114 * big[..., 0] + 0.587 * big[..., 1]
            + 0.299 * big[..., 2]).astype(np.float32)
    frames = np.stack([gray[64 * i:64 * i + FRAME_H,
                            256 * i:256 * i + FRAME_W]
                       for i in range(N_FRAMES)])

    scale = scale_for_megapixels(FRAME_H, FRAME_W, REG_MPX)
    wh, ww = int(round(FRAME_H * scale)), int(round(FRAME_W * scale))
    bh, bw = -(-wh // 128) * 128, -(-ww // 128) * 128
    log(f"backend={jax.default_backend()} work {wh}x{ww} pad {bh}x{bw}")
    frames_dev = jnp.asarray(frames)

    def prep(f):
        small = jax.vmap(lambda x: resize_area(x, wh, ww))(f)
        return jnp.pad(small, ((0, 0), (0, bh - wh), (0, bw - ww)),
                       mode="edge")

    n_oct = F.num_octaves(bh, bw, False)
    prelim = 0.5 * 0.04 / N_LAYERS * 255.0
    contrast_abs = 0.04 * 255.0

    def scale_space(f):
        octs = jax.vmap(
            lambda im: F.build_scale_space(im, N_LAYERS, n_oct, False))(
            prep(f))
        return sum(g.sum() + d.sum() for g, d in octs)

    def extrema(f):
        octs = jax.vmap(
            lambda im: F.build_scale_space(im, N_LAYERS, n_oct, False))(
            prep(f))
        tot = 0.0
        for o, (g, dog) in enumerate(octs):
            k_oct = max(SIFT_FEATURES >> o, min(128, SIFT_FEATURES))
            cand, top, cvalid = jax.vmap(
                lambda d: F._extrema_candidates(d, prelim, k_oct))(dog)
            tot += cand.sum() + top.sum() + cvalid.sum()
        return tot

    def _phase_refine(f):
        octs = jax.vmap(
            lambda im: F.build_scale_space(im, N_LAYERS, n_oct, False))(
            prep(f))
        fields = []
        for o, (g, dog) in enumerate(octs):
            k_oct = max(SIFT_FEATURES >> o, min(128, SIFT_FEATURES))
            cand, _, cvalid = jax.vmap(
                lambda d: F._extrema_candidates(d, prelim, k_oct))(dog)
            lf, yf, xf, resp, ok = jax.vmap(
                lambda d, c: F._refine_dense(d, c, N_LAYERS, contrast_abs,
                                             10.0))(dog, cand)
            fields.append((yf, xf, resp, ok & cvalid))
        return fields

    def refine(f):
        return sum(yf.sum() + xf.sum() + resp.sum() + ok.sum()
                   for yf, xf, resp, ok in _phase_refine(f))

    def select(f):
        fields = _phase_refine(f)
        resp = jnp.concatenate([r for _, _, r, _ in fields], axis=1)
        ok = jnp.concatenate([o for _, _, _, o in fields], axis=1)
        score = jnp.where(ok, resp, -1.0)
        top, idx = jax.lax.top_k(score, min(SIFT_FEATURES, score.shape[1]))
        return top.sum() + idx.sum()

    def describe(f):
        feats = F.detect_and_describe_batched(prep(f), SIFT_FEATURES)
        return feats.desc.sum() + feats.xy.sum()

    probes = {
        # relay/dispatch floor: one trivial dispatch + scalar fetch. On the
        # remote-TPU tunnel this is pure round-trip latency (device work is
        # a ~0.3 ms HBM read); subtract it mentally from every stage.
        "null": jax.jit(lambda f: f.sum()),
        "prep": jax.jit(lambda f: prep(f).sum()),
        "scale_space": jax.jit(scale_space),
        "extrema": jax.jit(extrema),
        "refine": jax.jit(refine),
        "select": jax.jit(select),
        "describe": jax.jit(describe),
    }

    def timeit(fn, reps=3):
        float(np.asarray(fn(frames_dev)))  # warm (compile)
        t0 = time.perf_counter()
        for _ in range(reps):
            float(np.asarray(fn(frames_dev)))
        return (time.perf_counter() - t0) / reps

    times = {}
    for name, fn in probes.items():
        times[name] = timeit(fn)
        log(f"{name:12s} cumulative {times[name]*1e3:8.1f} ms")

    order = list(probes)
    stages = {}
    prev = 0.0
    for name in order:
        stages[name] = round((times[name] - prev) * 1e3, 2)
        prev = times[name]
    out = {
        "backend": jax.default_backend(),
        "batch": N_FRAMES,
        "cumulative_ms": {k: round(v * 1e3, 2) for k, v in times.items()},
        "stage_ms": stages,
        "total_detect_ms": round(times["describe"] * 1e3, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
