"""Attribute the global-align wall-clock on the real TPU relay.

Round-4 flagship split: GlobalCustom:align = 108.6 s for 9 strip pairs
(~12 s/pair) — the largest unprofiled stage after blend/detect. This
probe rebuilds the stage on flagship-shaped synthetic strips (3 strips,
~3600 x ~25700, 35% overlap — same padded bucket and keypoint budget as
the 200-frame sortie) and times each sub-step separately:

  repad      DeviceStrip.device_padded (the compose's strip layout)
  detect     _detect_strip_dev per strip (fused gray/resize/detect)
  mirror     closed-form flip features
  banked     align_pair_banked dispatch + single fetch
  flip       _flip_padded when the flip hypothesis wins
  chain      host transform chaining (numpy)

Every step syncs (jax.block_until_ready) so the relay's async dispatch
cannot smear costs across probes. Two passes: pass 1 absorbs compiles
(cold), pass 2 is the warm attribution. Writes JSON to stdout.

Run: python tools/profile_align.py          (default = TPU backend)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from drone_image_stitch_cpp_tpu.config.tuning import load_stitch_tuning
    from drone_image_stitch_cpp_tpu.ops import blend as B
    from drone_image_stitch_cpp_tpu.ops import features as F
    from drone_image_stitch_cpp_tpu.pipeline import global_ as G
    from drone_image_stitch_cpp_tpu.pipeline.roi_align import \
        align_pair_banked
    from drone_image_stitch_cpp_tpu.runtime.device import \
        enable_compile_cache
    from drone_image_stitch_cpp_tpu.runtime.handoff import DeviceStrip
    from drone_image_stitch_cpp_tpu.utils.synthetic import synthetic_ortho

    enable_compile_cache()
    log("backend:", jax.default_backend())

    # flagship-shaped strips: height ~3600 (2160 frame + registration
    # drift), width ~25700 (20 frames at ~1150 px step), 35% side overlap
    sh_, sw_ = 3600, 25728
    step_y = int(sh_ * 0.65)
    n = 3
    big = synthetic_ortho(h=sh_ + step_y * (n - 1) + 8, w=sw_ + 8, seed=5)
    strips = [np.ascontiguousarray(
        big[step_y * i:step_y * i + sh_, :sw_]).astype(np.uint8)
        for i in range(n)]
    del big
    tuning = load_stitch_tuning("visible")
    tuning = tuning.replace(sift_features=tuning.global_sift_features)
    log(f"strips: {n} x {strips[0].shape}, "
        f"global_sift={tuning.global_sift_features}")

    shapes = [st.shape[:2] for st in strips]
    hp_ = B.align_up(max(h for h, _ in shapes), G._STRIP_BUCKET)
    wp_ = B.align_up(max(w for _, w in shapes), G._STRIP_BUCKET)

    # stage inputs as DeviceStrips (the flagship handoff): canvas is the
    # EXT-snapped blend canvas with the content at a small offset
    def to_handle(arr):
        h, w = arr.shape[:2]
        ch = B.align_up(h + 16, 512)
        cw = B.align_up(w + 16, 512)
        canvas = np.zeros((ch, cw, 3), np.uint8)
        canvas[8:8 + h, 8:8 + w] = arr
        return DeviceStrip(jnp.asarray(canvas), (8, 8 + h, 8, 8 + w))

    # sync primitive: the axon relay's block_until_ready is a NO-OP —
    # the only real sync is fetching a value derived from the result.
    # One jitted checksum program per array shape/dtype; Features pytrees
    # sync by fetching their small (1, K) validity mask directly.
    chk = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))

    def sync(r):
        import numpy as _np
        if hasattr(r, "valid"):            # Features pytree
            _np.asarray(r.valid)
        elif isinstance(r, tuple):
            for x in r:
                sync(x)
        elif hasattr(r, "shape"):
            float(_np.asarray(chk(r)))
        return r

    handles = [to_handle(st) for st in strips]
    sync(handles[-1].dev)

    out = {"n_strips": n, "strip_hw": list(shapes[0]),
           "padded_hw": [hp_, wp_], "passes": []}
    for pass_i in range(2):
        t = {}

        def probe(name, fn):
            t0 = time.perf_counter()
            r = sync(fn())
            dt = time.perf_counter() - t0
            t[name] = round(t.get(name, 0.0) + dt, 3)
            return r

        t_all0 = time.perf_counter()
        dev_strips = [probe("repad",
                            lambda hdl=hdl: hdl.device_padded(hp_, wp_))
                      for hdl in handles]
        feats = []
        scales = []
        for i, (ds, shp) in enumerate(zip(dev_strips, shapes)):
            f, sc = probe(
                "detect", lambda ds=ds, shp=shp: G._detect_strip_dev(
                    ds, shp, tuning.global_sift_features))
            feats.append(f)
            scales.append(sc)
        mirrors = [probe("mirror",
                         lambda f=f, w=shp[1]: F.mirror_features(f, w))
                   for f, shp in zip(feats, shapes)]
        ests = []
        for i in range(1, n):
            d, fl = probe("banked", lambda i=i: align_pair_banked(
                feats[i - 1], scales[i - 1], feats[i], mirrors[i],
                shapes[i - 1], shapes[i], tuning, i))
            ests.append((d, fl))
        # flip program cost (the flagship flips every other strip)
        probe("flip", lambda: G._flip_padded(dev_strips[1], shapes[1][1]))
        t["total"] = round(time.perf_counter() - t_all0, 3)
        out["passes"].append(t)
        log(f"pass {pass_i} ({'cold' if pass_i == 0 else 'warm'}): {t}")
        for k, (d, fl) in enumerate(ests):
            log(f"  pair {k}: direct ok={d.ok} inl={d.inliers} "
                f"m={d.matches} | flip ok={fl.ok} inl={fl.inliers}")

    warm = out["passes"][1]
    per_pair = round((warm["total"]) / (n - 1), 2)
    out["warm_per_pair_s"] = per_pair
    print(json.dumps(out))


if __name__ == "__main__":
    main()
