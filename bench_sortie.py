"""Flagship benchmark: 200-frame 4K sortie end-to-end (BASELINE.json #5).

The north-star metric: stitch a 200-frame 4K drone sortie end-to-end on a
single TPU chip faster than the C++/OpenCV reference
(/root/reference/src/stitch_app.cpp:146-271 is the matched program).

Renders a 10x20 boustrophedon sortie of 2160x3840 frames (70% along-track,
35% side overlap) from an aperiodic fractal ortho, runs this framework
end-to-end (grouping -> strips -> global compose -> crop -> write), then
the compiled reference on the identical input, and emits ONE JSON line:

  {"frames", "secs_ours", "secs_ref", "speedup", "gt_rmse_ours",
   "gt_rmse_ref", "rmse_ratio", "backend", "ref_rc", "peak_hbm_gb"}

Usage: python bench_sortie.py [--frames-rows 10 --frames-cols 20]
         [--work /tmp/sortie200] [--skip-ref] [--skip-ours]
Cached: the rendered sortie and the reference build persist under --work
and /tmp/refbuild, so re-runs only re-execute the stitchers.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

from tools.sortie_bench import (gt_rmse, log, make_sortie, run_ours,
                                run_reference)


def peak_hbm_gb():
    try:
        import jax
        st = jax.local_devices()[0].memory_stats()
        return round(st.get("peak_bytes_in_use", 0) / 2 ** 30, 2)
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-rows", type=int, default=10)
    ap.add_argument("--frames-cols", type=int, default=20)
    ap.add_argument("--work", default="/tmp/sortie200")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--ref-timeout", type=float, default=14400)
    args = ap.parse_args()

    root, gt_path = make_sortie(args.work, rows=args.frames_rows,
                                cols=args.frames_cols,
                                frame_h=2160, frame_w=3840)
    gt = np.load(gt_path)
    out = {"frames": args.frames_rows * args.frames_cols,
           "frame": "2160x3840", "overlap": "0.70/0.35"}

    if not args.skip_ours:
        import jax
        out["backend"] = jax.default_backend()
        secs, mosaic, rc = run_ours(root, f"{root}/_ours", retries=2)
        if rc != 0 or mosaic is None:
            raise SystemExit(f"[sortie] our run failed rc={rc}")
        r, _, _ = gt_rmse(mosaic, gt, max_dim=6000)
        out.update(secs_ours=round(secs, 1), gt_rmse_ours=round(r, 3),
                   mosaic_hw=list(mosaic.shape[:2]),
                   peak_hbm_gb=peak_hbm_gb())
        log(f"[sortie] ours: {secs:.1f}s gt_rmse={r:.2f} "
            f"mosaic={mosaic.shape} hbm={out['peak_hbm_gb']}")

    if not args.skip_ref:
        secs, mosaic, rc = run_reference(root, timeout=args.ref_timeout)
        out["ref_rc"] = rc
        out["secs_ref"] = round(secs, 1)
        if mosaic is not None:
            r, _, _ = gt_rmse(mosaic, gt, max_dim=6000)
            out["gt_rmse_ref"] = round(r, 3)
        else:
            out["gt_rmse_ref"] = None
            log(f"[sortie] reference produced no mosaic (rc={rc})")

    # merge with the recorded file: a --skip-ref / --skip-ours run reuses
    # the other side's cached numbers so the file always carries both
    record = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_sortie.json")
    prior = {}
    if os.path.exists(record):
        try:
            with open(record) as f:
                prior = json.load(f)
        except (OSError, json.JSONDecodeError):
            prior = {}
    for k in ("secs_ours", "gt_rmse_ours", "mosaic_hw", "peak_hbm_gb",
              "backend", "secs_ref", "gt_rmse_ref", "ref_rc"):
        if k not in out and k in prior:
            out[k] = prior[k]
    if out.get("secs_ref") and out.get("secs_ours") \
            and out.get("ref_rc") == 0:
        out["speedup"] = round(out["secs_ref"] / out["secs_ours"], 2)
        if out.get("gt_rmse_ref") and out.get("gt_rmse_ours") is not None:
            out["rmse_ratio"] = round(
                out["gt_rmse_ours"] / out["gt_rmse_ref"], 3)
    with open(record, "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
