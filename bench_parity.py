"""Repeatable parity harness: GT-RMSE of ours vs the compiled reference.

Runs BOTH stitchers end-to-end on synthetic sorties with exact ground
truth and emits one JSON line per config:

  {"config", "gt_rmse_ours", "gt_rmse_ref", "ratio", "secs_ours",
   "secs_ref", "ref_rc"}

ratio = gt_rmse_ours / gt_rmse_ref (<= 1.0 means we match or beat the
reference's accuracy). px-RMSE directly against the reference output is
not meaningful on textured synthetics (any two correct stitchers differ
at seams/resampling — BASELINE.md notes), so GT-RMSE is the parity
metric, mirroring the reference's own output at stitch_global.cpp:662-666.

Configs: BASELINE.json #2/#3 shapes — a 10-frame 2-strip sortie
(960x1280 frames, 70%/35% overlaps) and optionally the 45-frame 3-strip
sortie (--full; the reference OOM-crashes there, recorded as ref_rc != 0).

Usage: python bench_parity.py [--full] [--work DIR] [--tiny]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from tools.sortie_bench import (gt_rmse, log, make_sortie, run_ours,
                                run_reference)

import numpy as np


CONFIGS = {
    "tiny-8f":   dict(rows=2, cols=4, frame_h=160, frame_w=208),
    "10-frame":  dict(rows=2, cols=5, frame_h=960, frame_w=1280),
    "45-frame":  dict(rows=3, cols=15, frame_h=960, frame_w=1280),
}


def run_config(name: str, work: str, skip_ref: bool = False) -> dict:
    cfg = CONFIGS[name]
    root, gt_path = make_sortie(f"{work}/{name}", **cfg)
    gt = np.load(gt_path)

    secs_ours, mosaic_ours, rc_ours = run_ours(root, f"{root}/_ours")
    if rc_ours != 0 or mosaic_ours is None:
        raise SystemExit(f"[parity] our run failed rc={rc_ours}")
    r_ours, _, _ = gt_rmse(mosaic_ours, gt)
    log(f"[parity] {name} ours: {secs_ours:.1f}s gt_rmse={r_ours:.2f} "
        f"mosaic={mosaic_ours.shape}")

    out = {"config": name, "gt_rmse_ours": round(r_ours, 3),
           "secs_ours": round(secs_ours, 1)}
    if not skip_ref:
        secs_ref, mosaic_ref, rc_ref = run_reference(root)
        out["ref_rc"] = rc_ref
        out["secs_ref"] = round(secs_ref, 1)
        if mosaic_ref is not None:
            r_ref, _, _ = gt_rmse(mosaic_ref, gt)
            out["gt_rmse_ref"] = round(r_ref, 3)
            out["ratio"] = round(r_ours / max(r_ref, 1e-9), 3)
            log(f"[parity] {name} ref: {secs_ref:.1f}s gt_rmse={r_ref:.2f}"
                f" -> ratio {out['ratio']}")
        else:
            out["gt_rmse_ref"] = None
            out["ratio"] = None
            log(f"[parity] {name} reference produced no mosaic "
                f"(rc={rc_ref})")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/parity")
    ap.add_argument("--full", action="store_true",
                    help="also run the 45-frame config")
    ap.add_argument("--tiny", action="store_true",
                    help="only the tiny CI config")
    ap.add_argument("--only", choices=sorted(CONFIGS),
                    help="run a single named config")
    ap.add_argument("--json-out", default=None,
                    help="also write all results (+ commit hash) to FILE — "
                         "the per-round PARITY_r{N}.json artifact")
    args = ap.parse_args()

    if args.only:
        names = [args.only]
    else:
        names = (["tiny-8f"] if args.tiny
                 else ["10-frame"] + (["45-frame"] if args.full else []))
    results = []
    for name in names:
        out = run_config(name, args.work)
        results.append(out)
        print(json.dumps(out))
    if args.json_out:
        import subprocess
        try:
            commit = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
        except (subprocess.CalledProcessError, OSError):
            commit = None
        with open(args.json_out, "w") as f:
            json.dump({"commit": commit, "results": results}, f, indent=1)
        log(f"[parity] wrote {args.json_out}")


if __name__ == "__main__":
    main()
