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
    """Peak device memory of the run (runtime/hbm.py watermark).

    Prefers the allocator's peak_bytes_in_use when the backend exposes it;
    through the axon relay (memory_stats() -> None) it is the high-water
    of live client-visible device buffers sampled at stage boundaries and
    per compose tile — a lower bound (in-dispatch temporaries invisible).
    The meter used is recorded alongside the number.
    """
    try:
        from drone_image_stitch_cpp_tpu.runtime import hbm
        p = hbm.peak()
        if p["peak_bytes"] > 0:
            return round(p["peak_gb"], 2), p["meter"], p["tag"]
    except Exception:
        pass
    try:
        import jax
        st = jax.local_devices()[0].memory_stats()
        return (round(st.get("peak_bytes_in_use", 0) / 2 ** 30, 2),
                "allocator", "")
    except Exception:
        return None, None, None


def _git_commit():
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except (subprocess.CalledProcessError, OSError):
        return None


def _stage_split(records):
    """Aggregate the run's `... done seconds=` records into a per-stage
    wall-clock map (strips summed; the per-strip warm/cold spread is in
    the raw log)."""
    out = {}
    for r in records:
        if "seconds" not in r:
            continue
        stage = r["stage"]
        msg = r["msg"].replace(" done", "")
        if stage.startswith("Strip"):
            key = f"strips:{msg}"
        else:
            key = f"{stage}:{msg}"
        out[key] = round(out.get(key, 0.0) + r["seconds"], 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-rows", type=int, default=10)
    ap.add_argument("--frames-cols", type=int, default=20)
    ap.add_argument("--work", default="/tmp/sortie200")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--ref-timeout", type=float, default=14400)
    ap.add_argument("--runs", type=int, default=1,
                    help="measured end-to-end runs of ours at this commit. "
                         "Run 1 is labeled COLD (it absorbs XLA compiles); "
                         "the recorded secs_ours is the MEDIAN OF THE WARM "
                         "runs (2..N), and every run's wall/GT-RMSE/stage "
                         "split is kept. Use --runs >= 4 for the protocol "
                         "(1 cold + >= 3 warm).")
    args = ap.parse_args()

    root, gt_path = make_sortie(args.work, rows=args.frames_rows,
                                cols=args.frames_cols,
                                frame_h=2160, frame_w=3840)
    gt = np.load(gt_path)
    out = {"frames": args.frames_rows * args.frames_cols,
           "frame": "2160x3840", "overlap": "0.70/0.35",
           "commit": _git_commit()}

    partial = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "artifacts", "BENCH_sortie_partial.json")

    def _snapshot_runs(out, runs):
        """Fold the runs-so-far into ``out`` (protocol v2 stats) and write
        a partial artifact after EVERY run, so a measurement interrupted
        mid-protocol still leaves its completed runs on disk. The real
        record (BENCH_sortie.json) is only touched once >= 3 warm runs
        exist — the ratchet test arms on any protocol-v2 record, and an
        under-powered record must not masquerade as the headline."""
        true_warm = [rn for rn in runs if rn["label"] == "warm"]
        warm = true_warm or runs
        wsecs = sorted(rn["secs"] for rn in warm)
        med = wsecs[(len(wsecs) - 1) // 2]
        med_run = next(rn for rn in warm if rn["secs"] == med)
        out.update(secs_ours=med, secs_ours_runs=[rn["secs"] for rn in runs],
                   cold_secs=runs[0]["secs"],
                   warm_median=(med if true_warm else None),
                   warm_runs=len(true_warm),
                   warm_spread=[wsecs[0], wsecs[-1]],
                   gt_rmse_ours=med_run["gt_rmse"],
                   peak_hbm_gb=med_run["peak_hbm_gb"],
                   hbm_meter=med_run["hbm_meter"],
                   hbm_peak_at=med_run["hbm_peak_at"],
                   protocol_version=2,
                   runs=runs)
        rec = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_sortie.json")
        if os.path.exists(rec):
            try:
                with open(rec) as f:
                    pr = json.load(f)
                for k in ("secs_ref", "gt_rmse_ref", "ref_rc"):
                    out.setdefault(k, pr.get(k))
                if out.get("secs_ref") and out.get("ref_rc") == 0:
                    out["speedup"] = round(out["secs_ref"] / med, 2)
                    if out.get("gt_rmse_ref"):
                        out["rmse_ratio"] = round(
                            med_run["gt_rmse"] / out["gt_rmse_ref"], 3)
            except (OSError, json.JSONDecodeError):
                pass
        os.makedirs(os.path.dirname(partial), exist_ok=True)
        with open(partial, "w") as f:
            json.dump(out, f)
            f.write("\n")
        return len(true_warm)

    if not args.skip_ours:
        import jax
        from drone_image_stitch_cpp_tpu.runtime import hbm
        from drone_image_stitch_cpp_tpu.runtime.logging import get_logger
        out["backend"] = jax.default_backend()
        runs = []
        for k in range(max(1, args.runs)):
            hbm.reset()
            rec0 = len(get_logger()._records)
            secs, mosaic, rc = run_ours(root, f"{root}/_ours", retries=2)
            if rc != 0 or mosaic is None:
                raise SystemExit(f"[sortie] our run failed rc={rc}")
            r, _, _ = gt_rmse(mosaic, gt, max_dim=6000)
            hbm_gb, hbm_meter, hbm_tag = peak_hbm_gb()
            runs.append(dict(
                label=("cold" if k == 0 else "warm"),
                secs=round(secs, 1), gt_rmse=round(r, 3),
                stages=_stage_split(get_logger()._records[rec0:]),
                peak_hbm_gb=hbm_gb, hbm_meter=hbm_meter,
                hbm_peak_at=hbm_tag))
            log(f"[sortie] ours run {k + 1}/{args.runs} "
                f"({runs[-1]['label']}): {secs:.1f}s "
                f"gt_rmse={r:.2f} mosaic={mosaic.shape} hbm={hbm_gb} "
                f"({hbm_meter} @ {hbm_tag})")
            # protocol: run 1 absorbs the XLA compiles (COLD); the headline
            # is the median over the WARM runs only — a "median" of
            # [cold, warm] was really the min and under-reported the spread
            # (round-4 weak #2)
            out["mosaic_hw"] = list(mosaic.shape[:2])
            n_warm = _snapshot_runs(out, runs)
        if n_warm < 3:
            log(f"[sortie] only {n_warm} warm runs — partial artifact "
                f"written to {partial}; BENCH_sortie.json left untouched")
            return

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
    for k in ("secs_ours", "secs_ours_runs", "cold_secs", "warm_median",
              "warm_runs", "warm_spread", "protocol_version",
              "gt_rmse_ours", "mosaic_hw",
              "peak_hbm_gb", "hbm_meter", "hbm_peak_at", "backend", "runs",
              "secs_ref", "gt_rmse_ref", "ref_rc"):
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
