"""Shared harness for the flagship / parity benchmarks.

Provides the four pieces both bench_sortie.py (200-frame flagship) and
bench_parity.py (repeatable GT-RMSE parity) need:

  * make_sortie(): render a boustrophedon sortie from a fractal ortho into
    the reference's expected layout (<root>/visible/minfull/*.jpg), with
    the ground-truth ortho crop cached alongside;
  * build_reference(): compile /root/reference against this image's
    OpenCV 5 (one API-removal patch: cv::utils::logging::setLogLevel,
    gone in OpenCV 5 — see stitch_app.cpp:147) into a cached binary;
  * run_reference() / run_ours(): end-to-end timed runs producing a
    mosaic; the reference binary uses hardcoded ../images paths
    (stitch_app.cpp:149-151), so it runs with cwd inside a scratch tree;
  * gt_rmse(): mosaic vs ground-truth ortho crop, phase-aligned at
    reduced scale, blurred RMSE over the shared region (any two correct
    stitchers differ at seams/resampling; GT-RMSE is the parity metric —
    see BASELINE.md notes).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# sortie generation
# ---------------------------------------------------------------------------

def make_sortie(root: str, rows: int, cols: int, frame_h: int, frame_w: int,
                overlap: float = 0.7, overlap_y: float = 0.35,
                seed: int = 11, jpeg_q: int = 92):
    """Render <root>/visible/minfull/*.jpg + <root>/gt.npy; cached.

    Returns (input_root, gt_path): ``input_root`` is the folder whose
    visible/minfull the stitchers consume; ``gt.npy`` holds the uint8
    ground-truth ortho crop covering exactly the sortie footprint.
    """
    import cv2
    from drone_image_stitch_cpp_tpu.utils.synthetic import fractal_ortho

    img_dir = os.path.join(root, "visible", "minfull")
    gt_path = os.path.join(root, "gt.npy")
    meta_path = os.path.join(root, "meta.json")
    meta = {"rows": rows, "cols": cols, "frame_h": frame_h,
            "frame_w": frame_w, "overlap": overlap, "overlap_y": overlap_y,
            "seed": seed, "jpeg_q": jpeg_q}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f) == meta and os.path.exists(gt_path):
                log(f"[sortie] cached: {img_dir}")
                return root, gt_path

    shutil.rmtree(img_dir, ignore_errors=True)
    os.makedirs(img_dir)
    step_x = int(frame_w * (1 - overlap))
    step_y = int(frame_h * (1 - overlap_y))
    margin = 16
    oh = 2 * margin + frame_h + (rows - 1) * step_y
    ow = 2 * margin + frame_w + (cols - 1) * step_x
    log(f"[sortie] ortho {oh}x{ow}, {rows * cols} frames "
        f"{frame_h}x{frame_w}")
    ortho = fractal_ortho(oh, ow, seed=seed)
    k = 0
    for row in range(rows):
        xs = range(cols) if row % 2 == 0 else range(cols - 1, -1, -1)
        for c in xs:
            y = margin + row * step_y
            x = margin + c * step_x
            frame = ortho[y:y + frame_h, x:x + frame_w].astype(np.uint8)
            cv2.imwrite(os.path.join(img_dir, f"IMG{k:04d}_f{k:04d}.jpg"),
                        frame, [cv2.IMWRITE_JPEG_QUALITY, jpeg_q])
            k += 1
    gt = ortho[margin:margin + frame_h + (rows - 1) * step_y,
               margin:margin + frame_w + (cols - 1) * step_x]
    np.save(gt_path, gt.astype(np.uint8))
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return root, gt_path


# ---------------------------------------------------------------------------
# reference build + run
# ---------------------------------------------------------------------------

_REF_SRC = "/root/reference"
_REF_BUILD = "/tmp/refbuild"


def build_reference() -> str:
    """Patched build of the C++ reference; returns the cached binary path."""
    exe = os.path.join(_REF_BUILD, "build", "drone_image_stitch_cpp")
    if os.path.exists(exe):
        return exe
    shutil.rmtree(_REF_BUILD, ignore_errors=True)
    shutil.copytree(_REF_SRC, _REF_BUILD)
    app = os.path.join(_REF_BUILD, "src", "stitch_app.cpp")
    with open(app) as f:
        src = f.read()
    # OpenCV 5 removed cv::utils::logging::setLogLevel — drop the call
    src = src.replace(
        "cv::utils::logging::setLogLevel(cv::utils::logging::"
        "LOG_LEVEL_SILENT);", "// (logging call removed for OpenCV 5)")
    with open(app, "w") as f:
        f.write(src)
    bdir = os.path.join(_REF_BUILD, "build")
    os.makedirs(bdir)
    log("[ref] cmake+make (cached afterwards)")
    subprocess.run(["cmake", "-DCMAKE_BUILD_TYPE=Release", ".."],
                   cwd=bdir, check=True, capture_output=True)
    subprocess.run(["make", "-j", str(os.cpu_count() or 1)], cwd=bdir,
                   check=True, capture_output=True)
    return exe


def run_reference(input_root: str, timeout: float = 7200):
    """Run the reference on <input_root>/visible/minfull.

    Returns (seconds, mosaic uint8 BGR or None, returncode). The binary
    reads ../images/visible/minfull and writes ../output/... relative to
    its cwd (stitch_app.cpp:149-160), so a scratch cwd symlinks the input.
    """
    import cv2

    exe = build_reference()
    scratch = os.path.join(input_root, "_refrun")
    shutil.rmtree(scratch, ignore_errors=True)
    cwd = os.path.join(scratch, "run")
    os.makedirs(cwd)
    os.symlink(input_root, os.path.join(scratch, "images"))
    t0 = time.perf_counter()
    try:
        proc = subprocess.run([exe], cwd=cwd, capture_output=True,
                              timeout=timeout)
        rc = proc.returncode
    except subprocess.TimeoutExpired:
        return timeout, None, -1
    secs = time.perf_counter() - t0
    out = os.path.join(scratch, "output", "visible", "minfull",
                       "visible_minfull_uav_panorama.jpg")
    mosaic = cv2.imread(out, cv2.IMREAD_COLOR) if os.path.exists(out) \
        else None
    if rc != 0:
        log(f"[ref] exit={rc} stderr tail: "
            f"{proc.stderr.decode(errors='replace')[-300:]}")
    return secs, mosaic, rc


def run_ours(input_root: str, out_root: str, retries: int = 0):
    """End-to-end run of this framework; returns (seconds, mosaic, rc).

    ``retries``: re-attempts after a non-zero exit (e.g. a remote-relay
    blip on a long flagship run), resuming the global stage from the
    strip checkpoint (app.py --resume) so completed strips are not
    re-stitched. Wall-clock accumulates across attempts.
    """
    import cv2
    from drone_image_stitch_cpp_tpu.app import (RunConfig,
                                                run_stitch_application)

    shutil.rmtree(out_root, ignore_errors=True)
    t0 = time.perf_counter()
    for attempt in range(retries + 1):
        cfg = RunConfig(image_folder=input_root, image_type="visible",
                        group="minfull", output_root=out_root,
                        resume=attempt > 0)
        rc = run_stitch_application(cfg)
        if rc == 0:
            break
        if attempt < retries:
            log(f"[ours] rc={rc}; retrying with --resume "
                f"({attempt + 1}/{retries})")
    secs = time.perf_counter() - t0
    mosaic = cv2.imread(cfg.output_path, cv2.IMREAD_COLOR) \
        if os.path.exists(cfg.output_path) else None
    return secs, mosaic, rc


# ---------------------------------------------------------------------------
# ground-truth RMSE
# ---------------------------------------------------------------------------

def gt_rmse(mosaic: np.ndarray, gt: np.ndarray, max_dim: int = 4000):
    """Blurred RMSE between a mosaic and the ground-truth ortho crop.

    Phase-correlates gray downscales to absorb the global translation a
    stitcher is free to choose, shifts the mosaic, and computes RMSE after
    a mild blur (subpixel-resampling tolerant) over the common region.
    Returns (rmse, dx, dy). Scale-invariant comparisons only — both
    stitchers compose at native resolution.
    """
    import cv2

    def gray(a):
        return cv2.cvtColor(a, cv2.COLOR_BGR2GRAY).astype(np.float32)

    s = min(1.0, max_dim / max(gt.shape[0], gt.shape[1],
                               mosaic.shape[0], mosaic.shape[1]))
    gm = cv2.resize(gray(mosaic), None, fx=s, fy=s,
                    interpolation=cv2.INTER_AREA)
    gg = cv2.resize(gray(gt), None, fx=s, fy=s,
                    interpolation=cv2.INTER_AREA)
    h = min(gm.shape[0], gg.shape[0])
    w = min(gm.shape[1], gg.shape[1])
    (dx, dy), _ = cv2.phaseCorrelate(gm[:h, :w], gg[:h, :w])
    # full-res shift of the mosaic onto the gt frame
    fdx, fdy = dx / s, dy / s
    m = cv2.warpAffine(
        mosaic, np.asarray([[1, 0, fdx], [0, 1, fdy]], np.float32),
        (gt.shape[1], gt.shape[0]))
    valid = (cv2.cvtColor(m, cv2.COLOR_BGR2GRAY) > 2)
    valid = cv2.erode(valid.astype(np.uint8), np.ones((9, 9), np.uint8))
    mb = cv2.GaussianBlur(m.astype(np.float32), (9, 9), 2.0)
    gb = cv2.GaussianBlur(gt.astype(np.float32), (9, 9), 2.0)
    diff = ((mb - gb) ** 2).mean(axis=-1)
    sel = valid.astype(bool)
    if sel.sum() < 1000:
        return float("inf"), fdx, fdy
    return float(np.sqrt(diff[sel].mean())), fdx, fdy
