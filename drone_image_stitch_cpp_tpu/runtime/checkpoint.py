"""Checkpoint / resume for the strip -> global pipeline boundary.

The reference persists per-strip panoramas (stitch_app.cpp:215-217) but
never reads them back; SURVEY.md §5 calls for making this a real checkpoint
boundary. Strip mosaics + a manifest are written after the strip stage and
the global stage can resume from them (RunConfig.resume).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

_MANIFEST = "checkpoint.json"


def save_strip_checkpoint(ckpt_dir: str, strips: List[np.ndarray]) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    names = []
    for i, s in enumerate(strips):
        # lossless for exact resume; raw .npy, because PNG deflate of a
        # 56 MP strip costs 10-30 s of host CPU (the flagship sortie's
        # worst crop+save stall) while a raw write runs at disk speed
        name = f"strip_{i:02d}.npy"
        np.save(os.path.join(ckpt_dir, name), np.ascontiguousarray(s))
        names.append(name)
    with open(os.path.join(ckpt_dir, _MANIFEST), "w") as f:
        json.dump({"strips": names, "version": 2}, f)


def load_strip_checkpoint(ckpt_dir: str) -> Optional[List[np.ndarray]]:
    path = os.path.join(ckpt_dir, _MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        manifest = json.load(f)
    strips = []
    for name in manifest.get("strips", []):
        fpath = os.path.join(ckpt_dir, name)
        if not os.path.exists(fpath):
            return None  # incomplete checkpoint -> recompute
        if name.endswith(".npy"):
            strips.append(np.load(fpath))
        else:  # version-1 checkpoints (PNG)
            import cv2
            img = cv2.imread(fpath, cv2.IMREAD_COLOR)
            if img is None:
                return None
            strips.append(img)
    return strips if strips else None
