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
    import cv2
    names = []
    for i, s in enumerate(strips):
        name = f"strip_{i:02d}.png"  # lossless for exact resume
        cv2.imwrite(os.path.join(ckpt_dir, name), s)
        names.append(name)
    with open(os.path.join(ckpt_dir, _MANIFEST), "w") as f:
        json.dump({"strips": names, "version": 1}, f)


def load_strip_checkpoint(ckpt_dir: str) -> Optional[List[np.ndarray]]:
    path = os.path.join(ckpt_dir, _MANIFEST)
    if not os.path.exists(path):
        return None
    import cv2
    with open(path) as f:
        manifest = json.load(f)
    strips = []
    for name in manifest.get("strips", []):
        img = cv2.imread(os.path.join(ckpt_dir, name), cv2.IMREAD_COLOR)
        if img is None:
            return None  # incomplete checkpoint -> recompute
        strips.append(img)
    return strips if strips else None
