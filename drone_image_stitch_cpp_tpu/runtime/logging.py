"""Structured stage logging + per-stage timers.

The reference's observability is `[Stage]`-prefixed stdout lines whose
logged quantities form a de-facto metrics schema (SURVEY.md §5): keypoint
counts, matches, inliers, ratios, tx/ty/scale/rot, scores, canvas sizes,
gains, seam scale, blend bands, timings (e.g. visual_flight_grouper.cpp:
362-373, stitch_global.cpp:400,431-436,667-670). This module reproduces that
schema through a structured logger (stage-prefixed lines + optional JSONL
sink) and adds real per-stage wall-clock timers and jax.profiler hooks the
reference lacks.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class StageLogger:
    """`[Stage] message key=value ...` lines + optional JSONL sink."""

    jsonl_path: Optional[str] = None
    verbose: bool = True
    _records: List[dict] = field(default_factory=list)

    def log(self, stage: str, message: str, **fields):
        if self.verbose:
            kv = " ".join(f"{k}={_fmt(v)}" for k, v in fields.items())
            print(f"[{stage}] {message}" + (f" {kv}" if kv else ""))
        rec = {"ts": time.time(), "stage": stage, "msg": message, **fields}
        self._records.append(rec)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec, default=str) + "\n")

    @contextlib.contextmanager
    def timer(self, stage: str, what: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.log(stage, f"{what} done", seconds=round(dt, 3))

    def timings(self) -> Dict[str, float]:
        return {r["msg"]: r["seconds"] for r in self._records
                if "seconds" in r}


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.4g}"
    return v


_GLOBAL = StageLogger()


def get_logger() -> StageLogger:
    return _GLOBAL


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str] = None):
    """jax.profiler trace hook around a pipeline stage (no-op if dir unset)."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
