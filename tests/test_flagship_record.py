"""Flagship-benchmark record ratchet (VERDICT r4 item 8).

Rounds 3 and 4 both shipped perf-affecting source AFTER the recorded
flagship measurement, so the headline number never described HEAD. This
test makes that impossible to repeat silently: once a protocol-v2 record
exists (bench_sortie.py --runs >= 4), the suite fails if

  * fewer than 3 warm runs back the headline (n=1 is not a protocol),
  * the GT-RMSE ratio exceeds the 0.75 ratchet (round-4 weak #1: a 12%
    accuracy regression shipped unnoticed inside a perf win),
  * the speedup regressed below the last recorded round, or
  * any perf-affecting source file changed after the measured commit
    (committed or uncommitted) — measure LAST, or re-measure.

Pre-v2 records (older rounds' artifacts) skip: the protocol fields they
lack are exactly what this test enforces.
"""

import json
import os
import subprocess

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_RECORD = os.path.join(_ROOT, "BENCH_sortie.json")

# paths whose changes can move the flagship number; docs/tests/artifacts
# are free to land after a measurement
_PERF_PREFIXES = ("drone_image_stitch_cpp_tpu/", "native/")
_PERF_FILES = {"bench_sortie.py", "tools/sortie_bench.py", "bench.py",
               "__graft_entry__.py"}

_SPEEDUP_FLOOR = 5.68      # round-4 recorded speedup; ratchet, only up
_RMSE_RATIO_MAX = 0.75     # ours/reference GT-RMSE (lower = better)


def _load():
    if not os.path.exists(_RECORD):
        pytest.skip("no BENCH_sortie.json record")
    with open(_RECORD) as f:
        return json.load(f)


@pytest.mark.quick
def test_flagship_record_protocol():
    data = _load()
    if data.get("protocol_version", 1) < 2:
        pytest.skip("pre-protocol-v2 record (re-measure with "
                    "bench_sortie.py --runs >= 4 to arm the ratchet)")
    assert data.get("warm_runs", 0) >= 3, \
        f"flagship headline needs >= 3 warm runs, got {data.get('warm_runs')}"
    assert data.get("warm_median") is not None
    assert data.get("secs_ours") == data["warm_median"]
    assert data.get("rmse_ratio") is not None \
        and data["rmse_ratio"] <= _RMSE_RATIO_MAX, \
        f"GT-RMSE ratio {data.get('rmse_ratio')} > {_RMSE_RATIO_MAX}"
    assert data.get("speedup") is not None \
        and data["speedup"] >= _SPEEDUP_FLOOR, \
        f"speedup {data.get('speedup')} regressed below {_SPEEDUP_FLOOR}"


@pytest.mark.quick
def test_flagship_record_matches_head_source():
    """No perf-affecting source may change after the measured commit."""
    data = _load()
    if data.get("protocol_version", 1) < 2:
        pytest.skip("pre-protocol-v2 record")
    commit = data.get("commit")
    assert commit, "record carries no commit hash"
    try:
        proc = subprocess.run(
            ["git", "diff", "--name-only", commit],
            capture_output=True, text=True, cwd=_ROOT, timeout=60)
    except (OSError, subprocess.TimeoutExpired) as e:
        pytest.skip(f"git unavailable: {e}")
    if proc.returncode != 0:
        pytest.skip(f"measured commit {commit} not in this clone: "
                    f"{proc.stderr.strip()[:200]}")
    changed = [p for p in proc.stdout.splitlines()
               if p.startswith(_PERF_PREFIXES) or p in _PERF_FILES]
    assert not changed, (
        f"perf-affecting source changed after the measured commit "
        f"{commit}: {changed} — re-run bench_sortie.py at HEAD")
