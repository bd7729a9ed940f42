"""Batched pairwise registration over a pair schedule.

The TPU-native replacement for the reference's per-pair feature-match loops:
  - BestOf2NearestRangeMatcher's banded schedule |i - j| <= range_width
    (reference: stitch_robust.cpp:190-197)
  - the grouper's short-range gap 1..3 motion graph
    (reference: visual_flight_grouper.cpp:349-377)
  - optional explicit matching masks (reference: stitch_robust.cpp:247-249)

All pairs in the schedule are matched + RANSAC'd as one vmapped device
batch (chunked to bound the (K, K) distance-matrix memory), instead of one
OpenCV call per pair. Confidence uses the BestOf2Nearest semantics
inliers / (8 + 0.3 * matches).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import match as M
from ..ops import ransac as R
from ..ops.features import Features


class PairGraph(NamedTuple):
    """Per-pair registration results (leading axis = pair)."""

    pairs: np.ndarray     # (P, 2) int32 frame indices (i, j)
    model: jnp.ndarray    # (P, 3, 3) frame_i -> frame_j
    n_good: jnp.ndarray   # (P,) int32 ratio-test survivors
    n_inliers: jnp.ndarray  # (P,) int32
    conf: jnp.ndarray     # (P,) float32
    ok: jnp.ndarray       # (P,) bool RANSAC success
    pts_a: jnp.ndarray    # (P, K, 2) matched coords in frame i
    pts_b: jnp.ndarray    # (P, K, 2) matched coords in frame j
    w: jnp.ndarray        # (P, K) float32 inlier weights


def banded_pairs(n: int, range_width: int) -> List[Tuple[int, int]]:
    """|i - j| <= range_width pair schedule (ordered, j > i)."""
    return [(i, j) for i in range(n) for j in range(i + 1, n)
            if j - i <= range_width]


def all_pairs(n: int) -> List[Tuple[int, int]]:
    return [(i, j) for i in range(n) for j in range(i + 1, n)]


def gap_pairs(n: int, max_gap: int) -> List[Tuple[int, int]]:
    """The grouper's short-range graph: gaps 1..max_gap."""
    return [(i, i + g) for g in range(1, max_gap + 1) for i in range(n - g)]


@functools.partial(jax.jit,
                   static_argnames=("kind", "n_hyp"))
def _register_chunk(desc_a, valid_a, xy_a, desc_b, valid_b, xy_b, keys,
                    ratio, thresh, kind: str, n_hyp: int):
    """vmapped match + RANSAC over one chunk of pairs."""

    def one(da, va, xa, db, vb, xb, key, th):
        m = M.knn2_ratio(da, va, db, vb, ratio)
        src, dst, good = M.gather_correspondences(xa, xb, m)
        res = R.ransac(src, dst, good, key, kind, thresh=th, n_hyp=n_hyp)
        n_good = jnp.sum(good.astype(jnp.int32))
        conf = M.pair_confidence(res.n_inliers.astype(jnp.float32),
                                 n_good.astype(jnp.float32))
        w = res.inliers.astype(jnp.float32)
        return (res.model, n_good, res.n_inliers, conf, res.ok, src, dst, w)

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
        desc_a, valid_a, xy_a, desc_b, valid_b, xy_b, keys, thresh)


def register_pairs(feats: Features, pairs: List[Tuple[int, int]],
                   ratio: float, thresh: float, kind: str = "similarity",
                   n_hyp: int = 1024, chunk: int = 16,
                   seed: int = 0, mesh=None) -> PairGraph:
    """Match + RANSAC every (i, j) in ``pairs``.

    ``feats``: batched Features (leading frame axis). ``thresh`` is in the
    same coordinate units as feats.xy. Chunked so HBM holds at most
    ``chunk`` (K, K) distance matrices at once per device.

    ``mesh``: optional 1-D jax.sharding.Mesh ("dp" axis). Pairs are data-
    parallel: each chunk's pair axis is sharded over the mesh (the (K, K)
    distance matmul + RANSAC bank partition trivially along it; collectives
    ride ICI only for the gather/concat boundaries). Per-pair PRNG keys
    make results independent of the device count.
    """
    p = len(pairs)
    assert p > 0
    pa = np.asarray(pairs, np.int32)
    step = chunk
    sharding = None
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        axis = mesh.axis_names[0]
        step = chunk * int(mesh.devices.size)
        sharding = NamedSharding(mesh, PartitionSpec(axis))
    n_chunks = -(-p // step)
    pad = n_chunks * step - p
    pa_pad = np.concatenate([pa, np.tile(pa[-1:], (pad, 1))]) if pad else pa

    keys = jax.random.split(jax.random.PRNGKey(seed), n_chunks * step)
    outs = []
    for c in range(n_chunks):
        sl = slice(c * step, (c + 1) * step)
        idx_i = jnp.asarray(pa_pad[sl, 0])
        idx_j = jnp.asarray(pa_pad[sl, 1])
        args = [feats.desc[idx_i], feats.valid[idx_i], feats.xy[idx_i],
                feats.desc[idx_j], feats.valid[idx_j], feats.xy[idx_j],
                keys[sl]]
        if sharding is not None:
            args = [jax.device_put(a, sharding) for a in args]
        outs.append(_register_chunk(
            *args, jnp.float32(ratio), jnp.float32(thresh), kind, n_hyp))

    cat = [jnp.concatenate([o[f] for o in outs])[:p] for f in range(8)]
    model, n_good, n_inl, conf, ok, src, dst, w = cat
    return PairGraph(pairs=pa, model=model, n_good=n_good, n_inliers=n_inl,
                     conf=conf, ok=ok, pts_a=src, pts_b=dst, w=w)


def biggest_component(n: int, pairs: np.ndarray,
                      keep: np.ndarray) -> List[int]:
    """Largest connected component of the kept-pair graph (host, tiny N).

    Analog of OpenCV's leaveBiggestComponent driven by pano_conf_thresh
    (reference: stitch_robust.cpp:181).
    """
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (i, j), k in zip(pairs, keep):
        if k:
            parent[find(int(i))] = find(int(j))
    comps = {}
    for v in range(n):
        comps.setdefault(find(v), []).append(v)
    return max(comps.values(), key=len)


def chain_init(n: int, pairs: np.ndarray, models: np.ndarray,
               ok: np.ndarray, conf: np.ndarray) -> np.ndarray:
    """Initial frame->frame0 transforms by walking the best spanning edges.

    BFS from frame 0 over successful pairs, always expanding the highest-
    confidence edge first (host logic, tiny N). Frames unreachable from 0
    get identity. Returns (N, 3, 3) float32.
    """
    import heapq

    t = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    adj = {}
    for idx, (i, j) in enumerate(pairs):
        if not ok[idx]:
            continue
        adj.setdefault(int(i), []).append((float(conf[idx]), int(j), idx, 0))
        adj.setdefault(int(j), []).append((float(conf[idx]), int(i), idx, 1))
    visited = {0}
    heap = [(-c, 0, nb, idx, rev) for c, nb, idx, rev in adj.get(0, [])]
    heapq.heapify(heap)
    while heap:
        negc, src, dst, idx, rev = heapq.heappop(heap)
        if dst in visited:
            continue
        m = models[idx]
        # model maps frame_i -> frame_j; we need dst -> src
        m_dst_to_src = np.linalg.inv(m) if rev == 0 else m
        t[dst] = t[src] @ m_dst_to_src
        visited.add(dst)
        for c, nb, nidx, nrev in adj.get(dst, []):
            if nb not in visited:
                heapq.heappush(heap, (-c, dst, nb, nidx, nrev))
    return t
