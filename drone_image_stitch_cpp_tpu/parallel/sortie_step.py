"""Multi-chip sortie registration step (shard_map over a 'dp' mesh axis).

The reference has no distributed execution at all (single process, SURVEY.md
§2.3); this is the TPU-native scaling story: frames are sharded over the
mesh's data axis, descriptors are all_gather'd over ICI so the banded pair
schedule can match across shard boundaries, RANSAC runs on the local shard
of pairs, the bundle-adjust normal equations are psum-reduced across
devices, and a feather-blended preview canvas is psum-composed. One jitted
step = the full registration + bundle adjust + DP-blend of a sortie.

Collectives used: all_gather (descriptor exchange), psum (normal equations
reduce + canvas reduce) — all over ICI via XLA, no hand-written backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import match as M
from ..ops import ransac as R
from ..ops.features import detect_and_describe
from ..pipeline.bundle import normal_equations, solve_with_priors
from ..ops.blend import border_feather_weight
from ..ops.warp import warp_affine
from ..ops.transform import compose_affine


def build_sortie_step(mesh: Mesh, n_frames: int, h: int, w: int,
                      max_kp: int = 128, range_width: int = 2,
                      n_hyp: int = 128, thresh: float = 4.0,
                      canvas_h: int = 256, canvas_w: int = 512,
                      axis: str = "dp"):
    """Return a jitted sharded step: (frames (B,H,W), key) -> outputs.

    B = n_frames must be divisible by the mesh axis size. Outputs:
      transforms (B, 2, 3) replicated frame->frame0 estimates,
      canvas (canvas_h, canvas_w) replicated feather-blend preview,
      n_inliers (B-1,) per adjacent pair.
    """
    n_dev = mesh.shape[axis]
    assert n_frames % n_dev == 0
    b_loc = n_frames // n_dev
    ratio = 0.8

    def step(frames_loc: jnp.ndarray, key: jnp.ndarray):
        # frames_loc: (b_loc, H, W) on this device
        feats = jax.vmap(
            lambda g: detect_and_describe(g, max_kp))(frames_loc)

        # ICI exchange: every device needs neighbor descriptors for the
        # banded schedule across shard boundaries.
        desc_all = jax.lax.all_gather(feats.desc, axis, tiled=True)
        xy_all = jax.lax.all_gather(feats.xy, axis, tiled=True)
        valid_all = jax.lax.all_gather(feats.valid, axis, tiled=True)

        my = jax.lax.axis_index(axis)
        keys = jax.random.split(key[0], b_loc * range_width)

        models = []
        weights = []
        pts_a = []
        pts_b = []
        pair_i = []
        pair_j = []
        ninl = []
        for li in range(b_loc):
            for g in range(1, range_width + 1):
                i_glob = my * b_loc + li
                j_glob = i_glob + g
                in_range = j_glob < n_frames
                j_safe = jnp.minimum(j_glob, n_frames - 1)
                db = desc_all[j_safe]
                xb = xy_all[j_safe]
                vb = valid_all[j_safe] & in_range
                m = M.knn2_ratio(feats.desc[li], feats.valid[li], db, vb,
                                 ratio)
                src, dst, good = M.gather_correspondences(feats.xy[li], xb,
                                                          m)
                res = R.ransac(src, dst, good,
                               keys[li * range_width + (g - 1)],
                               "similarity", thresh=thresh, n_hyp=n_hyp)
                models.append(res.model)
                weights.append(res.inliers.astype(jnp.float32)
                               * in_range.astype(jnp.float32))
                pts_a.append(src)
                pts_b.append(dst)
                pair_i.append(i_glob)
                pair_j.append(j_safe)
                ninl.append(res.n_inliers * in_range.astype(jnp.int32))

        pair_idx = jnp.stack([jnp.stack(pair_i), jnp.stack(pair_j)], -1)
        ata_loc, atb_loc = normal_equations(
            pair_idx, jnp.stack(pts_a), jnp.stack(pts_b),
            jnp.stack(weights), n_frames)

        # mesh-wide reduce of the normal equations, replicated solve
        ata = jax.lax.psum(ata_loc, axis)
        atb = jax.lax.psum(atb_loc, axis)
        init = jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (n_frames, 1))
        transforms = solve_with_priors(ata, atb, init)

        # DP-composed preview canvas: local warps, psum over the mesh
        feather = border_feather_weight(h, w)
        acc = jnp.zeros((canvas_h, canvas_w), jnp.float32)
        wacc = jnp.zeros((canvas_h, canvas_w), jnp.float32)
        shift = jnp.asarray([[0.25, 0.0, canvas_w * 0.25],
                             [0.0, 0.25, canvas_h * 0.25]], jnp.float32)
        for li in range(b_loc):
            i_glob = my * b_loc + li
            t = jnp.take(transforms, i_glob, axis=0)
            tc = compose_affine(shift, t)
            acc = acc + warp_affine(frames_loc[li] * feather, tc,
                                    canvas_h, canvas_w)
            wacc = wacc + warp_affine(feather, tc, canvas_h, canvas_w)
        acc = jax.lax.psum(acc, axis)
        wacc = jax.lax.psum(wacc, axis)
        canvas = acc / jnp.maximum(wacc, 1e-6)

        n_inl_loc = jnp.stack(ninl)
        n_inl_all = jax.lax.all_gather(n_inl_loc, axis, tiled=True)
        return transforms, canvas, n_inl_all

    mapped = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False)

    @jax.jit
    def run(frames: jnp.ndarray, keys: jnp.ndarray):
        return mapped(frames, keys)

    return run


def demo_inputs(mesh: Mesh, n_frames: int, h: int, w: int, axis="dp",
                seed: int = 0):
    """Tiny synthetic sharded inputs for the dry run."""
    import numpy as np

    r = np.random.default_rng(seed)
    bh, bw = h + 8 * n_frames, w + 8 * n_frames
    yy, xx = np.mgrid[0:bh, 0:bw].astype(np.float32)
    base = 110 + 50 * np.sin(xx / 17.0) * np.cos(yy / 13.0)
    for _ in range(300):  # sharp patches: structure at feature scales
        cy, cx = int(r.integers(0, bh)), int(r.integers(0, bw))
        s = int(r.integers(2, 8))
        base[max(0, cy - s):cy + s, max(0, cx - s):cx + s] = r.uniform(0,
                                                                       255)
    try:
        from scipy.ndimage import gaussian_filter
        base = base + gaussian_filter(r.normal(0, 1, (bh, bw)), 2.0) * 40.0
    except ImportError:
        pass
    base = np.clip(base, 0, 255).astype(np.float32)
    frames = np.stack([base[8 * i:8 * i + h, 8 * i:8 * i + w]
                       for i in range(n_frames)])
    keys = jax.random.split(jax.random.PRNGKey(seed), n_frames)
    frames = jax.device_put(frames, NamedSharding(mesh, P(axis)))
    keys = jax.device_put(keys, NamedSharding(mesh, P(axis)))
    return frames, keys
