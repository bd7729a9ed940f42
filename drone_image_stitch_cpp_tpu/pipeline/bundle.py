"""Bundle adjustment over per-frame 4-DoF similarity transforms.

Capability parity: detail::BundleAdjusterAffinePartial (reference:
stitch_robust.cpp:199-201) — refine per-image transforms by minimizing
match reprojection residuals across the pair graph.

TPU-first observation: for the affine-partial (similarity) model the
residuals  T_i(p) - T_j(q)  are *linear* in the stacked parameters
(a_i, b_i, tx_i, ty_i), so the whole bundle adjust is one weighted linear
least-squares solve — a single jitted normal-equations build (vectorized
over all pairs and matches, scatter-add into the (4N, 4N) system) plus one
dense solve. No iterative LM loop, no per-edge host logic. Gauge freedom is
fixed with a strong prior pinning frame 0 to identity and a weak prior
pulling every frame toward its chain initialization (which also anchors any
frames weakly connected to the rest).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PIN_WEIGHT = 1e8     # frame-0 identity prior
_INIT_WEIGHT = 1e-4   # weak pull toward the chain init


def params_from_affine(t23: jnp.ndarray) -> jnp.ndarray:
    """(N, 2, 3) similarity transforms -> (N, 4) params (a, b, tx, ty)."""
    return jnp.stack([t23[:, 0, 0], t23[:, 1, 0], t23[:, 0, 2],
                      t23[:, 1, 2]], axis=-1)


def affine_from_params(p: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) params -> (N, 2, 3) transforms."""
    a, b, tx, ty = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    row0 = jnp.stack([a, -b, tx], axis=-1)
    row1 = jnp.stack([b, a, ty], axis=-1)
    return jnp.stack([row0, row1], axis=1)


def _jac_blocks(pts: jnp.ndarray):
    """Per-point Jacobian wrt (a, b, tx, ty): (..., 2 rows, 4 params)."""
    x = pts[..., 0]
    y = pts[..., 1]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    jx = jnp.stack([x, -y, one, zero], axis=-1)
    jy = jnp.stack([y, x, zero, one], axis=-1)
    return jnp.stack([jx, jy], axis=-2)  # (..., 2, 4)


def normal_equations(pair_idx: jnp.ndarray, pts_a: jnp.ndarray,
                     pts_b: jnp.ndarray, w: jnp.ndarray, n: int):
    """Assemble (4N, 4N) AtA and (4N,) Atb for a set of pairs.

    Separated from the solve so multi-chip execution can psum per-device
    partial systems over the mesh before one replicated solve
    (parallel/sortie_step.py).
    """
    ja = _jac_blocks(pts_a)          # (P, K, 2, 4)
    jb = -_jac_blocks(pts_b)         # (P, K, 2, 4)

    def blk(u, v):
        return jnp.einsum("pkra,pkrb,pk->pab", u, v, w,
                          preferred_element_type=jnp.float32)

    ata = jnp.zeros((n, 4, n, 4), jnp.float32)
    i_idx = pair_idx[:, 0]
    j_idx = pair_idx[:, 1]
    ata = ata.at[i_idx, :, i_idx, :].add(blk(ja, ja))
    ata = ata.at[i_idx, :, j_idx, :].add(blk(ja, jb))
    ata = ata.at[j_idx, :, i_idx, :].add(blk(jb, ja))
    ata = ata.at[j_idx, :, j_idx, :].add(blk(jb, jb))
    return ata.reshape(n * 4, n * 4), jnp.zeros((n * 4,), jnp.float32)


def solve_with_priors(ata: jnp.ndarray, atb: jnp.ndarray,
                      init_params: jnp.ndarray) -> jnp.ndarray:
    """Apply gauge priors and solve; returns (N, 2, 3) transforms."""
    n = init_params.shape[0]
    prior_w = jnp.full((n,), _INIT_WEIGHT).at[0].set(_PIN_WEIGHT)
    prior_diag = jnp.repeat(prior_w, 4)
    ata = ata + jnp.diag(prior_diag)
    atb = atb + prior_diag * init_params.reshape(-1)
    sol = jnp.linalg.solve(ata, atb).reshape(n, 4)
    return affine_from_params(sol)


def bundle_adjust_similarity(pair_idx: jnp.ndarray, pts_a: jnp.ndarray,
                             pts_b: jnp.ndarray, w: jnp.ndarray,
                             init_params: jnp.ndarray) -> jnp.ndarray:
    """Solve for per-frame similarity transforms.

    pair_idx: (P, 2) int32 frame indices (i, j) per pair
    pts_a:    (P, K, 2) matched points in frame i
    pts_b:    (P, K, 2) matched points in frame j
    w:        (P, K) float32 match weights (inlier mask)
    init_params: (N, 4) chain-initialized (a, b, tx, ty)

    Returns (N, 2, 3) refined frame->reference transforms. Fully jittable
    (static P, K, N).

    Numerics: coordinates are centered/scaled to O(1) before the system is
    assembled (x^2 terms at 4K-pixel coordinates hit 1.5e7: the raw normal
    equations have condition ~1e7, marginal in f32 — and fatal on the TPU,
    where default matmul precision rounds einsum INPUTS to bf16, i.e. +-8
    px at x=3840; round 2's first 200-frame sortie collapsed every strip
    to a ~0.24-scale point cloud this way). The solve runs under
    float32-precision matmuls; the result is conjugated back.
    """
    n = init_params.shape[0]
    with jax.default_matmul_precision("float32"):
        # shared Hartley-style frame: p_n = (p - c) / s
        wsum = jnp.maximum(jnp.sum(w), 1e-6)
        c = (jnp.sum(pts_a * w[..., None], axis=(0, 1))
             + jnp.sum(pts_b * w[..., None], axis=(0, 1))) / (2.0 * wsum)
        spread = (jnp.sum(jnp.abs(pts_a - c) * w[..., None])
                  + jnp.sum(jnp.abs(pts_b - c) * w[..., None])) / (
            4.0 * wsum)
        s = jnp.maximum(spread, 1e-3)

        pa_n = (pts_a - c) / s
        pb_n = (pts_b - c) / s
        # conjugate the init: T_n = D T D^-1 with D = [(1/s)I | -c/s]
        # for similarity params (a, b, tx, ty): a,b invariant;
        # t_n = (A c + t - c) / s with A = [[a,-b],[b,a]]
        a_, b_ = init_params[:, 0], init_params[:, 1]
        tx, ty = init_params[:, 2], init_params[:, 3]
        tnx = (a_ * c[0] - b_ * c[1] + tx - c[0]) / s
        tny = (b_ * c[0] + a_ * c[1] + ty - c[1]) / s
        init_n = jnp.stack([a_, b_, tnx, tny], axis=-1)

        # IRLS robust solve: a falsely-verified pair model (periodic
        # texture can lock RANSAC onto a coherent wrong offset with a
        # conf above the keep threshold) would otherwise drag every frame
        # it touches. Per-EDGE Cauchy weights from the RMS residual —
        # first evaluated at the chain init, then re-evaluated once at
        # the solution — cut such edges by ~(rms/tau)^-2 while leaving
        # consistent edges (rms ~ a few px) at full weight.
        tau = 12.0 / s  # ~3x the RANSAC inlier threshold, normalized

        def edge_weights(params_n):
            t23 = affine_from_params(params_n)          # (N, 2, 3)
            ti = t23[pair_idx[:, 0]]                    # (P, 2, 3)
            tj = t23[pair_idx[:, 1]]

            def appl(t, p):
                return (jnp.einsum("pab,pkb->pka", t[:, :, :2], p,
                                   precision=jax.lax.Precision.HIGHEST)
                        + t[:, None, :, 2])

            res = appl(ti, pa_n) - appl(tj, pb_n)       # (P, K, 2)
            r2 = jnp.sum(res * res, axis=-1)
            wsum_e = jnp.maximum(jnp.sum(w, axis=1), 1e-6)
            rms = jnp.sqrt(jnp.sum(r2 * w, axis=1) / wsum_e)
            return 1.0 / (1.0 + (rms / tau) ** 2)       # (P,)

        t_n = None
        params_cur = init_n
        for _ in range(2):
            we = edge_weights(params_cur)
            ata, atb = normal_equations(pair_idx, pa_n, pb_n,
                                        w * we[:, None], n)
            t_n = solve_with_priors(ata, atb, init_n)   # (N, 2, 3) norm.
            params_cur = params_from_affine(t_n)

        # denormalize: T = D^-1 T_n D
        an, bn = t_n[:, 0, 0], t_n[:, 1, 0]
        tnx2, tny2 = t_n[:, 0, 2], t_n[:, 1, 2]
        txf = -an * c[0] + bn * c[1] + s * tnx2 + c[0]
        tyf = -bn * c[0] - an * c[1] + s * tny2 + c[1]
        return affine_from_params(jnp.stack([an, bn, txf, tyf], axis=-1))


bundle_adjust_similarity_jit = jax.jit(bundle_adjust_similarity)
