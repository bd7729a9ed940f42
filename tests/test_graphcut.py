"""Native graph-cut seam: min-cut optimality + pairwise seam behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from drone_image_stitch_cpp_tpu.ops import seam as S
from drone_image_stitch_cpp_tpu.utils import native


pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native library not built")


def _cut_value(lab, cs, ck, ch, cv):
    labf = lab.astype(bool)
    cut = float(np.where(~labf, cs, 0).sum())
    cut += float(np.where(labf, ck, 0).sum())
    cut += float((ch * (labf[:, :-1] != labf[:, 1:])).sum())
    cut += float((cv * (labf[:-1, :] != labf[1:, :])).sum())
    return cut


def test_mincut_matches_scipy():
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_flow

    rng = np.random.default_rng(3)
    for _ in range(6):
        h, w = int(rng.integers(3, 10)), int(rng.integers(3, 10))
        n = h * w
        cs = (rng.integers(0, 4, (h, w))
              * (rng.random((h, w)) < 0.3)).astype(np.float32)
        ck = (rng.integers(0, 4, (h, w))
              * (rng.random((h, w)) < 0.3)).astype(np.float32)
        ch = rng.integers(1, 5, (h, w - 1)).astype(np.float32)
        cv = rng.integers(1, 5, (h - 1, w)).astype(np.float32)
        lab = native.graphcut_native(cs, ck, ch, cv)
        rows, cols, data = [], [], []
        for i in range(n):
            y, x = divmod(i, w)
            if cs[y, x] > 0:
                rows.append(0), cols.append(i + 1), data.append(int(cs[y, x]))
            if ck[y, x] > 0:
                rows.append(i + 1), cols.append(n + 1), data.append(
                    int(ck[y, x]))
        for y in range(h):
            for x in range(w - 1):
                for (u, v) in ((y * w + x + 1, y * w + x + 2),
                               (y * w + x + 2, y * w + x + 1)):
                    rows.append(u), cols.append(v), data.append(
                        int(ch[y, x]))
        for y in range(h - 1):
            for x in range(w):
                for (u, v) in ((y * w + x + 1, (y + 1) * w + x + 1),
                               ((y + 1) * w + x + 1, y * w + x + 1)):
                    rows.append(u), cols.append(v), data.append(
                        int(cv[y, x]))
        g = csr_matrix((data, (rows, cols)), shape=(n + 2, n + 2))
        mf = maximum_flow(g, 0, n + 1).flow_value
        assert abs(_cut_value(lab, cs, ck, ch, cv) - mf) < 1e-3


def test_graphcut_pairwise_seam_prefers_agreement():
    r = np.random.default_rng(1)
    h, w = 64, 96
    base = r.uniform(0, 255, (h, w, 3)).astype(np.float32)
    img_a = base.copy()
    img_b = base.copy()
    img_b[:, :40] += 60
    img_b[:, 56:] -= 60
    ma = np.zeros((h, w), bool)
    mb = np.zeros((h, w), bool)
    ma[:, :88] = True   # A-exclusive left margin anchors the source
    mb[:, 8:] = True    # B-exclusive right margin anchors the sink
    got = S.graphcut_pairwise_seam(img_a, img_b, ma, mb)
    assert got is not None
    na, nb = got
    assert not (na & nb).any()
    assert ((na | nb) == (ma | mb)).all()
    # A keeps the left side; the cut runs inside the agreement corridor
    cols = na.sum(axis=1)
    mid = np.median(cols)
    assert 36 <= mid <= 60, mid


def test_graphcut_identical_masks_falls_back():
    img = np.zeros((16, 16, 3), np.float32)
    mask = np.ones((16, 16), bool)
    assert S.graphcut_pairwise_seam(img, img, mask, mask) is None


def test_graphcut_full_res_large_regions():
    """Above the coarse budget the cut still runs at FULL resolution
    (hierarchical banded refinement) and returns quickly."""
    import time
    r = np.random.default_rng(2)
    h, w = 400, 1400  # 560k px > coarse budget
    a = r.uniform(0, 255, (h, w, 3)).astype(np.float32)
    b = a + r.normal(0, 10, (h, w, 3)).astype(np.float32)
    ma = np.zeros((h, w), bool)
    mb = np.zeros((h, w), bool)
    ma[: 3 * h // 4] = True
    mb[h // 4:] = True
    t0 = time.perf_counter()
    got = S.graphcut_pairwise_seam(a, b, ma, mb)
    dt = time.perf_counter() - t0
    assert got is not None
    na, nb = got
    assert not (na & nb).any()
    assert ((na | nb) == (ma | mb)).all()
    assert dt < 60, dt


def _smooth_pair(h, w, seed):
    """Correlated (aerial-like) image pair with a radiometric offset."""
    import cv2
    r = np.random.default_rng(seed)
    a = cv2.blur(cv2.blur(
        r.uniform(0, 255, (h, w, 3)).astype(np.float32), (31, 31)), (31, 31))
    b = a + r.normal(0, 8, (h, w, 3)).astype(np.float32)
    b[:, : w // 3] += 25
    return a, b


def test_banded_refinement_matches_direct_cut():
    """The hierarchical banded solve must recover the SAME optimal cut
    value as a direct full-resolution solve (validating that lifting the
    node cap via pinning does not change the optimum)."""
    h, w = 320, 480  # small enough that the direct solve is instant
    a, b = _smooth_pair(h, w, 7)
    ma = np.zeros((h, w), bool)
    mb = np.zeros((h, w), bool)
    ma[:, : 3 * w // 4] = True
    mb[:, w // 4:] = True
    prob = S._gc_problem(a, b, ma, mb)
    assert prob is not None
    cs, ck, ch, cv_ = prob
    lab_direct = native.graphcut_native(cs, ck, ch, cv_).astype(bool)

    # banded path: coarse at 1/16 the nodes, pin outside a 24-px band
    import cv2
    nh, nw = h // 4, w // 4
    mac = cv2.resize(ma.astype(np.uint8), (nw, nh),
                     interpolation=cv2.INTER_NEAREST).astype(bool)
    mbc = cv2.resize(mb.astype(np.uint8), (nw, nh),
                     interpolation=cv2.INTER_NEAREST).astype(bool)
    ac = cv2.resize(a, (nw, nh), interpolation=cv2.INTER_AREA)
    bc = cv2.resize(b, (nw, nh), interpolation=cv2.INTER_AREA)
    lab_c = native.graphcut_native(*S._gc_problem(ac, bc, mac, mbc))
    lab_up = cv2.resize(lab_c, (w, h),
                        interpolation=cv2.INTER_NEAREST).astype(bool)
    in_band = S._seam_band(lab_up, 24)
    both = ma & mb
    cs2, ck2 = cs.copy(), ck.copy()
    cs2[both & ~in_band & lab_up] = 1e8
    ck2[both & ~in_band & ~lab_up] = 1e8
    lab_band = native.graphcut_native(cs2, ck2, ch, cv_).astype(bool)

    v_direct = _cut_value(lab_direct, cs, ck, ch, cv_)
    v_band = _cut_value(lab_band, cs, ck, ch, cv_)
    assert abs(v_band - v_direct) <= 1e-3 * max(1.0, v_direct), (
        v_band, v_direct)


def test_graphcut_beats_dp_seam_on_textured_overlap():
    """Seam quality: on a textured overlap with a misaligned object, the
    min-cut seam's cost along the cut must not exceed the DP seam's cost
    (the cut is globally optimal; DP is constrained to monotone paths)."""
    import jax.numpy as jnp
    h, w = 160, 240
    a, b = _smooth_pair(h, w, 11)
    # plant a bright misaligned blob in the overlap middle: a good seam
    # must route around it
    yy, xx = np.mgrid[:h, :w]
    blob_a = ((yy - 80) ** 2 + (xx - 120) ** 2) < 20 ** 2
    blob_b = ((yy - 80) ** 2 + (xx - 132) ** 2) < 20 ** 2
    a[blob_a] = 255.0
    b[blob_b] = 255.0
    ma = np.zeros((h, w), bool)
    mb = np.zeros((h, w), bool)
    ma[:, : 7 * w // 8] = True
    mb[:, w // 8:] = True

    got = S.graphcut_pairwise_seam(a, b, ma, mb)
    assert got is not None
    na_gc, _ = got
    na_dp, _ = S.pairwise_seam(jnp.asarray(a), jnp.asarray(b),
                               jnp.asarray(ma), jnp.asarray(mb),
                               axis="vertical")
    na_dp = np.asarray(na_dp)

    prob = S._gc_problem(a, b, ma, mb)
    assert prob is not None
    cs, ck, ch, cv_ = prob

    def seam_cost(lab):
        # pairwise discontinuity cost only (both labelings satisfy the
        # exclusive-region terminals by construction)
        labf = lab | (ma & ~mb)  # A-side labeling over the union
        return (float((ch * (labf[:, :-1] != labf[:, 1:])).sum())
                + float((cv_ * (labf[:-1, :] != labf[1:, :])).sum()))

    c_gc = seam_cost(na_gc)
    c_dp = seam_cost(na_dp)
    assert c_gc <= c_dp + 1e-3, (c_gc, c_dp)
