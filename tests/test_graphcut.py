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


def test_graphcut_downscales_large_regions():
    """A big overlap must still return quickly (node budget)."""
    import time
    r = np.random.default_rng(2)
    h, w = 400, 1400  # 560k px > budget
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
