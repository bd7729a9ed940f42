"""Unit tests: seam DP, multiband blender, feather, exposure, crop."""

import numpy as np
import jax.numpy as jnp

from drone_image_stitch_cpp_tpu.ops import blend as B
from drone_image_stitch_cpp_tpu.ops import exposure as E
from drone_image_stitch_cpp_tpu.ops import seam as S
from drone_image_stitch_cpp_tpu.ops.crop import (auto_crop_black_border,
                                                 content_bbox)


def test_num_blend_bands_formula():
    # reference formula: max(max(5, cfg), ceil(log2(maxdim)) - 1) cap 12
    assert B.num_blend_bands(5, 1000, 1000) == max(5, 9)
    assert B.num_blend_bands(3, 512, 256) == max(5, 8)
    assert B.num_blend_bands(5, 100000, 100) == 12  # cap
    assert B.num_blend_bands(7, 64, 64) == 7


def test_aligned_roi_grid():
    tlx, tly, w, h = B.aligned_roi(100.3, 50.7, 700.2, 300.9, 4, 1024, 2048)
    g = 16
    assert tlx % g == 0 and tly % g == 0 and w % g == 0 and h % g == 0
    assert tlx <= 100 and tly <= 50
    assert tlx + w >= 701 and tly + h >= 301


def test_bucketed_window_invariants():
    """Fixed-size feed windows: aligned, in-bounds, cover the ROI, and the
    size set stays tiny (each distinct size is one XLA compile)."""
    cases = [
        (10.3, 5.2, 3900.9, 2161.7, 5, 2176, 4608),
        (3000.0, 0.0, 4600.0, 2162.0, 5, 2176, 4608),
        (0.0, 0.0, 120.0, 90.0, 3, 256, 384),
        (4500.0, 2000.0, 4607.0, 2175.0, 5, 2176, 4608),
        (-5.0, -3.0, 5200.0, 2300.0, 6, 2176, 5120),  # oversize bbox
        (257.0, 1.0, 513.0, 400.0, 5, 2176, 4608),
    ]
    sizes = set()
    for c in cases:
        x0, y0, x1, y1, bands, ch, cw = c
        tlx, tly, rh, rw = B.bucketed_window(x0, y0, x1, y1, bands, ch, cw)
        g = 1 << bands
        caw, cah = B.align_up(cw, g), B.align_up(ch, g)
        assert tlx % g == 0 and tly % g == 0, c
        assert rh % g == 0 and rw % g == 0, c
        assert 0 <= tlx and tlx + rw <= caw, c
        assert 0 <= tly and tly + rh <= cah, c
        ax, ay, aw, ah = B.aligned_roi(x0, y0, x1, y1, bands, ch, cw)
        assert tlx <= ax and tly <= ay, c
        assert tlx + rw >= ax + aw and tly + rh >= ay + ah, c
        sizes.add((rh, rw))
    # the two interior strip-window cases must share one size bucket
    w1 = B.bucketed_window(10.0, 0.0, 3900.0, 2162.0, 5, 2176, 4608)
    w2 = B.bucketed_window(300.0, 0.0, 4100.0, 2162.0, 5, 2176, 4608)
    assert w1[2:] == w2[2:], (w1, w2)


def test_multiband_blend_identity():
    """Blending one image reproduces it (away from ROI borders)."""
    r = np.random.default_rng(0)
    img = r.uniform(0, 255, (128, 192, 3)).astype(np.float32)
    bands = 4
    canvas = B.mb_prepare(128, 192, bands)
    w = jnp.ones((128, 192), jnp.float32)
    canvas = B.mb_feed(canvas, jnp.asarray(img), w, 0, 0)
    out, valid = B.mb_blend(canvas, 128, 192)
    assert np.asarray(valid).all()
    assert np.abs(np.asarray(out) - img).max() < 0.5


def test_multiband_blend_two_halves_smooth():
    """Blending two constant images along a seam has no visible banding."""
    h, w = 64, 128
    a = jnp.full((h, w, 3), 100.0)
    b = jnp.full((h, w, 3), 160.0)
    wa = jnp.asarray((np.arange(w) < w // 2).astype(np.float32))
    wa = jnp.broadcast_to(wa, (h, w))
    wb = 1.0 - wa
    canvas = B.mb_prepare(h, w, 3)
    canvas = B.mb_feed(canvas, a, wa, 0, 0)
    canvas = B.mb_feed(canvas, b, wb, 0, 0)
    out, _ = B.mb_blend(canvas, h, w)
    out = np.asarray(out)
    # ends keep their levels; transition is monotone and smooth
    assert abs(out[32, 4, 0] - 100) < 3
    assert abs(out[32, -4, 0] - 160) < 3
    grad = np.diff(out[32, :, 0])
    assert grad.max() < 25  # no hard step
    assert (grad >= -1.5).all()  # monotone-ish


def test_feather_blend_weights():
    wmap = np.asarray(B.border_feather_weight(100, 200))
    assert wmap[0, 100] < 0.1  # border
    assert wmap[50, 100] == 1.0  # interior saturates
    out, valid = B.feather_blend(
        [jnp.full((10, 10, 3), 50.0), jnp.full((10, 10, 3), 150.0)],
        [jnp.full((10, 10), 1.0), jnp.full((10, 10), 1.0)])
    assert np.allclose(np.asarray(out), 100.0)


def test_seam_prefers_identical_region():
    """Seam must run through the zero-cost band where images agree."""
    r = np.random.default_rng(1)
    h, w = 64, 96
    base = r.uniform(0, 255, (h, w, 3)).astype(np.float32)
    img_a = base.copy()
    img_b = base.copy()
    # images differ except in columns 40..56 (the agreement corridor)
    img_b[:, :40] += 60
    img_b[:, 56:] -= 60
    mask = jnp.ones((h, w), bool)
    na, nb = S.pairwise_seam(jnp.asarray(img_a), jnp.asarray(img_b),
                             mask, mask, axis="vertical")
    na = np.asarray(na)
    nb = np.asarray(nb)
    # disjoint and covering
    assert not (na & nb).any()
    assert (na | nb).all()
    # seam column within the agreement corridor for every row
    seam_cols = na.sum(axis=1)
    assert (seam_cols >= 39).all() and (seam_cols <= 57).all()


def test_seam_no_overlap_passthrough():
    h, w = 32, 64
    img = jnp.zeros((h, w, 3))
    ma = np.zeros((h, w), bool)
    mb = np.zeros((h, w), bool)
    ma[:, :30] = True
    mb[:, 34:] = True
    na, nb = S.pairwise_seam(img, img, jnp.asarray(ma), jnp.asarray(mb))
    assert (np.asarray(na) == ma).all()
    assert (np.asarray(nb) == mb).all()


def test_gain_solve_recovers_exposure():
    """Two overlapping constant images with a gain offset."""
    h, w = 48, 96
    base = 120.0
    inten = np.zeros((2, h, w), np.float32)
    masks = np.zeros((2, h, w), bool)
    inten[0, :, :64] = base
    masks[0, :, :64] = True
    inten[1, :, 32:] = base * 0.8  # darker
    masks[1, :, 32:] = True
    gains = np.asarray(E.gain_compensate_scalar(
        jnp.asarray(inten), jnp.asarray(masks), similarity_thresh=0.0))
    # OpenCV's beta prior makes equalization intentionally partial: with
    # I=120/96 the closed-form optimum closes ~82% of the 20% gap.
    ratio = (gains[1] * base * 0.8) / (gains[0] * base)
    assert gains[1] > 1.0 > gains[0]
    assert abs(ratio - 0.961) < 0.01, (gains, ratio)


def test_autocrop():
    img = np.zeros((100, 120, 3), np.uint8)
    img[20:80, 30:100] = 200
    out = auto_crop_black_border(img)
    assert out.shape == (60, 70, 3)
    y0, y1, x0, x1 = (int(v) for v in content_bbox(jnp.asarray(
        img.astype(np.float32))))
    assert (y0, y1, x0, x1) == (20, 80, 30, 100)


def test_autocrop_all_black():
    img = np.zeros((50, 60, 3), np.uint8)
    out = auto_crop_black_border(img)
    assert out.shape == (50, 60, 3)


def test_autocrop_near_black_border_uses_gray():
    """The crop test is gray > thresh (stitch_common.cpp:9), not
    any-channel: a (2,0,0) border pixel (gray 0.23) must be cropped."""
    img = np.zeros((100, 120, 3), np.uint8)
    img[20:80, 30:100] = 200
    img[:, :2, 0] = 2        # blue-only noise band on the left border
    out = auto_crop_black_border(img)
    assert out.shape == (60, 70, 3)


def test_tiled_bands_memory_plan():
    """Tiled composes shrink bands until the per-tile ext-window pyramid
    fits the HBM budget: the 200-frame sortie's 383 MP global canvas at
    bands=8 means an 8192^2 ext window (~1.4 GB pyramid + ~4x feed
    transients) — the configuration that OOMed a 16 GB chip."""
    # flagship global canvas: must downgrade below 8
    b = B.tiled_bands(14877, 25776, 8)
    assert b < 8
    g, halo = 1 << b, 8 << b
    ext = min(B.align_up(B.TILE, g) + 2 * halo, B.align_up(25776, g))
    assert B.pyramid_bytes(ext, ext, b) <= B.TILE_PYR_BUDGET_BYTES
    # strip canvases (short and wide) keep their configured bands
    assert B.tiled_bands(2176, 25692, 5) == 5
    # small canvases: clamped by MAX_TILED_BANDS only
    assert B.tiled_bands(512, 512, 11) == B.MAX_TILED_BANDS


def test_tile_grid_ext_shape_stable_across_strip_heights():
    """Strip canvas heights are data-dependent (registration drift): the
    ext-window SHAPE must not change with them, or every strip recompiles
    the whole feed/blend program set (~3 min each on the remote relay —
    6 of 10 flagship strips paid it). Windows must still cover core+halo
    within the canvas."""
    shapes = set()
    for ch in (2162, 2176, 2201, 2248, 2304):
        tiles, halo = B.mb_tile_grid(ch, 25692, 5)
        for (cy0, cy1, cx0, cx1, ey0, ey1, ex0, ex1) in tiles:
            shapes.add((ey1 - ey0, ex1 - ex0))
            assert ey0 >= 0 and ex0 >= 0
            # ext covers the core plus the in-canvas part of the halo
            assert ey0 <= max(0, cy0 - halo) and ex0 <= max(0, cx0 - halo)
            assert ey1 >= min(ch, cy1 + halo) or ey1 >= ch
            assert ex1 >= min(25692, cx1 + halo) or ex1 >= 25692
    assert len(shapes) == 1, shapes


def test_tiled_compose_retires_frames_after_last_tile():
    """on_frame_retired fires exactly once per frame, only after every
    tile intersecting that frame has been fed (so callers may drop the
    frame's device residence), and does not perturb the mosaic."""
    import jax

    bands = 2
    ch, cw = 128, 512
    frames = [np.full((96, 160, 3), 60.0 + 40.0 * i, np.float32)
              for i in range(3)]
    offs = [(0.0, 8.0), (144.0, 8.0), (288.0, 8.0)]
    boxes = [(ox, oy, ox + f.shape[1], oy + f.shape[0])
             for (ox, oy), f in zip(offs, frames)]
    feed = jax.jit(B.mb_feed, donate_argnums=0)
    retired: list[int] = []

    def feed_roi(cv, i, oy, ox, eh, ew):
        assert i not in retired, f"frame {i} fed after retirement"
        fx0, fy0, fx1, fy1 = boxes[i]
        tlx, tly, rw_, rh_ = B.aligned_roi(fx0 - ox, fy0 - oy,
                                           fx1 - ox, fy1 - oy, bands,
                                           eh, ew)
        # paste the (possibly clipped) frame into the ROI patch
        ry, rx = oy + tly, ox + tlx
        y0c, y1c = max(int(fy0), ry), min(int(fy1), ry + rh_)
        x0c, x1c = max(int(fx0), rx), min(int(fx1), rx + rw_)
        img = jnp.zeros((rh_, rw_, 3), jnp.float32)
        img = img.at[y0c - ry:y1c - ry, x0c - rx:x1c - rx].set(
            jnp.asarray(frames[i][y0c - int(fy0):y1c - int(fy0),
                                  x0c - int(fx0):x1c - int(fx0)]))
        m = (img.sum(-1) > 0).astype(jnp.float32)
        return feed(cv, img, m, tlx, tly, m > 0)

    out_plain = B.mb_compose_tiled(ch, cw, bands, boxes, feed_roi,
                                   tile=128)
    out = B.mb_compose_tiled(ch, cw, bands, boxes, feed_roi,
                             tile=128, on_frame_retired=retired.append)
    assert sorted(retired) == [0, 1, 2]
    assert np.array_equal(out, out_plain)
    # every frame produced content
    for i, (ox, oy) in enumerate(offs):
        assert out[int(oy) + 48, int(ox) + 80].sum() > 0, i


def test_feed_many_matches_sequential_feeds():
    """One fused _feed_many_prog dispatch == the same feeds one by one."""
    import jax
    import numpy as np
    from drone_image_stitch_cpp_tpu.ops import blend as B
    from drone_image_stitch_cpp_tpu.pipeline import compose_feed as CF

    rng = np.random.default_rng(5)
    rh = rw = 64
    bands = 2
    imgs = [jnp.asarray(rng.uniform(0, 255, (48, 56, 3))
                        .astype(np.float32)) for _ in range(3)]
    seams = [jnp.asarray(rng.uniform(0, 1, (16, 16)).astype(np.float32))
             for _ in range(3)]
    entries = []
    seam_scale = 0.25
    for k in range(3):
        t = np.asarray([[1.0, 0.0, 2.0 * k], [0.0, 1.0, 1.0 * k]],
                       np.float32)
        entries.append(dict(img=imgs[k], seam_mask=seams[k], t_full=t,
                            tlx=0, tly=0, gx=0.0, gy=0.0, rh=rh, rw=rw,
                            chan_gain=np.asarray([1.0, 1.1, 0.9],
                                                 np.float32)))
    cv_seq = B.mb_prepare(rh, rw, bands)
    for e in entries:
        cv_seq = CF.feed_frame(cv_seq, e["img"], e["seam_mask"],
                               e["t_full"], e["tlx"], e["tly"], e["gx"],
                               e["gy"], seam_scale, rh, rw, "global",
                               chan_gain=e["chan_gain"])
    cv_many = B.mb_prepare(rh, rw, bands)
    cv_many = CF.feed_frames_grouped(cv_many, entries, seam_scale,
                                     "global")
    for a, b in zip(jax.tree_util.tree_leaves(cv_seq),
                    jax.tree_util.tree_leaves(cv_many)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-5)
