"""Integration tests: pairwise slice, strip stitch, grouping, global.

Synthetic sorties rendered from one ortho image give exact expected
geometry (SURVEY.md §4 test strategy).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import blurred_rmse, render_sortie

from drone_image_stitch_cpp_tpu.config.tuning import StitchTuning
from drone_image_stitch_cpp_tpu.grouping.flight_grouper import (
    group_boustrophedon)
from drone_image_stitch_cpp_tpu.ops.crop import auto_crop_black_border
from drone_image_stitch_cpp_tpu.pipeline.pairwise import stitch_pair
from drone_image_stitch_cpp_tpu.pipeline.strip import stitch_strip
from drone_image_stitch_cpp_tpu.pipeline.global_ import (
    align_strips, stitch_inter_strips_custom)


def _small_tuning():
    return StitchTuning(
        sift_features=512, strip_sift_features=512, global_sift_features=768,
        registration_resol_mpx=-1.0, seam_estimation_resol_mpx=-1.0,
        blend_bands=3)


def test_pairwise_stitch_geometry(ortho):
    imgs, _, _ = render_sortie(ortho, 1, 2, frame_h=192, frame_w=256,
                               overlap=0.5)
    pano = stitch_pair(imgs[0], imgs[1], _small_tuning())
    # union of two frames overlapping 50%: 192 x (256 + 128)
    assert abs(pano.shape[0] - 192) <= 3
    assert abs(pano.shape[1] - 384) <= 3
    gt = ortho[40:40 + 192, 40:40 + 384].astype(np.uint8)
    hh = min(pano.shape[0], gt.shape[0])
    ww = min(pano.shape[1], gt.shape[1])
    assert blurred_rmse(pano[:hh, :ww], gt[:hh, :ww]) < 8.0


def test_strip_stitch_four_frames(ortho):
    imgs, _, pos = render_sortie(ortho, 1, 4, frame_h=160, frame_w=208,
                                 overlap=0.5)
    pano = stitch_strip(imgs, _small_tuning(), stage="T")
    pano = auto_crop_black_border(pano)
    exp_w = 208 + 3 * 104
    assert abs(pano.shape[0] - 160) <= 4
    assert abs(pano.shape[1] - exp_w) <= 6
    gt = ortho[40:200, 40:40 + exp_w].astype(np.uint8)
    hh = min(pano.shape[0], gt.shape[0])
    ww = min(pano.shape[1], gt.shape[1])
    assert blurred_rmse(pano[:hh, :ww], gt[:hh, :ww]) < 8.0


def test_strip_stitch_single_image(ortho):
    img = ortho[:128, :160].astype(np.uint8)
    pano = stitch_strip([img], _small_tuning())
    assert (pano == img).all()


def test_grouping_two_rows(ortho):
    # realistic sortie overlaps: ~70% forward, ~30% side
    imgs, ids, _ = render_sortie(ortho, 2, 4, frame_h=160, frame_w=208,
                                 overlap=0.7, overlap_y=0.3)
    groups = group_boustrophedon(imgs, ids, _small_tuning())
    sizes = [len(g.indices) for g in groups]
    assert sum(sizes) == 8
    assert len(groups) == 2, sizes
    assert groups[0].indices == [0, 1, 2, 3]
    assert groups[1].indices == [4, 5, 6, 7]


def test_grouping_removes_duplicates(ortho):
    imgs, ids, _ = render_sortie(ortho, 1, 4, frame_h=160, frame_w=208,
                                 overlap=0.5)
    # insert a near-duplicate of frame 1 (tiny shift)
    dup = ortho[41:201, 146:354].astype(np.uint8)
    imgs = imgs[:2] + [dup] + imgs[2:]
    ids = ids[:2] + ["DUP"] + ids[2:]
    groups = group_boustrophedon(imgs, ids, _small_tuning())
    all_ids = [i for g in groups for i in g.ids]
    assert "DUP" not in all_ids
    assert len(all_ids) == 4


def test_grouping_single_image(ortho):
    img = ortho[:128, :160].astype(np.uint8)
    groups = group_boustrophedon([img], ["A"], _small_tuning())
    assert len(groups) == 1 and groups[0].indices == [0]


def test_global_align_flip_hypothesis(ortho):
    """Second strip horizontally flipped (reversed flight line)."""
    strip_a = ortho[40:200, 40:500].astype(np.uint8)
    strip_b = ortho[120:280, 40:500].astype(np.uint8)[:, ::-1].copy()
    transforms, oriented, flipped = align_strips([strip_a, strip_b],
                                                 _small_tuning())
    assert flipped == [False, True]
    # oriented[1] is the un-flipped strip; its transform is a pure
    # (0, +80) translation into strip_a's frame
    assert np.array_equal(oriented[1], ortho[120:280, 40:500].astype(
        np.uint8))
    t = transforms[1]
    assert abs(t[0, 2]) < 2.0, t
    assert abs(t[1, 2] - 80.0) < 2.0, t
    assert abs(t[0, 0] - 1.0) < 0.01, t


def test_global_compose_two_strips(ortho):
    strip_a = ortho[40:200, 40:500].astype(np.uint8)
    strip_b = ortho[120:280, 40:500].astype(np.uint8)
    mosaic = stitch_inter_strips_custom([strip_a, strip_b], _small_tuning())
    mosaic = auto_crop_black_border(mosaic)
    assert abs(mosaic.shape[0] - 240) <= 4
    assert abs(mosaic.shape[1] - 460) <= 4
    gt = ortho[40:280, 40:500].astype(np.uint8)
    hh = min(mosaic.shape[0], gt.shape[0])
    ww = min(mosaic.shape[1], gt.shape[1])
    assert blurred_rmse(mosaic[:hh, :ww], gt[:hh, :ww]) < 8.0


def test_global_needs_two_strips(ortho):
    from drone_image_stitch_cpp_tpu.pipeline.global_ import (
        GlobalStitchError)
    with pytest.raises(GlobalStitchError):
        stitch_inter_strips_custom([ortho[:100, :100].astype(np.uint8)],
                                   _small_tuning())


def test_pairwise_homography_mode(ortho):
    """Perspective model path (cv::Stitcher PANORAMA-mode analog)."""
    imgs, _, _ = render_sortie(ortho, 1, 2, frame_h=192, frame_w=256,
                               overlap=0.5)
    pano = stitch_pair(imgs[0], imgs[1], _small_tuning(),
                       model_kind="homography")
    assert abs(pano.shape[0] - 192) <= 3
    assert abs(pano.shape[1] - 384) <= 4
    gt = ortho[40:40 + 192, 40:40 + 384].astype(np.uint8)
    hh = min(pano.shape[0], gt.shape[0])
    ww = min(pano.shape[1], gt.shape[1])
    assert blurred_rmse(pano[:hh, :ww], gt[:hh, :ww]) < 8.0


def test_pairwise_modality_presets(ortho):
    """NIR and LWIR presets drive the same pipeline with their own knobs."""
    from drone_image_stitch_cpp_tpu.config.tuning import load_stitch_tuning
    imgs, _, _ = render_sortie(ortho, 1, 2, frame_h=192, frame_w=256,
                               overlap=0.5)
    for modality in ("nir", "lwir"):
        t = load_stitch_tuning(modality).replace(
            sift_features=512, registration_resol_mpx=-1.0,
            seam_estimation_resol_mpx=-1.0)
        pano = stitch_pair(imgs[0], imgs[1], t)
        assert abs(pano.shape[0] - 192) <= 3, modality
        assert abs(pano.shape[1] - 384) <= 4, modality


def test_roi_candidates_reference_grid():
    """ROI rects match buildStripRoiCandidates exactly
    (stitch_global.cpp:226-259): full / left(0..0.68) / right(0.32..1) /
    center(0.16..0.84) with 0.05..0.95 y-trim, >=120 px both dims."""
    from drone_image_stitch_cpp_tpu.pipeline.roi_align import (
        build_hyp_bank, roi_candidates)
    rois = roi_candidates((600, 1000))
    assert rois == [(0.0, 1000.0, 0.0, 600.0),
                    (0.0, 680.0, 30.0, 570.0),
                    (320.0, 1000.0, 30.0, 570.0),
                    (160.0, 840.0, 30.0, 570.0)]
    # small strip: every sub-ROI is under 120 px wide -> full frame only
    assert roi_candidates((150, 150)) == [(0.0, 150.0, 0.0, 150.0)]
    bank, n_real = build_hyp_bank((600, 1000), (600, 1000))
    assert bank.shape == (16, 8) and n_real == 16
    # row 0 is the (full, full) pair
    assert bank[0].tolist() == [0, 1000, 0, 600, 0, 1000, 0, 600]
    # a tiny cur strip keeps only the full ROI -> 4 real rows, 12 padding
    bank2, n2 = build_hyp_bank((150, 150), (600, 1000))
    assert bank2.shape == (16, 8) and n2 == 4


def test_frame_store_detect_equivalence(ortho):
    """FrameStore-served detect == list-served detect, incl. subsets and
    a full strip stitch driven through the store (app.py wiring)."""
    import jax
    from drone_image_stitch_cpp_tpu.pipeline.registration import (
        detect_features)
    from drone_image_stitch_cpp_tpu.runtime.feed import FrameStore

    imgs, _, _ = render_sortie(ortho, 1, 5, frame_h=160, frame_w=224,
                               overlap=0.6)
    store = FrameStore(imgs)

    f_list, s_list = detect_features(imgs, 256, 0.4)
    f_store, s_store = detect_features(None, 256, 0.4, store=store,
                                       indices=list(range(len(imgs))))
    assert s_list == s_store
    for a, b in zip(jax.tree_util.tree_leaves(f_list),
                    jax.tree_util.tree_leaves(f_store)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sub = [1, 3, 4]
    f_sub, _ = detect_features([imgs[i] for i in sub], 256, 0.4)
    f_sub_store, _ = detect_features(None, 256, 0.4, store=store,
                                     indices=sub)
    for a, b in zip(jax.tree_util.tree_leaves(f_sub),
                    jax.tree_util.tree_leaves(f_sub_store)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    pano_plain = stitch_strip(imgs, _small_tuning())
    pano_store = stitch_strip(imgs, _small_tuning(), store=store,
                              indices=list(range(len(imgs))))
    np.testing.assert_array_equal(pano_plain, pano_store)


def test_strip_tiled_fused_compose_matches_untiled(ortho, monkeypatch):
    """Tiled compose (fused per-tile feeds + core-crop fetch) == the
    whole-canvas compose on the same strip."""
    from drone_image_stitch_cpp_tpu.ops import blend as B
    from drone_image_stitch_cpp_tpu.pipeline.strip import (
        compose_strip, estimate_strip_transforms)

    imgs, _, _ = render_sortie(ortho, 1, 4, frame_h=160, frame_w=224,
                               overlap=0.6)
    tuning = _small_tuning()
    kept, transforms, _ = estimate_strip_transforms(imgs, tuning)
    imgs = [imgs[i] for i in kept]
    plain = compose_strip(imgs, transforms, tuning)
    monkeypatch.setattr(B, "TILED_THRESHOLD_BYTES", 1)
    tiled = compose_strip(imgs, transforms, tuning)
    assert plain.shape == tiled.shape
    diff = np.abs(plain.astype(np.int16) - tiled.astype(np.int16))
    assert diff.max() <= 1, diff.max()
