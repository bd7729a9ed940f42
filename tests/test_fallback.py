"""Robustness-ladder fidelity: sequential fallback, 2-image gates, knobs.

Reference behaviors under test:
  - stitchRobustly ALWAYS falls back to sequential stitching when the joint
    stitch fails and no matching mask was given (stitch_robust.cpp:366-375);
    use_anchor_fallback only gates the anchor batch inside it (:297).
  - 2-image jobs are gated on min_good_matches / min_inliers with a
    diagnostics dump (stitch_robust.cpp:233-243, logPairDiagnostics
    :144-172).
  - compositing_resol_mpx composes at reduced resolution
    (stitch_robust.cpp:185); use_affine_warper selects the warper family
    (:203-205).
"""

import numpy as np
import pytest

from conftest import blurred_rmse, render_sortie

from drone_image_stitch_cpp_tpu.config.tuning import StitchTuning
from drone_image_stitch_cpp_tpu.ops.blend import num_blend_bands
from drone_image_stitch_cpp_tpu.ops.crop import auto_crop_black_border
import drone_image_stitch_cpp_tpu.pipeline.strip as strip_mod
from drone_image_stitch_cpp_tpu.pipeline.strip import (StripStitchError,
                                                       stitch_strip)


def _small_tuning(**kw):
    base = dict(sift_features=512, strip_sift_features=512,
                global_sift_features=768, registration_resol_mpx=-1.0,
                seam_estimation_resol_mpx=-1.0, blend_bands=3)
    base.update(kw)
    return StitchTuning(**base)


def _fail_joint(monkeypatch):
    """Force the joint (>2 images) registration to fail; pairs still work."""
    real = strip_mod.estimate_strip_transforms

    def wrapper(images, *a, **kw):
        if len(images) > 2:
            raise StripStitchError("forced joint failure (test)")
        return real(images, *a, **kw)

    monkeypatch.setattr(strip_mod, "estimate_strip_transforms", wrapper)


def test_sequential_fallback_is_unconditional(ortho, monkeypatch):
    """Default tuning has use_anchor_fallback=False; the sequential path
    must still run when the joint stitch fails (stitch_robust.cpp:366)."""
    imgs, _, _ = render_sortie(ortho, 1, 3, frame_h=160, frame_w=208,
                               overlap=0.5)
    tuning = _small_tuning()
    assert not tuning.use_anchor_fallback
    _fail_joint(monkeypatch)
    pano = stitch_strip(imgs, tuning, stage="T")
    pano = auto_crop_black_border(pano)
    exp_w = 208 + 2 * 104
    assert abs(pano.shape[0] - 160) <= 6
    assert abs(pano.shape[1] - exp_w) <= 8
    gt = ortho[40:200, 40:40 + exp_w].astype(np.uint8)
    hh = min(pano.shape[0], gt.shape[0])
    ww = min(pano.shape[1], gt.shape[1])
    assert blurred_rmse(pano[:hh, :ww], gt[:hh, :ww]) < 9.0


def test_no_fallback_with_matching_mask(ortho, monkeypatch):
    """A supplied matching mask disables the fallback
    (stitch_robust.cpp:360-364)."""
    imgs, _, _ = render_sortie(ortho, 1, 3, frame_h=160, frame_w=208,
                               overlap=0.5)
    _fail_joint(monkeypatch)
    mask = np.ones((3, 3), bool)
    with pytest.raises(StripStitchError):
        stitch_strip(imgs, _small_tuning(), stage="T", matching_mask=mask)


def test_two_image_gates_in_strip_path(ortho):
    """Non-overlapping 2-image job must fail the min_good_matches /
    min_inliers gates inside the strip path (stitch_robust.cpp:233-243)."""
    a = ortho[0:160, 0:208].astype(np.uint8)
    b = ortho[400:560, 600:808].astype(np.uint8)
    # the joint attempt fails the gates, then the (unconditional)
    # sequential fallback re-tries the same pair and fails them too — the
    # surfaced error is the sequential one (stitch_robust.cpp:373-375)
    with pytest.raises(StripStitchError, match="sequential stitch failed"):
        stitch_strip([a, b], _small_tuning(), stage="T")


def test_anchor_fallback_schedule(ortho, monkeypatch):
    """Anchor-batch fidelity (stitch_robust.cpp:285,297-312): anchors seed
    with the FIRST image, and the batch registers with local range width
    max(2, min(len(batch), range_width)) — NOT the full batch length."""
    imgs, _, _ = render_sortie(ortho, 1, 4, frame_h=160, frame_w=208,
                               overlap=0.5)
    calls = []
    state = {"joint_failed": False}
    real = strip_mod.estimate_strip_transforms

    def wrapper(images, tuning, range_width=None, *a, **kw):
        if not state["joint_failed"]:
            # first call = the joint all-image attempt: fail it so the
            # sequential path runs
            state["joint_failed"] = True
            raise StripStitchError("forced joint failure (test)")
        calls.append((len(images), range_width))
        return real(images, tuning, range_width, *a, **kw)

    monkeypatch.setattr(strip_mod, "estimate_strip_transforms", wrapper)
    tuning = _small_tuning(use_anchor_fallback=True, anchor_window=2,
                           range_width=2)
    stitch_strip(imgs, tuning, stage="T", range_width_override=2)
    # step 1: anchors=[img0] -> batch [current, img0, img1] of 3, local
    # range width max(2, min(3, 2)) = 2; later steps grow to the window cap
    batch_calls = [c for c in calls if c[0] > 2]
    assert batch_calls, calls
    for n_imgs, rw in batch_calls:
        assert rw == max(2, min(n_imgs, 2)), (n_imgs, rw, calls)
    assert batch_calls[0][0] == 3, calls  # first-image anchor seeding


def test_sequential_failure_dumps_pair_diagnostics(ortho):
    """After the sequential ladder fails a step, pair diagnostics for
    [current, next] are dumped with kp counts for BOTH sides
    (stitch_robust.cpp:319-325)."""
    from drone_image_stitch_cpp_tpu.runtime.logging import get_logger

    a = ortho[0:160, 0:208].astype(np.uint8)
    b = ortho[400:560, 600:808].astype(np.uint8)
    log = get_logger()
    n0 = len(log._records)
    with pytest.raises(StripStitchError, match="sequential stitch failed"):
        stitch_strip([a, b], _small_tuning(), stage="T")
    recs = [r for r in log._records[n0:]
            if r["msg"] == "failure diagnostics"
            and r["stage"].startswith("T/seq")]
    assert recs, "no sequential-stage diagnostics dump"
    rec = recs[-1]
    for fieldname in ("kp_left", "kp_right", "good_matches", "model",
                      "left", "right"):
        assert fieldname in rec, rec


def test_compositing_resol_scales_output(ortho):
    """compositing_resol_mpx > 0 composes at the reduced resolution
    (setCompositingResol analog, stitch_robust.cpp:185)."""
    imgs, _, _ = render_sortie(ortho, 1, 3, frame_h=160, frame_w=208,
                               overlap=0.5)
    full = auto_crop_black_border(
        stitch_strip(imgs, _small_tuning(), stage="T"))
    # 160x208 frames ~= 0.033 MP; ask for ~1/4 the pixels -> scale ~0.5
    mpx = 160 * 208 / 4 / 1e6
    small = auto_crop_black_border(
        stitch_strip(imgs, _small_tuning(compositing_resol_mpx=mpx),
                     stage="T"))
    ratio_h = small.shape[0] / full.shape[0]
    ratio_w = small.shape[1] / full.shape[1]
    assert 0.4 < ratio_h < 0.6, (small.shape, full.shape)
    assert 0.4 < ratio_w < 0.6, (small.shape, full.shape)
    # content parity: upsample the small mosaic and compare
    import cv2
    up = cv2.resize(small, (full.shape[1], full.shape[0]),
                    interpolation=cv2.INTER_LINEAR)
    assert blurred_rmse(up, full) < 12.0


def test_perspective_warper_knob(ortho):
    """use_affine_warper=False routes compose through the perspective
    warper family (stitch_robust.cpp:203-205); geometry is unchanged for
    affine transforms, so the mosaics must agree."""
    imgs, _, _ = render_sortie(ortho, 1, 3, frame_h=160, frame_w=208,
                               overlap=0.5)
    affine = stitch_strip(imgs, _small_tuning(), stage="T", seed=0)
    persp = stitch_strip(imgs, _small_tuning(use_affine_warper=False),
                         stage="T", seed=0)
    assert affine.shape == persp.shape
    assert blurred_rmse(affine, persp) < 2.0


def test_blend_bands_cap_only_auto_term():
    """Configured blend_bands > 12 is honored; only the canvas-derived
    auto term is capped (stitch_global.cpp:632-635)."""
    assert num_blend_bands(14, 1000, 1000) == 14
    assert num_blend_bands(5, 1 << 20, 1 << 20) == 12
    assert num_blend_bands(3, 1000, 1000) == max(5, 9)


def test_tiled_compose_matches_single_canvas(ortho, monkeypatch):
    """HBM-bounded tiled compose is exact: forcing the tiled path (tiny
    threshold + tile size) must reproduce the single-canvas mosaic (the
    pyramid filters have compact support; the halo covers it)."""
    from drone_image_stitch_cpp_tpu.ops import blend as B

    imgs, _, _ = render_sortie(ortho, 1, 4, frame_h=160, frame_w=208,
                               overlap=0.5)
    tuning = _small_tuning()
    single = stitch_strip(imgs, tuning, stage="T", seed=0)
    monkeypatch.setattr(B, "TILED_THRESHOLD_BYTES", 1)
    monkeypatch.setattr(B, "TILE", 256)
    tiled = stitch_strip(imgs, tuning, stage="T", seed=0)
    assert tiled.shape == single.shape
    diff = np.abs(tiled.astype(np.float32) - single.astype(np.float32))
    assert diff.max() <= 2.0, diff.max()  # uint8 rounding only
