"""Config parity tests vs SURVEY.md §2.4 (reference stitch_config values)."""

from drone_image_stitch_cpp_tpu.config.tuning import (
    CameraCalibration, StitchTuning, load_stitch_tuning, normalize_image_type)


def test_defaults_match_reference():
    t = StitchTuning()
    assert t.sift_features == 1500
    assert t.strip_sift_features == 1500
    assert t.global_sift_features == 2500
    assert t.match_conf == 0.35
    assert t.min_good_matches == 10
    assert t.min_inliers == 8
    assert t.use_range_matcher and t.range_width == 6
    assert t.use_affine_bundle and t.use_affine_warper and t.use_blocks_gain
    assert t.blend_bands == 5
    assert t.pano_conf_thresh == 0.7
    assert not t.use_anchor_fallback and t.anchor_window == 4
    assert t.use_opencl and t.try_gpu
    assert t.registration_resol_mpx == 0.40
    assert t.seam_estimation_resol_mpx == 0.10
    assert t.compositing_resol_mpx == -1.0


def test_presets():
    vis = load_stitch_tuning("visible")
    assert (vis.sift_features, vis.strip_sift_features,
            vis.global_sift_features) == (2200, 2200, 3600)
    assert (vis.match_conf, vis.range_width, vis.blend_bands) == (0.35, 6, 5)
    assert (vis.registration_resol_mpx, vis.seam_estimation_resol_mpx) == (
        0.45, 0.12)

    nir = load_stitch_tuning("nir")
    assert (nir.sift_features, nir.global_sift_features) == (2800, 4200)
    assert (nir.match_conf, nir.range_width) == (0.40, 7)
    assert (nir.registration_resol_mpx, nir.seam_estimation_resol_mpx) == (
        0.55, 0.15)

    lwir = load_stitch_tuning("lwir")
    assert (lwir.sift_features, lwir.global_sift_features) == (900, 1400)
    assert (lwir.match_conf, lwir.range_width, lwir.blend_bands) == (
        0.48, 4, 3)
    assert (lwir.registration_resol_mpx, lwir.seam_estimation_resol_mpx) == (
        0.30, 0.08)


def test_alias_normalization():
    assert normalize_image_type("RGB") == "visible"
    assert normalize_image_type(" Near-Infrared ") == "nir"
    assert normalize_image_type("THERMAL") == "lwir"
    assert normalize_image_type("FLIR") == "lwir"
    assert normalize_image_type("unknown-modality") == "visible"
    # unknown falls back to visible preset
    assert load_stitch_tuning("???").sift_features == 2200


def test_calibration_readiness():
    c = CameraCalibration(name="visible")
    assert not c.is_ready()
    c2 = CameraCalibration(name="x", fx=1000.0, fy=1000.0, cx=320.0, cy=240.0,
                           dist=(0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    assert c2.is_ready()


def test_calibration_lookup():
    t = load_stitch_tuning("visible")
    assert t.calibration.find("vis").name == "visible"
    assert t.calibration.find("tir").name == "lwir"
