"""Stitch tuning configuration: knob surface, modality presets, calibration.

API-parity target: the reference's ``StitchTuning`` struct and preset loader
(reference: src/stitch_config.hpp:50-100 defaults; src/stitch_config.cpp:17-60
preset values; src/stitch_config.cpp:84-103 alias-normalized preset selection;
src/stitch_config.hpp:9-48 calibration placeholder structs).

This is a pure-data layer: no JAX, no device code. The TPU pipeline consumes
these knobs to size its static-shape compilation buckets (feature budgets,
band counts, working resolutions).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple


@dataclasses.dataclass
class CameraCalibration:
    """Optional intrinsics + 8-coefficient rational distortion model.

    Mirrors the reference's placeholder struct (src/stitch_config.hpp:9-34):
    every field is optional; undistortion only runs when both the intrinsic
    matrix and the distortion vector are fully specified.
    """

    name: str = ""
    fx: Optional[float] = None
    fy: Optional[float] = None
    cx: Optional[float] = None
    cy: Optional[float] = None
    # k1 k2 p1 p2 k3 k4 k5 k6 (OpenCV rational model ordering)
    dist: Optional[Tuple[float, ...]] = None

    def has_intrinsics(self) -> bool:
        return None not in (self.fx, self.fy, self.cx, self.cy)

    def has_distortion(self) -> bool:
        return self.dist is not None and len(self.dist) == 8

    def is_ready(self) -> bool:
        """Readiness predicate (reference: stitch_config.hpp:27-33)."""
        return self.has_intrinsics() and self.has_distortion()


@dataclasses.dataclass
class MultiBandCalibration:
    """Per-modality camera set (reference: stitch_config.hpp:37-48)."""

    visible: CameraCalibration = dataclasses.field(
        default_factory=lambda: CameraCalibration(name="visible"))
    nir: CameraCalibration = dataclasses.field(
        default_factory=lambda: CameraCalibration(name="nir"))
    lwir: CameraCalibration = dataclasses.field(
        default_factory=lambda: CameraCalibration(name="lwir"))

    def find(self, name: str) -> Optional[CameraCalibration]:
        key = normalize_image_type(name)
        return {"visible": self.visible, "nir": self.nir,
                "lwir": self.lwir}.get(key)


@dataclasses.dataclass
class StitchTuning:
    """Full knob surface with reference defaults (stitch_config.hpp:50-100).

    Knob semantics map 1:1 onto the reference; consumption sites are listed
    in SURVEY.md §2.4. TPU-specific additions live at the bottom and default
    to values that reproduce reference behavior.
    """

    # --- feature budgets -------------------------------------------------
    sift_features: int = 1500
    strip_sift_features: int = 1500
    global_sift_features: int = 2500

    # --- matching gates --------------------------------------------------
    match_conf: float = 0.35
    min_good_matches: int = 10
    min_inliers: int = 8

    # --- pair schedule ---------------------------------------------------
    use_range_matcher: bool = True
    range_width: int = 6

    # --- model / warp selection ------------------------------------------
    use_affine_bundle: bool = True
    use_affine_warper: bool = True
    use_blocks_gain: bool = True

    # --- compose ----------------------------------------------------------
    blend_bands: int = 5
    pano_conf_thresh: float = 0.7

    # --- fallbacks ---------------------------------------------------------
    use_anchor_fallback: bool = False
    anchor_window: int = 4

    # --- device toggles (reference: OpenCL; here: TPU vs host fallback) ----
    use_opencl: bool = True
    try_gpu: bool = True

    # --- working resolutions (megapixels; <0 => full resolution) -----------
    registration_resol_mpx: float = 0.40
    seam_estimation_resol_mpx: float = 0.10
    compositing_resol_mpx: float = -1.0

    # --- calibration --------------------------------------------------------
    calibration: MultiBandCalibration = dataclasses.field(
        default_factory=MultiBandCalibration)

    def replace(self, **kw) -> "StitchTuning":
        return dataclasses.replace(self, **kw)


def normalize_image_type(image_type: str) -> str:
    """Lowercase + strip non-alphanumerics, then alias-match.

    Reference: normalizeImageType (stitch_config.cpp:6-15) + alias lists
    (stitch_config.cpp:89-96). Unknown types fall back to "visible"
    (stitch_config.cpp:97-99).
    """
    norm = "".join(c for c in image_type.lower() if c.isalnum())
    visible_aliases = {"visible", "vis", "rgb", "color", "colour", "eo"}
    nir_aliases = {"nir", "nearinfrared", "nearir", "ir"}
    lwir_aliases = {"lwir", "thermal", "longwaveinfrared", "tir", "flir"}
    if norm in visible_aliases:
        return "visible"
    if norm in nir_aliases:
        return "nir"
    if norm in lwir_aliases:
        return "lwir"
    return "visible"


def _apply_visible_preset(t: StitchTuning) -> StitchTuning:
    """Reference: applyVisiblePreset (stitch_config.cpp:17-30)."""
    return t.replace(
        sift_features=2200, strip_sift_features=2200, global_sift_features=3600,
        match_conf=0.35, range_width=6, blend_bands=5,
        registration_resol_mpx=0.45, seam_estimation_resol_mpx=0.12,
        compositing_resol_mpx=-1.0,
        use_range_matcher=True, use_affine_bundle=True, use_affine_warper=True,
    )


def _apply_nir_preset(t: StitchTuning) -> StitchTuning:
    """Reference: applyNirPreset (stitch_config.cpp:32-45)."""
    return t.replace(
        sift_features=2800, strip_sift_features=2800, global_sift_features=4200,
        match_conf=0.40, range_width=7, blend_bands=5,
        registration_resol_mpx=0.55, seam_estimation_resol_mpx=0.15,
        compositing_resol_mpx=-1.0,
        use_range_matcher=True, use_affine_bundle=True, use_affine_warper=True,
    )


def _apply_lwir_preset(t: StitchTuning) -> StitchTuning:
    """Reference: applyLwirPreset (stitch_config.cpp:47-60)."""
    return t.replace(
        sift_features=900, strip_sift_features=900, global_sift_features=1400,
        match_conf=0.48, range_width=4, blend_bands=3,
        registration_resol_mpx=0.30, seam_estimation_resol_mpx=0.08,
        compositing_resol_mpx=-1.0,
        use_range_matcher=True, use_affine_bundle=True, use_affine_warper=True,
    )


_PRESETS = {
    "visible": _apply_visible_preset,
    "nir": _apply_nir_preset,
    "lwir": _apply_lwir_preset,
}


def load_stitch_tuning(image_type: str) -> StitchTuning:
    """Preset loader (reference: loadStitchTuning, stitch_config.cpp:84-103).

    Initializes calibration placeholders, normalizes the modality alias, and
    applies the matching preset (unknown aliases resolve to "visible").
    """
    tuning = StitchTuning()
    key = normalize_image_type(image_type)
    return _PRESETS[key](tuning)


def tuning_as_dict(t: StitchTuning) -> Dict[str, object]:
    d = dataclasses.asdict(t)
    d.pop("calibration", None)
    return d
