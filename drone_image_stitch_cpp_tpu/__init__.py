"""TPU-native drone ortho-mosaicking framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of the C++/OpenCV pipeline
``Akika404/drone_image_stitch_cpp`` (see SURVEY.md): ingest -> visual
flight-line grouping -> per-strip stitching -> global mosaic composition,
with the compute path (feature detection, matching, RANSAC, bundle
adjustment, warping, seam finding, blending) running as batched, fixed-shape
JAX/Pallas programs on TPU.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry solves (RANSAC refinement, bundle adjustment, gain systems) are
# precision-critical: TPU default (bf16-class) matmuls bias transform
# estimates by ~0.3% scale, which is pixels of drift over a mosaic. Hot
# bandwidth-bound ops (descriptor distance matmuls) opt back down where
# measured safe.
_jax.config.update("jax_default_matmul_precision", "highest")

from .config.tuning import (  # noqa: F401
    CameraCalibration,
    MultiBandCalibration,
    StitchTuning,
    load_stitch_tuning,
)
