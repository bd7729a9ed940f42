"""YUV420 wire format: native raw decode, device conversion, FrameStore
auto mode, and detect parity vs the BGR path.

The FrameStore ships 4:2:0 JPEG sources in their native planar form
(1.5 B/px instead of 3 — host->device transfer is the ingest bottleneck
on the remote relay); these tests pin the format end to end.
"""

import os

import numpy as np
import pytest

from drone_image_stitch_cpp_tpu.utils import native


cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not native.native_available(),
    reason="native library not built")


def _write_jpegs(tmp_path, n=3, h=160, w=208, seed=0):
    r = np.random.default_rng(seed)
    paths = []
    base = cv2.blur(r.uniform(0, 255, (h + 40, w + 40 * n, 3))
                    .astype(np.float32), (5, 5)).astype(np.uint8)
    for k in range(n):
        img = base[20:20 + h, 40 * k:40 * k + w]
        p = str(tmp_path / f"IMG{k:03d}_x.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_native_yuv_decode_matches_cv2(tmp_path):
    paths = _write_jpegs(tmp_path, n=1)
    packed = native.decode_image_yuv420_native(paths[0])
    if packed is None:
        pytest.skip("source JPEG not 4:2:0 on this cv2 build")
    bgr = cv2.imread(paths[0])
    h, w = bgr.shape[:2]
    assert packed.shape == (h * 3 // 2, w)
    # device conversion vs libjpeg's full decode: identical Y, chroma
    # differs only by upsample phase — a few intensity levels
    from drone_image_stitch_cpp_tpu.ops.color import yuv420_to_bgr
    import jax.numpy as jnp
    ours = np.asarray(yuv420_to_bgr(jnp.asarray(packed)))
    d = np.abs(ours - bgr.astype(np.float32))
    assert d.mean() < 2.0, d.mean()
    assert d.max() < 48.0, d.max()


def test_framestore_auto_selects_yuv_and_host_frames_are_bgr(tmp_path):
    from drone_image_stitch_cpp_tpu.runtime.feed import FrameStore

    paths = _write_jpegs(tmp_path, n=3)
    st = FrameStore.from_paths(paths)
    if st.fmt != "yuv420":
        pytest.skip("auto mode stayed bgr (non-420 source)")
    h, w, c = st.shape0
    assert c == 3
    # packed device frames
    fr = st.frame(1)
    assert fr.ndim == 2 and fr.shape == (h * 3 // 2, w)
    # host BGR views re-decode the source through the standard BGR path,
    # bit-exact with the eager loader / a straight decode
    bgr = cv2.imread(paths[1])
    hf = st.host_frame(1)
    np.testing.assert_array_equal(hf, bgr)
    y_ours = st.images[1][:bgr.shape[0]].astype(np.float32)
    y_ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2YUV)[..., 0].astype(np.float32)
    assert np.abs(y_ours - y_ref).mean() < 1.5


def test_detect_parity_yuv_vs_bgr_store(tmp_path):
    """Keypoints from the yuv store must match the BGR store's (same luma
    plane up to decode rounding): the recovered pair transform agrees."""
    from drone_image_stitch_cpp_tpu.config.tuning import StitchTuning
    from drone_image_stitch_cpp_tpu.pipeline.strip import (
        estimate_strip_transforms)
    from drone_image_stitch_cpp_tpu.runtime.feed import FrameStore

    paths = _write_jpegs(tmp_path, n=3, seed=4)
    st_yuv = FrameStore.from_paths(paths)
    if st_yuv.fmt != "yuv420":
        pytest.skip("auto mode stayed bgr (non-420 source)")
    imgs = [cv2.imread(p) for p in paths]
    st_bgr = FrameStore(imgs)
    tuning = StitchTuning(sift_features=256, registration_resol_mpx=-1.0)
    kept_y, tr_y, _ = estimate_strip_transforms(
        None, tuning, stage="Y", seed=2, store=st_yuv, indices=[0, 1, 2])
    kept_b, tr_b, _ = estimate_strip_transforms(
        None, tuning, stage="B", seed=2, store=st_bgr, indices=[0, 1, 2])
    assert kept_y == kept_b
    # frames are 40 px apart; both paths must recover that geometry
    assert np.abs(tr_y - tr_b).max() < 0.75, np.abs(tr_y - tr_b).max()
    dx = tr_y[1:, 0, 2] - tr_y[:-1, 0, 2]
    assert np.abs(np.abs(dx) - 40.0).max() < 1.5, dx
