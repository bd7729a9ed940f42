"""App-driver integration: full run, checkpoint resume, loader, undistort."""

import os

import numpy as np
import pytest

from conftest import render_sortie

from drone_image_stitch_cpp_tpu.app import RunConfig, run_stitch_application
from drone_image_stitch_cpp_tpu.runtime import loader


@pytest.fixture(scope="module")
def sortie_dir(tmp_path_factory):
    import cv2
    from conftest import synthetic_ortho
    ortho = synthetic_ortho()
    imgs, ids, _ = render_sortie(ortho, 2, 3, frame_h=160, frame_w=208,
                                 overlap=0.7, overlap_y=0.3)
    root = tmp_path_factory.mktemp("sortie")
    d = root / "visible" / "run"
    os.makedirs(d)
    for k, img in enumerate(imgs):
        cv2.imwrite(str(d / f"IMG{k:03d}_x.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 97])
    return str(root)


def test_full_application_run(sortie_dir, tmp_path):
    out = str(tmp_path / "out")
    cfg = RunConfig(image_folder=sortie_dir, image_type="visible",
                    group="run", output_root=out,
                    tuning_overrides=dict(
                        sift_features=512, strip_sift_features=512,
                        global_sift_features=768,
                        registration_resol_mpx=-1.0,
                        seam_estimation_resol_mpx=-1.0, blend_bands=3))
    rc = run_stitch_application(cfg)
    assert rc == 0
    pano_path = os.path.join(out, "visible", "run",
                             "visible_run_uav_panorama.jpg")
    assert os.path.exists(pano_path)
    import cv2
    pano = cv2.imread(pano_path)
    # 2 rows x 3 cols at 70%/30% overlap: ~272 x ~332 content
    assert pano.shape[0] > 240 and pano.shape[1] > 290, pano.shape
    # strip checkpoint written
    assert os.path.exists(os.path.join(
        out, "visible", "run", "strips", "checkpoint.json"))

    # resume path: rerun with resume=True reuses the checkpoint
    cfg2 = RunConfig(image_folder=sortie_dir, image_type="visible",
                     group="run", output_root=out, resume=True,
                     tuning_overrides=cfg.tuning_overrides)
    assert run_stitch_application(cfg2) == 0


def test_device_failure_midrun_retry(sortie_dir, tmp_path, monkeypatch):
    """Mid-run accelerator-fault retry ladder (the reference's OpenCL
    exception -> CPU re-run, stitch_robust.cpp:259-270): a device/transport
    fault injected into the FIRST grouping detect dispatch must degrade the
    process to the host CPU backend, re-run the stage, and still produce a
    complete mosaic — with the degradation visible in the log."""
    import jax

    from drone_image_stitch_cpp_tpu.grouping import flight_grouper
    from drone_image_stitch_cpp_tpu.runtime import device as rt_device
    from drone_image_stitch_cpp_tpu.runtime.logging import get_logger

    # the degradation latch is process-global one-shot; reset around the test
    monkeypatch.setattr(rt_device, "_degraded", False)

    real_detect = flight_grouper.detect_features
    calls = {"n": 0}
    fake_xla_error = type("XlaRuntimeError", (RuntimeError,), {})

    def failing_detect(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise fake_xla_error(
                "UNAVAILABLE: TPU relay transport: connection reset")
        return real_detect(*args, **kwargs)

    monkeypatch.setattr(flight_grouper, "detect_features", failing_detect)

    out = str(tmp_path / "out")
    cfg = RunConfig(image_folder=sortie_dir, image_type="visible",
                    group="run", output_root=out,
                    tuning_overrides=dict(
                        sift_features=512, strip_sift_features=512,
                        global_sift_features=768,
                        registration_resol_mpx=-1.0,
                        seam_estimation_resol_mpx=-1.0, blend_bands=3))
    try:
        rc = run_stitch_application(cfg)
    finally:
        rt_device._degraded = False
        jax.config.update("jax_default_device", None)
    assert rc == 0
    assert calls["n"] >= 2  # the stage really re-ran after the fault
    pano_path = os.path.join(out, "visible", "run",
                             "visible_run_uav_panorama.jpg")
    assert os.path.exists(pano_path)
    import cv2
    pano = cv2.imread(pano_path)
    assert pano.shape[0] > 240 and pano.shape[1] > 290, pano.shape
    msgs = [r["msg"] for r in get_logger()._records]
    assert any("DEGRADED" in m for m in msgs)
    assert any("retrying stage on CPU backend" in m for m in msgs)


def test_resume_is_byte_identical(sortie_dir, tmp_path, monkeypatch):
    """A --resume run composes from the strip checkpoint; the checkpoint
    stores the LOSSLESS raw host copy of each DeviceStrip, so the resumed
    mosaic must be byte-identical to the straight-through run's (the
    round-4 I420 checkpoint wire silently chroma-degraded resumed runs)."""
    import cv2

    from drone_image_stitch_cpp_tpu.ops import blend as B

    # force the tiled compose so strips really flow as DeviceStrips
    monkeypatch.setattr(B, "TILED_THRESHOLD_BYTES", 1)
    out = str(tmp_path / "out")
    overrides = dict(sift_features=512, strip_sift_features=512,
                     global_sift_features=768,
                     registration_resol_mpx=-1.0,
                     seam_estimation_resol_mpx=-1.0, blend_bands=3)
    cfg = RunConfig(image_folder=sortie_dir, image_type="visible",
                    group="run", output_root=out,
                    tuning_overrides=overrides)
    assert run_stitch_application(cfg) == 0
    pano_path = os.path.join(out, "visible", "run",
                             "visible_run_uav_panorama.jpg")
    straight = cv2.imread(pano_path, cv2.IMREAD_COLOR)
    assert straight is not None

    cfg2 = RunConfig(image_folder=sortie_dir, image_type="visible",
                     group="run", output_root=out, resume=True,
                     tuning_overrides=overrides)
    assert run_stitch_application(cfg2) == 0
    resumed = cv2.imread(pano_path, cv2.IMREAD_COLOR)
    assert resumed is not None
    assert np.array_equal(straight, resumed)


def test_application_missing_folder(tmp_path):
    cfg = RunConfig(image_folder=str(tmp_path / "none"),
                    image_type="visible", group="g",
                    output_root=str(tmp_path / "out"))
    assert run_stitch_application(cfg) == 1  # top-level catch -> exit 1


def test_loader_id_extraction():
    assert loader.extract_image_id("DJI_0042.jpg") == "DJI"
    assert loader.extract_image_id("frame.png") == "frame"
    assert loader.extract_image_id("/a/b/X123_cam0_t1.tif") == "X123"
    # '_' at position 0 -> stem fallback (pos > 0 required)
    assert loader.extract_image_id("_odd.jpg") == "_odd"


def test_loader_requires_two_images(tmp_path):
    import cv2
    d = tmp_path / "one"
    os.makedirs(d)
    cv2.imwrite(str(d / "a.jpg"), np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(RuntimeError):
        loader.load(str(d))
    # loadWithIds accepts a single image
    got = loader.load_with_ids(str(d))
    assert len(got.images) == 1


def test_native_decoder_roundtrip(tmp_path):
    from drone_image_stitch_cpp_tpu.utils import native
    if not native.native_available():
        pytest.skip("native library not built")
    import cv2
    img = (np.random.default_rng(0).uniform(0, 255, (64, 96, 3))
           .astype(np.uint8))
    p = str(tmp_path / "t.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 100])
    ours = native.decode_image_native(p)
    ref = cv2.imread(p)
    assert ours is not None and ours.shape == ref.shape
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2

    batch = native.decode_batch_native([p, p, p], n_threads=2)
    assert batch is not None and len(batch) == 3
    assert all(b.shape == ref.shape for b in batch)


def test_device_feed(tmp_path):
    import cv2
    from drone_image_stitch_cpp_tpu.runtime.feed import DeviceFeed
    img = (np.random.default_rng(1).uniform(0, 255, (32, 48, 3))
           .astype(np.uint8))
    paths = []
    for i in range(5):
        p = str(tmp_path / f"f{i}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)
    batches = list(DeviceFeed(paths, batch_size=2))
    assert [b.shape[0] for b in batches] == [2, 2, 1]
    assert batches[0].shape[1:] == (32, 48, 3)
    # production mode (pipeline/registration.py): uint8 transfer, tail
    # padded so every chunk reuses one compiled shape, real count returned
    prod = list(DeviceFeed(paths, batch_size=2, keep_uint8=True,
                           pad_tail=True))
    assert [t for _, t in prod] == [2, 2, 1]
    assert all(b.shape[0] == 2 for b, _ in prod)
    assert all(b.dtype == np.uint8 for b, _ in prod)
    # padded tail frame repeats the last real frame
    assert np.array_equal(np.asarray(prod[-1][0][1]),
                          np.asarray(prod[-1][0][0]))


def test_undistort_identity():
    import jax.numpy as jnp
    from drone_image_stitch_cpp_tpu.config.tuning import CameraCalibration
    from drone_image_stitch_cpp_tpu.ops.undistort import undistort
    calib = CameraCalibration(name="t", fx=100.0, fy=100.0, cx=32.0,
                              cy=24.0, dist=(0.0,) * 8)
    img = jnp.asarray(np.random.default_rng(2).uniform(
        0, 255, (48, 64)).astype(np.float32))
    out = undistort(img, calib)
    assert np.abs(np.asarray(out) - np.asarray(img)).max() < 1e-3


def test_undistort_matches_cv():
    import cv2
    import jax.numpy as jnp
    from drone_image_stitch_cpp_tpu.config.tuning import CameraCalibration
    from drone_image_stitch_cpp_tpu.ops.undistort import undistort
    from conftest import synthetic_ortho
    img = synthetic_ortho(h=120, w=160)[..., 0]
    k = np.asarray([[120.0, 0, 80.0], [0, 120.0, 60.0], [0, 0, 1]])
    dist = np.asarray([0.05, -0.01, 0.001, -0.002, 0.002, 0.01, 0.0, 0.0])
    calib = CameraCalibration(name="t", fx=120.0, fy=120.0, cx=80.0,
                              cy=60.0, dist=tuple(dist))
    ours = np.asarray(undistort(jnp.asarray(img), calib))
    ref = cv2.undistort(img, k, dist)
    # interior agreement (border handling differs at the frame edge)
    diff = np.abs(ours[8:-8, 8:-8] - ref[8:-8, 8:-8])
    assert np.quantile(diff, 0.995) < 1.5, np.quantile(diff, 0.995)


def test_streaming_ingest_fallback_on_garbage(sortie_dir, tmp_path):
    """A garbage file in the folder trips the streaming FrameStore and the
    app recovers through the eager loader's skip-unreadable path."""
    import shutil
    root = str(tmp_path / "dirty")
    d = os.path.join(root, "visible", "run")
    shutil.copytree(os.path.join(sortie_dir, "visible", "run"), d)
    with open(os.path.join(d, "IMG000_x.jpg"), "wb") as f:
        f.write(b"not a jpeg at all")
    out = str(tmp_path / "out")
    cfg = RunConfig(image_folder=root, image_type="visible",
                    group="run", output_root=out,
                    tuning_overrides=dict(
                        sift_features=512, strip_sift_features=512,
                        global_sift_features=768,
                        registration_resol_mpx=-1.0,
                        seam_estimation_resol_mpx=-1.0, blend_bands=3))
    assert run_stitch_application(cfg) == 0
    assert os.path.exists(os.path.join(
        out, "visible", "run", "visible_run_uav_panorama.jpg"))


def test_frame_store_streaming_decode(sortie_dir):
    """from_paths decodes in the background and matches the eager loader."""
    from drone_image_stitch_cpp_tpu.runtime.feed import FrameStore
    d = os.path.join(sortie_dir, "visible", "run")
    paths = [os.path.join(d, n) for n in sorted(os.listdir(d))]
    store = FrameStore.from_paths(paths)
    assert store.shape0 == (160, 208, 3)
    imgs = store.host_images()
    eager = loader.load_with_ids(d)
    assert len(imgs) == len(eager.images)
    for a, b in zip(imgs, eager.images):
        np.testing.assert_array_equal(a, b)


def test_half_res_store_detect_geometry(tmp_path):
    """Half-res (DCT-scaled) store + coord_scale=2 recovers the same
    full-res geometry as the full store (the flagship detect path)."""
    import cv2
    from conftest import synthetic_ortho
    from drone_image_stitch_cpp_tpu.ops.match import adaptive_ratio
    from drone_image_stitch_cpp_tpu.pipeline.pairgraph import register_pairs
    from drone_image_stitch_cpp_tpu.pipeline.registration import (
        detect_features)
    from drone_image_stitch_cpp_tpu.runtime.feed import FrameStore

    big = synthetic_ortho(h=1200, w=4300)
    # planted (dx, dy) = (256, 64) at full resolution
    a = big[0:1024, 0:3968].astype(np.uint8)
    b = big[64:1088, 256:4224].astype(np.uint8)
    d = tmp_path / "half"
    os.makedirs(d)
    paths = []
    for k, img in enumerate([a, b]):
        p = str(d / f"F{k}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 97])
        paths.append(p)

    def recover(store, coord_scale):
        feats, scale = detect_features(None, 400, 0.2, store=store,
                                       indices=[0, 1],
                                       coord_scale=coord_scale)
        graph = register_pairs(feats, [(0, 1)], float(adaptive_ratio(0.35)),
                               thresh=4.0 / scale, kind="similarity")
        assert bool(np.asarray(graph.ok)[0])
        m = np.asarray(graph.model)[0]
        return float(m[0, 2]), float(m[1, 2])

    tx_f, ty_f = recover(FrameStore.from_paths(paths), 1.0)
    tx_h, ty_h = recover(FrameStore.from_paths(paths, scale_denom=2), 2.0)
    # both recover the planted full-res translation
    assert abs(tx_f + 256.0) < 1.0 and abs(ty_f + 64.0) < 1.0, (tx_f, ty_f)
    assert abs(tx_h + 256.0) < 1.0 and abs(ty_h + 64.0) < 1.0, (tx_h, ty_h)
