"""Device-resident strip handoff (runtime/handoff.py) + packed-I420 wire.

The flagship's biggest wire cost was the strip-panorama round trip (fetch
after the strip blend + re-upload before the global align, ~150 s on the
~25 MB/s relay). These tests pin the replacement: device-assembled tiled
composes, the DeviceStrip handle, and the half-byte I420 fetch format.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import render_sortie

from drone_image_stitch_cpp_tpu.ops import blend as B
from drone_image_stitch_cpp_tpu.ops.color import bgr_to_yuv420
from drone_image_stitch_cpp_tpu.runtime.handoff import DeviceStrip


def _rand_bgr(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), np.uint8)


@pytest.mark.quick
def test_bgr_to_yuv420_roundtrip_error_bound():
    """Device pack -> cv2 unpack loses at most the 4:2:0 chroma detail
    (the same loss the JPEG encode applies); luma-flat regions roundtrip
    within a couple of levels."""
    import cv2

    img = _rand_bgr(64, 128, seed=3)
    # smooth the chroma so the 2x2 subsample is representative (random
    # per-pixel chroma is the worst case no camera produces)
    img = cv2.GaussianBlur(img, (5, 5), 2.0)
    packed = np.asarray(bgr_to_yuv420(jnp.asarray(img)))
    assert packed.shape == (64 * 3 // 2, 128) and packed.dtype == np.uint8
    back = cv2.cvtColor(packed, cv2.COLOR_YUV2BGR_I420)
    err = np.abs(back.astype(np.int16) - img.astype(np.int16))
    assert float(err.mean()) < 6.0, err.mean()
    assert int(err.max()) <= 48, err.max()
    # luma is preserved almost exactly (BT.601 both ways: the chroma
    # terms cancel out of the gray projection; only rounding remains)
    gray = lambda a: (a.astype(np.float32)
                      @ np.asarray([0.114, 0.587, 0.299], np.float32))
    lerr = np.abs(gray(back) - gray(img))
    assert float(lerr.max()) <= 4.0, lerr.max()


def _tiled_fixture(ortho):
    """Two overlapping frames + a feed_roi, as in test_parallel."""
    from drone_image_stitch_cpp_tpu.ops.pallas_warp import (
        warp_affine as fast_warp)

    bands = 3
    ch, cw = 320, 512
    frames = [ortho[40:200, 40:296].astype(np.float32),
              ortho[40:200, 168:424].astype(np.float32)]
    offs = [(0.0, 0.0), (128.0, 40.0)]
    boxes = [(ox, oy, ox + f.shape[1], oy + f.shape[0])
             for (ox, oy), f in zip(offs, frames)]
    feed = jax.jit(B.mb_feed, donate_argnums=0)

    def feed_roi(cv, i, oy, ox, eh, ew):
        fx0, fy0, fx1, fy1 = boxes[i]
        tlx, tly, rw_, rh_ = B.aligned_roi(fx0 - ox, fy0 - oy,
                                           fx1 - ox, fy1 - oy, bands,
                                           eh, ew)
        t = np.asarray([[1, 0, -(ox + tlx - offs[i][0])],
                        [0, 1, -(oy + tly - offs[i][1])]], np.float32)
        img = jnp.asarray(frames[i])
        wimg = fast_warp(img, t, rh_, rw_)
        cmask = fast_warp(jnp.ones(img.shape[:2], jnp.float32), t,
                          rh_, rw_) >= 0.999
        return feed(cv, wimg, cmask.astype(jnp.float32), tlx, tly, cmask)

    return ch, cw, bands, boxes, feed_roi


def test_device_assembly_matches_host(ortho):
    """assemble="device" produces the identical canvas + the identical
    autocrop bbox as the host-fetch path — pixels just never cross the
    host link until the single fetch here."""
    ch, cw, bands, boxes, feed_roi = _tiled_fixture(ortho)
    host_out, host_bbox = B.mb_compose_tiled(ch, cw, bands, boxes,
                                             feed_roi, tile=128,
                                             want_bbox=True)
    dev_out, dev_bbox = B.mb_compose_tiled(ch, cw, bands, boxes, feed_roi,
                                           tile=128, assemble="device")
    assert dev_bbox == host_bbox
    a = np.asarray(dev_out)
    assert a.shape[0] >= ch and a.shape[1] >= cw
    assert np.array_equal(a[:ch, :cw], host_out)
    # snap margin beyond the canvas stays black
    assert not a[ch:].any() and not a[:, cw:].any()


def test_fetch_packed_matches_within_chroma(ortho):
    """fetch_packed halves the fetch bytes; pixels differ only by the
    4:2:0 chroma subsample (luma-exact)."""
    ch, cw, bands, boxes, feed_roi = _tiled_fixture(ortho)
    plain = B.mb_compose_tiled(ch, cw, bands, boxes, feed_roi, tile=128)
    packed = B.mb_compose_tiled(ch, cw, bands, boxes, feed_roi, tile=128,
                                fetch_packed=True)
    gray = lambda a: (a.astype(np.float32)
                      @ np.asarray([0.114, 0.587, 0.299], np.float32))
    assert np.abs(gray(plain) - gray(packed)).max() <= 3.0
    assert np.abs(plain.astype(np.int16)
                  - packed.astype(np.int16)).mean() < 4.0


@pytest.mark.quick
def test_device_strip_host_and_repad(ortho):
    """DeviceStrip.host() is the LOSSLESS bbox crop (the resume
    checkpoint and the degrade ladder consume it; a --resume run must be
    byte-identical to a straight-through run); device_padded == the host
    pad layout the global compose expects."""
    canvas = np.zeros((256, 512, 3), np.uint8)
    content = ortho[:100, :200].astype(np.uint8)
    canvas[10:110, 20:220] = content
    ds = DeviceStrip(jnp.asarray(canvas), (10, 110, 20, 220))
    assert ds.hw == (100, 200) and ds.shape == (100, 200, 3)

    got = ds.host()
    assert np.array_equal(got, content)      # exact pixels, no wire loss
    assert ds.host_cached() is got  # cached, single fetch

    padded = np.asarray(ds.device_padded(512, 512))
    assert padded.shape == (512, 512, 3)
    assert np.array_equal(padded[:100, :200], content)
    assert not padded[100:].any() and not padded[:, 200:].any()


@pytest.mark.quick
def test_device_strip_release_lifecycle(ortho):
    """mark_consumed + cached host releases the device canvas (HBM
    headroom during the global compose); a released strip can still
    rebuild device_padded from the lossless host copy."""
    canvas = np.zeros((128, 256, 3), np.uint8)
    content = ortho[:64, :96].astype(np.uint8)
    canvas[8:72, 16:112] = content
    ds = DeviceStrip(jnp.asarray(canvas), (8, 72, 16, 112))

    ds.mark_consumed()
    assert ds.dev is not None          # no host copy yet: dev must stay
    host = ds.host()
    assert ds.dev is None              # consumed + cached -> released
    assert np.array_equal(host, content)
    assert ds.host() is host           # cache survives the release
    # device_padded rebuilds from the host copy (identical pixels)
    padded = np.asarray(ds.device_padded(128, 128))
    assert np.array_equal(padded[:64, :96], content)
    assert not padded[64:].any() and not padded[:, 96:].any()


@pytest.mark.quick
def test_recover_host_strips_ladder(tmp_path):
    """The degrade ladder per strip: cached copy -> live fetch -> saved
    JPEG -> only then abort. A dead-device strip with a JPEG on disk is
    recovered (lossy but usable); one with nothing raises with the strip
    index named."""
    import cv2

    from drone_image_stitch_cpp_tpu.runtime.handoff import \
        recover_host_strips

    class _DeadDev:
        shape = (128, 128, 3)

        def __getattr__(self, name):
            raise RuntimeError("UNAVAILABLE: device halted")

    # strip 0: healthy host array passes through untouched
    arr = np.full((32, 48, 3), 9, np.uint8)
    # strip 1: dead device, JPEG saved by the background writer
    dead1 = DeviceStrip(jnp.zeros((128, 128, 3), jnp.uint8), (0, 32, 0, 48))
    dead1.dev = _DeadDev()
    jpg = np.full((32, 48, 3), 120, np.uint8)
    cv2.imwrite(str(tmp_path / "strip_01.jpg"), jpg)
    panos = [arr, dead1]
    recover_host_strips(panos, str(tmp_path))
    assert panos[0] is arr
    assert isinstance(panos[1], np.ndarray)
    assert panos[1].shape == (32, 48, 3)
    assert dead1.host_cached() is not None  # writer's pending host() safe

    # strip with NO recovery path: raises naming the lost index
    dead2 = DeviceStrip(jnp.zeros((128, 128, 3), jnp.uint8), (0, 32, 0, 48))
    dead2.dev = _DeadDev()
    with pytest.raises(RuntimeError, match=r"strips \[0\] lost"):
        recover_host_strips([dead2], str(tmp_path / "nowhere"))


@pytest.mark.quick
def test_device_strip_put_host_recovery():
    """put_host installs a recovered copy (degrade ladder: device died,
    pixels came back from the strip JPEG) and later host() calls never
    touch the device again."""
    class _DeadDev:
        shape = (128, 128, 3)

        def __getattr__(self, name):
            raise RuntimeError("UNAVAILABLE: device halted")

    ds = DeviceStrip(jnp.zeros((128, 128, 3), jnp.uint8), (0, 32, 0, 48))
    ds.dev = _DeadDev()
    recovered = np.full((32, 48, 3), 7, np.uint8)
    ds.put_host(recovered)
    assert ds.host() is recovered      # no device touch
    ds.mark_consumed()
    assert ds.dev is None


def test_compose_strip_device_handle_matches_host(ortho, monkeypatch):
    """compose_strip(return_device=True) yields a DeviceStrip whose
    cropped canvas equals the host tiled compose byte-for-byte."""
    from drone_image_stitch_cpp_tpu.pipeline.strip import (
        compose_strip, estimate_strip_transforms)
    from test_pipeline import _small_tuning

    imgs, _, _ = render_sortie(ortho, 1, 4, frame_h=160, frame_w=224,
                               overlap=0.6)
    tuning = _small_tuning()
    kept, transforms, _ = estimate_strip_transforms(imgs, tuning)
    imgs = [imgs[i] for i in kept]
    monkeypatch.setattr(B, "TILED_THRESHOLD_BYTES", 1)
    host = compose_strip(imgs, transforms, tuning)
    ds = compose_strip(imgs, transforms, tuning, return_device=True)
    assert isinstance(ds, DeviceStrip)
    assert ds.hw == host.shape[:2]
    y0, y1, x0, x1 = ds.bbox
    assert np.array_equal(np.asarray(ds.dev)[y0:y1, x0:x1], host)


def test_global_compose_accepts_device_strips(ortho):
    """stitch_inter_strips_custom on DeviceStrip handles == on host
    arrays (the handles skip the upload; the math is identical)."""
    from drone_image_stitch_cpp_tpu.pipeline.global_ import (
        stitch_inter_strips_custom)
    from test_pipeline import _small_tuning

    strip_a = ortho[:120, :300].astype(np.uint8)
    strip_b = ortho[80:200, :300].astype(np.uint8)
    tuning = _small_tuning()
    host_mosaic = stitch_inter_strips_custom([strip_a, strip_b], tuning)

    def to_handle(arr):
        h, w = arr.shape[:2]
        canvas = np.zeros((((h + 3) // 4) * 4, ((w + 1) // 2) * 2, 3),
                          np.uint8)
        canvas[:h, :w] = arr
        return DeviceStrip(jnp.asarray(canvas), (0, h, 0, w))

    dev_mosaic = stitch_inter_strips_custom(
        [to_handle(strip_a), to_handle(strip_b)], tuning)
    assert np.array_equal(host_mosaic, dev_mosaic)
