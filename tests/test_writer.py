"""Background writers + streamed mosaic output (runtime/writer.py,
native/encode.cpp, ops/blend.mb_compose_tiled on_rows)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_image_stitch_cpp_tpu.ops import blend as B
from drone_image_stitch_cpp_tpu.runtime.writer import (BackgroundWriter,
                                                       StreamedMosaicWriter)
from drone_image_stitch_cpp_tpu.utils.native import jpeg_encoder_available


def test_background_writer_runs_and_joins(tmp_path):
    w = BackgroundWriter()
    paths = [tmp_path / f"f{i}.npy" for i in range(4)]
    for i, p in enumerate(paths):
        w.submit(np.save, str(p), np.full((8, 8), i, np.uint8))
    w.join()
    for i, p in enumerate(paths):
        assert np.load(str(p))[0, 0] == i


def test_background_writer_reraises_errors():
    w = BackgroundWriter()

    def boom():
        raise ValueError("disk on fire")

    w.submit(boom)
    with pytest.raises(ValueError, match="disk on fire"):
        w.join()
    # a joined writer with drained errors can be joined again harmlessly
    w.join()


@pytest.mark.skipif(not jpeg_encoder_available(),
                    reason="native encoder not built")
def test_native_jpeg_encoder_matches_cv2(tmp_path):
    """Streamed scanline encode == cv2.imwrite at the same quality."""
    import cv2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (150, 200, 3), np.uint8)
    # low-pass so JPEG error doesn't dominate the comparison
    img = cv2.GaussianBlur(img, (5, 5), 2.0)
    p_stream = str(tmp_path / "stream.jpg")
    p_cv = str(tmp_path / "cv.jpg")
    from drone_image_stitch_cpp_tpu.utils.native import NativeJpegEncoder
    enc = NativeJpegEncoder(p_stream, 200, 150, quality=95)
    for y0 in range(0, 150, 37):   # uneven bands
        enc.write(img[y0:y0 + 37])
    enc.finish()
    cv2.imwrite(p_cv, img)
    a = cv2.imread(p_stream)
    b = cv2.imread(p_cv)
    assert a is not None and a.shape == img.shape
    assert np.array_equal(a, b), "streamed encode differs from cv2"


def _tiny_tiled_compose(on_rows=None):
    """3-frame 128x512 tiled compose (mirrors the retire test's setup)."""
    bands = 2
    ch, cw = 128, 512
    frames = [np.full((96, 160, 3), 60.0 + 40.0 * i, np.float32)
              for i in range(3)]
    offs = [(0.0, 8.0), (144.0, 8.0), (288.0, 8.0)]
    boxes = [(ox, oy, ox + f.shape[1], oy + f.shape[0])
             for (ox, oy), f in zip(offs, frames)]
    feed = jax.jit(B.mb_feed, donate_argnums=0)

    def feed_roi(cv, i, oy, ox, eh, ew):
        fx0, fy0, fx1, fy1 = boxes[i]
        tlx, tly, rw_, rh_ = B.aligned_roi(fx0 - ox, fy0 - oy,
                                           fx1 - ox, fy1 - oy, bands,
                                           eh, ew)
        ry, rx = oy + tly, ox + tlx
        y0c, y1c = max(int(fy0), ry), min(int(fy1), ry + rh_)
        x0c, x1c = max(int(fx0), rx), min(int(fx1), rx + rw_)
        img = jnp.zeros((rh_, rw_, 3), jnp.float32)
        img = img.at[y0c - ry:y1c - ry, x0c - rx:x1c - rx].set(
            jnp.asarray(frames[i][y0c - int(fy0):y1c - int(fy0),
                                  x0c - int(fx0):x1c - int(fx0)]))
        m = (img.sum(-1) > 0).astype(jnp.float32)
        return feed(cv, img, m, tlx, tly, m > 0)

    return B.mb_compose_tiled(128, 512, bands, boxes, feed_roi,
                              tile=128, on_rows=on_rows), ch, cw


def test_compose_tiled_on_rows_streams_in_order():
    """on_rows fires once per tile row, in order, covering the canvas,
    with rows equal to the returned mosaic's."""
    events = []
    out, ch, cw = _tiny_tiled_compose(
        on_rows=lambda y0, y1, rows: events.append((y0, y1, rows.copy())))
    assert [(e[0], e[1]) for e in events] == [(0, 128)]
    assert np.array_equal(events[0][2], out)

    # taller canvas -> multiple bands in order (empty tiles included)
    events2 = []
    bands = 2
    boxes = [(8.0, 0.0, 168.0, 96.0)]   # content only in the top band
    feed = jax.jit(B.mb_feed, donate_argnums=0)
    frame = np.full((96, 160, 3), 120.0, np.float32)

    def feed_roi(cv, i, oy, ox, eh, ew):
        fx0, fy0, fx1, fy1 = boxes[i]
        tlx, tly, rw_, rh_ = B.aligned_roi(fx0 - ox, fy0 - oy,
                                           fx1 - ox, fy1 - oy, bands,
                                           eh, ew)
        ry, rx = oy + tly, ox + tlx
        y0c, y1c = max(int(fy0), ry), min(int(fy1), ry + rh_)
        x0c, x1c = max(int(fx0), rx), min(int(fx1), rx + rw_)
        img = jnp.zeros((rh_, rw_, 3), jnp.float32)
        img = img.at[y0c - ry:y1c - ry, x0c - rx:x1c - rx].set(
            jnp.asarray(frame[y0c - int(fy0):y1c - int(fy0),
                              x0c - int(fx0):x1c - int(fx0)]))
        m = (img.sum(-1) > 0).astype(jnp.float32)
        return feed(cv, img, m, tlx, tly, m > 0)

    out2 = B.mb_compose_tiled(512, 256, bands, boxes, feed_roi, tile=128,
                              on_rows=lambda y0, y1, rows:
                              events2.append((y0, y1, rows.copy())))
    assert [(e[0], e[1]) for e in events2] == [
        (0, 128), (128, 256), (256, 384), (384, 512)]
    assert np.array_equal(np.concatenate([e[2] for e in events2]), out2)


@pytest.mark.skipif(not jpeg_encoder_available(),
                    reason="native encoder not built")
def test_streamed_mosaic_writer_end_to_end(tmp_path):
    """StreamedMosaicWriter fed by mb_compose_tiled row bands produces the
    cropped mosaic on disk."""
    import cv2

    path = str(tmp_path / "mosaic.jpg")
    sink = StreamedMosaicWriter(path)
    crop = (0, 112, 8, 456)
    events = []

    def on_rows(y0, y1, rows):
        events.append((y0, y1))
        sink.on_rows(y0, y1, rows)

    # begin needs canvas dims before compose; mirror global_.py's order
    sink.begin(128, 512, crop)
    out, _, _ = _tiny_tiled_compose(on_rows=on_rows)
    h, w = sink.finish()
    assert sink.done and (h, w) == (112, 448)
    back = cv2.imread(path)
    assert back.shape == (112, 448, 3)
    ref = cv2.imdecode(cv2.imencode(
        ".jpg", out[crop[0]:crop[1], crop[2]:crop[3]])[1], cv2.IMREAD_COLOR)
    assert np.array_equal(back, ref)


def test_checkpoint_npy_roundtrip(tmp_path):
    from drone_image_stitch_cpp_tpu.runtime.checkpoint import (
        load_strip_checkpoint, save_strip_checkpoint)
    strips = [np.random.default_rng(i).integers(
        0, 256, (20 + i, 30, 3), np.uint8) for i in range(3)]
    save_strip_checkpoint(str(tmp_path), strips)
    back = load_strip_checkpoint(str(tmp_path))
    assert back is not None and len(back) == 3
    for a, b in zip(strips, back):
        assert np.array_equal(a, b)


def test_checkpoint_missing_file_recomputes(tmp_path):
    from drone_image_stitch_cpp_tpu.runtime.checkpoint import (
        load_strip_checkpoint, save_strip_checkpoint)
    strips = [np.zeros((8, 8, 3), np.uint8)] * 2
    save_strip_checkpoint(str(tmp_path), strips)
    os.remove(str(tmp_path / "strip_01.npy"))
    assert load_strip_checkpoint(str(tmp_path)) is None
