"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import sys

import jax
import numpy as np
import pytest


def test_mesh_has_8_devices():
    # assert on the CPU platform explicitly: even if the image's remote-TPU
    # platform leaks through JAX_PLATFORMS=cpu, the virtual host mesh must
    # still expose 8 CPU devices (xla_force_host_platform_device_count).
    assert len(jax.devices("cpu")) == 8


def test_make_mesh_raises_on_insufficient_devices():
    from drone_image_stitch_cpp_tpu.parallel.mesh import make_mesh
    with pytest.raises(RuntimeError):
        make_mesh(64, platform="cpu")


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    model, n_good, n_inl, ok = fn(*args)
    assert model.shape == (3, 3)
    assert bool(ok), (int(n_good), int(n_inl))
    # the planted shift is (40, 24); similarity should recover it
    m = np.asarray(model)
    assert abs(m[0, 2] + 40) < 1.5 and abs(m[1, 2] + 24) < 1.5, m


def test_sharded_matches_single_device():
    """The psum-reduced bundle adjust must equal the 1-device result."""
    from drone_image_stitch_cpp_tpu.parallel.mesh import make_mesh
    from drone_image_stitch_cpp_tpu.parallel.sortie_step import (
        build_sortie_step, demo_inputs)

    n_frames, h, w = 4, 96, 128
    outs = []
    for nd in (1, 4):
        mesh = make_mesh(nd, platform="cpu")
        step = build_sortie_step(mesh, n_frames, h, w, max_kp=64,
                                 range_width=2, n_hyp=64,
                                 canvas_h=128, canvas_w=160)
        frames, keys = demo_inputs(mesh, n_frames, h, w)
        t, canvas, _ = step(frames, keys)
        outs.append((np.asarray(t), np.asarray(canvas)))
    t1, c1 = outs[0]
    t4, c4 = outs[1]
    assert np.allclose(t1, t4, atol=1e-3), np.abs(t1 - t4).max()
    assert np.allclose(c1, c4, atol=0.5)


def test_app_registration_device_count_invariant():
    """The PRODUCTION registration path (estimate_strip_transforms with a
    sharded pair axis) must produce identical transforms on 1 device and
    on the full 8-device mesh (per-pair PRNG keys; data-parallel only)."""
    import numpy as np

    from drone_image_stitch_cpp_tpu.config.tuning import StitchTuning
    from drone_image_stitch_cpp_tpu.parallel.mesh import make_mesh
    from drone_image_stitch_cpp_tpu.pipeline.strip import (
        estimate_strip_transforms)
    from drone_image_stitch_cpp_tpu.utils.synthetic import synthetic_ortho

    ortho = synthetic_ortho(h=200, w=420, seed=3)
    imgs = [ortho[20:180, 30 * i:30 * i + 208].astype(np.uint8)
            for i in range(5)]
    tuning = StitchTuning(sift_features=192, registration_resol_mpx=-1.0)
    kept1, tr1, _ = estimate_strip_transforms(imgs, tuning, stage="T",
                                              seed=3, mesh=None)
    mesh = make_mesh(8, platform="cpu")
    kept8, tr8, _ = estimate_strip_transforms(imgs, tuning, stage="T",
                                              seed=3, mesh=mesh)
    assert kept1 == kept8
    assert np.abs(tr1 - tr8).max() < 1e-4, np.abs(tr1 - tr8).max()


def test_strip_stitch_device_placement_invariant():
    """Per-strip device round-robin (app.py strip loop): a strip stitched
    under ANY mesh device's default placement must produce the identical
    panorama — placement changes scheduling, never values."""
    from drone_image_stitch_cpp_tpu.config.tuning import StitchTuning
    from drone_image_stitch_cpp_tpu.parallel.mesh import make_mesh
    from drone_image_stitch_cpp_tpu.pipeline.strip import stitch_strip
    from drone_image_stitch_cpp_tpu.utils.synthetic import synthetic_ortho

    ortho = synthetic_ortho(h=200, w=420, seed=5)
    imgs = [ortho[20:180, 40 * i:40 * i + 208].astype(np.uint8)
            for i in range(4)]
    tuning = StitchTuning(sift_features=192, registration_resol_mpx=-1.0,
                          seam_estimation_resol_mpx=-1.0, blend_bands=2)
    mesh = make_mesh(8, platform="cpu")
    devs = list(mesh.devices.flat)
    outs = []
    for d in (devs[0], devs[5]):
        with jax.default_device(d):
            outs.append(stitch_strip([im.copy() for im in imgs], tuning,
                                     stage="T", seed=1))
    assert outs[0].shape == outs[1].shape
    assert np.array_equal(outs[0], outs[1]), np.abs(
        outs[0].astype(int) - outs[1].astype(int)).max()


def test_tiled_compose_sharded_matches_single_device(ortho):
    """mb_compose_tiled's independent tiles distributed over the mesh must
    produce the identical mosaic byte-for-byte (round-robin placement +
    deferred fetches change scheduling, never values)."""
    import jax.numpy as jnp

    from drone_image_stitch_cpp_tpu.ops import blend as B
    from drone_image_stitch_cpp_tpu.ops.pallas_warp import (
        warp_affine as fast_warp)
    from drone_image_stitch_cpp_tpu.parallel.mesh import make_mesh

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

    kw = dict(tile=128)
    out1 = B.mb_compose_tiled(ch, cw, bands, boxes, feed_roi, **kw)
    # 4 devices: per-device placement means each tile program compiles
    # once per device — 4 validates distribution at half the compile cost
    mesh = make_mesh(4, platform="cpu")
    out8 = B.mb_compose_tiled(ch, cw, bands, boxes, feed_roi,
                              devices=list(mesh.devices.flat), **kw)
    assert out1.shape == out8.shape == (ch, cw, 3)
    assert np.array_equal(out1, out8), np.abs(
        out1.astype(int) - out8.astype(int)).max()
    # content actually landed on the canvas
    assert (out1 > 0).mean() > 0.2
