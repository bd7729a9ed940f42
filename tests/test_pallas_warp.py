"""Pallas warp kernel: interpret-mode correctness vs the XLA gather warp."""

import numpy as np
import jax.numpy as jnp
import pytest

import drone_image_stitch_cpp_tpu.ops.pallas_warp as PW
from drone_image_stitch_cpp_tpu.ops.warp import warp_affine as warp_xla


@pytest.fixture(autouse=True)
def interpret_mode():
    old = PW._INTERPRET
    PW._INTERPRET = True
    yield
    PW._INTERPRET = old


def _check(a23, max_err, size=512):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (size, size)).astype(np.float32))
    inv = np.linalg.inv(np.vstack([a23, [0, 0, 1]])).astype(np.float32)
    starts, ny, nx = PW._tile_starts(inv[:2], size, size, size, size)
    params = jnp.asarray([inv[0, 0], inv[0, 1], inv[0, 2], inv[1, 0],
                          inv[1, 1], inv[1, 2], float(size), float(size)],
                         jnp.float32)
    out = PW._run(img, jnp.asarray(starts), params, size, size, ny, nx)
    ref = warp_xla(img, jnp.asarray(a23), size, size)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    assert d.max() <= max_err, (a23, d.max(), d.mean())


def test_pure_translation_exact():
    _check(np.asarray([[1, 0, 10.0], [0, 1, 5.0]], np.float32), 1e-3)
    _check(np.asarray([[1, 0, -17.0], [0, 1, 33.0]], np.float32), 1e-3)
    _check(np.asarray([[1, 0, -200.0], [0, 1, -200.0]], np.float32), 1e-3)


def test_fractional_translation_exact():
    _check(np.asarray([[1, 0, 10.25], [0, 1, -5.75]], np.float32), 1e-2)


def test_rot_scale_within_bound():
    # two-pass approximation error ~|i10| * bilinear offset; on 0..255
    # noise with ~80/px gradients that is a few intensity counts
    _check(np.asarray([[1.02, 0.01, 30.5], [-0.015, 0.99, -12.3]],
                      np.float32), 4.0)
    _check(np.asarray([[0.98, -0.03, 5.0], [0.03, 1.01, 280.0]],
                      np.float32), 6.0)


def test_nonaligned_source_sizes_exact():
    """Advisor repro: an identity warp of a 200x520 source must keep the
    last src_w%128 columns and src_h%8 rows (round-1 kernel zeroed them)."""
    rng = np.random.default_rng(2)
    for (h, w) in [(200, 520), (137, 260), (50, 70)]:
        img = jnp.asarray(rng.uniform(1, 255, (h, w)).astype(np.float32))
        for a23 in (np.asarray([[1, 0, 0], [0, 1, 0]], np.float32),
                    np.asarray([[1.01, 0.0, -7.5], [0.0, 0.99, 3.25]],
                               np.float32)):
            out = PW.warp_affine(img, a23, h, w)
            ref = warp_xla(img, jnp.asarray(a23), h, w)
            d = np.abs(np.asarray(out) - np.asarray(ref))
            assert d.max() <= 4.0, ((h, w), a23.tolist(), d.max())
            # identity specifically: exact, including the last column/row
            if np.allclose(a23, np.asarray([[1, 0, 0], [0, 1, 0]])):
                assert d.max() <= 1e-3, ((h, w), d.max())
                assert np.asarray(out)[-1, -1] > 0


def test_dispatcher_fallback_on_large_rotation():
    # 30-degree rotation exceeds _MAX_DEV -> must take the XLA path (on
    # CPU everything falls back, so just verify it matches XLA exactly)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (256, 256)).astype(np.float32))
    th = np.radians(30)
    a = np.asarray([[np.cos(th), -np.sin(th), 10],
                    [np.sin(th), np.cos(th), 5]], np.float32)
    assert not PW.pallas_warp_supported(a, 256, 256)
    out = PW.warp_affine(img, a, 256, 256)
    ref = warp_xla(img, jnp.asarray(a), 256, 256)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-3
