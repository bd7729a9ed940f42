"""Device mesh construction + sharding helpers.

The reference is single-host/single-device (SURVEY.md §2.3); the TPU-native
design is mesh-ready from the start: frames are data-parallel over a "dp"
axis (per-strip / per-pair work is embarrassingly parallel), and canvas
tiles can shard over the same axis for compose. Collectives ride ICI via
XLA (psum / all_gather inside shard_map) — there is no hand-written
communication backend to port.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp",
              platform: str | None = None) -> Mesh:
    """Build a 1-D device mesh.

    ``platform`` selects the device kind explicitly (e.g. "cpu" for the
    virtual host mesh used by tests and the driver's multi-chip dry run) —
    this sidesteps an unreliable default-platform override: even when a
    remote TPU platform leaks through JAX_PLATFORMS, jax.devices("cpu")
    still returns the host devices.

    Raises when fewer than ``n_devices`` devices exist instead of silently
    truncating (a truncated mesh makes sharding-equivalence tests vacuous).
    """
    devs = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devs)} available on platform="
                f"{platform or jax.default_backend()!r}; for a virtual "
                "CPU mesh set XLA_FLAGS=--xla_force_host_platform_"
                "device_count=N before the CPU backend initializes")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(mesh: Mesh, x, axis: str = "dp"):
    """Place a leading-axis batch with per-device sharding."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicated(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
