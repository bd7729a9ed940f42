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


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(mesh: Mesh, x, axis: str = "dp"):
    """Place a leading-axis batch with per-device sharding."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicated(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
