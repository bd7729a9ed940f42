"""Test harness config: force an 8-device virtual CPU mesh.

All tests run on the CPU backend (CI needs no TPU); the same code paths are
jit/pjit-ed on device in production. The env vars must be set before JAX is
imported anywhere in the process.
"""

import os

# FORCE cpu: the image profile exports JAX_PLATFORMS=axon (remote TPU
# tunnel); tests must run on the local CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# The JAX_PLATFORMS env var is IGNORED in this image (the axon PJRT plugin
# registers regardless; round 1's tests silently ran on the remote TPU).
# Only jax.config.update("jax_platforms") before backend init truly forces
# CPU; clear_backends covers the already-initialized case.
try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    import jax.extend
    jax.extend.backend.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
assert len(jax.devices("cpu")) == 8, (
    f"virtual CPU mesh not active: {jax.devices('cpu')}")

# persistent compilation cache: compiles dominate test wall-clock on CPU.
# (separate dir from any axon/remote-compiled artifacts — mixed machine
# features in one cache dir trigger AOT-mismatch warnings or SIGILL)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# XLA:CPU accumulates thousands of memory mappings per live compiled
# executable; the full suite crosses Linux's default vm.max_map_count
# (65530) and dies with SIGABRT/SIGSEGV inside an unrelated late compile.
# Raise the sysctl when privileged, and clear JAX's executable caches
# between test modules so mapping count stays bounded regardless.
from drone_image_stitch_cpp_tpu.runtime.device import (  # noqa: E402
    raise_map_limit)

raise_map_limit()


def _map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def _map_limit() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return 65530


@pytest.fixture(autouse=True, scope="module")
def _bound_process_mappings():
    yield
    # clear only under real pressure: unconditional clearing re-compiles
    # shared executables in every later module (~+60 s/module). 60% of
    # the limit leaves a full module of headroom (largest observed
    # single-module growth ~12k of the 65530 default); when
    # raise_map_limit succeeded the threshold is never reached.
    if _map_count() > 0.6 * _map_limit():
        jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


from drone_image_stitch_cpp_tpu.utils.synthetic import (  # noqa: E402,F401
    blurred_rmse, render_sortie, synthetic_ortho)


@pytest.fixture(scope="session")
def ortho():
    return synthetic_ortho()



# ---- fast test tier ("pytest -m quick": < 5 min on one CPU core) ----------
_QUICK_MODULES = {
    "test_config", "test_ops_image", "test_ops_blend_seam",
    "test_graphcut", "test_ops_ransac", "test_pallas_sift", "test_hbm",
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        if it.module.__name__ in _QUICK_MODULES:
            it.add_marker(pytest.mark.quick)
