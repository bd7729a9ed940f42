"""Device runtime control: accelerator introspection + host fallback.

Capability parity with the reference's OpenCL runtime control
(cv::ocl::setUseOpenCL / device query at stitch_robust.cpp:262-266,
stitch_global.cpp:489-495,671-673, stitch_app.cpp:86-91): the tuning knobs
``use_opencl``/``try_gpu`` map to "use the accelerator backend"; disabling
them forces the CPU backend, and accelerator initialization failures
degrade to CPU with a logged warning instead of aborting (the reference's
exception-sniffing retry ladder, re-expressed as an upfront policy).
"""

from __future__ import annotations

from typing import List

from .logging import get_logger


def enable_compile_cache() -> None:
    """Backend-keyed persistent XLA compilation cache.

    Over the remote-TPU relay a single large jit compile takes minutes;
    a fresh process (flagship bench, CLI run) otherwise pays every
    compile again. Keyed by backend so TPU and host-CPU executables never
    share a directory (mixed machine features in one cache dir can
    SIGILL on deserialization). No-op if the user already configured a
    cache (JAX_COMPILATION_CACHE_DIR or jax.config)."""
    import os
    import jax

    raise_map_limit()  # every enable_compile_cache caller is a long
    # compile-heavy run, exactly the workload that exhausts mappings
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import tempfile

    try:
        if jax.config.jax_compilation_cache_dir:
            return
        backend = jax.default_backend()
        # per-user path: a world-shared /tmp cache dir would deserialize
        # (execute) whatever another local user planted there
        cache_dir = os.path.join(
            tempfile.gettempdir(), f"jax_cache_{backend}_u{os.getuid()}")
        legacy = os.path.join(tempfile.gettempdir(),
                              f"jax_cache_{backend}")
        if not os.path.exists(cache_dir) and os.path.isdir(legacy) \
                and os.stat(legacy).st_uid == os.getuid():
            os.rename(legacy, cache_dir)  # keep warm entries
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        get_logger().log("Device", "compile cache unavailable",
                         error=str(e))


def raise_map_limit(target: int = 262144) -> None:
    """Raise vm.max_map_count when permitted (best-effort, root-only).

    XLA:CPU accumulates thousands of memory mappings per compiled
    executable (LLVM JIT code/data sections + mmap'd buffers): a long
    CPU-backend run that compiles hundreds of programs (the test suite, a
    big sortie on the CPU fallback) crosses the Linux default of 65530
    mappings and the process dies with SIGABRT/SIGSEGV deep inside the
    next compile — observed twice at the exact same test. Raising the
    sysctl is the cheap system-level guard; jax.clear_caches() at stage
    boundaries is the in-process one.
    """
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            cur = int(f.read().strip())
        if cur >= target:
            return
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write(str(target))
        get_logger().log("Device", "raised vm.max_map_count",
                         old=cur, new=target)
    except (OSError, ValueError):
        pass  # not privileged / not Linux — the per-module cache clears
              # in tests and the app's bounded program count cover it


def describe_devices() -> List[str]:
    import jax
    try:
        return [f"{d.platform}:{d.device_kind}" for d in jax.devices()]
    except Exception as e:  # accelerator init failure -> CPU fallback
        return [f"unavailable ({e})"]


def select_backend(use_accelerator: bool) -> str:
    """Pick the JAX backend honoring the tuning toggles.

    Returns the backend actually in use (verified via jax.default_backend,
    not assumed). Must be called before any device computation: once XLA
    backends initialize, the platform cannot be switched, in which case the
    mismatch is logged instead of silently ignored.
    """
    import os
    import jax

    log = get_logger()
    if not use_accelerator:
        os.environ["JAX_PLATFORMS"] = "cpu"  # covers child processes
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception as e:  # backends already initialized
            log.log("Device", "cpu force too late", error=str(e))
        backend = jax.default_backend()
        if backend != "cpu":
            log.log("Device",
                    "WARNING: accelerator disabled by tuning but backend "
                    "already initialized", backend=backend)
        else:
            log.log("Device", "accelerator disabled by tuning; using cpu")
        return backend
    try:
        backend = jax.default_backend()
    except Exception as e:
        log.log("Device", "accelerator init failed; falling back to cpu",
                error=str(e))
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
        backend = jax.default_backend()
    return backend
