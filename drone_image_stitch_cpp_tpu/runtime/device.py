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


# Device/transport failure signatures for the mid-run retry ladder — the
# analog of the reference's OpenCL exception sniffing (looksLikeOpenClFailure,
# stitch_robust.cpp:45-51: it matches "OpenCL"/"ocl4dnn"/"AGX" substrings in
# the exception text, then disables OpenCL and re-runs on CPU :259-270).
# Here the accelerator is a (possibly remote) TPU: we match XLA runtime /
# transport error shapes and degrade the process to the host CPU backend.
_DEVICE_FAILURE_SIGNATURES = (
    "UNAVAILABLE", "DEADLINE_EXCEEDED", "ABORTED", "DATA_LOSS",
    "RESOURCE_EXHAUSTED", "INTERNAL:", "failed to connect", "connection",
    "socket", "transport", "relay", "device is in an invalid state",
    "tpu driver", "halted", "libtpu",
)


def looks_like_device_failure(err: BaseException) -> bool:
    """True when an exception from a jitted dispatch looks like an
    accelerator/transport fault (vs a programming error): XlaRuntimeError
    by type name, or a known transport signature in the message."""
    tname = type(err).__name__
    if tname in ("XlaRuntimeError", "JaxRuntimeError"):
        return True
    msg = str(err)
    return any(sig.lower() in msg.lower()
               for sig in _DEVICE_FAILURE_SIGNATURES)


_degraded = False


def degrade_to_cpu() -> bool:
    """Mid-run accelerator -> host-CPU degradation (one-shot).

    Re-points JAX's default device at the host CPU backend (computations
    whose inputs are uncommitted numpy follow it) and drops every cached
    executable and live trace bound to the failed device. Returns False
    when the process already degraded once (a second fault is a real
    error) or no CPU backend exists. When the process was already running
    on CPU, the single retry still happens — that covers transient faults,
    which is all a CPU re-run can fix.
    """
    global _degraded
    import jax

    log = get_logger()
    if _degraded:
        return False
    try:
        cpu = jax.devices("cpu")[0]
    except Exception as e:
        log.log("Device", "no CPU backend for degradation", error=str(e))
        return False
    _degraded = True
    jax.config.update("jax_default_device", cpu)
    jax.clear_caches()  # executables/consts pinned to the dead device
    log.log("Device", "DEGRADED: accelerator fault; retrying stages on "
                      "host CPU backend")
    return True


def run_stage_with_retry(stage: str, fn, on_degrade=None):
    """Run one pipeline stage; on an accelerator fault, degrade to CPU and
    re-run it once (the reference's OpenCL-failure retry, re-expressed:
    stitch_robust.cpp:259-270). ``on_degrade`` lets the caller drop
    device-resident state (e.g. FrameStore.clear()) before the retry —
    stale buffers on a dead device would just re-raise."""
    log = get_logger()
    try:
        return fn()
    except Exception as err:
        if not looks_like_device_failure(err):
            raise
        log.log(stage, "accelerator failure detected",
                error=f"{type(err).__name__}: {err}")
        if not degrade_to_cpu():
            raise
        if on_degrade is not None:
            on_degrade()
        log.log(stage, "retrying stage on CPU backend")
        return fn()


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
