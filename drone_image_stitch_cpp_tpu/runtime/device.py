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


def describe_devices() -> List[str]:
    import jax
    try:
        return [f"{d.platform}:{d.device_kind}" for d in jax.devices()]
    except Exception as e:  # accelerator init failure -> CPU fallback
        return [f"unavailable ({e})"]


def select_backend(use_accelerator: bool) -> str:
    """Pick the JAX backend honoring the tuning toggles.

    Returns the backend name actually in use. Must be called before any
    device computation if it needs to force CPU.
    """
    import jax

    log = get_logger()
    if not use_accelerator:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        log.log("Device", "accelerator disabled by tuning; using cpu")
        return "cpu"
    try:
        backend = jax.default_backend()
    except Exception as e:
        log.log("Device", "accelerator init failed; falling back to cpu",
                error=str(e))
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        backend = "cpu"
    return backend
