"""Command-line interface.

The reference has no CLI (hardcoded run parameters, stitch_app.cpp:149-151,
main takes no args, main.cpp:3); SURVEY.md §5 requires a real CLI exposing
the full StitchTuning knob surface plus folder/type/group/output. Every
knob name matches the struct field for drop-in familiarity.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

from ..config.tuning import StitchTuning


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpu-mosaic",
        description="TPU-native drone ortho-mosaicking (JAX/XLA/Pallas)")
    p.add_argument("--image-folder", default="../images",
                   help="root folder; images at <root>/<type>/<group>")
    p.add_argument("--image-type", default="visible",
                   help="modality preset alias (visible/nir/lwir/...)")
    p.add_argument("--group", default="minfull")
    p.add_argument("--output-root", default="../output")
    p.add_argument("--no-save-strips", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume global stage from strip checkpoint")
    p.add_argument("--log-jsonl", default=None,
                   help="structured log sink (JSONL)")
    p.add_argument("--trace-dir", default=None,
                   help="jax.profiler trace output directory")

    # full StitchTuning knob surface (SURVEY.md §2.4)
    defaults = StitchTuning()
    for f in dataclasses.fields(StitchTuning):
        if f.name == "calibration":
            continue
        flag = "--" + f.name.replace("_", "-")
        default = getattr(defaults, f.name)
        if isinstance(default, bool):
            p.add_argument(flag, type=_str2bool, default=None,
                           metavar="BOOL")
        elif isinstance(default, int):
            p.add_argument(flag, type=int, default=None)
        else:
            p.add_argument(flag, type=float, default=None)
    return p


def _str2bool(v: str) -> bool:
    if v.lower() in ("1", "true", "yes", "on"):
        return True
    if v.lower() in ("0", "false", "no", "off"):
        return False
    raise argparse.ArgumentTypeError(f"boolean expected, got {v!r}")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # The accelerator toggle must act BEFORE any JAX import: once XLA
    # backends initialize the platform cannot change (and the JAX_PLATFORMS
    # env var is ignored in some images). use_opencl/try_gpu map to "use
    # the accelerator" (reference analog: stitch_robust.cpp:259-270 CPU
    # retry ladder; cv::ocl toggles).
    accel = (args.use_opencl if args.use_opencl is not None else True) and         (args.try_gpu if args.try_gpu is not None else True)
    if not accel:
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # already initialized; select_backend logs the mismatch

    from ..app import RunConfig, run_stitch_application

    overrides = {}
    for f in dataclasses.fields(StitchTuning):
        if f.name == "calibration":
            continue
        v = getattr(args, f.name, None)
        if v is not None:
            overrides[f.name] = v
    if args.log_jsonl:
        from ..runtime.logging import get_logger
        get_logger().jsonl_path = args.log_jsonl
    cfg = RunConfig(
        image_folder=args.image_folder, image_type=args.image_type,
        group=args.group, output_root=args.output_root,
        save_strips=not args.no_save_strips, resume=args.resume,
        tuning_overrides=overrides)
    if args.trace_dir:
        from ..runtime.logging import device_trace
        with device_trace(args.trace_dir):
            return run_stitch_application(cfg)
    return run_stitch_application(cfg)


if __name__ == "__main__":
    sys.exit(main())
