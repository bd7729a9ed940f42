"""Application driver: load -> undistort -> group -> strips -> global -> crop.

Capability parity: runStitchApplication (reference: stitch_app.cpp:146-271)
with its per-stage tuning overrides (strip_sift_features :198-201;
global_sift_features + range matcher off + blend_bands floor 5 :227-239),
strip persistence (:215-217, here a real checkpoint boundary with resume),
single-group flatten path (:246-260), autocrop + write (:262-263), and the
top-level catch -> exit code 1 (:265-268). Unlike the reference's hardcoded
run parameters (:149-151), every knob is exposed through RunConfig / the CLI
(cli/main.py).
"""

from __future__ import annotations

import os
import traceback
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .config.tuning import StitchTuning, load_stitch_tuning
from .grouping.flight_grouper import group_boustrophedon
from .ops.crop import auto_crop_black_border
from .pipeline.global_ import stitch_inter_strips_custom
from .pipeline.strip import stitch_strip
from .runtime.checkpoint import (load_strip_checkpoint,
                                 save_strip_checkpoint)
from .runtime.loader import load_with_ids, scan_with_ids
from .runtime.logging import get_logger
from .runtime.writer import BackgroundWriter, StreamedMosaicWriter


@dataclass
class RunConfig:
    """The reference's hardcoded run parameters, promoted to real config
    (stitch_app.cpp:149-160)."""

    image_folder: str = "../images"
    image_type: str = "visible"
    group: str = "minfull"
    output_root: str = "../output"
    save_strips: bool = True
    resume: bool = False          # resume global stage from strip checkpoint
    tuning_overrides: dict = field(default_factory=dict)

    @property
    def input_dir(self) -> str:
        return os.path.join(self.image_folder, self.image_type, self.group)

    @property
    def output_dir(self) -> str:
        return os.path.join(self.output_root, self.image_type, self.group)

    @property
    def output_path(self) -> str:
        return os.path.join(
            self.output_dir,
            f"{self.image_type}_{self.group}_uav_panorama.jpg")


def _write_image(path: str, img: np.ndarray) -> None:
    import cv2
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not cv2.imwrite(path, img):
        raise RuntimeError(f"failed to write {path}")


def _undistort_if_ready(images: List[np.ndarray], tuning: StitchTuning,
                        image_type: str) -> List[np.ndarray]:
    """Reference: findCameraCalibration + undistortImagesIfReady
    (stitch_app.cpp:27-80): no-op while the calibration placeholders are
    empty."""
    calib = tuning.calibration.find(image_type)
    if calib is None or not calib.is_ready():
        get_logger().log("Main", "calibration not ready; skipping undistort")
        return images
    import jax.numpy as jnp
    from .ops.undistort import undistort
    out = []
    for img in images:
        und = undistort(jnp.asarray(img.astype(np.float32)), calib)
        out.append(np.asarray(und).astype(np.uint8))
    get_logger().log("Main", "undistorted", n=len(out))
    return out


def _init_runtime(tuning: StitchTuning) -> None:
    """Backend selection + compile cache + mapping-limit raise.

    Explicit init step (NOT buried in logging): it mutates process-global
    JAX config and, when privileged, a kernel sysctl."""
    from .runtime.device import enable_compile_cache, select_backend
    select_backend(tuning.use_opencl and tuning.try_gpu)
    enable_compile_cache()


def _log_runtime_options(tuning: StitchTuning) -> None:
    """Reference: logRuntimeOptions (stitch_app.cpp:82-113)."""
    import jax

    from .runtime.device import describe_devices
    log = get_logger()
    log.log("Main", "devices", backend=jax.default_backend(),
            devices=describe_devices())
    from .config.tuning import tuning_as_dict
    log.log("Main", "tuning", **tuning_as_dict(tuning))


def make_strip_tags(strip_idx: int, ids: List[str]) -> List[str]:
    """Reference: makeStripTags (stitch_app.cpp:131-142)."""
    return [f"S{strip_idx}:{i}" for i in ids]


def run_stitch_application(cfg: Optional[RunConfig] = None) -> int:
    """End-to-end run; returns a process exit code like the reference."""
    cfg = cfg or RunConfig()
    log = get_logger()
    try:
        tuning = load_stitch_tuning(cfg.image_type)
        if cfg.tuning_overrides:
            tuning = tuning.replace(**cfg.tuning_overrides)
        os.makedirs(cfg.output_dir, exist_ok=True)
        _init_runtime(tuning)
        _log_runtime_options(tuning)

        # Ingest. Two paths:
        #  * STREAMING (default): scan now, decode on a background thread
        #    chunk by chunk into a FrameStore — host JPEG decode (~60 s
        #    for a 200-frame 4K sortie on one core) overlaps the grouping
        #    stage's device compute. Any decode failure falls back below.
        #  * EAGER: decode everything up front (undistort rewrites
        #    pixels; also the recovery path for unreadable files, keeping
        #    the reference's skip-unreadable semantics,
        #    image_loader.cpp:52-59).
        # Either way the FrameStore is the transfer-once device frame
        # cache: grouping detect, strip registration, and the compose
        # feeds all read the same frames, and on the remote relay each
        # full pass over a 200-frame 4K sortie costs ~100 s of
        # host->device transfer alone.
        from .runtime.feed import FrameStore, FrameStoreError

        calib = tuning.calibration.find(cfg.image_type)
        store = images = ids = None
        if calib is None or not calib.is_ready():
            log.log("Main", "calibration not ready; skipping undistort")
            try:
                with log.timer("Main", "scan"):
                    paths, ids = scan_with_ids(cfg.input_dir)
                if len(paths) >= 2:
                    # ONE full-res streaming store. (A dual-store variant —
                    # half-res DCT-scaled decode feeding the detect stages,
                    # still available as FrameStore scale_denom + detect
                    # coord_scale, both unit-tested — was measured on the
                    # flagship sortie and LOST on this serial relay:
                    # flagship_r3_run7.log.)
                    store = FrameStore.from_paths(paths)
                    sh = store.shape0
                    if not (len(sh) == 3 and sh[2] == 3
                            and store.images[0].dtype == np.uint8):
                        raise FrameStoreError("frame 0 is not BGR uint8")
                    log.log("Main", "streaming ingest", n=len(paths))
            except FrameStoreError as e:
                log.log("Main", "streaming ingest unavailable",
                        error=str(e))
                store = images = ids = None

        if store is None:
            with log.timer("Main", "load+decode"):
                loaded = load_with_ids(cfg.input_dir)
            log.log("Main", "loaded", n=len(loaded.images))
            if len(loaded.images) < 2:
                log.log("Main", "need at least 2 images")
                return 1
            ids = loaded.ids
            images = _undistort_if_ready(loaded.images, tuning,
                                         cfg.image_type)
            if (len({im.shape for im in images}) == 1
                    and images[0].ndim == 3 and images[0].shape[2] == 3
                    and images[0].dtype == np.uint8):
                store = FrameStore(images)

        # data-parallel mesh over all visible devices: the registration
        # pair axis shards across it (pairgraph.register_pairs), the
        # independent per-strip stitches round-robin over it, and tiled
        # composes distribute tiles; a single device runs unsharded
        mesh = None
        try:
            import jax
            from .parallel.mesh import make_mesh
            if len(jax.devices()) > 1:
                mesh = make_mesh(len(jax.devices()))
                log.log("Main", "mesh", devices=int(mesh.devices.size))
        except Exception as e:
            log.log("Main", "mesh unavailable", error=str(e))

        # mid-run accelerator-failure retry ladder (the reference's
        # OpenCL-exception -> CPU re-run, stitch_robust.cpp:259-270):
        # any stage that dies with a device/transport fault degrades the
        # process to the host CPU backend and re-runs ONCE. Device-resident
        # state on the dead accelerator (FrameStore chunks, the mesh) is
        # dropped first; host copies rebuild it on the retry.
        from .runtime.device import run_stage_with_retry
        from .runtime.handoff import (DeviceStrip, as_host_strips,
                                      recover_host_strips)

        strip_panos: List = []
        ckpt_dir = os.path.join(cfg.output_dir, "strips")

        def _on_degrade():
            nonlocal mesh
            mesh = None
            if store is not None:
                store.clear()
            recover_host_strips(strip_panos, ckpt_dir, log)
            if strips_done is not None and strips_done is not strip_panos:
                recover_host_strips(strips_done, ckpt_dir, log)

        writer = None
        strips_done: Optional[List[np.ndarray]] = None
        if cfg.resume:
            strips_done = load_strip_checkpoint(ckpt_dir)
            if strips_done is not None:
                log.log("Main", "resuming global stage from checkpoint",
                        strips=len(strips_done))

        if strips_done is None:
            try:
                with log.timer("Main", "grouping"):
                    groups = run_stage_with_retry(
                        "VisualGroup",
                        lambda: group_boustrophedon(images, ids, tuning,
                                                    store=store),
                        on_degrade=_on_degrade)
            except FrameStoreError as e:
                # unreadable/mismatched files: recover with the eager
                # loader (skip-unreadable, image_loader.cpp:52-59)
                log.log("Main", "streaming ingest failed; reloading",
                        error=str(e))
                with log.timer("Main", "load+decode"):
                    loaded = load_with_ids(cfg.input_dir)
                log.log("Main", "loaded", n=len(loaded.images))
                if len(loaded.images) < 2:
                    log.log("Main", "need at least 2 images")
                    return 1
                ids = loaded.ids
                images = _undistort_if_ready(loaded.images, tuning,
                                             cfg.image_type)
                store = None
                if (len({im.shape for im in images}) == 1
                        and images[0].ndim == 3 and images[0].shape[2] == 3
                        and images[0].dtype == np.uint8):
                    store = FrameStore(images)
                with log.timer("Main", "grouping"):
                    groups = group_boustrophedon(images, ids, tuning,
                                                 store=store)
            log.log("Main", "groups", n=len(groups),
                    sizes=[len(g.indices) for g in groups])

            if len(groups) > 1:
                strip_tuning = tuning.replace(
                    sift_features=tuning.strip_sift_features)
                # strip JPEGs + the resume checkpoint encode on a worker
                # thread while the device stitches the NEXT strip (the
                # reference encodes each strip serially before moving on,
                # stitch_app.cpp:215-217 — ~110 s of idle device on the
                # 200-frame sortie); errors resurface at join() below
                writer = BackgroundWriter()

                # independent per-strip stitches round-robin over the mesh
                # devices (the reference loops strips serially on one
                # accelerator, stitch_app.cpp:202-221): strip gi's
                # uncommitted placements default to device gi % N, so
                # consecutive strips' device programs overlap across chips
                # while the host orchestrates. Store-resident frames stay
                # committed where they were ingested (computation follows
                # the committed data); results are placement-invariant —
                # tests/test_parallel.py asserts 1-dev == N-dev equality.
                # The device pin re-checks `mesh` on every attempt: after a
                # mid-run degrade (_on_degrade clears the mesh) the retry
                # must NOT re-enter the dead accelerator's context.
                from contextlib import nullcontext

                def _stitch_one(gi, g, imgs, tags):
                    if mesh is not None:
                        import jax
                        devs = list(mesh.devices.flat)
                        ctx = jax.default_device(devs[gi % len(devs)])
                    else:
                        ctx = nullcontext()
                    with ctx:
                        return stitch_strip(
                            imgs, strip_tuning, stage=f"Strip{gi}",
                            range_width_override=tuning.range_width,
                            image_tags=tags, mesh=mesh, store=store,
                            indices=list(g.indices), return_device=True)

                for gi, g in enumerate(groups):
                    imgs = (None if images is None
                            else [images[k] for k in g.indices])
                    tags = make_strip_tags(gi, g.ids)
                    with log.timer(f"Strip{gi}", "stitch"):
                        pano = run_stage_with_retry(
                            f"Strip{gi}",
                            lambda gi=gi, g=g, imgs=imgs, tags=tags:
                                _stitch_one(gi, g, imgs, tags),
                            on_degrade=_on_degrade)
                    if not isinstance(pano, DeviceStrip):
                        # host-array results (small canvases, sequential
                        # fallback) still need the host crop; DeviceStrip
                        # panoramas carry their device-computed bbox
                        with log.timer(f"Strip{gi}", "crop"):
                            pano = auto_crop_black_border(pano)
                    strip_panos.append(pano)
                    if cfg.save_strips:
                        # DeviceStrip.host() fetches on the WRITER thread:
                        # the strip download overlaps the next strip's
                        # device compute instead of serializing inside the
                        # stitch loop
                        writer.submit(
                            lambda path, p: _write_image(
                                path, p.host() if isinstance(p, DeviceStrip)
                                else p),
                            os.path.join(ckpt_dir, f"strip_{gi:02d}.jpg"),
                            pano)
                    elif isinstance(pano, DeviceStrip):
                        # no JPEG save: still prefetch the host copy in
                        # the background so a later device fault finds
                        # every strip recoverable (the degrade ladder
                        # must not depend on a live device)
                        writer.submit(lambda p: p.host() is not None, pano)
                writer.submit(
                    lambda: save_strip_checkpoint(
                        ckpt_dir, as_host_strips(strip_panos)))
                strips_done = strip_panos
            else:
                # single-group path (stitch_app.cpp:246-260)
                flat = (None if images is None
                        else [images[k] for g in groups for k in g.indices])
                flat_idx = [k for g in groups for k in g.indices]
                with log.timer("Main", "single-group stitch"):
                    pano = run_stage_with_retry(
                        "Single",
                        lambda: stitch_strip(
                            flat, tuning.replace(
                                sift_features=tuning.strip_sift_features),
                            stage="Single",
                            range_width_override=tuning.range_width,
                            mesh=mesh, store=store, indices=flat_idx),
                        on_degrade=_on_degrade)
                pano = auto_crop_black_border(pano)
                _write_image(cfg.output_path, pano)
                log.log("Main", "wrote", path=cfg.output_path)
                return 0

        if store is not None:
            store.clear()   # frames are done; free HBM for the global canvas

        sink = None
        if len(strips_done) == 1:
            panorama = strips_done[0]
            if isinstance(panorama, DeviceStrip):
                panorama = panorama.host()
        else:
            # global tuning overrides (stitch_app.cpp:227-239)
            global_tuning = tuning.replace(
                sift_features=tuning.global_sift_features,
                use_range_matcher=False,
                blend_bands=max(5, tuning.blend_bands))
            # stream the mosaic's finished row bands straight into an
            # incremental JPEG encode while later tiles blend (the final
            # encode of a 380 MP ortho is ~60-100 s of trailing host work
            # otherwise); falls back to crop+write below if unavailable
            from .utils.native import jpeg_encoder_available

            def _compose():
                # a retry needs a FRESH sink: the previous attempt may
                # have partially streamed into the output file
                nonlocal sink
                if sink is not None:
                    sink.abort()
                    sink = None
                if jpeg_encoder_available():
                    os.makedirs(cfg.output_dir, exist_ok=True)
                    sink = StreamedMosaicWriter(cfg.output_path)
                return stitch_inter_strips_custom(strips_done,
                                                  global_tuning,
                                                  mesh=mesh, row_sink=sink)

            with log.timer("Main", "global compose"):
                panorama = run_stage_with_retry("GlobalCustom", _compose,
                                                on_degrade=_on_degrade)

        if writer is not None:
            with log.timer("Main", "strip-save drain"):
                writer.join()
            writer = None
        if sink is not None and sink.done:
            log.log("Main", "wrote", path=cfg.output_path, streamed=True)
            return 0
        with log.timer("Main", "crop+write"):
            panorama = auto_crop_black_border(panorama)
            _write_image(cfg.output_path, panorama)
        log.log("Main", "wrote", path=cfg.output_path,
                h=panorama.shape[0], w=panorama.shape[1])
        return 0
    except Exception as err:  # top-level catch (stitch_app.cpp:265-268)
        log.log("Main", "FATAL", error=str(err))
        traceback.print_exc()
        return 1
