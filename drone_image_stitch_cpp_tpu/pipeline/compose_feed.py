"""Fused per-(frame, tile) compose feed: ONE dispatch per feed.

The compose stages (pipeline/strip.compose_strip, pipeline/global_
.stitch_inter_strips_custom) feed each frame's ROI into the shared canvas
pyramid. Naively that is ~7 device dispatches per (frame, tile) — 3 Pallas
channel warps + content-mask warp + gain/seam upsamples + the pyramid
feed — and on the remote-TPU relay each dispatch costs tens of ms, so a
20-frame strip's compose paid hundreds of round-trips.

This module traces the WHOLE feed as one jitted program (warp plan passed
as arrays, so different frames/tiles reuse one compile per shape bucket):
  warp img (3ch) + footprint -> optional block-gain modulation ->
  seam-mask upsample -> weight -> multiband pyramid accumulate.

Two weight modes mirror the two callers:
  * mode="strip": weight = seam * footprint(>=0.5), block-gain map
    (BlocksGainCompensator analog);
  * mode="global": weight = gaussian(sigma=10)-feathered seam mask inside
    the 0.999-footprint content mask (buildSoftBlendMask analog,
    reference: stitch_global.cpp:332-351,643-660).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import blend as B
from ..ops import pallas_warp as PW
from ..ops.color import nonblack_mask, yuv420_to_bgr
from ..ops.gaussian import gaussian_blur
from ..ops.warp import warp_affine as warp_xla
from ..ops.warp import warp_perspective

_SOFT_MASK_SIGMA = 10.0  # reference :345


def device_colocator():
    """(on_dev, drop_frame) for mesh-tiled composes.

    ``on_dev(key, arr, like)`` returns ``arr`` colocated with ``like``
    (the tiled compose places each tile's canvas on its own device;
    committed arrays must follow), caching one transfer per (key, device).
    ``drop_frame(i)`` evicts every cached entry whose key tags frame i —
    pair it with mb_compose_tiled's ``on_frame_retired`` so retired
    frames release their per-device copies. Shared by
    pipeline/strip.compose_strip and pipeline/global_ (identical inline
    copies previously drifted apart by hand).
    """
    cache: dict = {}

    def on_dev(key, arr, like):
        dev = next(iter(like.devices()))
        if next(iter(arr.devices())) == dev:
            return arr
        ck = (key, dev)
        if ck not in cache:
            cache[ck] = jax.device_put(arr, dev)
        return cache[ck]

    def drop_frame(i):
        for ck in [k for k in cache if k[0][1] == i]:
            del cache[ck]

    return on_dev, drop_frame


def _feed_body(cv, img, gain_m1, chan_gain, seam_mask, t23, h33, starts,
               params, tlx, tly, gx, gy, inv_seam, *, rh: int, rw: int,
               ny: int, nx: int, ph: int, pw: int, use_pallas: bool,
               has_gain: bool, persp: bool, mode: str):
    # frames/strips stay device-resident as uint8 (4x less HBM — ten 4K
    # strip panoramas as f32 alone exceed a v5e's memory); convert here.
    # 2-D inputs are the FrameStore's packed I420 wire format (H*3/2, W):
    # the YCbCr->BGR conversion fuses into this program
    img32 = (yuv420_to_bgr(img) if img.ndim == 2
             else img.astype(jnp.float32))
    h, w = img32.shape[0], img32.shape[1]
    if persp:
        wimg = warp_perspective(img32, h33, rh, rw)
        content = (nonblack_mask(img32, 2.0).astype(jnp.float32)
                   if mode == "global"
                   else jnp.ones((h, w), jnp.float32))
        cm = warp_perspective(content, h33, rh, rw)
        cthresh = 0.999 if mode == "global" else 0.5
    elif use_pallas:
        imgp = jnp.pad(img32, ((0, ph - h), (0, pw - w), (0, 0)))
        wimg = jnp.stack(
            [PW._run(imgp[..., c], starts, params, rh, rw, ny, nx)
             for c in range(3)], axis=-1)
        content = (nonblack_mask(img32, 2.0).astype(jnp.float32)
                   if mode == "global"
                   else jnp.ones((h, w), jnp.float32))
        cm = PW._run(jnp.pad(content, ((0, ph - h), (0, pw - w))),
                     starts, params, rh, rw, ny, nx)
        cthresh = 0.999 if mode == "global" else 0.5
    else:
        wimg = warp_xla(img32, t23, rh, rw)
        content = (nonblack_mask(img32, 2.0).astype(jnp.float32)
                   if mode == "global"
                   else jnp.ones((h, w), jnp.float32))
        cm = warp_xla(content, t23, rh, rw)
        cthresh = 0.999 if mode == "global" else 0.5
    cmask = cm >= cthresh
    # per-channel gain applied AFTER the warp: bilinear warping is linear,
    # so gain-then-warp == warp-then-gain exactly, and the uint8 source
    # stays gain-free in HBM (reference: applyChannelGainInPlace,
    # stitch_global.cpp:558-571)
    wimg = wimg * chan_gain

    def upsample(m):
        # axis-aligned scale+translate == two 1-D bilinear-hat matmuls
        # (identical samples/border-zeros to the gather warp of
        #  [[inv_seam,0,-gx],[0,inv_seam,-gy]], but MXU work instead of
        #  gathers — the gather lowering cost ~0.4 s per 10 MP tile window)
        m32 = m.astype(jnp.float32)
        gh, gw = m32.shape
        hp = jax.lax.Precision.HIGHEST

        def hat(n_out, n_src, off):
            src = (jnp.arange(n_out, dtype=jnp.float32) + off) / inv_seam
            k = jnp.arange(n_src, dtype=jnp.float32)
            return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - k[None, :]))

        t = jnp.dot(m32, hat(rw, gw, gx).T, precision=hp)    # (gh, rw)
        return jnp.dot(hat(rh, gh, gy), t, precision=hp)     # (rh, rw)

    if has_gain:
        wimg = wimg * (1.0 + upsample(gain_m1))[..., None]
    sroi = upsample(seam_mask)
    if mode == "global":
        weight = jnp.where(cmask, gaussian_blur(sroi, _SOFT_MASK_SIGMA),
                           0.0)
    else:
        weight = sroi * cmask.astype(jnp.float32)
    return B.mb_feed(cv, wimg, weight, tlx, tly, cmask)


_feed_prog = functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("rh", "rw", "ny", "nx", "ph", "pw", "use_pallas",
                     "has_gain", "persp", "mode"))(_feed_body)


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("k", "rh", "rw", "ny", "nx", "ph", "pw",
                     "use_pallas", "has_gain", "persp", "mode"))
def _feed_many_prog(cv, imgs, gain_m1s, chan_gains, seam_masks, t23s,
                    h33s, startss, paramss, tlxs, tlys, gxs, gys,
                    inv_seam, *, k: int, rh: int, rw: int, ny: int,
                    nx: int, ph: int, pw: int, use_pallas: bool,
                    has_gain: bool, persp: bool, mode: str):
    """Feed ``k`` frames into the canvas pyramid as ONE program.

    Per-(frame, tile) dispatches cost ~200-300 ms of relay round-trip
    each (a 20-frame strip's tiled blend ran ~41 of them); a fori_loop
    over the stacked per-frame inputs pays that once per TILE. All frames
    of one call share the window bucket and fast-path flags — callers
    group by those (pipeline/strip.py, pipeline/global_.py).
    """

    def body(i, cv):
        return _feed_body(
            cv, imgs[i], gain_m1s[i], chan_gains[i], seam_masks[i],
            t23s[i], h33s[i], startss[i], paramss[i], tlxs[i], tlys[i],
            gxs[i], gys[i], inv_seam, rh=rh, rw=rw, ny=ny, nx=nx, ph=ph,
            pw=pw, use_pallas=use_pallas, has_gain=has_gain, persp=persp,
            mode=mode)

    return jax.lax.fori_loop(0, k, body, cv)


_ZERO1 = np.zeros((8, 8), np.float32)


def feed_frames_grouped(cv, entries, seam_scale: float, mode: str):
    """Feed several frames into ``cv`` with as few dispatches as possible.

    ``entries``: list of dicts with keys ``img`` (device (H, W, 3) u8/f32,
    same shape across entries), ``seam_mask``, ``t_full`` (host (2, 3)),
    ``tlx``/``tly``/``gx``/``gy``, ``rh``/``rw`` (window bucket), optional
    ``gain_m1``/``chan_gain``/``h33``, ``persp``. Entries sharing
    (rh, rw, persp, pallas-ability, has-gain) fuse into one
    _feed_many_prog dispatch; singletons use the per-frame program.
    """
    on_tpu = jax.default_backend() == "tpu"
    groups: dict = {}
    for e in entries:
        use_pallas = (not e.get("persp", False)
                      and (on_tpu or PW._INTERPRET)
                      and PW.pallas_warp_supported(e["t_full"]))
        key = (e["rh"], e["rw"], bool(e.get("persp", False)), use_pallas,
               e.get("gain_m1") is not None)
        groups.setdefault(key, []).append(e)
    for (rh, rw, persp, use_pallas, has_gain), es in groups.items():
        if len(es) == 1:
            e = es[0]
            cv = feed_frame(cv, e["img"], e["seam_mask"], e["t_full"],
                            e["tlx"], e["tly"], e["gx"], e["gy"],
                            seam_scale, rh, rw, mode,
                            gain_m1=e.get("gain_m1"),
                            chan_gain=e.get("chan_gain"), persp=persp,
                            h33=e.get("h33"))
            continue
        k = len(es)
        h = int(es[0]["img"].shape[0])
        w = int(es[0]["img"].shape[1])
        if es[0]["img"].ndim == 2:     # packed I420: logical frame dims
            h = h * 2 // 3
        if use_pallas:
            plans = [PW.warp_plan(e["t_full"], rh, rw, h, w) for e in es]
            startss = jnp.asarray(np.stack([p[0] for p in plans]))
            paramss = jnp.asarray(np.stack([p[1] for p in plans]))
            _, _, ny, nx, ph, pw = plans[0]
        else:
            startss = jnp.zeros((k, 1, 4), jnp.int32)
            paramss = jnp.zeros((k, 8), jnp.float32)
            ny = nx = 1
            ph, pw = h, w
        t23s = jnp.asarray(np.stack([np.asarray(e["t_full"], np.float32)
                                     for e in es]))
        h33s = jnp.asarray(np.stack(
            [np.asarray(e["h33"], np.float32) if e.get("h33") is not None
             else np.eye(3, dtype=np.float32) for e in es]))
        gain_m1s = (jnp.stack([e["gain_m1"] for e in es]) if has_gain
                    else jnp.zeros((k, 8, 8), jnp.float32))
        chan_gains = jnp.asarray(np.stack(
            [np.asarray(e["chan_gain"], np.float32)
             if e.get("chan_gain") is not None
             else np.ones(3, np.float32) for e in es]))
        cv = _feed_many_prog(
            cv, jnp.stack([e["img"] for e in es]),
            gain_m1s, chan_gains,
            jnp.stack([e["seam_mask"] for e in es]),
            t23s, h33s, startss, paramss,
            jnp.asarray([e["tlx"] for e in es], jnp.int32),
            jnp.asarray([e["tly"] for e in es], jnp.int32),
            jnp.asarray([e["gx"] for e in es], jnp.float32),
            jnp.asarray([e["gy"] for e in es], jnp.float32),
            jnp.float32(1.0 / max(seam_scale, 1e-12)),
            k=k, rh=rh, rw=rw, ny=ny, nx=nx, ph=ph, pw=pw,
            use_pallas=use_pallas, has_gain=has_gain, persp=persp,
            mode=mode)
    return cv


def feed_frame(cv, img, seam_mask, t_full: np.ndarray, tlx: int,
               tly: int, gx: float, gy: float, seam_scale: float,
               rh: int, rw: int, mode: str, gain_m1=None,
               chan_gain=None, persp: bool = False,
               h33: np.ndarray | None = None):
    """One-dispatch feed of a frame ROI into ``cv`` (see module doc).

    ``img``: (H, W, 3) uint8 or float32 device frame; ``t_full``: host
    (2, 3) frame->ROI affine (values known -> the Pallas fast-path plan is
    computed here and shipped as arrays); ``gain_m1``: optional (gh, gw)
    block-gain-minus-1 map at seam scale; ``chan_gain``: optional (3,)
    per-channel gain; ``persp`` routes through the perspective kernel
    with host ``h33``.
    """
    h, w = int(img.shape[0]), int(img.shape[1])
    if img.ndim == 2:                  # packed I420: logical frame dims
        h = h * 2 // 3
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = (not persp and (on_tpu or PW._INTERPRET)
                  and PW.pallas_warp_supported(t_full))
    if use_pallas:
        starts, params, ny, nx, ph, pw = PW.warp_plan(t_full, rh, rw, h, w)
        starts = jnp.asarray(starts)
        params = jnp.asarray(params)
    else:
        starts = jnp.zeros((1, 4), jnp.int32)
        params = jnp.zeros((8,), jnp.float32)
        ny = nx = 1
        ph, pw = h, w
    if chan_gain is None:
        chan_gain = np.ones(3, np.float32)
    return _feed_prog(
        cv, img,
        gain_m1 if gain_m1 is not None else jnp.asarray(_ZERO1),
        jnp.asarray(chan_gain, jnp.float32),
        seam_mask, jnp.asarray(t_full),
        jnp.asarray(h33 if h33 is not None else np.eye(3, dtype=np.float32)),
        starts, params, tlx, tly, jnp.float32(gx), jnp.float32(gy),
        jnp.float32(1.0 / max(seam_scale, 1e-12)),
        rh=rh, rw=rw, ny=ny, nx=nx, ph=ph, pw=pw, use_pallas=use_pallas,
        has_gain=gain_m1 is not None, persp=persp, mode=mode)
