"""Pipeline driver: the canonical detect → match → estimate → adjust → warp
→ expose → seam → blend stage order of every reference main()
(SURVEY.md §1; e.g. ref 特征点检测.cpp:1023-1185), as

- `stitch_pair_core`: the FULLY-JITTED 2-image flagship path — one XLA
  program from two RGB arrays to the blended pano canvas (the reference runs
  7 separate CPU passes with host round-trips between every stage);
- `stitch` / `Stitcher`: the host-orchestrated N-image driver (general
  topology via the host MST estimator, per-stage jitted kernels, per-stage
  timers replacing the reference's clock() prints).

Outputs are (pano canvas, validity mask, corner) + a metrics dict; the host
wrappers crop to the valid bounding box and convert to uint8.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from imagestitch_tpu.config import PipelineConfig
from imagestitch_tpu.types import CameraParams, ImageFeatures, MatchesInfo
from imagestitch_tpu.ops.image import rgb_to_gray, dilate
from imagestitch_tpu.features import detect as detect_features
from imagestitch_tpu.matching.matcher import match_pair, match_all
from imagestitch_tpu.geometry.rotation import (
    estimate_cameras, estimate_cameras_host)
from imagestitch_tpu.geometry.bundle import bundle_adjust_ray, wave_correct
from imagestitch_tpu.warp.warper import warp_image, roi_bounds
from imagestitch_tpu.exposure.gain import gain_compensate
from imagestitch_tpu.seam.dp import dp_seam_pair
from imagestitch_tpu.seam.voronoi import voronoi_seam_pair
from imagestitch_tpu.blend.feather import feather_blend
from imagestitch_tpu.blend.multiband import multiband_blend
from imagestitch_tpu.blend.ramp import ramp_blend_pair
from imagestitch_tpu.utils.log import StageTimer


# ---------------------------------------------------------------------------
# shared stage helpers (jit-traceable)
# ---------------------------------------------------------------------------

def _pano_canvas_shape(hw: tuple[int, int], n_images: int,
                       cfg: PipelineConfig) -> tuple[int, int]:
    """Static pano canvas capacity for the jitted path."""
    H, W = hw
    w = int(round(W * (1.0 + (cfg.warp.canvas_scale_w - 1.0)
                       * max(n_images - 1, 1))))
    h = int(round(H * cfg.warp.canvas_scale_h))
    return h, w


def _seam_and_blend(images: jnp.ndarray, masks: jnp.ndarray,
                    cfg: PipelineConfig, src_w: int | None = None):
    """Pairwise seam resolution in chain order + blend, on shared-frame
    batched canvases (N, H, W, C) / (N, H, W). Mirrors the reference's
    seam_finder->find + mask dilation + blender feed/blend
    (ref 特征点检测.cpp:1128-1183). `src_w` (source image width) bounds the
    pairwise overlap width so the DP seam can run on a column window."""
    n = images.shape[0]
    max_w = None
    if src_w is not None:
        max_w = -(-int(round(1.3 * src_w)) // 128) * 128
    seam_masks = [masks[i] for i in range(n)]
    if cfg.seam.kind != "none":
        for i in range(n - 1):
            a, b = seam_masks[i], seam_masks[i + 1]
            if cfg.seam.kind == "voronoi":
                a2, b2 = voronoi_seam_pair(a, b)
            else:
                # "graphcut" is host-only (native maxflow; Stitcher handles
                # it before calling here) — inside jit it degrades to the DP
                # seam, its closest on-device equivalent
                use_grad = cfg.seam.kind == "dp_colorgrad"
                a2, b2, _ = dp_seam_pair(images[i], images[i + 1], a, b,
                                         use_grad, max_overlap_w=max_w)
            seam_masks[i], seam_masks[i + 1] = a2, b2

    if cfg.blend.kind == "ramp" and n == 2:
        out, valid, _ = ramp_blend_pair(images[0], images[1],
                                        masks[0], masks[1])
        return out, valid

    sm = jnp.stack(seam_masks)
    if cfg.blend.kind == "none":
        out = jnp.sum(images * sm[..., None], axis=0)
        return out, jnp.any(sm, axis=0)

    # dilate seam masks and clip by warped coverage (ref :1157-1173)
    k = cfg.seam.dilate_kernel
    if k > 1 and cfg.seam.kind != "none":
        sm = jax.vmap(lambda m: dilate(m.astype(jnp.float32), (k, k)))(sm)
        sm = (sm > 0.5) & masks
    if cfg.blend.kind == "multiband":
        return multiband_blend(images, sm, cfg.blend.num_bands)
    return feather_blend(images, sm, cfg.blend.feather_sharpness)


def _warp_all_shared(images: jnp.ndarray, cams: CameraParams, scale,
                     canvas_hw: tuple[int, int], cfg: PipelineConfig):
    """Warp N images into one shared pano frame whose corner is the union of
    all per-image ROI corners.
    Returns (warped (N,Hc,Wc,C), masks, corner, overflow).

    Every image warps DIRECTLY into the full shared canvas in one batched
    Pallas launch (grid = (N, rows, cols)): canvas tiles outside an image's
    ROI skip their slab DMA and accumulation, so the extra tiles cost only
    the map trig — cheaper than the round-1 design of per-image canvases +
    dynamic_update_slice pastes (which paid a full zero-canvas write and a
    copy per image, ~20 ms/stitch at 1080p) and free of its silent-clipping
    1.2x per-image width heuristic.

    `overflow` is True when any projected ROI (or the union) exceeds the
    static canvas capacity — content was clipped; surfaced in metrics.
    """
    n = images.shape[0]
    H, W = images.shape[1:3]
    Hc, Wc = canvas_hw
    Ks = cams.K()
    bounds = [roi_bounds(Ks[i], cams.R[i], scale, (H, W), cfg.warp.kind)
              for i in range(n)]
    u0 = jnp.min(jnp.stack([b[0] for b in bounds]))
    v0 = jnp.min(jnp.stack([b[1] for b in bounds]))
    u1 = jnp.max(jnp.stack([b[2] for b in bounds]))
    v1 = jnp.max(jnp.stack([b[3] for b in bounds]))
    corner = jnp.stack([jnp.floor(u0), jnp.floor(v0)]).astype(jnp.int32)
    overflow = ((jnp.ceil(u1) - jnp.floor(u0) + 1 > Wc)
                | (jnp.ceil(v1) - jnp.floor(v0) + 1 > Hc))

    use_pallas = (jax.default_backend() == "tpu"
                  and cfg.warp.kind in ("cylindrical", "spherical", "plane"))
    if use_pallas:
        from imagestitch_tpu.ops.pallas_warp import pallas_warp_batched
        from imagestitch_tpu.warp.projectors import _camera_mats
        k_rinvs = jnp.stack([_camera_mats(Ks[i], cams.R[i])[1]
                             for i in range(n)])
        roi_uvs = jnp.stack([jnp.stack(b) for b in bounds])
        corners = jnp.broadcast_to(corner, (n, 2))
        warped, masks = pallas_warp_batched(
            images, k_rinvs, scale, corners, roi_uvs, (Hc, Wc),
            cfg.warp.kind)
        return warped, masks, corner, overflow

    canvases, mask_list = [], []
    for i in range(n):
        r = warp_image(images[i], Ks[i], cams.R[i], scale, (Hc, Wc),
                       cfg.warp.kind, corner=corner, use_pallas=False)
        canvases.append(r.image)
        mask_list.append(r.mask)
    return jnp.stack(canvases), jnp.stack(mask_list), corner, overflow


# ---------------------------------------------------------------------------
# flagship: fully-jitted 2-image stitch
# ---------------------------------------------------------------------------

def stitch_pair_impl(img1: jnp.ndarray, img2: jnp.ndarray, key: jax.Array,
                     cfg: PipelineConfig = PipelineConfig()):
    """Two (H, W, 3) RGB float/uint8 arrays -> (pano canvas, valid, corner,
    metrics). One XLA program covering the reference's entire 7-stage
    pipeline (特征点检测.cpp:1023-1185). Unjitted implementation — jit via
    `stitch_pair_core`, vmap via parallel.batch."""
    H, W = img1.shape[:2]
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    # 1-2. features (ref :1034-1038)
    g1 = rgb_to_gray(img1)
    g2 = rgb_to_gray(img2)
    f1 = detect_features(g1, cfg.detector)
    f2 = detect_features(g2, cfg.detector)

    # 3. match + homography (ref :307-308 of the matching project)
    mi = match_pair(f1, f2, key, 0, 1, cfg.matcher, cfg.ransac)

    # 4. camera recovery over the 2-chain (ref 恢复相机内参数.cpp:313-321)
    sizes = jnp.asarray([[H, W], [H, W]], jnp.int32)
    cams = estimate_cameras(mi.H[None], mi.h_valid[None], sizes)

    # 5. bundle adjustment (stock BundleAdjusterRay in ref :1064-1067)
    if cfg.camera.ba_refine:
        src_pts = f1.xy[mi.pairs[:, 0]][None]
        dst_pts = f2.xy[mi.pairs[:, 1]][None]
        ptv = (mi.inliers & mi.valid)[None]
        cams = bundle_adjust_ray(
            cams, src_pts, dst_pts, ptv,
            jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
            (mi.confidence > cfg.camera.ba_conf_thresh)[None],
            cfg.camera.ba_iters)
    if cfg.camera.wave_correct:
        cams = cams.replace(R=wave_correct(cams.R))

    # 6. warp at scale = focal (ref :1093-1109, 圆柱面投影.cpp:222)
    scale = jnp.median(cams.focal)
    canvas_hw = _pano_canvas_shape((H, W), 2, cfg)
    imgs = jnp.stack([img1, img2])
    warped, masks, corner, overflow = _warp_all_shared(
        imgs, cams, scale, canvas_hw, cfg)

    # 7. exposure compensation (ref :1114-1121)
    if cfg.exposure.kind == "gain":
        zero_corners = jnp.zeros((2, 2), jnp.int32)
        _, warped = gain_compensate(warped, masks, zero_corners,
                                    shared_frame=True)

    # 8-10. seam + mask postprocess + blend (ref :1128-1183)
    pano, valid = _seam_and_blend(warped, masks, cfg, src_w=W)

    metrics = {
        "kpts1": f1.num_valid(), "kpts2": f2.num_valid(),
        "num_matches": mi.num_matches(), "num_inliers": mi.num_inliers,
        "confidence": mi.confidence, "focal": cams.focal[0],
        "h_valid": mi.h_valid, "canvas_overflow": overflow,
    }
    return pano, valid, corner, metrics


stitch_pair_core = jax.jit(stitch_pair_impl, static_argnames=("cfg",))


def _crop_valid(pano: np.ndarray, valid: np.ndarray):
    ys, xs = np.nonzero(valid)
    if len(ys) == 0:
        return pano[:1, :1], valid[:1, :1]
    y0, y1 = ys.min(), ys.max() + 1
    x0, x1 = xs.min(), xs.max() + 1
    return pano[y0:y1, x0:x1], valid[y0:y1, x0:x1]


def stitch_pair(img1, img2, config: PipelineConfig | None = None, seed: int = 0):
    """Host entry: two (H, W, 3) uint8 RGB arrays -> (pano uint8, metrics).

    The device work is one jitted program; the host only converts, crops to
    the valid bounding box, and collects metrics.
    """
    cfg = config or PipelineConfig()
    timer = StageTimer()
    with timer.stage("stitch_pair_total"):
        pano, valid, corner, metrics = stitch_pair_core(
            jnp.asarray(img1), jnp.asarray(img2), jax.random.key(seed), cfg)
        pano = np.asarray(pano)
        valid = np.asarray(valid)
    pano, valid = _crop_valid(pano, valid)
    out = np.clip(pano, 0, 255).astype(np.uint8)
    m = {k: np.asarray(v).item() for k, v in metrics.items()}
    m.update(timer.summary())
    return out, m


# ---------------------------------------------------------------------------
# general N-image driver (host-orchestrated, jitted stages)
# ---------------------------------------------------------------------------

class Stitcher:
    """N-image panorama stitcher with per-stage timers.

    Mirrors the reference driver loop (ref 特征点检测.cpp:1023-1185) but with
    general pair topology: all-pairs matching, confidence filtering
    (conf_thresh, ref BundleAdjuster conf=1), host MST rotation chaining,
    optional jitted ray bundle adjustment + wave correction, shared-frame
    warping, gain compensation, chained pairwise seams, and the configured
    blender.
    """

    def __init__(self, config: PipelineConfig | None = None):
        self.cfg = config or PipelineConfig()
        self._detect = jax.jit(functools.partial(
            detect_features, cfg=self.cfg.detector))
        self._match_all = jax.jit(functools.partial(
            match_all, cfg=self.cfg.matcher, rcfg=self.cfg.ransac))

    def stitch(self, images, seed: int = 0):
        """images: list/array of (H, W, 3) uint8 RGB (same size).
        Returns (pano uint8, metrics dict)."""
        cfg = self.cfg
        timer = StageTimer()
        imgs = jnp.asarray(np.stack(images), jnp.float32)
        n, H, W = imgs.shape[:3]
        if n == 1:
            return np.asarray(images[0]), {"n_images": 1}
        if n == 2:
            return stitch_pair(images[0], images[1], cfg, seed)

        with timer.stage("detect"):
            feats = jax.vmap(self._detect)(jax.vmap(rgb_to_gray)(imgs))
            jax.block_until_ready(feats.xy)

        with timer.stage("match"):
            ms = self._match_all(feats, jax.random.key(seed))
            jax.block_until_ready(ms.H)

        with timer.stage("cameras"):
            conf = np.asarray(ms.confidence)
            keep = conf > cfg.matcher.conf_thresh
            cams = estimate_cameras_host(
                np.asarray(ms.H), np.asarray(ms.src_idx),
                np.asarray(ms.dst_idx), np.asarray(ms.num_inliers),
                np.asarray(ms.h_valid) & keep,
                np.asarray([[H, W]] * n))

        if cfg.camera.ba_refine:
            with timer.stage("bundle_adjust"):
                src_pts = jax.vmap(lambda i, p: feats.xy[i][p[:, 0]])(
                    ms.src_idx, ms.pairs)
                dst_pts = jax.vmap(lambda j, p: feats.xy[j][p[:, 1]])(
                    ms.dst_idx, ms.pairs)
                cams = bundle_adjust_ray(
                    cams, src_pts, dst_pts, ms.inliers & ms.valid,
                    ms.src_idx, ms.dst_idx,
                    jnp.asarray(keep) & ms.h_valid, cfg.camera.ba_iters)
                jax.block_until_ready(cams.R)
        if cfg.camera.wave_correct:
            cams = cams.replace(R=wave_correct(cams.R))

        with timer.stage("warp"):
            scale = jnp.median(cams.focal)
            canvas_hw = _pano_canvas_shape((H, W), n, cfg)
            warped, masks, corner, overflow = _warp_all_shared(
                imgs, cams, scale, canvas_hw, cfg)
            jax.block_until_ready(warped)

        with timer.stage("exposure"):
            if cfg.exposure.kind == "gain":
                zero_corners = jnp.zeros((n, 2), jnp.int32)
                _, warped = gain_compensate(warped, masks, zero_corners,
                                            shared_frame=True)
                jax.block_until_ready(warped)

        with timer.stage("seam_blend"):
            if cfg.seam.kind == "graphcut":
                # host path: native BK maxflow per chained pair, then blend
                # with the already-resolved masks
                from imagestitch_tpu.seam.graphcut import graphcut_seam_pair
                w_np = np.asarray(warped)
                m_list = [np.asarray(masks[i]) for i in range(n)]
                for i in range(n - 1):
                    m_list[i], m_list[i + 1] = graphcut_seam_pair(
                        w_np[i], w_np[i + 1], m_list[i], m_list[i + 1])
                masks_cut = jnp.asarray(np.stack(m_list))
                cfg_rest = cfg.replace(seam=dataclasses.replace(
                    cfg.seam, kind="none"))
                pano, valid = _seam_and_blend(warped, masks_cut, cfg_rest,
                                              src_w=W)
            else:
                pano, valid = _seam_and_blend(warped, masks, cfg, src_w=W)
            pano = np.asarray(pano)
            valid = np.asarray(valid)

        pano, valid = _crop_valid(pano, valid)
        metrics = {
            "n_images": n,
            "focal": float(np.asarray(cams.focal[0])),
            "pair_confidences": conf.tolist(),
            "canvas_overflow": bool(np.asarray(overflow)),
        }
        metrics.update(timer.summary())
        return np.clip(pano, 0, 255).astype(np.uint8), metrics


def stitch(images, config: PipelineConfig | None = None, seed: int = 0):
    """Functional N-image entry point: `stitch(images) -> (pano, metrics)`."""
    return Stitcher(config).stitch(images, seed)
