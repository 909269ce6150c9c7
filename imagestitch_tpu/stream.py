"""Video / streaming stitcher: calibrate once, compose every frame.

The reference re-registers from scratch on every run (each main() is a
one-shot program). For video from a fixed rig the registration (detect →
match → cameras → seam layout) is constant across frames; only the pixel
content changes. `StreamStitcher` splits the pipeline accordingly:

- `calibrate(frames)`: runs the full registration on one frame set and
  caches cameras, the warp scale, the canvas geometry, and the RESOLVED
  seam masks.
- `compose(frames)`: warps the new frames with the cached cameras, applies
  exposure compensation, and blends with the cached seam masks — ONE jitted
  XLA program per frame set (the compiled executable is reused across
  frames: shapes and the config are static).

This is the TPU-native answer to the ROADMAP "video/stream API" item: the
per-frame cost is the composite path only (warp + gain + blend), which is
also the portion that batches across a video's frames via parallel.batch.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from imagestitch_tpu.config import PipelineConfig
from imagestitch_tpu.pipeline import (
    Stitcher, _apply_exposure, _batched_detect, _blend_resolved, _crop_valid,
    _host_seam_masks, _jitted_match_all, _needs_host_seam,
    _pano_canvas_shape, _seam_and_blend, _warp_all_shared, _work_scale,
    _upscale_cameras, blend_resolved)
from imagestitch_tpu.ops.image import rgb_to_gray
from imagestitch_tpu.geometry.rotation import estimate_cameras_host
from imagestitch_tpu.geometry.bundle import bundle_adjust, wave_correct
from imagestitch_tpu.seam.dp import dp_seam_pair
from imagestitch_tpu.seam.voronoi import voronoi_seam_pair


def _compose_impl(imgs, cams, scale, seam_masks, cfg, canvas_hw):
    """Jit-traceable per-frame composite: warp → exposure → blend with
    frozen registration."""
    warped, masks, corner, overflow, _ = _warp_all_shared(
        imgs, cams, scale, canvas_hw, cfg)
    warped = _apply_exposure(warped, masks, cfg)
    pano, valid = _blend_resolved(warped, seam_masks, masks, cfg)
    return pano, valid, corner


_compose_jit = jax.jit(_compose_impl, static_argnames=("cfg", "canvas_hw"))


class StreamStitcher:
    """Fixed-rig video stitcher: `calibrate` once, `compose` per frame."""

    def __init__(self, config: PipelineConfig | None = None):
        from imagestitch_tpu.pipeline import _normalize_scans
        self.cfg = _normalize_scans(config or PipelineConfig())
        self._cams = None
        self._scale = None
        self._seam_masks = None
        self._canvas_hw = None
        self._compose = _compose_jit

    def calibrate(self, images, seed: int = 0):
        """Full registration on one frame set; caches cameras + seam masks.
        Returns the calibration pano (uint8) and metrics."""
        cfg = self.cfg
        imgs = jnp.asarray(np.stack(images), jnp.float32)
        n, H, W = imgs.shape[:3]
        ws = _work_scale(cfg, (H, W))
        Hw = max(int(round(H * ws)), 1)
        Ww = max(int(round(W * ws)), 1)

        grays = jax.vmap(rgb_to_gray)(imgs)
        if ws < 1.0:
            from imagestitch_tpu.ops.pyramid import resize_linear_mxu
            grays = jax.vmap(lambda g: resize_linear_mxu(g, (Hw, Ww)))(grays)
        feats = _batched_detect(cfg.detector)(grays)
        ms = _jitted_match_all(cfg.matcher, cfg.ransac)(
            feats, jax.random.key(seed))
        conf = np.asarray(ms.confidence)
        keep = conf > cfg.matcher.conf_thresh
        if cfg.mode == "scans":
            from imagestitch_tpu.pipeline import _scans_cameras
            cams, _, reachable = _scans_cameras(ms, feats, keep, n, cfg, ws)
            self._reachable = jnp.asarray(reachable)
        else:
            cams, _, reachable = estimate_cameras_host(
                np.asarray(ms.H), np.asarray(ms.src_idx),
                np.asarray(ms.dst_idx), np.asarray(ms.num_inliers),
                np.asarray(ms.h_valid) & keep,
                np.asarray([[Hw, Ww]] * n), return_tree=True)
            self._reachable = jnp.asarray(reachable)
            if cfg.camera.ba_refine:
                src_pts = jax.vmap(lambda i, p: feats.xy[i][p[:, 0]])(
                    ms.src_idx, ms.pairs)
                dst_pts = jax.vmap(lambda j, p: feats.xy[j][p[:, 1]])(
                    ms.dst_idx, ms.pairs)
                cams = bundle_adjust(
                    cams, src_pts, dst_pts, ms.inliers & ms.valid,
                    ms.src_idx, ms.dst_idx, jnp.asarray(keep) & ms.h_valid,
                    cfg.camera.ba_iters, cfg.camera.ba_kind)
            if cfg.camera.wave_correct:
                cams = cams.replace(
                    R=wave_correct(cams.R, cfg.camera.wave_kind))
            if ws < 1.0:
                cams = _upscale_cameras(cams, 1.0 / ws)

        self._cams = jax.tree.map(jnp.asarray, cams)
        self._scale = jnp.median(cams.focal)
        self._canvas_hw = _pano_canvas_shape((H, W), n, cfg)

        warped, masks, corner, _, _ = _warp_all_shared(
            imgs, self._cams, self._scale, self._canvas_hw, cfg)
        # exclude images outside the largest match component (they sit at
        # identity R); the frozen seam masks then exclude them from every
        # subsequent compose() as well
        masks = masks & self._reachable[:, None, None]
        warped = _apply_exposure(warped, masks, cfg)
        if _needs_host_seam(cfg):
            sm = jnp.asarray(_host_seam_masks(
                np.asarray(warped), np.asarray(masks), cfg))
        else:
            sm_list = [masks[i] for i in range(n)]
            if cfg.seam.kind != "none":
                for i in range(n - 1):
                    a, b = sm_list[i], sm_list[i + 1]
                    if cfg.seam.kind == "voronoi":
                        a2, b2 = voronoi_seam_pair(a, b)
                    else:
                        a2, b2, _ = dp_seam_pair(
                            warped[i], warped[i + 1], a, b,
                            cfg.seam.kind == "dp_colorgrad",
                            orient=cfg.seam.orient,
                            scale=cfg.seam.dp_scale)
                    sm_list[i], sm_list[i + 1] = a2, b2
            sm = jnp.stack(sm_list)
        self._seam_masks = sm

        pano, valid = _blend_resolved(warped, sm, masks, cfg)
        pano, valid = _crop_valid(np.asarray(pano), np.asarray(valid))
        metrics = {"n_images": n,
                   "pair_confidences": conf.tolist(),
                   "focal": float(np.asarray(cams.focal[0]))}
        return np.clip(pano, 0, 255).astype(np.uint8), metrics

    def compose(self, images):
        """Stitch a new frame set with the cached registration: one jitted
        dispatch (compiled once; reused every frame)."""
        if self._cams is None:
            raise RuntimeError("call calibrate() before compose()")
        imgs = jnp.asarray(np.stack(images), jnp.float32)
        pano, valid, corner = self._compose(
            imgs, self._cams, self._scale, self._seam_masks,
            self.cfg, self._canvas_hw)
        pano, valid = _crop_valid(np.asarray(pano), np.asarray(valid))
        return np.clip(pano, 0, 255).astype(np.uint8)
