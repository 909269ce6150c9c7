"""Batched-hypothesis RANSAC homography engine.

TPU-native replacement for the reference's sequential adaptive RANSAC loop
(ref 计算单应性矩阵.cpp RANSACPointSetRegistrator1::run :139-248 with
getSubset :88-134, checkSubset :253-288, findInliers :67-85 and the adaptive
RANSACUpdateNumIters1 :39-58):

- A fixed batch of `num_hypotheses` minimal samples is drawn with a keyed
  PRNG (deterministic per pair, reproducing the reference's per-pair RNG
  reseeding idea at 特征点匹配.cpp:71-75) and solved/scored in ONE dispatch:
  vmapped 4-point solves + an (B, N) reprojection-error matrix. With
  B >= the adaptive iteration bound (2000 in the reference) this strictly
  dominates the sequential loop.
- Duplicate-index and degenerate (collinear / orientation-inconsistent)
  samples are rejected by masking their scores, which also sidesteps the
  reference's dropped-runKernel transcription bug (ref :186-204).
- The winner is refit on its inliers with the normalized DLT and polished by
  analytic-Jacobian LM (ref :657-673), matching findHomography2's RANSAC +
  refine path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from imagestitch_tpu.config import RansacConfig
from imagestitch_tpu.parallel.mesh import shard_hint
from imagestitch_tpu.geometry.homography import (
    dlt_homography,
    lm_refine_homography,
    reproj_error_sq,
    solve_h4p,
)


@struct.dataclass
class RansacResult:
    H: jnp.ndarray            # (3, 3) float32
    inliers: jnp.ndarray      # (N,) bool
    num_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray           # () bool


def _triple_areas(p: jnp.ndarray) -> jnp.ndarray:
    """Signed twice-areas of the 4 triples of a 4-point subset, (4,)."""
    idx = jnp.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    a = p[idx[:, 0]]
    b = p[idx[:, 1]]
    c = p[idx[:, 2]]
    return ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
            - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))


def _check_subset(src4: jnp.ndarray, dst4: jnp.ndarray,
                  idx4: jnp.ndarray) -> jnp.ndarray:
    """Degenerate-sample rejection (ref checkSubset :253-288): no repeated
    indices, no (near-)collinear triple in either set, and the Márquez-Neila
    orientation constraint — corresponding triples keep a consistent
    orientation sign across the pair."""
    # distinct indices (the reference's getSubset guarantees this by
    # construction; we sample with replacement and reject)
    d = idx4[:, None] == idx4[None, :]
    distinct = jnp.sum(d.astype(jnp.int32)) == 4

    a_src = _triple_areas(src4)
    a_dst = _triple_areas(dst4)
    # relative collinearity threshold as in the reference (eps scaled by
    # the span of the points)
    span_s = jnp.maximum(jnp.max(jnp.abs(src4)), 1.0)
    span_d = jnp.maximum(jnp.max(jnp.abs(dst4)), 1.0)
    noncol = (jnp.all(jnp.abs(a_src) > 1e-5 * span_s * span_s)
              & jnp.all(jnp.abs(a_dst) > 1e-5 * span_d * span_d))

    prod = jnp.sign(a_src) * jnp.sign(a_dst)
    orient = jnp.all(prod > 0) | jnp.all(prod < 0)
    return distinct & noncol & orient


def find_homography(src: jnp.ndarray, dst: jnp.ndarray, mask: jnp.ndarray,
                    key: jax.Array, cfg: RansacConfig = RansacConfig()
                    ) -> RansacResult:
    """RANSAC + DLT refit + LM polish over a masked correspondence set.

    src, dst: (N, 2) float32 padded point sets; mask: (N,) bool.
    Equivalent entry point to ref findHomography1 (:695, maxIters=2000,
    conf=0.995, threshold 3). Fully jittable; deterministic given `key`.
    """
    N = src.shape[0]
    B = cfg.num_hypotheses
    m = mask.astype(jnp.float32)
    nvalid = jnp.sum(m).astype(jnp.int32)

    # compact valid indices to the front (stable)
    order = jnp.argsort(jnp.logical_not(mask), stable=True)

    # draw B x 4 indices over the valid prefix; the hypothesis batch shards
    # over the "model" mesh axis when one is active (parallel.mesh) — XLA
    # turns the final argmax into an ICI collective
    u = jax.random.uniform(key, (B, 4))
    u = shard_hint(u, "model", 0)
    raw = jnp.floor(u * jnp.maximum(nvalid, 1).astype(jnp.float32))
    raw = jnp.clip(raw.astype(jnp.int32), 0, jnp.maximum(nvalid - 1, 0))
    idx = order[raw]                                   # (B, 4) into src/dst

    src4 = src[idx]                                    # (B, 4, 2)
    dst4 = dst[idx]

    good = jax.vmap(_check_subset)(src4, dst4, idx)    # (B,)
    Hs, ok_solve = jax.vmap(solve_h4p)(src4, dst4)     # (B, 3, 3), (B,)
    hyp_ok = good & ok_solve & (nvalid >= 4)

    thresh2 = jnp.float32(cfg.reproj_threshold ** 2)
    errs = jax.vmap(reproj_error_sq, in_axes=(0, None, None))(Hs, src, dst)
    inl = (errs <= thresh2) & mask[None, :]            # (B, N)
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    counts = jnp.where(hyp_ok, counts, -1)

    best = jnp.argmax(counts)
    H_best = Hs[best]
    best_count = counts[best]
    inliers0 = inl[best]

    # refit on the winning inlier set with the normalized DLT (ref :657-668)
    H_fit, fit_ok = dlt_homography(src, dst, inliers0)
    H_fit = jnp.where(fit_ok, H_fit, H_best)
    # LM polish (ref :670-673, LMSolverImpl1 10 iters)
    H_ref = lm_refine_homography(H_fit, src, dst, inliers0, cfg.lm_iters)
    # final inlier set under the refined model
    err_f = reproj_error_sq(H_ref, src, dst)
    inliers = (err_f <= thresh2) & mask
    num = jnp.sum(inliers.astype(jnp.int32))

    ok = (best_count >= 4) & (num >= 4) & jnp.all(jnp.isfinite(H_ref))
    H_out = jnp.where(ok, H_ref, jnp.eye(3, dtype=jnp.float32))
    return RansacResult(H=H_out, inliers=inliers,
                        num_inliers=num.astype(jnp.int32), ok=ok)
