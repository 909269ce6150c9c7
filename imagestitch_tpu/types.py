"""Data contracts between pipeline stages, as JAX pytrees.

These mirror the `cv::detail` structs the reference passes between stages
(SURVEY.md §1: ImageFeatures, MatchesInfo, CameraParams; used at e.g.
ref 特征点检测.cpp:948, 特征点匹配.cpp:38-43, 恢复相机内参数.cpp:118-123) —
redesigned for TPU static shapes: every variable-length collection is a
fixed-capacity padded array plus a validity mask.
"""

from __future__ import annotations

from flax import struct
import jax.numpy as jnp


@struct.dataclass
class ImageFeatures:
    """Detected keypoints + descriptors for one image (padded to capacity K).

    Ref contract: `cv::detail::ImageFeatures {img_idx, img_size, keypoints,
    descriptors}` (特征点检测.cpp:948).
    """

    xy: jnp.ndarray          # (K, 2) float32 — keypoint (x, y) in image coords
    response: jnp.ndarray    # (K,)  float32 — Harris response
    angle: jnp.ndarray       # (K,)  float32 — IC orientation, radians
    size: jnp.ndarray        # (K,)  float32 — patch size * level scale
    level: jnp.ndarray       # (K,)  int32   — pyramid octave
    valid: jnp.ndarray       # (K,)  bool
    descriptors: jnp.ndarray  # (K, 256) uint8 in {0,1} — unpacked rBRIEF bits
    img_size: jnp.ndarray    # (2,) int32 — (height, width)

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


@struct.dataclass
class MatchesInfo:
    """Match set + homography for one ordered image pair (padded to M).

    Ref contract: `cv::detail::MatchesInfo {src_img_idx, dst_img_idx, matches,
    inliers_mask, num_inliers, H, confidence}` (特征点匹配.cpp:38-43).
    H maps src image points to dst image points.
    """

    src_idx: jnp.ndarray       # ()  int32
    dst_idx: jnp.ndarray       # ()  int32
    pairs: jnp.ndarray         # (M, 2) int32 — (query kp idx, train kp idx)
    distance: jnp.ndarray      # (M,) float32 — descriptor distance
    valid: jnp.ndarray         # (M,) bool    — match validity
    inliers: jnp.ndarray       # (M,) bool    — RANSAC inlier mask (⊆ valid)
    num_inliers: jnp.ndarray   # ()  int32
    H: jnp.ndarray             # (3, 3) float32
    h_valid: jnp.ndarray       # ()  bool — homography estimation succeeded
    confidence: jnp.ndarray    # ()  float32 — Brown–Lowe inliers/(8+0.3·matches)

    def num_matches(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))


@struct.dataclass
class CameraParams:
    """Per-camera intrinsics + rotation.

    Ref contract: `cv::detail::CameraParams {focal, aspect, ppx, ppy, R, t}`
    (恢复相机内参数.cpp:118-123). Batched over N cameras.
    """

    focal: jnp.ndarray   # (N,) float32
    aspect: jnp.ndarray  # (N,) float32
    ppx: jnp.ndarray     # (N,) float32
    ppy: jnp.ndarray     # (N,) float32
    R: jnp.ndarray       # (N, 3, 3) float32
    t: jnp.ndarray       # (N, 3) float32

    def K(self) -> jnp.ndarray:
        """Intrinsic matrices, (N, 3, 3) (ref 恢复相机内参数.cpp CameraParams::K)."""
        n = self.focal.shape[0]
        K = jnp.zeros((n, 3, 3), jnp.float32)
        K = K.at[:, 0, 0].set(self.focal)
        K = K.at[:, 0, 2].set(self.ppx)
        K = K.at[:, 1, 1].set(self.focal * self.aspect)
        K = K.at[:, 1, 2].set(self.ppy)
        K = K.at[:, 2, 2].set(1.0)
        return K
