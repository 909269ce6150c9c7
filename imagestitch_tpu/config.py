"""Frozen per-stage configuration dataclasses.

The reference keeps every tunable as a global or literal scattered through the
seven programs (SURVEY.md §5 "Config / flag system"); defaults here reproduce
those values:

- detector tunables: ref 特征点检测.cpp:39-55 (nfeatures=510, scaleFactor=1.3,
  nlevels=5, edgeThreshold=31, wta_k=2, patchSize=31, fastThreshold=20,
  grid 3x1)
- matcher: ref 特征点匹配.cpp:307 (match_conf=0.3, i.e. ratio d0 < (1-0.3)·d1)
- RANSAC: ref 计算单应性矩阵.cpp:695-698 (maxIters=2000 → fixed hypothesis
  batch here, confidence=0.995, reprojection threshold 3 px)
- feather sharpness: ref 特征点检测.cpp:1156 (5.0) / 恢复相机内参数.cpp:439 (0.1)
- seam-mask dilation kernel 20x20: ref 特征点检测.cpp:1164

All configs are frozen (hashable) so they can be passed as static arguments to
`jax.jit`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class DetectorConfig:
    """Feature detector configuration.

    kind="orb" is the reference's detector (ref 特征点检测.cpp:39-55);
    kind="sift" selects the DoG/SIFT-style float-descriptor detector
    (BASELINE.json north star; ref README.md:14-24 cites the SIFT papers).
    """

    kind: str = "orb"             # orb | sift
    nfeatures: int = 512          # max keypoints kept per grid cell (ref: 510)
    scale_factor: float = 1.3
    nlevels: int = 5
    edge_threshold: int = 31
    first_level: int = 0
    wta_k: int = 2                # 2|3|4 (ref :329-415); 3/4 = 2-bit codes
    # BRIEF sampling pattern for wta_k=2: "framework" = seeded-Gaussian
    # makeRandomPattern equivalent (self-consistent); "opencv" = OpenCV's
    # learned bit_pattern_31_ table (ref :448-706), making descriptors
    # bit-comparable with cv2.ORB's for differential tests
    pattern: str = "framework"    # framework | opencv
    patch_size: int = 31
    fast_threshold: int = 20
    harris_block_size: int = 7
    grid_rows: int = 1            # ref grid_size = 3 cols x 1 row
    grid_cols: int = 3
    # SIFT-path tunables (Lowe's defaults)
    sift_octaves: int = 4
    sift_scales: int = 3
    sift_sigma: float = 1.6
    # OpenCV contrastThreshold semantics (0..1 intensity units; the SIFT
    # module converts to its 0..255 DoG scale internally)
    sift_contrast_thresh: float = 0.04
    # capacity knobs (TPU static-shape design; not in the reference)
    max_keypoints: int = 1536     # total padded keypoint capacity per image
    per_level_overretain: float = 2.0  # FAST over-retention before Harris cull

    def __post_init__(self):
        assert self.wta_k in (2, 3, 4), "wta_k can be only 2, 3 or 4"
        assert self.kind in ("orb", "sift"), \
            f"unknown detector kind: {self.kind!r}"
        assert self.pattern in ("framework", "opencv"), \
            f"unknown BRIEF pattern: {self.pattern!r}"


@dataclass(frozen=True)
class MatcherConfig:
    """BestOf2Nearest matcher configuration (ref 特征点匹配.cpp:107-229)."""

    match_conf: float = 0.3       # ratio test: d0 < (1-match_conf)*d1
    num_matches_thresh1: int = 6  # min inliers to compute confidence
    num_matches_thresh2: int = 6  # min inliers to refit H on inliers
    max_matches: int = 512        # padded per-pair match capacity
    conf_thresh: float = 1.0      # pair kept if confidence > this (driver)
    # OpenCV BestOf2NearestRangeMatcher: only match pairs with
    # j - i <= range_width (ordered sequences; O(N*w) instead of O(N^2)
    # pair programs). <= 0 matches all pairs (BestOf2NearestMatcher).
    range_width: int = -1
    # Pair motion model: "homography" (BestOf2NearestMatcher — centered
    # coords, RANSAC H, inlier refit) or the SCANS family's
    # AffineBestOf2NearestMatcher: "affine_partial" (4-DoF similarity,
    # OpenCV full_affine=false — the cv2.Stitcher SCANS default) /
    # "affine" (6-DoF). Affine modes estimate on RAW keypoint coords in
    # one pass, exactly like OpenCV's affine matcher.
    motion: str = "homography"

    def __post_init__(self):
        motions = ("homography", "affine", "affine_partial")
        assert self.motion in motions, \
            f"unknown matcher motion: {self.motion!r}"


@dataclass(frozen=True)
class RansacConfig:
    """RANSAC homography configuration (ref 计算单应性矩阵.cpp:602-698).

    The reference runs an adaptive sequential loop of up to 2000 iterations;
    the TPU-native engine scores a fixed batch of hypotheses in parallel
    (one XLA dispatch) which strictly dominates the adaptive loop when
    num_hypotheses >= the adaptive count.
    """

    num_hypotheses: int = 2048
    reproj_threshold: float = 3.0
    confidence: float = 0.995
    lm_iters: int = 10            # ref LMSolverImpl1 maxIters=10 (:695)
    seed: int = 0x34985739        # deterministic per-pair folding, ref :71-75


@dataclass(frozen=True)
class CameraConfig:
    """Intrinsics recovery + bundle adjustment (ref 恢复相机内参数.cpp,
    stock BundleAdjusterRay at 特征点检测.cpp:1064-1067)."""

    ba_refine: bool = True
    ba_kind: str = "ray"          # ray (ref driver) | reproj (OpenCV alt)
    ba_iters: int = 25
    ba_conf_thresh: float = 1.0   # ref conf_thresh = 1
    wave_correct: bool = False    # present but commented out in ref (:1071-1077)
    wave_kind: str = "horiz"      # horiz | vert (OpenCV WAVE_CORRECT_*)


@dataclass(frozen=True)
class WarpConfig:
    """Rotation warper configuration (ref 圆柱面投影.cpp)."""

    # cylindrical|spherical|plane|fisheye|stereographic plus OpenCV's
    # extended family under cv2's own kind strings: mercator,
    # transverseMercator, compressedPlaneA2B1, compressedPlaneA1.5B1,
    # paniniA2B1, paniniA1.5B1 (warp/projectors.PROJECTORS is the registry)
    kind: str = "cylindrical"
    # static canvas capacity as a multiple of the input image size (the
    # jit-compiled pipeline warps into a fixed canvas; ROI offsets are
    # dynamic). Every downstream stage's cost scales with canvas area;
    # clipping is detected on device and surfaced as metrics
    # "canvas_overflow" (raise these scales if it fires)
    canvas_scale_w: float = 2.1
    canvas_scale_h: float = 1.35
    # Pallas warp kernel: per-slab-row horizontal rebase (tilt-factorized
    # shift window; see ops/pallas_warp._warp_kernel). MEASURED SLOWER on
    # TPU v5e at 2x1080p rotation geometry (26 ms vs 22 ms base — the
    # per-row dynamic roll costs more than the smaller shift rung saves;
    # bench.py A/B-times both every run), so the default stays off.
    row_rebase: bool = False

    def __post_init__(self):
        from imagestitch_tpu.warp.projectors import PROJECTORS
        assert self.kind in PROJECTORS, \
            f"unknown warp kind: {self.kind!r} (have {sorted(PROJECTORS)})"


@dataclass(frozen=True)
class ExposureConfig:
    """Gain exposure compensation (stock ExposureCompensator::GAIN,
    ref 特征点检测.cpp:1114-1121)."""

    # gain|gain_blocks|channels|channels_blocks|none — the channels kinds
    # are OpenCV's CHANNELS/CHANNELS_BLOCKS (per-color-channel gains)
    kind: str = "gain"
    block_size: int = 32          # *_blocks cell size (OpenCV default)

    def __post_init__(self):
        kinds = ("gain", "gain_blocks", "channels", "channels_blocks",
                 "none")
        assert self.kind in kinds, f"unknown exposure kind: {self.kind!r}"


@dataclass(frozen=True)
class SeamConfig:
    """Seam finder configuration (ref 动态规划....cpp; GraphCut COST_COLOR used
    in most reference mains, DP/Voronoi in project 6)."""

    # dp_color|dp_colorgrad|voronoi|graphcut|graphcut_colorgrad|none
    # (graphcut_colorgrad = OpenCV GraphCutSeamFinder COST_COLOR_GRAD)
    kind: str = "dp_color"
    dilate_kernel: int = 20       # ref 特征点检测.cpp:1164 (20x20 rect dilate)
    # DP seam orientation on the jitted fast path: "auto" dispatches per
    # pair via lax.cond from the relative displacement of the two masks
    # (horizontally-offset pair -> vertical dividing seam, vertically-
    # offset -> horizontal); "vertical"/"horizontal" pin it. Inside vmap a
    # lax.cond becomes compute-both-select, so the batched driver
    # (parallel.batch.stitch_pairs_batched) resolves "auto" to "vertical"
    # before tracing — pass an explicit orient for stacked batched pairs.
    orient: str = "auto"
    # on-device scan-DP resolution: the seam is found on a dp_scale-x
    # mean-pooled cost window and upscaled (left cell edge). Measured at
    # 2x1080p rotation (round 5, tools/profile_seam_blend.py + the
    # dp_scale sweep): the seam stage costs 11.4 / 10.6 / 4.3 ms at
    # scale 1 / 2 / 4, and the scale-2-vs-4 pano difference is mean
    # 0.007 intensity (p99 = 0) — the 20x20 dilate + blend absorb the
    # quantization entirely. 4 is still ~2x FINER than OpenCV
    # stitching_detailed's own default seam resolution (seam_megapix=0.1
    # ~= 0.13x linear scale at 1080p). Set 1 for exact full-resolution
    # scan seams.
    dp_scale: int = 4
    # full reference DpSeamFinder machinery (component labeling, conflict
    # resolution, seam tips, horizontal+vertical seams — ref 动态规划....cpp
    # :196-1093) on the host via native CCL, instead of the fast on-device
    # windowed scan DP. Applies to dp_color/dp_colorgrad kinds.
    full_components: bool = False
    # host-seam resolution scale (OpenCV stitching_detailed seam_megapix,
    # default 0.1 there): > 0 finds graphcut / full-components seams on
    # canvases downscaled to ~this many megapixels, then upscales the seam
    # masks (nearest) — the dilate+blend stage smooths the quantization.
    # <= 0 keeps full-resolution seams (this framework's default; the
    # on-device scan-DP fast path is unaffected either way).
    seam_megapix: float = -1.0

    def __post_init__(self):
        kinds = ("dp_color", "dp_colorgrad", "voronoi", "graphcut",
                 "graphcut_colorgrad", "none")
        assert self.kind in kinds, f"unknown seam kind: {self.kind!r}"
        assert self.dp_scale in (1, 2, 4), \
            f"dp_scale must be 1, 2 or 4, got {self.dp_scale!r}"


@dataclass(frozen=True)
class BlendConfig:
    """Blender configuration (ref FeatherBlender 特征点检测.cpp:1148-1156;
    MultiBandBlender commented at :1143-1144; custom ramp 图像融合.cpp)."""

    kind: str = "feather"         # feather|multiband|ramp|none
    feather_sharpness: float = 5.0
    num_bands: int = 5

    def __post_init__(self):
        kinds = ("feather", "multiband", "ramp", "none")
        assert self.kind in kinds, f"unknown blend kind: {self.kind!r}"


@dataclass(frozen=True)
class PipelineConfig:
    # "panorama": the reference's rotation model (focal recovery, rotation
    # chaining, rotation warpers). "scans": the cv2.Stitcher SCANS family —
    # affine pair motion (AffineBestOf2NearestMatcher), affine camera
    # chaining (AffineBasedEstimator), affine warp (AffineWarper ≡ the
    # plane projector with K=I, R=G, scale=1); no focal/BA/wave-correct.
    mode: str = "panorama"
    detector: DetectorConfig = DetectorConfig()
    matcher: MatcherConfig = MatcherConfig()
    ransac: RansacConfig = RansacConfig()
    camera: CameraConfig = CameraConfig()
    warp: WarpConfig = WarpConfig()
    exposure: ExposureConfig = ExposureConfig()
    seam: SeamConfig = SeamConfig()
    blend: BlendConfig = BlendConfig()
    # working scale: images are processed at full resolution by default
    work_megapix: float = -1.0
    # compositing scale (OpenCV stitching_detailed compose_megapix):
    # > 0 warps/seams/blends on inputs downscaled to ~this many megapixels
    # (registration still honors work_megapix); <= 0 composes at full
    # resolution. Host Stitcher path only.
    compose_megapix: float = -1.0
    # chain resilience: also match skip pairs i -> i+2 in stitch_chain and
    # bridge a broken consecutive link through them (costs ~2x matching in
    # the chain program; the host Stitcher's MST routes around weak pairs
    # by construction and does not need this)
    chain_splice: bool = False
    # final crop of the pano canvas: "bbox" (tight bounding box of valid
    # pixels — the reference writes the raw canvas) | "interior" (largest
    # all-valid axis-aligned rectangle, utils.crop — removes the irregular
    # warped borders entirely)
    crop: str = "bbox"

    def __post_init__(self):
        assert self.mode in ("panorama", "scans"), \
            f"unknown pipeline mode: {self.mode!r}"
        assert self.crop in ("bbox", "interior"), \
            f"unknown crop mode: {self.crop!r}"
        # affine pair motions produce RAW-coordinate transforms with last
        # row (0,0,1); the panorama camera/focal estimator consumes
        # CENTER-NORMALIZED homographies — mixing them silently corrupts
        # the focal (zero perspective terms). Affine motions require
        # mode="scans" (which also derives them, see _normalize_scans).
        assert not (self.mode == "panorama"
                    and self.matcher.motion != "homography"), \
            "matcher.motion %r requires PipelineConfig(mode='scans')" \
            % self.matcher.motion

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)
