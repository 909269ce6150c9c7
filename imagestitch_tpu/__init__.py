"""imagestitch_tpu — a TPU-native panoramic image-stitching framework.

Built from scratch in JAX (XLA / Pallas / pjit) with the capabilities of the
reference mhhai/ImageStitch (a seven-stage reconstruction of OpenCV's
stitching module; see SURVEY.md). Every stage is a pure, shape-static,
jit-compilable function over batched arrays:

  1. ORB feature detection        imagestitch_tpu.features
  2. pairwise descriptor matching imagestitch_tpu.matching
  3. RANSAC homography            imagestitch_tpu.geometry
  4. camera intrinsics recovery   imagestitch_tpu.geometry.rotation / bundle
  5. projection warping           imagestitch_tpu.warp
  6. seam finding                 imagestitch_tpu.seam
  7. exposure comp + blending     imagestitch_tpu.exposure / blend

High-level API: `imagestitch_tpu.stitch(images, config)`.
"""

__version__ = "0.2.0"

import jax as _jax

# Geometry numerics (DLT, LM, rotation chains) need true float32 matmuls;
# the TPU default is one-pass bfloat16, which loses ~3 decimal digits and
# breaks sub-pixel homography agreement. The one genuinely throughput-bound
# matmul (the descriptor-distance kernel in imagestitch_tpu.matching)
# explicitly opts back into bf16 MXU passes.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the full jitted pipeline is a large XLA
# program (minutes to compile at 1080p on a tunneled TPU); cache compiled
# executables across processes. Override with JAX_COMPILATION_CACHE_DIR.
import os as _os

_cache_dir = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..",
                  ".jax_cache"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the knobs — cache is best-effort
    pass

from imagestitch_tpu.config import (
    DetectorConfig,
    MatcherConfig,
    RansacConfig,
    CameraConfig,
    WarpConfig,
    SeamConfig,
    BlendConfig,
    ExposureConfig,
    PipelineConfig,
)
from imagestitch_tpu.types import ImageFeatures, MatchesInfo, CameraParams
from imagestitch_tpu.pipeline import (
    Stitcher, stitch, stitch_pair, stitch_chain)
from imagestitch_tpu.stream import StreamStitcher
from imagestitch_tpu.timelapse import Timelapser

__all__ = [
    "Timelapser",
    "DetectorConfig",
    "MatcherConfig",
    "RansacConfig",
    "CameraConfig",
    "WarpConfig",
    "SeamConfig",
    "BlendConfig",
    "ExposureConfig",
    "PipelineConfig",
    "ImageFeatures",
    "MatchesInfo",
    "CameraParams",
    "Stitcher",
    "stitch",
    "stitch_pair",
    "stitch_chain",
    "StreamStitcher",
    "__version__",
]
