from imagestitch_tpu.geometry.homography import (
    dlt_homography,
    solve_h4p,
    reproj_error_sq,
    lm_refine_homography,
    apply_homography,
)
from imagestitch_tpu.geometry.ransac import find_homography, RansacResult
from imagestitch_tpu.geometry.autocalib import focals_from_homography, estimate_focal
from imagestitch_tpu.geometry.rotation import (
    max_spanning_tree,
    estimate_cameras,
    estimate_cameras_host,
)
from imagestitch_tpu.geometry.bundle import (
    bundle_adjust, bundle_adjust_ray, bundle_adjust_reproj, wave_correct)

__all__ = [
    "dlt_homography",
    "solve_h4p",
    "reproj_error_sq",
    "lm_refine_homography",
    "apply_homography",
    "find_homography",
    "RansacResult",
    "focals_from_homography",
    "estimate_focal",
    "max_spanning_tree",
    "estimate_cameras",
    "estimate_cameras_host",
    "bundle_adjust",
    "bundle_adjust_ray",
    "bundle_adjust_reproj",
    "wave_correct",
]
