from imagestitch_tpu.features.orb import detect_and_compute
from imagestitch_tpu.features.fast import fast_score_map, harris_map, nms3x3
from imagestitch_tpu.features.pattern import brief_pattern, ic_angle_offsets

__all__ = [
    "detect_and_compute",
    "fast_score_map",
    "harris_map",
    "nms3x3",
    "brief_pattern",
    "ic_angle_offsets",
]
