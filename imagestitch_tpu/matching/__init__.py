from imagestitch_tpu.matching.hamming import (
    hamming_distance_matrix,
    l2_distance_matrix,
)
from imagestitch_tpu.matching.matcher import (
    match_pair,
    match_pair_descriptors,
    match_all,
)

__all__ = [
    "hamming_distance_matrix",
    "l2_distance_matrix",
    "match_pair",
    "match_pair_descriptors",
    "match_all",
]
