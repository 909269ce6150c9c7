from imagestitch_tpu.seam.distance import l1_distance_transform
from imagestitch_tpu.seam.voronoi import voronoi_seam_pair
from imagestitch_tpu.seam.graphcut import graphcut_seam_pair
from imagestitch_tpu.seam.dp import (
    dp_seam_pair,
    dp_seam_path,
    seam_costs,
    ramp_weights,
    overlap_extents,
)

__all__ = [
    "l1_distance_transform",
    "voronoi_seam_pair",
    "graphcut_seam_pair",
    "dp_seam_pair",
    "dp_seam_path",
    "seam_costs",
    "ramp_weights",
    "overlap_extents",
]
