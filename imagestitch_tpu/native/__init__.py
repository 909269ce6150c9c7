from imagestitch_tpu.native.ccl import (
    connected_components,
    flood_fill,
    component_stats,
    have_native,
)

__all__ = ["connected_components", "flood_fill", "component_stats",
           "have_native"]
