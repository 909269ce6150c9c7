from imagestitch_tpu.warp.projectors import PROJECTORS
from imagestitch_tpu.warp.warper import WarpResult, warp_image, warp_point

__all__ = ["PROJECTORS", "WarpResult", "warp_image", "warp_point"]
