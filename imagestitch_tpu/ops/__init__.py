from imagestitch_tpu.ops.image import (
    rgb_to_gray,
    gaussian_kernel1d,
    gaussian_blur,
    sobel,
    resize,
    remap_bilinear,
    remap_nearest,
    dilate,
    erode,
    box_filter,
)
from imagestitch_tpu.ops.pyramid import build_pyramid, level_scale

__all__ = [
    "rgb_to_gray",
    "gaussian_kernel1d",
    "gaussian_blur",
    "sobel",
    "resize",
    "remap_bilinear",
    "remap_nearest",
    "dilate",
    "erode",
    "box_filter",
    "build_pyramid",
    "level_scale",
]
