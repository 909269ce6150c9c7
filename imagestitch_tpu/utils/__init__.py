from imagestitch_tpu.utils.io import imread, imwrite, synthetic_pair, synthetic_sequence
from imagestitch_tpu.utils.log import StageTimer, get_logger

__all__ = [
    "imread",
    "imwrite",
    "synthetic_pair",
    "synthetic_sequence",
    "StageTimer",
    "get_logger",
]
