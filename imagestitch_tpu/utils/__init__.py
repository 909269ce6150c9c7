from imagestitch_tpu.utils.io import (imread, imwrite, load_photo,
                                      photo_rotation_pair,
                                      photo_translation_pair, synthetic_pair,
                                      synthetic_sequence)
from imagestitch_tpu.utils.log import StageTimer, get_logger

__all__ = [
    "imread",
    "imwrite",
    "load_photo",
    "photo_rotation_pair",
    "photo_translation_pair",
    "synthetic_pair",
    "synthetic_sequence",
    "StageTimer",
    "get_logger",
]
