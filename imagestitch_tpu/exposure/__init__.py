from imagestitch_tpu.exposure.gain import (
    gain_compensate, gain_compensate_blocks,
    channels_compensate, channels_compensate_blocks)

__all__ = ["gain_compensate", "gain_compensate_blocks",
           "channels_compensate", "channels_compensate_blocks"]
