from imagestitch_tpu.exposure.gain import gain_compensate

__all__ = ["gain_compensate"]
