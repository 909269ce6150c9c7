"""Multi-band (Laplacian pyramid) blender.

Equivalent of OpenCV's MultiBandBlender, present-but-commented in the
reference drivers (ref 特征点检测.cpp:1143-1144, 恢复相机内参数.cpp:430-432,
num_bands=5): blend each Laplacian band of the inputs with the Gaussian-
smoothed weight pyramid and collapse. Canvas dims are padded statically to a
multiple of 2^bands; pyramids use a 5-tap Gaussian and jax.image resizes —
each band is a fused conv + resample on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imagestitch_tpu.ops.image import gaussian_blur

WEIGHT_EPS = 1e-5


def _down(x):
    h, w = x.shape[:2]
    g = gaussian_blur(x, 5, 1.0)
    return jax.image.resize(g, (h // 2, w // 2) + x.shape[2:], "linear")


def _up(x, hw):
    return jax.image.resize(x, hw + x.shape[2:], "linear")


def _pad_to(x, H, W):
    return jnp.pad(x, ((0, H - x.shape[0]), (0, W - x.shape[1]))
                   + ((0, 0),) * (x.ndim - 2))


def multiband_blend(images: jnp.ndarray, masks: jnp.ndarray,
                    num_bands: int = 5):
    """Blend N shared-frame canvases with Laplacian pyramids.

    images: (N, H, W, C) float32; masks: (N, H, W) bool — typically the
    seam-resolved + dilated masks the reference feeds its blender
    (特征点检测.cpp:1157-1181). Returns ((H, W, C), (H, W) bool).
    """
    N, H, W = images.shape[:3]
    mult = 1 << num_bands
    Hp = -(-H // mult) * mult
    Wp = -(-W // mult) * mult

    def blend_one_level_stack():
        imgs = [_pad_to(images[i], Hp, Wp) for i in range(N)]
        ws = [_pad_to(masks[i].astype(jnp.float32), Hp, Wp) for i in range(N)]

        # Gaussian pyramids of images and weights
        gauss = [imgs]
        wpyr = [ws]
        for _ in range(num_bands):
            gauss.append([_down(g) for g in gauss[-1]])
            wpyr.append([_down(w) for w in wpyr[-1]])

        # Laplacian bands + blended pyramid
        blended = []
        for l in range(num_bands + 1):
            if l < num_bands:
                laps = [gauss[l][i]
                        - _up(gauss[l + 1][i], gauss[l][i].shape[:2])
                        for i in range(N)]
            else:
                laps = gauss[l]
            wsum = sum(wpyr[l]) + WEIGHT_EPS
            acc = sum(laps[i] * wpyr[l][i][..., None] for i in range(N))
            blended.append(acc / wsum[..., None])

        # collapse coarse-to-fine
        out = blended[-1]
        for l in range(num_bands - 1, -1, -1):
            out = _up(out, blended[l].shape[:2]) + blended[l]
        return out

    out = blend_one_level_stack()[:H, :W]
    valid = jnp.any(masks, axis=0)
    out = jnp.where(valid[..., None], out, 0.0)
    return out, valid
