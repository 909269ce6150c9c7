"""Calibration probe: our ORB vs cv2.ORB (VERDICT r3 item 10).

Measures (a) keypoint repeatability between our detector and cv2.ORB on
the same image, (b) descriptor bit agreement when OUR sampler runs with
OpenCV's learned pattern on cv2's own keypoints/angles. Prints numbers to
pick test thresholds.
"""

import numpy as np
import cv2
import jax.numpy as jnp

from imagestitch_tpu.config import DetectorConfig
from imagestitch_tpu.features.orb import (detect_and_compute,
                                          _orb_descriptors)
from imagestitch_tpu.ops.image import gaussian_blur, rgb_to_gray
from imagestitch_tpu.utils.io import synthetic_pair


def main():
    img, _, _ = synthetic_pair(480, 640, seed=0)
    gray8 = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    grayf = np.asarray(rgb_to_gray(jnp.asarray(img, jnp.float32)))

    orb = cv2.ORB_create(nfeatures=510, scaleFactor=1.3, nlevels=5,
                         edgeThreshold=31, patchSize=31, fastThreshold=20)
    kps, desc = orb.detectAndCompute(gray8, None)
    print(f"cv2: {len(kps)} kpts")

    cfg = DetectorConfig(pattern="opencv")
    ours = detect_and_compute(jnp.asarray(grayf), cfg)
    oxy = np.asarray(ours.xy)[np.asarray(ours.valid)]
    print(f"ours: {len(oxy)} kpts")

    # (a) repeatability: cv2 kpts with one of ours within r px
    cxy = np.array([k.pt for k in kps], np.float32)
    d = np.linalg.norm(cxy[:, None, :] - oxy[None, :, :], axis=-1)
    for r in (1.0, 2.0, 3.0):
        print(f"repeatability@{r}px: cv2-in-ours "
              f"{(d.min(1) <= r).mean():.3f}  ours-in-cv2 "
              f"{(d.min(0) <= r).mean():.3f}")

    # (b) descriptor agreement on cv2's octave-0 keypoints
    sel = [i for i, k in enumerate(kps) if k.octave == 0]
    xk = jnp.asarray(np.round([kps[i].pt[0] for i in sel]).astype(np.int32))
    yk = jnp.asarray(np.round([kps[i].pt[1] for i in sel]).astype(np.int32))
    ang = jnp.asarray(np.deg2rad([kps[i].angle for i in sel])
                      .astype(np.float32))
    blurred = gaussian_blur(jnp.asarray(grayf), 7, 2.0)
    dd = np.asarray(_orb_descriptors(blurred, xk, yk, ang, cfg))  # (K,256)
    cvbits = np.unpackbits(desc[sel], axis=1, bitorder="little")  # (K,256)
    agree = (dd == cvbits).mean(axis=1)
    print(f"octave-0 kpts: {len(sel)}; bit agreement mean "
          f"{agree.mean():.3f} median {np.median(agree):.3f} "
          f"p10 {np.percentile(agree, 10):.3f}")


if __name__ == "__main__":
    main()
