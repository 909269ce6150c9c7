"""Runnable demo: stitch two real-photo views with the default pipeline.

Uses the package's vendored photograph (utils/data/china.jpg, CC-BY 2.0)
so it works offline on a bare install:

    python examples/stitch_photo.py [out.png]

Writes the pano and prints the registration metrics. On CPU the first run
compiles for ~1-2 min; on TPU a warm process stitches in tens of ms (see
README "Measured performance").
"""

import sys

import numpy as np


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "pano_photo.png"

    from imagestitch_tpu import stitch_pair
    from imagestitch_tpu.utils.io import imwrite, photo_rotation_pair

    img1, img2, H_true, focal_true = photo_rotation_pair()
    pano, metrics = stitch_pair(img1, img2)

    print(f"pano {pano.shape[1]}x{pano.shape[0]}  "
          f"h_valid={metrics['h_valid']}  "
          f"inliers={metrics['num_inliers']}  "
          f"focal={metrics['focal']:.1f} (true {focal_true:.1f})")
    imwrite(out_path, np.asarray(pano))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
