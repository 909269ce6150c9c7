"""One-off generator for features/data/orb_pattern_cv.npy.

OpenCV's ORB uses a LEARNED 256-pair BRIEF sampling pattern
(`bit_pattern_31_`, modules/features2d/src/orb.cpp, BSD-3-Clause), trained
offline by Rublee et al. (ORB paper, sec. 4.3) for low correlation between
bits. The reference transcribes the same table (特征点检测.cpp:448-706).
This script parses the numeric DATA out of the reference's table (it is
OpenCV's data, not reference code) and writes it as a (256, 4) int8 array
[x1, y1, x2, y2] per descriptor bit, coordinates in the rotated 31x31
patch frame — consumed by features/pattern.py's opencv-compatible mode.

Run from the repo root:  python tools/extract_cv_orb_pattern.py
"""

import re
from pathlib import Path

import numpy as np

SRC = Path("/root/reference/特征点检测/特征点检测/特征点检测.cpp")
OUT = Path(__file__).resolve().parent.parent / \
    "imagestitch_tpu/features/data/orb_pattern_cv.npy"


def main():
    text = SRC.read_bytes().decode("gbk", errors="replace")
    m = re.search(r"bit_pattern_31_\[256 \* 4\]\s*=\s*\{(.*?)\};",
                  text, re.S)
    assert m, "table not found"
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    vals = [int(v) for v in re.findall(r"-?\d+", body)]
    assert len(vals) == 1024, len(vals)
    arr = np.asarray(vals, np.int64).reshape(256, 4)
    assert arr.min() >= -15 and arr.max() <= 15, (arr.min(), arr.max())
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.save(OUT, arr.astype(np.int8))
    print(f"wrote {OUT} shape={arr.shape} "
          f"first={arr[0].tolist()} last={arr[-1].tolist()}")


if __name__ == "__main__":
    main()
