"""GraphCut seam finder (host + native maxflow).

Equivalent of OpenCV's GraphCutSeamFinder(COST_COLOR), the default of most
reference mains (ref 特征点检测.cpp:1128-1136): the overlap is labeled by a
min-cut whose edge weights are the color differences

    w(p, q) = |I1(p) − I2(p)| + |I1(q) − I2(q)| + eps

with infinite terminal links pinning the exclusive regions of each image.
Min-cut is irregular sequential work, so it runs host-side on the native BK
maxflow (imagestitch_tpu.native); cost maps are computed on device. Not
jittable — the `Stitcher` uses it when cfg.seam.kind == "graphcut"; the
fully-jitted pair path substitutes the DP seam.
"""

from __future__ import annotations

import numpy as np

from imagestitch_tpu.native.ccl import grid_maxflow

INF = 1e8
EPS = 1.0


def graphcut_seam_pair(img1: np.ndarray, img2: np.ndarray,
                       mask1: np.ndarray, mask2: np.ndarray,
                       use_grad: bool = False):
    """Resolve the overlap of two shared-frame canvases by min-cut.

    img*: (H, W, C) float; mask*: (H, W) bool. Returns (mask1', mask2').
    """
    mask1 = np.asarray(mask1, bool)
    mask2 = np.asarray(mask2, bool)
    img1 = np.asarray(img1, np.float32)
    img2 = np.asarray(img2, np.float32)

    union = mask1 | mask2
    ys, xs = np.nonzero(union)
    if len(ys) == 0:
        return mask1, mask2
    y0, y1 = ys.min(), ys.max() + 1
    x0, x1 = xs.min(), xs.max() + 1

    m1 = mask1[y0:y1, x0:x1]
    m2 = mask2[y0:y1, x0:x1]
    i1 = img1[y0:y1, x0:x1]
    i2 = img2[y0:y1, x0:x1]
    h, w = m1.shape

    diff = np.linalg.norm(i1 - i2, axis=-1)          # (h, w)
    both = m1 & m2

    tcap = np.zeros((h, w), np.float32)
    tcap[m1 & ~m2] = INF                              # img1-exclusive: source
    tcap[m2 & ~m1] = -INF                             # img2-exclusive: sink

    # edge weights w(p,q) = diff(p) + diff(q) + eps inside the union;
    # crossing out of the union is free (those pixels are invalid anyway)
    wsum = diff + EPS
    ecap = np.zeros((h, w, 4), np.float32)

    def pairw(a, b, valid):
        return np.where(valid, a + b, 0.0).astype(np.float32)

    # left (d=0): p with its left neighbor
    valid_l = union[y0:y1, x0:x1] & np.roll(union[y0:y1, x0:x1], 1, 1)
    wl = pairw(wsum, np.roll(wsum, 1, 1), valid_l)
    wl[:, 0] = 0
    # right (d=1)
    vr = union[y0:y1, x0:x1] & np.roll(union[y0:y1, x0:x1], -1, 1)
    wr = pairw(wsum, np.roll(wsum, -1, 1), vr)
    wr[:, -1] = 0
    # up (d=2) / down (d=3)
    vu = union[y0:y1, x0:x1] & np.roll(union[y0:y1, x0:x1], 1, 0)
    wu = pairw(wsum, np.roll(wsum, 1, 0), vu)
    wu[0, :] = 0
    vd = union[y0:y1, x0:x1] & np.roll(union[y0:y1, x0:x1], -1, 0)
    wd = pairw(wsum, np.roll(wsum, -1, 0), vd)
    wd[-1, :] = 0
    ecap[..., 0] = wl
    ecap[..., 1] = wr
    ecap[..., 2] = wu
    ecap[..., 3] = wd

    labels, _ = grid_maxflow(tcap, ecap)
    keep1 = labels.astype(bool)

    out1 = mask1.copy()
    out2 = mask2.copy()
    sub_both = both
    out1[y0:y1, x0:x1] &= ~(sub_both & ~keep1)
    out2[y0:y1, x0:x1] &= ~(sub_both & keep1)
    return out1, out2
