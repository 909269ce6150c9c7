"""GraphCut seam finder (host + native solvers).

Equivalent of OpenCV's GraphCutSeamFinder(COST_COLOR), the default of most
reference mains (ref 特征点检测.cpp:1128-1136): the overlap is labeled by a
min-cut whose edge weights are the color differences

    w(p, q) = |I1(p) − I2(p)| + |I1(q) − I2(q)| + eps

with infinite terminal links pinning the exclusive regions of each image.
Min-cut is irregular sequential work, so it runs host-side on native C++
solvers (imagestitch_tpu.native); cost maps are vectorized NumPy.

Two solvers, chosen by problem size:
  - small / arbitrary-topology overlaps: Boykov-Kolmogorov maxflow on the
    full union grid (native/maxflow.cpp) — exact for any mask shape;
  - large overlaps (the 1080p path): a DP seam seeds a corridor of
    ±band columns, whose s-t min cut is — by planar duality — the shortest
    top-to-bottom path in the pixel-corner lattice, solved exactly by
    native Dijkstra (native/seamdual.cpp) in ~20 ms where BK needs minutes.
    The corridor is oriented by the overlap's aspect (transposed for
    stacked pairs), so horizontal seams work too.

Not jittable — the `Stitcher` and the host-seam pair path use it when
cfg.seam.kind == "graphcut".
"""

from __future__ import annotations

import numpy as np

from imagestitch_tpu.native.ccl import grid_maxflow, band_dijkstra

INF = 1e8
EPS = 1.0
# overlap-bbox pixel count above which the banded dual solver takes over
BK_LIMIT = 160 * 160
BAND = 64


def graphcut_seam_pair(img1: np.ndarray, img2: np.ndarray,
                       mask1: np.ndarray, mask2: np.ndarray,
                       use_grad: bool = False, method: str = "auto"):
    """Resolve the overlap of two shared-frame canvases by min-cut.

    img*: (H, W, C) float; mask*: (H, W) bool. method: "auto" (banded dual
    solver for large overlaps, BK otherwise), "bk", or "banded".
    Returns (mask1', mask2').
    """
    mask1 = np.asarray(mask1, bool)
    mask2 = np.asarray(mask2, bool)
    img1 = np.asarray(img1, np.float32)
    img2 = np.asarray(img2, np.float32)

    union = mask1 | mask2
    ys, xs = np.nonzero(union)
    if len(ys) == 0:
        return mask1, mask2

    both_full = mask1 & mask2
    oys, oxs = np.nonzero(both_full)
    if len(oys) == 0:
        return mask1, mask2
    ov_area = (int(oys.max()) + 1 - int(oys.min())) * \
        (int(oxs.max()) + 1 - int(oxs.min()))
    if method == "banded" or (method == "auto" and ov_area > BK_LIMIT):
        return _banded_cut_pair(img1, img2, mask1, mask2)

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


def _np_dp_seam(cost: np.ndarray) -> np.ndarray:
    """Plain 3-predecessor DP seam over a cost map (host seed for the
    banded cut; same recurrence as ref estimateSeam :846-916 vertical)."""
    H, W = cost.shape
    M = cost[0].copy()
    back = np.zeros((H, W), np.int8)
    big = np.float32(np.inf)
    for y in range(1, H):
        left = np.concatenate([[big], M[:-1]])
        right = np.concatenate([M[1:], [big]])
        stacked = np.stack([left, M, right])
        back[y] = np.argmin(stacked, 0)
        M = cost[y] + stacked[back[y], np.arange(W)]
    seam = np.zeros(H, np.int64)
    seam[-1] = int(np.argmin(M))
    for y in range(H - 2, -1, -1):
        off = int(back[y + 1][seam[y + 1]]) - 1
        seam[y] = np.clip(seam[y + 1] + off, 0, W - 1)
    return seam


def _banded_cut_pair(img1, img2, mask1, mask2):
    """Large-overlap path: DP-seeded corridor + exact dual-Dijkstra cut."""
    both = mask1 & mask2
    oys, oxs = np.nonzero(both)
    y0, y1 = int(oys.min()), int(oys.max()) + 1
    x0, x1 = int(oxs.min()), int(oxs.max()) + 1

    # orient the corridor: tall overlap -> vertical seam; wide -> transpose
    transpose = (y1 - y0) < (x1 - x0)
    if transpose:
        i1, i2 = img1.transpose(1, 0, 2), img2.transpose(1, 0, 2)
        m1, m2 = mask1.T, mask2.T
        out1, out2 = _banded_cut_pair(i1, i2, m1, m2)
        return out1.T, out2.T

    b1 = both[y0:y1, x0:x1]
    i1 = img1[y0:y1, x0:x1]
    i2 = img2[y0:y1, x0:x1]
    h, w = b1.shape

    dp_cost = np.where(
        b1, ((i1 - i2) ** 2).sum(-1).astype(np.float32), np.float32(1e9))
    seam = _np_dp_seam(dp_cost)

    bx0 = max(int(seam.min()) - BAND, 0)
    bx1 = min(int(seam.max()) + BAND + 1, w)
    bw = bx1 - bx0

    # crossing costs: w(p,q) = diff(p) + diff(q) + eps inside the union,
    # free where either pixel lacks coverage (same convention as the BK
    # graph edges)
    u = (mask1 | mask2)[y0:y1, x0:x1][:, bx0:bx1]
    wsum = np.linalg.norm(i1[:, bx0:bx1] - i2[:, bx0:bx1], axis=-1) + EPS
    wsum = np.where(u, wsum, 0.0).astype(np.float32)

    vcost = np.full((h, bw + 1), INF, np.float32)
    pairv = wsum[:, :-1] + wsum[:, 1:]
    bothu = u[:, :-1] & u[:, 1:]
    vcost[:, 1:-1] = np.where(bothu, pairv, 0.0)

    hcost = np.zeros((h + 1, bw), np.float32)
    pairh = wsum[:-1, :] + wsum[1:, :]
    bothh = u[:-1, :] & u[1:, :]
    hcost[1:-1, :] = np.where(bothh, pairh, 0.0)

    crossings, _ = band_dijkstra(vcost, hcost)
    # pixel (y, x) is LEFT of the cut iff an even number of crossings lie
    # at corner columns <= x
    parity = np.cumsum(crossings[:, :-1], axis=1) % 2 == 0

    # which image owns the left side: mask centroids (like seam.dp)
    xs_all = np.arange(mask1.shape[1], dtype=np.float64)
    c1 = (mask1.sum(0) * xs_all).sum() / max(mask1.sum(), 1)
    c2 = (mask2.sum(0) * xs_all).sum() / max(mask2.sum(), 1)
    one_is_left = c1 <= c2

    keep1 = np.zeros((h, w), bool)          # overlap pixels img1 keeps
    keep1[:, :bx0] = True
    keep1[:, bx0:bx1] = parity
    if not one_is_left:
        keep1 = ~keep1

    out1 = mask1.copy()
    out2 = mask2.copy()
    sub1 = out1[y0:y1, x0:x1]
    sub2 = out2[y0:y1, x0:x1]
    sub1 &= ~(b1 & ~keep1)
    sub2 &= ~(b1 & keep1)
    return out1, out2
