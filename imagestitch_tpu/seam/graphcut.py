"""GraphCut seam finder (host + native solvers).

Equivalent of OpenCV's GraphCutSeamFinder(COST_COLOR / COST_COLOR_GRAD) —
COST_COLOR is the default of most reference mains (ref 特征点检测.cpp
:1128-1136). The cost models follow OpenCV's setGraphWeightsColor /
setGraphWeightsColorGrad exactly:

    COLOR:      w(p, q) = ||I1(p) − I2(p)||² + ||I1(q) − I2(q)||² + 1
    COLOR_GRAD: w(p, q) = (||ΔI(p)||² + ||ΔI(q)||²)
                          / (Σ Sobel² maps of both images at p, q + 1) + 1
                (horizontal edges divide by the d/dx maps, vertical by
                 d/dy — seam_finders.cpp precomputes dx_/dy_ per image)
    both:       + bad_region_penalty if any endpoint lies outside
                  either warped mask
    terminal caps: terminal_cost toward source where mask1, toward sink
                   where mask2 (overlap pixels get both, which cancels)

with terminal_cost = 10000 and bad_region_penalty = 1000 (OpenCV's
GraphCutSeamFinderBase defaults). Min-cut is irregular sequential work, so
it runs host-side on native C++ solvers (imagestitch_tpu.native); cost maps
are vectorized NumPy.

Two solvers, chosen by problem size:
  - small / arbitrary-topology overlaps: Boykov-Kolmogorov maxflow on the
    full union grid (native/maxflow.cpp) — exact for any mask shape;
  - large overlaps (the 1080p path): a DP seam seeds a corridor of
    ±band columns, whose s-t min cut is — by planar duality — the shortest
    top-to-bottom path in the pixel-corner lattice, solved exactly by
    native Dijkstra (native/seamdual.cpp) in ~20 ms where BK needs minutes.
    If the optimal cut touches the corridor edge, the band DOUBLES and the
    solve repeats (up to the full overlap width), so the result is not
    silently suboptimal when the global cut strays from the DP seed.
    The corridor is oriented by the overlap's aspect (transposed for
    stacked pairs), so horizontal seams work too.

Not jittable — the `Stitcher` and the host-seam pair path use it when
cfg.seam.kind is "graphcut" / "graphcut_colorgrad".
"""

from __future__ import annotations

import numpy as np

from imagestitch_tpu.native.ccl import grid_maxflow, band_dijkstra

# OpenCV GraphCutSeamFinderBase defaults (terminal_cost_, bad_region_penalty_)
TERMINAL_COST = 10000.0
BAD_REGION_PENALTY = 1000.0
WEIGHT_EPS = 1.0
INF = 1e8
# overlap-bbox pixel count above which the banded dual solver takes over
BK_LIMIT = 160 * 160
BAND = 64


def _diff2(img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
    """Per-pixel SQUARED L2 color difference (OpenCV's normL2 on Point3f
    returns the squared norm — seam_finders.cpp setGraphWeightsColor)."""
    d = img1.astype(np.float32) - img2.astype(np.float32)
    return (d * d).sum(axis=-1)


def _sobel_sqnorm(img: np.ndarray, axis: int) -> np.ndarray:
    """Squared L2 norm over channels of the 3x3 Sobel derivative along
    `axis` (1 = d/dx, 0 = d/dy), BORDER_REFLECT_101 — exactly the dx_/dy_
    maps GraphCutSeamFinder::Impl::find precomputes for COST_COLOR_GRAD
    (seam_finders.cpp: Sobel CV_32F per channel, then normL2 per pixel)."""
    p = np.pad(img.astype(np.float32), ((1, 1), (1, 1), (0, 0)),
               mode="reflect")
    if axis == 1:
        sm = p[:-2] + 2.0 * p[1:-1] + p[2:]       # [1,2,1] vertical smooth
        d = sm[:, 2:] - sm[:, :-2]                # [-1,0,1] horizontal diff
    else:
        sm = p[:, :-2] + 2.0 * p[:, 1:-1] + p[:, 2:]
        d = sm[2:] - sm[:-2]
    return (d * d).sum(axis=-1)


def _grid_costs(d2, g, u, use_grad, dxs=None, dys=None):
    """Pair costs of the 4-neighbor grid graph (OpenCV
    setGraphWeightsColor / setGraphWeightsColorGrad): wh (h, w-1) edges
    between (y,x)-(y,x+1), wv (h-1, w) edges between (y,x)-(y+1,x).

    COST_COLOR:      w = d2(p) + d2(q) + eps
    COST_COLOR_GRAD: w = (d2(p) + d2(q)) / (dxs(p) + dxs(q) + eps) + eps
    with dxs/dys = dx1+dx2 / dy1+dy2 (the two images' Sobel sqnorm maps;
    horizontal edges divide by dxs, vertical by dys). Both add the
    bad-region penalty when either endpoint leaves either mask, and are 0
    (free) outside the union."""
    if use_grad:
        wh = ((d2[:, :-1] + d2[:, 1:])
              / (dxs[:, :-1] + dxs[:, 1:] + WEIGHT_EPS) + WEIGHT_EPS)
        wv = ((d2[:-1, :] + d2[1:, :])
              / (dys[:-1, :] + dys[1:, :] + WEIGHT_EPS) + WEIGHT_EPS)
    else:
        wh = d2[:, :-1] + d2[:, 1:] + WEIGHT_EPS
        wv = d2[:-1, :] + d2[1:, :] + WEIGHT_EPS
    wh = wh + np.where(~(g[:, :-1] & g[:, 1:]),
                       np.float32(BAD_REGION_PENALTY), 0.0)
    wv = wv + np.where(~(g[:-1, :] & g[1:, :]),
                       np.float32(BAD_REGION_PENALTY), 0.0)
    wh = np.where(u[:, :-1] & u[:, 1:], wh, 0.0).astype(np.float32)
    wv = np.where(u[:-1, :] & u[1:, :], wv, 0.0).astype(np.float32)
    return wh, wv


def graphcut_seam_pair(img1: np.ndarray, img2: np.ndarray,
                       mask1: np.ndarray, mask2: np.ndarray,
                       use_grad: bool = False, method: str = "auto",
                       orient_marginals=None, crop_origin=(0, 0)):
    """Resolve the overlap of two shared-frame canvases by min-cut.

    img*: (H, W, C) float; mask*: (H, W) bool. method: "auto" (banded dual
    solver for large overlaps, BK otherwise), "bk", or "banded".
    Returns (mask1', mask2').

    `orient_marginals` (optional): ((col_marginals), (row_marginals)) of
    the FULL canvas when img/mask are a bbox crop of a larger frame —
    each set is per-column/-row pixel counts (excl1, excl2, mask1, mask2)
    — with `crop_origin` = (y, x) of the crop in that frame, so the
    banded solver's side-ownership decision uses evidence the crop
    removed (see _one_is_left_marginals)."""
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
        return _banded_cut_pair(img1, img2, mask1, mask2, use_grad,
                                orient_marginals=orient_marginals,
                                crop_origin=crop_origin)

    y0, y1 = ys.min(), ys.max() + 1
    x0, x1 = xs.min(), xs.max() + 1

    # gradient maps on a 1-pixel-margin bbox crop (the 3x3 Sobel support
    # crosses the bbox; beyond the margin the full-canvas values are
    # identical, so this avoids 4 full-canvas passes for a small overlap)
    dxs = dys = None
    if use_grad:
        gy0, gx0 = max(y0 - 1, 0), max(x0 - 1, 0)
        c1 = img1[gy0:y1 + 1, gx0:x1 + 1]
        c2 = img2[gy0:y1 + 1, gx0:x1 + 1]
        ry, rx = y0 - gy0, x0 - gx0           # margin actually added
        dxs = (_sobel_sqnorm(c1, 1) + _sobel_sqnorm(c2, 1))[
            ry:ry + (y1 - y0), rx:rx + (x1 - x0)]
        dys = (_sobel_sqnorm(c1, 0) + _sobel_sqnorm(c2, 0))[
            ry:ry + (y1 - y0), rx:rx + (x1 - x0)]

    m1 = mask1[y0:y1, x0:x1]
    m2 = mask2[y0:y1, x0:x1]
    i1 = img1[y0:y1, x0:x1]
    i2 = img2[y0:y1, x0:x1]
    h, w = m1.shape

    d2 = _diff2(i1, i2)                               # (h, w) squared diff
    both = m1 & m2

    # terminal caps: OpenCV gives every mask1 pixel terminal_cost toward
    # source and every mask2 pixel terminal_cost toward sink; on overlap
    # pixels both cancel, leaving net source on img1-exclusive and net sink
    # on img2-exclusive pixels
    tcap = np.zeros((h, w), np.float32)
    tcap[m1 & ~m2] = TERMINAL_COST
    tcap[m2 & ~m1] = -TERMINAL_COST

    u = union[y0:y1, x0:x1]
    wh, wv = _grid_costs(d2, both, u, use_grad, dxs, dys)
    ecap = np.zeros((h, w, 4), np.float32)
    ecap[:, 1:, 0] = wh          # edge to the LEFT neighbor
    ecap[:, :-1, 1] = wh         # edge to the RIGHT neighbor
    ecap[1:, :, 2] = wv          # edge UP
    ecap[:-1, :, 3] = wv         # edge DOWN

    labels, _ = grid_maxflow(tcap, ecap)
    keep1 = labels.astype(bool)

    out1 = mask1.copy()
    out2 = mask2.copy()
    sub_both = both
    out1[y0:y1, x0:x1] &= ~(sub_both & ~keep1)
    out2[y0:y1, x0:x1] &= ~(sub_both & keep1)
    return out1, out2


def _one_is_left(mask1, mask2, x_lo, x_hi):
    """Which image owns the LEFT side of a vertical cut: the image with
    more exclusive coverage left of the corridor (columns < x_lo) plus the
    other's exclusive coverage right of it (columns >= x_hi). Falls back to
    mask centroids when neither has exclusive mass outside the corridor."""
    e1 = mask1 & ~mask2
    e2 = mask2 & ~mask1
    return _one_is_left_marginals(
        (e1.sum(0), e2.sum(0), mask1.sum(0), mask2.sum(0)), x_lo, x_hi)


def _one_is_left_marginals(col_marg, x_lo, x_hi):
    """_one_is_left from COLUMN MARGINALS (per-column pixel counts of
    exclusive-1, exclusive-2, mask1, mask2). The bbox-cropped pipeline
    path passes FULL-CANVAS marginals (computed on device, ~KBs through
    the tunnel) so the side-ownership decision sees the exclusive mass the
    crop removed and can never flip relative to the full-canvas solve."""
    e1c, e2c, m1c, m2c = (np.asarray(v, np.float64) for v in col_marg)
    l1 = e1c[:x_lo].sum()
    l2 = e2c[:x_lo].sum()
    r1 = e1c[x_hi:].sum()
    r2 = e2c[x_hi:].sum()
    score = (l1 + r2) - (l2 + r1)
    if score != 0:
        return score > 0
    xs_all = np.arange(len(m1c), dtype=np.float64)
    c1 = (m1c * xs_all).sum() / max(m1c.sum(), 1)
    c2 = (m2c * xs_all).sum() / max(m2c.sum(), 1)
    return c1 <= c2


def _corridor_costs(wh, wv):
    """Dual-lattice crossing costs for a corridor window from the grid
    pair costs (_grid_costs): a vertical dual step crosses a horizontal
    edge (wh), a horizontal dual step crosses a vertical edge (wv).
    Returns (vcost, hcost) for band_dijkstra."""
    h = wv.shape[0] + 1
    bw = wh.shape[1] + 1
    vcost = np.full((h, bw + 1), INF, np.float32)
    vcost[:, 1:-1] = wh
    hcost = np.zeros((h + 1, bw), np.float32)
    hcost[1:-1, :] = wv
    return vcost, hcost


def _block_reduce(a, s, fn):
    """(h, w) -> (ceil(h/s), ceil(w/s)) block reduction (zero-padded)."""
    h, w = a.shape
    hp, wp = -(-h // s) * s, -(-w // s) * s
    p = np.zeros((hp, wp), a.dtype)
    p[:h, :w] = a
    return fn(p.reshape(hp // s, s, wp // s, s), axis=(1, 3))


COARSE_STRIDE = 4


def _banded_cut_pair(img1, img2, mask1, mask2, use_grad=False,
                     orient_marginals=None, crop_origin=(0, 0)):
    """Large-overlap path: a FULL-WIDTH coarse dual solve seeds the
    corridor (so distant cheap channels are seen globally), then the exact
    fine solve runs inside it, doubling the band whenever the cut touches
    the corridor edge. Round-2 seeded from a DP seam with a fixed ±64 band,
    which was silently suboptimal when the true cut strayed."""
    both = mask1 & mask2
    oys, oxs = np.nonzero(both)
    y0, y1 = int(oys.min()), int(oys.max()) + 1
    x0, x1 = int(oxs.min()), int(oxs.max()) + 1

    # orient the corridor: tall overlap -> vertical seam; wide -> transpose
    transpose = (y1 - y0) < (x1 - x0)
    if transpose:
        i1, i2 = img1.transpose(1, 0, 2), img2.transpose(1, 0, 2)
        m1, m2 = mask1.T, mask2.T
        # transposed view: its column marginals are the original's ROW
        # marginals, and the crop origin's axes swap
        tm = (None if orient_marginals is None
              else (orient_marginals[1], orient_marginals[0]))
        out1, out2 = _banded_cut_pair(i1, i2, m1, m2, use_grad,
                                      orient_marginals=tm,
                                      crop_origin=crop_origin[::-1])
        return out1.T, out2.T

    dxs = dys = None
    if use_grad:
        # Sobel on a 1-pixel-margin bbox crop (support crosses the crop;
        # values match the full-canvas maps). After a transpose, Sobel_x of
        # the transposed image IS Sobel_yᵀ of the original, so computing
        # here keeps the oracle orientation exact.
        gy0, gx0 = max(y0 - 1, 0), max(x0 - 1, 0)
        c1 = img1[gy0:y1 + 1, gx0:x1 + 1]
        c2 = img2[gy0:y1 + 1, gx0:x1 + 1]
        ry, rx = y0 - gy0, x0 - gx0
        dxs = (_sobel_sqnorm(c1, 1) + _sobel_sqnorm(c2, 1))[
            ry:ry + (y1 - y0), rx:rx + (x1 - x0)]
        dys = (_sobel_sqnorm(c1, 0) + _sobel_sqnorm(c2, 0))[
            ry:ry + (y1 - y0), rx:rx + (x1 - x0)]

    b1 = both[y0:y1, x0:x1]
    i1 = img1[y0:y1, x0:x1]
    i2 = img2[y0:y1, x0:x1]
    h, w = b1.shape

    d2 = _diff2(i1, i2)
    u = (mask1 | mask2)[y0:y1, x0:x1]
    g = (mask1 & mask2)[y0:y1, x0:x1]
    wh, wv = _grid_costs(d2, g, u, use_grad, dxs, dys)

    # global seed: full-width cut on a block-averaged pyramid level — sees
    # cheap channels anywhere in the overlap, unlike a DP seed. The coarse
    # pair costs come from block-averaged per-pixel maps (a seed heuristic;
    # the fine solve below is the exact one).
    s = COARSE_STRIDE
    d2c = _block_reduce(np.where(u, d2, 0.0).astype(np.float32), s, np.mean)
    uc = _block_reduce(u, s, np.any)
    gc_ = _block_reduce(g, s, np.all)
    whc, wvc = _grid_costs(
        d2c, gc_, uc, use_grad,
        _block_reduce(dxs, s, np.mean) if use_grad else None,
        _block_reduce(dys, s, np.mean) if use_grad else None)
    vc, hc = _corridor_costs(whc, wvc)
    coarse_cross, _ = band_dijkstra(vc, hc)
    ccols = np.nonzero(coarse_cross.any(axis=0))[0]
    if len(ccols) == 0:
        lo_seed, hi_seed = 0, w
    else:
        lo_seed = int(ccols.min()) * s
        hi_seed = (int(ccols.max()) + 1) * s

    band = BAND
    while True:
        bx0 = max(lo_seed - band, 0)
        bx1 = min(hi_seed + band + 1, w)
        bw = bx1 - bx0

        vcost, hcost = _corridor_costs(wh[:, bx0:bx1 - 1], wv[:, bx0:bx1])
        crossings, cut_cost = band_dijkstra(vcost, hcost)

        covers_all = bx0 == 0 and bx1 == w
        if covers_all:
            break
        # safety net: if the fine cut presses against a corridor edge that
        # is not a real overlap boundary, the optimum may lie beyond —
        # double the band and re-solve
        touches = ((bx0 > 0 and crossings[:, 1].any())
                   or (bx1 < w and crossings[:, -2].any())
                   or cut_cost >= INF)
        if not touches:
            break
        band *= 2

    # pixel (y, x) is LEFT of the cut iff an even number of crossings lie
    # at corner columns <= x
    parity = np.cumsum(crossings[:, :-1], axis=1) % 2 == 0

    if orient_marginals is not None:
        ox = int(crop_origin[1])
        one_left = _one_is_left_marginals(
            orient_marginals[0], ox + x0 + bx0, ox + x0 + bx1)
    else:
        one_left = _one_is_left(mask1, mask2, x0 + bx0, x0 + bx1)

    keep1 = np.zeros((h, w), bool)          # overlap pixels img1 keeps
    keep1[:, :bx0] = True
    keep1[:, bx0:bx1] = parity
    if not one_left:
        keep1 = ~keep1

    out1 = mask1.copy()
    out2 = mask2.copy()
    sub1 = out1[y0:y1, x0:x1]
    sub2 = out2[y0:y1, x0:x1]
    sub1 &= ~(b1 & ~keep1)
    sub2 &= ~(b1 & keep1)
    return out1, out2
