"""Dynamic-programming optimal seam finder.

TPU-native reconstruction of the reference's DpSeamFinder
(ref 动态规划....cpp): per-pixel color (or color/gradient) costs over the
overlap (computeCosts :733-805, diffL2Square3 :713-720, COLOR_GRAD division
by Σ|grad|+1 :783-793) and a minimal-cost path found by dynamic programming
over rows with the 3-predecessor band (estimateSeam :806-959).

The reference's DP is a sequential per-pixel double loop with control/
reachable bookkeeping; here each DP step processes a whole row vectorized
(VPU) inside one lax.scan — H steps of O(W) work — and the backtrack is a
second scan over the stored argmin decisions. The component/conflict-
resolution machinery of the reference (findComponents/resolveConflicts,
:196-548) exists to handle multi-region overlaps; for the rotation-panorama
overlaps this framework produces (single convex-ish overlap band per pair),
the path formulation with ±BIG guards is equivalent and fully parallel.

Also provides the seam-anchored linear ramp weights of the reference's
custom blender (图像融合.cpp:483-572) for blend.ramp.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from imagestitch_tpu.ops.image import sobel, rgb_to_gray

# np scalar, NOT jnp: a module-scope jnp scalar is an eager device array
# whose lowering-time readback stalls compilation (see matching.matcher)
BIG = np.float32(1e9)


def seam_costs(img1: jnp.ndarray, img2: jnp.ndarray, both: jnp.ndarray,
               use_grad: bool = False) -> jnp.ndarray:
    """Per-pixel seam cost over the overlap (ref computeCosts :733-805).

    COLOR: squared L2 color difference. COLOR_GRAD: the same divided by
    (|grad1| + |grad2| + 1). Outside the overlap: BIG.
    """
    d = img1.astype(jnp.float32) - img2.astype(jnp.float32)
    e = jnp.sum(d * d, axis=-1) if d.ndim == 3 else d * d
    if use_grad:
        def gmag(im):
            g = rgb_to_gray(im) if im.ndim == 3 else im
            gx = sobel(g, 1, 0)
            gy = sobel(g, 0, 1)
            return jnp.abs(gx) + jnp.abs(gy)
        e = e / (gmag(img1) + gmag(img2) + 1.0)
    return jnp.where(both, e, BIG)


def dp_seam_path(cost: jnp.ndarray, chunk: int = 8) -> jnp.ndarray:
    """Min-cost top-to-bottom path through a (H, W) cost map, one column per
    row, moves in {-1, 0, +1} (the 3-predecessor DP of ref estimateSeam
    :846-916). Rows whose cost is all-BIG (no overlap) are free (cost 0).

    The recurrence is row-sequential; `chunk` rows are processed per scan
    step (sequentially inside the body) to amortize the per-step overhead of
    lax.scan on TPU (~5 µs/step — a 1620-row canvas costs ~8 ms at chunk=1).

    Returns seam column per row, (H,) int32.
    """
    H, W = cost.shape
    row_has = jnp.any(cost < BIG, axis=1)
    e = jnp.where(row_has[:, None], cost, 0.0)

    def shift(x, s):
        return jnp.roll(x, s).at[(0 if s > 0 else -1)].set(BIG)

    def step_one(m, e_row):
        left = shift(m, 1)
        right = shift(m, -1)
        stacked = jnp.stack([left, m, right])               # (3, W)
        choice = jnp.argmin(stacked, axis=0)                 # 0/1/2
        m2 = jnp.minimum(e_row + jnp.min(stacked, axis=0), BIG)
        return m2, choice.astype(jnp.int8)

    # pad the (H-1) transition rows to a chunk multiple with free rows
    rest = e[1:]
    n_rest = H - 1
    n_pad = (-n_rest) % chunk
    if n_pad:
        rest = jnp.concatenate([rest, jnp.zeros((n_pad, W), e.dtype)])
    rest = rest.reshape(-1, chunk, W)

    def fwd(m, e_rows):
        chs = []
        for r in range(chunk):
            m, ch = step_one(m, e_rows[r])
            chs.append(ch)
        return m, jnp.stack(chs)

    # only the choice rows are materialized (int8); the cost wavefront M
    # lives in the carry — storing it per row cost a 60+ MB write at 1080p
    # and the backtrack never reads it beyond the final row
    m_last, choices = lax.scan(fwd, e[0], rest)
    choices = choices.reshape(-1, W)

    # start at the PADDED bottom: pad rows cost 0 everywhere, so its min
    # equals the min at row H-1 and backtracking through the pads lands on
    # an optimal column there
    last = jnp.argmin(m_last) if H > 1 else jnp.argmin(e[0])

    # backtrack with the position as a ONE-HOT row vector: the natural
    # per-row `ch_rows[r][col]` scalar gather costs ~40 µs/row on TPU
    # (dynamic-slice from a vector by a traced index), which made the
    # backtrack 2x the cost of the forward DP. With a one-hot position p,
    # the taken choice is the reduction o = <p, ch_row> and the move is a
    # select among the three pre-shifted copies of p — pure vector ALU.
    def pshift(x, s):  # roll with the wrapped element zeroed (not BIG)
        return jnp.roll(x, s).at[(0 if s > 0 else -1)].set(0.0)

    def back(p, ch_rows):
        cols = []
        for r in range(chunk - 1, -1, -1):
            cols.append(jnp.argmax(p))
            o = jnp.sum(p * ch_rows[r].astype(jnp.float32))
            lft = pshift(p, -1)  # col-1: choice 0 (border clips are moot:
            rgt = pshift(p, 1)   # finite choices never point off-grid)
            nxt = jnp.where(o == 0.0, lft, jnp.where(o == 2.0, rgt, p))
            # guard the fully-degenerate case (no finite path anywhere, so
            # BIG-tie argmins can point off-grid): a shift that would zero
            # the one-hot keeps the position instead of silently vanishing
            p = jnp.where(jnp.any(nxt > 0.0), nxt, p)
        # cols collected bottom-up within the chunk; reverse to top-down
        return p, jnp.stack(cols[::-1])

    # backtrack over padded chunks: padded free rows sit BELOW row H-1 and
    # have choice=1 (straight down), so starting from `last` at the padded
    # bottom yields the same column at row H-1
    pad_choices = choices.reshape(-1, chunk, W)
    p0 = (jnp.arange(W) == last).astype(jnp.float32)
    p_first, cols_rev = lax.scan(back, p0, pad_choices, reverse=True)
    cols = cols_rev.reshape(-1)[:n_rest]
    seam = jnp.concatenate([jnp.argmax(p_first)[None], cols])
    return seam.astype(jnp.int32)


def _decimate_cost(cwin: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Mean-pool a cost window by `scale` along both axes (borders padded
    with BIG — all-BIG rows are free rows for the DP, and a mixed border
    cell's inflated mean only pushes the seam one cell inward)."""
    H, W = cwin.shape
    Hp = -(-H // scale) * scale
    Wp = -(-W // scale) * scale
    if Hp != H or Wp != W:
        cwin = jnp.pad(cwin, ((0, Hp - H), (0, Wp - W)),
                       constant_values=BIG)
    return cwin.reshape(Hp // scale, scale, Wp // scale, scale).mean((1, 3))


def _dp_split_vertical(cost: jnp.ndarray, mask1: jnp.ndarray,
                       mask2: jnp.ndarray, both: jnp.ndarray,
                       max_overlap_w: int | None, scale: int = 1):
    """Vertical-seam mask split on a precomputed cost map. Returns
    (mask1', mask2', seam_cols (H,) int32).

    `scale` > 1 runs the DP on a mean-pooled cost map and upscales the seam
    (left cell edge), cutting the scan work by scale^2 — the 20x20 seam-mask
    dilation + blend absorb the <= scale-px quantization (OpenCV's own
    driver defaults to ~0.13x-scale seams at 1080p via seam_megapix=0.1,
    far coarser than this)."""
    H, W = mask1.shape
    if max_overlap_w is not None and max_overlap_w < W:
        Wd = max_overlap_w
        colhas = jnp.any(both, axis=0)
        first = jnp.argmax(colhas).astype(jnp.int32)
        x0 = jnp.clip(first - 8, 0, W - Wd)
        cwin = jax.lax.dynamic_slice(cost, (jnp.int32(0), x0), (H, Wd))
    else:
        x0 = jnp.int32(0)
        cwin = cost
    if scale > 1:
        seam_lo = dp_seam_path(_decimate_cost(cwin, scale))
        seam = jnp.repeat(seam_lo * scale, scale)[:H] + x0
    else:
        seam = dp_seam_path(cwin) + x0

    xs = jnp.arange(W, dtype=jnp.float32)
    m1f = mask1.astype(jnp.float32)
    m2f = mask2.astype(jnp.float32)
    cx1 = jnp.sum(m1f * xs[None, :]) / jnp.maximum(jnp.sum(m1f), 1.0)
    cx2 = jnp.sum(m2f * xs[None, :]) / jnp.maximum(jnp.sum(m2f), 1.0)
    one_is_left = cx1 <= cx2

    col = jnp.arange(W)[None, :]
    left_of = col <= seam[:, None]
    keep1 = jnp.where(one_is_left, left_of, ~left_of)
    m1 = mask1 & (~both | keep1)
    m2 = mask2 & (~both | ~keep1)
    return m1, m2, seam


def dp_seam_pair(img1: jnp.ndarray, img2: jnp.ndarray,
                 mask1: jnp.ndarray, mask2: jnp.ndarray,
                 use_grad: bool = False, max_overlap_w: int | None = None,
                 max_overlap_h: int | None = None, orient: str = "vertical",
                 scale: int = 1):
    """Find the optimal seam between two shared-frame images and split
    their masks along it (ref find/process :87-195 +
    updateLabelsUsingSeam :960-1093, reduced to the path split).

    The image whose mask centroid lies left (above, for horizontal seams)
    keeps that side — computed dynamically, so the caller need not order
    the pair.

    `orient`: "vertical" runs the top-to-bottom column seam; "horizontal"
    transposes (a left-to-right row seam for stacked pairs); "auto" picks
    per-call inside jit via lax.cond from the relative displacement of the
    two mask centroids — a horizontally-displaced pair needs a VERTICAL
    dividing seam and vice versa. (Round-3 used the overlap bbox aspect
    instead, which misfires on large-overlap side-by-side pairs — a 10 deg
    yaw rotation pair overlaps ~1600x1080, wider than tall, and was sent
    down the horizontal branch: a ~2.8x longer scan over canvas COLUMNS and
    the wrong seam direction; that was the r2->r3 headline regression.)
    With "auto" the returned seam coordinate vector is None (its length is
    orientation-dependent and lax.cond requires matching shapes).

    `max_overlap_w` / `max_overlap_h`: static upper bounds on the overlap
    extent ACROSS the seam direction. When given (the pipeline passes
    ~1.3x the source size, which a two-view overlap cannot exceed), the DP
    runs on a dynamic window instead of the whole canvas — the scan work
    drops proportionally.

    `scale` > 1 finds the seam on a scale-x decimated cost map (see
    _dp_split_vertical; SeamConfig.dp_scale).

    Returns (mask1', mask2', seam) — seam is (H,) int32 columns for
    vertical, (W,) int32 rows for horizontal, None for auto.
    """
    both = mask1 & mask2
    cost = seam_costs(img1, img2, both, use_grad)

    def vertical(c, m1, m2, b):
        return _dp_split_vertical(c, m1, m2, b, max_overlap_w, scale)

    def horizontal(c, m1, m2, b):
        m1t, m2t, seam = _dp_split_vertical(c.T, m1.T, m2.T, b.T,
                                            max_overlap_h, scale)
        return m1t.T, m2t.T, seam

    if orient == "vertical":
        return vertical(cost, mask1, mask2, both)
    if orient == "horizontal":
        return horizontal(cost, mask1, mask2, both)

    # auto: mask displacement decides — the seam must divide the canvas
    # ACROSS the direction the two images are offset from each other
    def centroid(m):
        mf = m.astype(jnp.float32)
        tot = jnp.maximum(jnp.sum(mf), 1.0)
        cx = jnp.sum(jnp.sum(mf, axis=0)
                     * jnp.arange(m.shape[1], dtype=jnp.float32)) / tot
        cy = jnp.sum(jnp.sum(mf, axis=1)
                     * jnp.arange(m.shape[0], dtype=jnp.float32)) / tot
        return cx, cy

    cx1, cy1 = centroid(mask1)
    cx2, cy2 = centroid(mask2)
    m1, m2 = jax.lax.cond(
        jnp.abs(cx1 - cx2) >= jnp.abs(cy1 - cy2),
        lambda c, a, b2, b: vertical(c, a, b2, b)[:2],
        lambda c, a, b2, b: horizontal(c, a, b2, b)[:2],
        cost, mask1, mask2, both)
    return m1, m2, None


def overlap_extents(both: jnp.ndarray):
    """Per-row overlap [left, right] column extents (W-1 defaults when the
    row has no overlap). both: (H, W) bool."""
    W = both.shape[1]
    col = jnp.arange(W)
    left = jnp.min(jnp.where(both, col[None, :], W), axis=1)
    right = jnp.max(jnp.where(both, col[None, :], -1), axis=1)
    has = jnp.any(both, axis=1)
    return jnp.where(has, left, 0), jnp.where(has, right, W - 1), has


def ramp_weights(both: jnp.ndarray, seam: jnp.ndarray):
    """Seam-anchored piecewise-linear blend weights for the LEFT image over
    the overlap (ref 图像融合.cpp:483-572): weight falls from 1 at the left
    overlap edge through 0.5 AT the seam to 0 at the right edge:

      x <= seam: 1 − 0.5·(x − left)/(seam − left)
      x >  seam:     0.5·(right − x)/(right − seam)

    Returns (H, W) float32 weights (only meaningful where `both`).
    """
    H, W = both.shape
    left, right, has = overlap_extents(both)
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    l = left.astype(jnp.float32)[:, None]
    r = right.astype(jnp.float32)[:, None]
    s = seam.astype(jnp.float32)[:, None]
    wl = 1.0 - 0.5 * (x - l) / jnp.maximum(s - l, 1.0)
    wr = 0.5 * (r - x) / jnp.maximum(r - s, 1.0)
    w = jnp.where(x <= s, wl, wr)
    return jnp.clip(w, 0.0, 1.0)
