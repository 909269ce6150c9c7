"""Native maxflow + GraphCut seam tests."""

import numpy as np
import pytest

from imagestitch_tpu.native.ccl import grid_maxflow
from imagestitch_tpu.seam.graphcut import graphcut_seam_pair


def test_maxflow_trivial_cut():
    """2x3 grid: source pins left column, sink right; middle edges carry
    capacity 1 each -> flow 2, cut between the cheap edges."""
    t = np.zeros((2, 3), np.float32)
    t[:, 0] = 100.0
    t[:, 2] = -100.0
    e = np.zeros((2, 3, 4), np.float32)
    e[:, 0, 1] = 5.0   # col0 -> col1
    e[:, 1, 0] = 5.0
    e[:, 1, 1] = 1.0   # col1 -> col2 (cheap: the cut)
    e[:, 2, 0] = 1.0
    lab, flow = grid_maxflow(t, e)
    assert flow == 2.0
    assert lab[:, 0].all() and lab[:, 1].all() and not lab[:, 2].any()


def test_maxflow_vertical_barrier():
    """Cut must follow the low-cost column."""
    h, w = 8, 9
    t = np.zeros((h, w), np.float32)
    t[:, 0] = 1e6
    t[:, -1] = -1e6
    e = np.ones((h, w, 4), np.float32) * 10.0
    e[:, 4, 1] = 0.5   # cheap right-edges at column 4
    e[:, 5, 0] = 0.5
    # zero out-of-grid edges
    e[:, 0, 0] = 0; e[:, -1, 1] = 0; e[0, :, 2] = 0; e[-1, :, 3] = 0
    lab, flow = grid_maxflow(t, e)
    assert lab[:, :5].all()
    assert not lab[:, 5:].any()
    assert abs(flow - 8 * 0.5) < 1e-3


def test_graphcut_seam_follows_agreement_column():
    H, W = 24, 32
    m1 = np.zeros((H, W), bool); m2 = np.zeros((H, W), bool)
    m1[:, :20] = True
    m2[:, 5:] = True
    img1 = np.zeros((H, W, 3), np.float32)
    img2 = np.full((H, W, 3), 60.0, np.float32)
    img2[:, 10:12] = 0.0   # images agree at columns 10-11
    s1, s2 = graphcut_seam_pair(img1, img2, m1, m2)
    assert not (s1 & s2).any()
    assert ((s1 | s2) == (m1 | m2)).all()
    # cut passes through the agreement band
    assert s1[:, :10].all()
    assert s2[:, 12:].all()



@pytest.mark.parametrize("seam_kind", ["graphcut", "graphcut_colorgrad"])
def test_stitcher_graphcut_path(seam_kind):
    """4-image Stitcher run with the host graphcut seam (COLOR and
    COLOR_GRAD cost models; the jitted programs are identical — the seam
    kind only changes the host solve — so the second kind reuses the
    executables)."""
    import jax.numpy as jnp
    from imagestitch_tpu import stitch
    from imagestitch_tpu.config import (
        PipelineConfig, DetectorConfig, MatcherConfig, RansacConfig,
        SeamConfig, WarpConfig, CameraConfig)
    from imagestitch_tpu.utils.io import synthetic_sequence
    # same stage configs / shapes as test_pipeline's ST_CFG (shares the
    # batched detect + match_all executables when caches survive the module
    # boundary; harmless otherwise)
    views, shift = synthetic_sequence(4, 160, 224, overlap=0.5, seed=50)
    cfg = PipelineConfig(
        detector=DetectorConfig(nfeatures=256, max_keypoints=768),
        matcher=MatcherConfig(max_matches=256),
        ransac=RansacConfig(num_hypotheses=512),
        camera=CameraConfig(ba_refine=False),
        warp=WarpConfig(kind="plane", canvas_scale_w=1.8, canvas_scale_h=1.4),
        seam=SeamConfig(kind=seam_kind))
    pano, metrics = stitch(views, cfg)
    assert pano.shape[1] > 224 + shift
    assert pano.std() > 20


def test_banded_matches_bk_on_corridor():
    """The dual-Dijkstra banded solver is EXACT for corridor topologies:
    same partition as BK on a mid-size overlap."""
    rng = np.random.RandomState(7)
    h, w = 120, 200
    img = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    i1 = img + rng.randn(h, w, 3).astype(np.float32) * 2
    i2 = img + rng.randn(h, w, 3).astype(np.float32) * 2
    m1 = np.zeros((h, w), bool); m1[:, :140] = True
    m2 = np.zeros((h, w), bool); m2[:, 60:] = True
    a_bk = graphcut_seam_pair(i1, i2, m1, m2, method="bk")
    a_bd = graphcut_seam_pair(i1, i2, m1, m2, method="banded")
    agree = np.mean([(x == y).mean() for x, y in zip(a_bk, a_bd)])
    assert agree > 0.995, agree


def test_banded_1080p_speed_and_differs_from_dp():
    """The round-1 verdict's done-criterion: graphcut on a 1080p-scale pair
    runs in well under 1 s and the cut differs from the plain DP seam where
    it should (the cut is free to move non-monotonically)."""
    import time
    import jax.numpy as jnp
    from imagestitch_tpu.seam.dp import dp_seam_pair

    rng = np.random.RandomState(3)
    h, w = 1080, 1920
    base = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    i1 = base + rng.randn(h, w, 3).astype(np.float32) * 3
    i2 = base + rng.randn(h, w, 3).astype(np.float32) * 3
    # a bright blob misaligned between the two images: the optimal cut must
    # swerve around it
    i2[400:700, 900:1100] += 120.0
    m1 = np.zeros((h, w), bool); m1[:, :1200] = True
    m2 = np.zeros((h, w), bool); m2[:, 700:] = True

    graphcut_seam_pair(i1, i2, m1, m2)        # warm (allocator, native lib)
    t0 = time.perf_counter()
    g1, g2 = graphcut_seam_pair(i1, i2, m1, m2)
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"banded graphcut took {dt:.2f}s"
    # valid partition of the overlap
    ov = m1 & m2
    assert not (g1 & g2 & ov).any()
    assert (g1 | g2)[ov].all()

    d1, d2, _ = dp_seam_pair(jnp.asarray(i1), jnp.asarray(i2),
                             jnp.asarray(m1), jnp.asarray(m2))
    d1 = np.asarray(d1)
    assert (g1 != d1)[ov].mean() > 0.001  # the cut found a different seam


def test_banded_horizontal_arrangement():
    """Stacked pair -> corridor transposed, horizontal cut."""
    rng = np.random.RandomState(11)
    h, w = 400, 300
    base = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    i1 = base.copy()
    i2 = base + 40.0                 # images disagree everywhere...
    i2[195:205] = base[195:205]      # ...except an interior horizontal band
    m1 = np.zeros((h, w), bool); m1[:260] = True
    m2 = np.zeros((h, w), bool); m2[150:] = True
    g1, g2 = graphcut_seam_pair(i1, i2, m1, m2, method="banded")
    ov = m1 & m2
    assert not (g1 & g2 & ov).any()
    assert (g1 | g2)[ov].all()
    # the horizontal cut runs through the agreement band: img1 keeps the
    # rows above it, img2 the rows below
    assert g1[150:195].all()
    assert g2[205:260].all()


class TestOpenCVGraphCutParity:
    """Differential vs cv2.detail.GraphCutSeamFinder("COST_COLOR") — the
    default seam finder of most reference mains (ref 特征点检测.cpp
    :1128-1136). The cost model (squared color diffs + weight_eps, terminal
    10000, bad-region penalty 1000) reproduces OpenCV's
    setGraphWeightsColor; both the full-BK and the banded planar-dual
    solver must match the oracle's mask split."""

    @staticmethod
    def _scene(H, W, seed):
        cv2 = __import__("cv2")
        r = np.random.default_rng(seed)
        base = r.uniform(0, 255, (H // 8, W // 8, 3))
        s = cv2.resize(base.astype(np.float32), (W, H),
                       interpolation=cv2.INTER_CUBIC)
        return np.clip(s, 0, 255)

    @staticmethod
    def _cv_masks(tiles, corners, tmasks, canvas_hw):
        cv2 = __import__("cv2")
        gc = cv2.detail_GraphCutSeamFinder("COST_COLOR")
        mo = gc.find([t.astype(np.float32) for t in tiles], corners,
                     [m.copy() for m in tmasks])
        mo = [m.get() if isinstance(m, cv2.UMat) else np.asarray(m)
              for m in mo]
        out = []
        for (x, y), tile, m in zip(corners, tiles, mo):
            full = np.zeros(canvas_hw, bool)
            h, w = tile.shape[:2]
            full[y:y + h, x:x + w] = m > 0
            out.append(full)
        return out

    def test_bk_and_banded_match_cv2(self):
        """Horizontal pair, exposure+noise difference in the overlap: both
        solvers reproduce cv2's cut pixel-exactly."""
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(5)
        H, W = 480, 640
        scene = self._scene(H, W, 1)
        x2, w1 = 240, 400
        t1 = scene[:, :w1].copy()
        t2 = np.clip(scene[:, x2:] * 1.06
                     + rng.normal(0, 4, (H, W - x2, 3)), 0, 255)
        t2 = t2.astype(np.float32)
        tm1 = np.full((H, w1), 255, np.uint8)
        tm2 = np.full((H, W - x2), 255, np.uint8)
        cv_m1, cv_m2 = self._cv_masks([t1, t2], [(0, 0), (x2, 0)],
                                      [tm1, tm2], (H, W))

        c1 = np.zeros((H, W, 3), np.float32); c1[:, :w1] = t1
        c2 = np.zeros((H, W, 3), np.float32); c2[:, x2:] = t2
        m1 = np.zeros((H, W), bool); m1[:, :w1] = True
        m2 = np.zeros((H, W), bool); m2[:, x2:] = True
        ov = m1 & m2
        for method in ("bk", "banded"):
            o1, o2 = graphcut_seam_pair(c1, c2, m1, m2, method=method)
            agree = ((o1 == cv_m1) & (o2 == cv_m2))[ov].mean()
            assert agree > 0.999, (method, agree)

    def test_trapezoid_masks_match_cv2(self):
        """Non-rectangular (trapezoid) warped-style masks engage the
        bad-region penalty terms; still pixel-exact vs cv2."""
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(7)
        H, W = 360, 560
        scene = self._scene(H, W, 2)
        x2, w1 = 200, 360
        t1 = scene[:, :w1].copy()
        t2 = np.clip(scene[:, x2:] * 0.94
                     + rng.normal(0, 5, (H, W - x2, 3)), 0, 255)
        t2 = t2.astype(np.float32)
        tm1 = np.zeros((H, w1), np.uint8)
        tm2 = np.zeros((H, W - x2), np.uint8)
        for y in range(H):
            sh = int(30 * y / H)
            tm1[y, :w1 - sh] = 255
            tm2[y, sh:] = 255
        cv_m1, cv_m2 = self._cv_masks([t1, t2], [(0, 0), (x2, 0)],
                                      [tm1, tm2], (H, W))

        c1 = np.zeros((H, W, 3), np.float32); c1[:, :w1] = t1
        c2 = np.zeros((H, W, 3), np.float32); c2[:, x2:] = t2
        m1 = np.zeros((H, W), bool); m1[:, :w1] = tm1 > 0
        m2 = np.zeros((H, W), bool); m2[:, x2:] = tm2 > 0
        c1 *= m1[..., None]
        c2 *= m2[..., None]
        ov = m1 & m2
        for method in ("bk", "banded"):
            o1, o2 = graphcut_seam_pair(c1, c2, m1, m2, method=method)
            agree = ((o1 == cv_m1) & (o2 == cv_m2))[ov].mean()
            assert agree > 0.999, (method, agree)

    def test_color_grad_matches_cv2(self):
        """COST_COLOR_GRAD (gradient-normalized weights): full-canvas tiles
        at corner (0,0), so cv2's per-tile Sobel dx_/dy_ maps equal ours on
        the canvas — both solvers must be pixel-exact."""
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(11)
        H, W = 300, 420
        sc = self._scene(H, W, 4)
        img1 = np.clip(sc + rng.normal(0, 3, sc.shape), 0,
                       255).astype(np.float32)
        img2 = np.clip(sc * 1.05 + rng.normal(0, 3, sc.shape), 0,
                       255).astype(np.float32)
        m1 = np.zeros((H, W), np.uint8)
        m1[:, :280] = 255
        m2 = np.zeros((H, W), np.uint8)
        m2[:, 140:] = 255

        gc = cv2.detail_GraphCutSeamFinder("COST_COLOR_GRAD")
        mo = gc.find([img1, img2], [(0, 0), (0, 0)],
                     [m1.copy(), m2.copy()])
        mo = [m.get() if isinstance(m, cv2.UMat) else np.asarray(m)
              for m in mo]
        cv_m1, cv_m2 = (mo[0] > 0), (mo[1] > 0)

        ov = (m1 > 0) & (m2 > 0)
        for method in ("bk", "banded"):
            o1, o2 = graphcut_seam_pair(img1, img2, m1 > 0, m2 > 0,
                                        use_grad=True, method=method)
            agree = ((o1 == cv_m1) & (o2 == cv_m2))[ov].mean()
            assert agree > 0.999, (method, agree)

    def test_stacked_pair_matches_cv2(self):
        """Vertically-arranged pair: the banded solver's transpose path and
        BK both match cv2's horizontal seam."""
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(9)
        H, W = 560, 360
        scene = self._scene(H, W, 3)
        y2, h1 = 200, 360
        t1 = scene[:h1].copy()
        t2 = np.clip(scene[y2:] * 1.05
                     + rng.normal(0, 5, (H - y2, W, 3)), 0, 255)
        t2 = t2.astype(np.float32)
        tm1 = np.full((h1, W), 255, np.uint8)
        tm2 = np.full((H - y2, W), 255, np.uint8)
        cv_m1, cv_m2 = self._cv_masks([t1, t2], [(0, 0), (0, y2)],
                                      [tm1, tm2], (H, W))

        c1 = np.zeros((H, W, 3), np.float32); c1[:h1] = t1
        c2 = np.zeros((H, W, 3), np.float32); c2[y2:] = t2
        m1 = np.zeros((H, W), bool); m1[:h1] = True
        m2 = np.zeros((H, W), bool); m2[y2:] = True
        ov = m1 & m2
        for method in ("bk", "banded"):
            o1, o2 = graphcut_seam_pair(c1, c2, m1, m2, method=method)
            agree = ((o1 == cv_m1) & (o2 == cv_m2))[ov].mean()
            assert agree > 0.999, (method, agree)


def test_banded_adaptive_growth_matches_bk():
    """A cost field whose optimal cut strays far (>64 columns) from the DP
    seed: the adaptive band doubling must still land on the full-BK cut
    (round-2's fixed ±64 corridor was silently suboptimal here)."""
    H, W = 360, 400
    m1 = np.zeros((H, W), bool); m1[:, :380] = True
    m2 = np.zeros((H, W), bool); m2[:, 20:] = True

    # DP (per-pixel cost) prefers column 40: pixel cost 0 there, but its
    # right neighbor costs 500, so CUTTING at (40,41) is expensive; the
    # cheap CUT channel is at (300,301) — 260 columns away from the seed
    val = np.full((H, W), 100.0, np.float32)
    val[:, 40] = 0.0
    val[:, 41] = 500.0
    val[100:, 300] = 0.0
    val[100:, 301] = 0.0
    val[:100, 300] = 30.0
    val[:100, 301] = 30.0
    img1 = np.zeros((H, W, 3), np.float32)
    img2 = np.zeros((H, W, 3), np.float32)
    img2[..., 0] = np.sqrt(val)

    o1b, o2b = graphcut_seam_pair(img1, img2, m1, m2, method="bk")
    o1d, o2d = graphcut_seam_pair(img1, img2, m1, m2, method="banded")
    ov = m1 & m2
    assert ((o1b == o1d) & (o2b == o2d))[ov].all()
    # and the cut actually sits in the far channel, not at the DP seed
    kept1 = o1b & ov
    rightmost = max(int(kept1[y].nonzero()[0].max()) for y in range(100, H))
    assert rightmost >= 295
