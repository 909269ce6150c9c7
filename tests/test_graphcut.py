"""Native maxflow + GraphCut seam tests."""

import numpy as np

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


def test_stitcher_graphcut_path():
    """4-image Stitcher run with the host graphcut seam."""
    import jax.numpy as jnp
    from imagestitch_tpu import stitch
    from imagestitch_tpu.config import (
        PipelineConfig, DetectorConfig, MatcherConfig, RansacConfig,
        SeamConfig, WarpConfig, CameraConfig)
    from imagestitch_tpu.utils.io import synthetic_sequence
    views, shift = synthetic_sequence(3, 160, 224, overlap=0.5, seed=50)
    cfg = PipelineConfig(
        detector=DetectorConfig(nfeatures=128, max_keypoints=384),
        matcher=MatcherConfig(max_matches=192),
        ransac=RansacConfig(num_hypotheses=256),
        camera=CameraConfig(ba_refine=False),
        warp=WarpConfig(kind="plane", canvas_scale_w=1.8, canvas_scale_h=1.4),
        seam=SeamConfig(kind="graphcut"))
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
