"""End-to-end pipeline tests on synthetic scenes with known geometry.

Program-sharing design (suite health, VERDICT r2 #7): XLA:CPU compiles of
the monolithic stitch programs dominate suite wall time, so tests reuse a
small set of (config, shape) combinations —

- the 192x256 FAST_CFG pair program (translation / determinism / failure
  tests are cache hits after the first compile);
- a module-scoped `stitch_pair_front` result that the per-blender and
  per-seam tests drive through the eager `_seam_and_blend` stage (the same
  dispatch code `stitch_pair` jits, minus 8 full-program recompiles);
- one CHAIN_CFG for the fixed-N chain tests and one ST_CFG for every
  host-Stitcher test (shared batched-detect / match_all executables).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from imagestitch_tpu import PipelineConfig, stitch, stitch_pair
from imagestitch_tpu.config import (
    DetectorConfig, MatcherConfig, RansacConfig, BlendConfig, SeamConfig,
    CameraConfig, WarpConfig,
)
from imagestitch_tpu.utils.io import synthetic_pair, synthetic_sequence

FAST_CFG = PipelineConfig(
    detector=DetectorConfig(nfeatures=256, max_keypoints=768),
    matcher=MatcherConfig(max_matches=256),
    ransac=RansacConfig(num_hypotheses=512),
    camera=CameraConfig(ba_iters=10),
)

_TESTS_RUN = {"n": 0}


@pytest.fixture(autouse=True)
def _midmodule_cache_clear():
    """This module now accumulates enough giant stitch executables to cross
    the XLA:CPU SIGSEGV threshold MID-module (conftest clears caches only at
    module boundaries; both round-4 full-file runs died at test #32 inside
    backend_compile_and_load while every test passes in isolation).
    Clearing every 10 tests keeps the live-executable footprint bounded for
    a few cheap O0 recompiles of the shared programs."""
    yield
    _TESTS_RUN["n"] += 1
    if _TESTS_RUN["n"] % 10 == 0:
        jax.clear_caches()

# every fixed-N chain test shares this program (jitted chain at 160x224, N=4)
CHAIN_CFG = PipelineConfig(
    detector=FAST_CFG.detector,
    matcher=FAST_CFG.matcher,
    ransac=FAST_CFG.ransac,
    camera=CameraConfig(ba_refine=False),
    warp=WarpConfig(kind="plane", canvas_scale_w=2.2, canvas_scale_h=1.4),
)

# every host-Stitcher test shares these detect/match executables
# (4 views at 160x224)
ST_CFG = CHAIN_CFG.replace(
    warp=WarpConfig(kind="plane", canvas_scale_w=1.8, canvas_scale_h=1.4))


def test_stitch_pair_translation_scene():
    img1, img2, shift = synthetic_pair(192, 256, overlap=0.5, seed=21)
    pano, metrics = stitch_pair(img1, img2, FAST_CFG)
    assert metrics["h_valid"]
    assert metrics["num_inliers"] > 20
    # pano must be wider than either input and roughly W + shift wide
    assert pano.shape[1] > 256
    assert abs(pano.shape[1] - (256 + shift)) < 60  # cylindrical shrinks a bit
    assert pano.shape[0] >= 160
    assert pano.dtype == np.uint8
    # interior is non-trivial
    assert pano.std() > 20


@pytest.fixture(scope="module")
def pair_front_192():
    """Stages 1-7 (detect → gain-compensated shared-frame warps) computed
    ONCE for the blender/seam parametrizations below — the per-kind tests
    exercise the same `_seam_and_blend` dispatch `stitch_pair` runs, without
    recompiling the whole front program per kind."""
    from imagestitch_tpu.pipeline import stitch_pair_front
    img1, img2, shift = synthetic_pair(192, 256, overlap=0.5, seed=22)
    warped, masks, corner, metrics = stitch_pair_front(
        jnp.asarray(img1, jnp.float32), jnp.asarray(img2, jnp.float32),
        jax.random.key(0), FAST_CFG)
    assert bool(metrics["h_valid"])
    return warped, masks, shift


@pytest.mark.parametrize("blend_kind", ["feather", "multiband", "ramp", "none"])
def test_stitch_pair_all_blenders(pair_front_192, blend_kind):
    from imagestitch_tpu.pipeline import _seam_and_blend
    warped, masks, shift = pair_front_192
    cfg = FAST_CFG.replace(blend=BlendConfig(kind=blend_kind, num_bands=3))
    pano, valid = _seam_and_blend(warped, masks, cfg, src_w=256, src_h=192)
    pano = np.asarray(pano)
    valid = np.asarray(valid)
    assert np.isfinite(pano).all()
    # the composed coverage spans both images: wider than either mask alone
    cols = valid.any(axis=0)
    assert cols.sum() > np.asarray(masks[0]).any(axis=0).sum() + shift // 2
    assert pano[valid].std() > 20


@pytest.mark.parametrize("seam_kind", ["dp_color", "dp_colorgrad", "voronoi",
                                       "none"])
def test_stitch_pair_all_seams(pair_front_192, seam_kind):
    from imagestitch_tpu.pipeline import _seam_and_blend
    warped, masks, shift = pair_front_192
    cfg = FAST_CFG.replace(seam=SeamConfig(kind=seam_kind))
    pano, valid = _seam_and_blend(warped, masks, cfg, src_w=256, src_h=192)
    pano = np.asarray(pano)
    valid = np.asarray(valid)
    assert np.isfinite(pano).all()
    cols = valid.any(axis=0)
    assert cols.sum() > np.asarray(masks[0]).any(axis=0).sum() + shift // 2
    assert pano[valid].std() > 20


def test_range_matcher():
    """MatcherConfig.range_width (OpenCV BestOf2NearestRangeMatcher):
    an ordered 4-sequence with range_width=1 matches only the 3
    consecutive pairs (vs 6 all-pairs) and still composes the pano."""
    from imagestitch_tpu.pipeline import Stitcher

    views, shift = synthetic_sequence(4, 160, 224, overlap=0.7, seed=11)
    views = list(np.asarray(views))

    import dataclasses
    cfgr = ST_CFG.replace(
        matcher=dataclasses.replace(ST_CFG.matcher, range_width=1))
    pano, m = Stitcher(cfgr).stitch(views)
    assert len(m["pair_confidences"]) == 3
    assert all(m["reachable"])
    assert pano.shape[1] > 224 + shift

    pano_all, m_all = Stitcher(ST_CFG).stitch(views)
    assert len(m_all["pair_confidences"]) == 6


def test_kitchen_sink_config():
    """Every non-default option at once — work_megapix registration,
    compose_megapix compositing, gain_blocks exposure, graphcut host seam
    at seam_megapix scale, multiband blend, range matcher, mixed input
    sizes. Option interactions are where integration bugs live."""
    import dataclasses
    from imagestitch_tpu.pipeline import Stitcher
    from imagestitch_tpu.config import (ExposureConfig, WarpConfig)

    views, shift = synthetic_sequence(3, 192, 256, overlap=0.7, seed=11)
    views = list(np.asarray(views))
    views[2] = views[2][:176, :240]  # mixed sizes

    cfg = PipelineConfig(
        detector=FAST_CFG.detector,
        matcher=dataclasses.replace(FAST_CFG.matcher, range_width=2),
        ransac=FAST_CFG.ransac,
        camera=CameraConfig(ba_refine=False),
        warp=WarpConfig(kind="plane", canvas_scale_w=1.8,
                        canvas_scale_h=1.4),
        exposure=ExposureConfig(kind="gain_blocks"),
        seam=SeamConfig(kind="graphcut", seam_megapix=0.02),
        blend=BlendConfig(kind="multiband", num_bands=3),
        work_megapix=0.03,
        compose_megapix=0.035,
    )
    pano, m = Stitcher(cfg).stitch(views)
    assert all(m["reachable"])
    assert np.isfinite(pano).all()
    # composited at reduced scale, still a 3-view panorama
    assert pano.shape[1] > pano.shape[0]
    assert pano[np.any(pano > 0, axis=-1)].std() > 15


def test_compose_megapix():
    """PipelineConfig.compose_megapix (stitching_detailed): registration
    at full res, compositing at reduced scale — the pano comes out at
    compose scale with the same relative geometry."""
    from imagestitch_tpu.pipeline import Stitcher

    views, shift = synthetic_sequence(4, 160, 224, overlap=0.7, seed=11)
    views = list(np.asarray(views))

    pano_full, mf = Stitcher(ST_CFG).stitch(views)
    cfg = ST_CFG.replace(compose_megapix=160 * 224 / 4e6)  # ~half scale
    pano_half, mh = Stitcher(cfg).stitch(views)
    assert all(mh["reachable"])
    ratio = pano_full.shape[1] / pano_half.shape[1]
    assert 1.7 < ratio < 2.4


def test_host_seam_megapix(pair_front_192):
    """cfg.seam.seam_megapix (OpenCV stitching_detailed's seam_megapix):
    host seams resolved at reduced scale must still PARTITION the coverage
    and land near the full-resolution cut."""
    from imagestitch_tpu.pipeline import _host_seam_masks

    warped, masks, shift = pair_front_192
    w_np = np.asarray(warped)
    m_np = np.asarray(masks)
    cfg_full = FAST_CFG.replace(seam=SeamConfig(kind="graphcut"))
    cfg_low = FAST_CFG.replace(
        seam=SeamConfig(kind="graphcut", seam_megapix=0.01))

    full = _host_seam_masks(w_np, m_np, cfg_full)
    low = _host_seam_masks(w_np, m_np, cfg_low)

    for res in (full, low):
        # partition: every covered pixel owned by exactly one image
        assert (res.sum(0) == m_np.any(0).astype(res.sum(0).dtype)).all()
        assert (res[0] & res[1]).sum() == 0
    # the coarse cut stays close to the full cut (same scene structure)
    disagree = (full[0] ^ low[0]) & m_np.any(0)
    assert disagree.mean() < 0.06


def test_device_decimated_host_seam_matches_host_path(pair_front_192):
    """The round-4 host-seam split decimates the canvases ON DEVICE and
    upscales the low-res seam masks inside the jitted blend (only the tiny
    seam masks cross the host boundary, not the full-res canvases). The
    result must equal the old all-host path: _host_seam_masks' own
    decimation branch + blend_resolved."""
    from imagestitch_tpu.pipeline import (_host_seam_blend,
                                          _host_seam_masks, blend_resolved)

    warped, masks, _ = pair_front_192
    cfg = FAST_CFG.replace(
        seam=SeamConfig(kind="graphcut", seam_megapix=0.01))

    pano_new, valid_new, _ = _host_seam_blend(warped, masks, cfg)
    sm_host = _host_seam_masks(np.asarray(warped), np.asarray(masks), cfg)
    pano_old, valid_old = blend_resolved(warped, jnp.asarray(sm_host),
                                         masks, cfg)
    assert np.array_equal(np.asarray(valid_new), np.asarray(valid_old))
    assert np.allclose(np.asarray(pano_new), np.asarray(pano_old),
                       atol=1e-4)


def test_fullres_bbox_host_seam_matches_full_readback():
    """The full-resolution graphcut pair split reads back only the
    overlap bbox as uint8 (round-5: the full-canvas float32 readback was
    6.2 s of the 6.8 s total through the dev tunnel). The bbox+uint8 path
    must produce the same coverage PARTITION as the all-host float path,
    with the cut itself at most nudged by the uint8 quantization."""
    from imagestitch_tpu.pipeline import _host_seam_blend, _host_seam_masks

    rng = np.random.default_rng(3)
    Hc, Wc = 600, 1400
    yy, xx = np.mgrid[0:Hc, 0:Wc].astype(np.float32)
    base = (120 + 60 * np.sin(xx / 37.0) * np.cos(yy / 23.0))
    w1 = np.stack([base + 10 * rng.random((Hc, Wc)) for _ in range(3)], -1)
    w2 = np.stack([base + 10 * rng.random((Hc, Wc)) for _ in range(3)], -1)
    # a zero-cost channel through the overlap makes the optimal cut
    # DISTINCT (pure-noise differences leave the min cut degenerate, and
    # any perturbation legally moves it): both paths must find it
    w2[:, 690:710] = w1[:, 690:710]
    m1 = np.zeros((Hc, Wc), bool)
    m2 = np.zeros((Hc, Wc), bool)
    m1[:, :800] = True
    m2[:, 600:] = True
    warped = jnp.asarray(np.stack([w1, w2]), jnp.float32)
    masks = jnp.asarray(np.stack([m1, m2]))
    cfg = FAST_CFG.replace(
        seam=SeamConfig(kind="graphcut", seam_megapix=-1.0),
        blend=BlendConfig(kind="none"))

    pano, valid, sm_new = _host_seam_blend(warped, masks, cfg)
    sm_new = np.asarray(sm_new)
    m_np = np.asarray(masks)
    # partition: every covered pixel owned by exactly one image
    assert (sm_new.any(0) == m_np.any(0)).all()
    assert not (sm_new[0] & sm_new[1]).any()
    assert (sm_new[0] <= m_np[0]).all() and (sm_new[1] <= m_np[1]).all()
    # vs the all-host float32 full-canvas path
    sm_ref = _host_seam_masks(np.asarray(warped), m_np, cfg)
    disagree = (sm_new[0] ^ sm_ref[0]) & m_np.any(0)
    assert disagree.mean() < 0.02, disagree.mean()
    assert np.isfinite(np.asarray(pano)).all()


def test_stitch_three_images_fullres_graphcut():
    """N>2 full-resolution graphcut goes through the quantized full-canvas
    readback (no single pairwise bbox to crop to): the Stitcher's 3-image
    pano must still partition and compose."""
    import dataclasses

    from imagestitch_tpu.pipeline import stitch
    from imagestitch_tpu.utils.io import synthetic_sequence

    from imagestitch_tpu.config import WarpConfig

    views, shift = synthetic_sequence(3, 192, 256, overlap=0.7, seed=11)
    cfg = FAST_CFG.replace(
        warp=WarpConfig(kind="plane", canvas_scale_w=1.8,
                        canvas_scale_h=1.4),
        camera=CameraConfig(ba_refine=False),
        seam=SeamConfig(kind="graphcut", seam_megapix=-1.0),
        matcher=dataclasses.replace(FAST_CFG.matcher, conf_thresh=0.3))
    pano, metrics = stitch(views, cfg)
    assert pano.shape[1] > 256 + shift      # spans all three views
    assert np.asarray(pano).std() > 20
    assert all(metrics["reachable"])


def test_stitch_pair_plane_warp_reconstructs_scene():
    """With plane warp + pure translation the pano should reproduce the
    underlying wide scene almost exactly."""
    from imagestitch_tpu.utils.io import _render_scene
    H, W, overlap = 240, 320, 0.5
    img1, img2, shift = synthetic_pair(H, W, overlap=overlap, seed=24)
    scene = _render_scene(H, W + shift, 24)
    cfg = FAST_CFG.replace(warp=WarpConfig(kind="plane", canvas_scale_w=2.5,
                                           canvas_scale_h=1.5),
                           camera=CameraConfig(ba_refine=False))
    pano, metrics = stitch_pair(img1, img2, cfg)
    assert metrics["h_valid"]
    # plane warp of a translation-only pair: canvas = scene size
    assert abs(pano.shape[1] - (W + shift)) <= 3
    assert abs(pano.shape[0] - H) <= 3
    h = min(pano.shape[0], H)
    w = min(pano.shape[1], W + shift)
    err = np.abs(pano[:h, :w].astype(np.float32)
                 - scene[:h, :w].astype(np.float32)).mean()
    assert err < 8.0


def test_stitch_pair_ba_reproj():
    """ba_kind="reproj" (BundleAdjusterReproj) through the full jitted pair
    path: valid H, sane pano geometry (mirror of the translation test)."""
    img1, img2, shift = synthetic_pair(192, 256, overlap=0.5, seed=21)
    cfg = FAST_CFG.replace(camera=CameraConfig(ba_iters=10,
                                               ba_kind="reproj"))
    pano, metrics = stitch_pair(img1, img2, cfg)
    assert metrics["h_valid"]
    assert metrics["num_inliers"] > 20
    assert pano.shape[1] > 256
    assert abs(pano.shape[1] - (256 + shift)) < 60
    assert pano.std() > 20


def test_stitch_pair_scans_mode():
    """SCANS (affine) mode on a similarity-related pair: the recovered
    canvas must match the ANALYTIC union of the two view footprints under
    the ground-truth affine (the affine warp is exact — no projective
    ambiguity), and the affine matcher must validate the pair."""
    from imagestitch_tpu.utils.io import synthetic_affine_pair

    H, W = 192, 256
    img1, img2, A_true = synthetic_affine_pair(H, W, angle_deg=6.0,
                                               scale=1.04, seed=5)
    cfg = FAST_CFG.replace(mode="scans")
    pano, m = stitch_pair(img1, img2, cfg)
    assert m["h_valid"]
    assert m["num_inliers"] > 15

    A = np.vstack([A_true, [0.0, 0.0, 1.0]])
    G1 = np.linalg.inv(A)                  # view2 pixels -> canvas
    corners = np.array([[0, 0, 1], [W, 0, 1], [0, H, 1], [W, H, 1]],
                       np.float64) @ G1.T
    exp_w = max(W, corners[:, 0].max()) - min(0.0, corners[:, 0].min())
    exp_h = max(H, corners[:, 1].max()) - min(0.0, corners[:, 1].min())
    assert abs(pano.shape[1] - exp_w) < 0.04 * exp_w + 6
    assert abs(pano.shape[0] - exp_h) < 0.04 * exp_h + 6
    assert pano.std() > 20


def test_stitcher_and_chain_scans_sequence():
    """N=4 translation sequence (an affine subset) through BOTH scans
    drivers: the host Stitcher (MST affine chaining) and the jitted
    fixed-N chain. Both panos must span the full sweep."""
    from imagestitch_tpu import stitch, stitch_chain

    views, shift = synthetic_sequence(4, 160, 224, overlap=0.5, seed=50)
    cfg = ST_CFG.replace(mode="scans")
    pano, m = stitch(views, cfg)
    assert pano.shape[1] > 224 + 3 * shift - 24
    assert all(bool(r) for r in np.asarray(m["reachable"]))

    cfg2 = CHAIN_CFG.replace(mode="scans")
    pano2, m2 = stitch_chain(views, cfg2)
    assert pano2.shape[1] > 224 + 3 * shift - 24
    assert all(bool(v) for v in m2["h_valid"])


def test_stream_stitcher_scans_mode():
    """StreamStitcher in scans mode: calibrate on a translated sequence
    (affine subset), compose a brightness-shifted frame set with the
    frozen affine registration."""
    from imagestitch_tpu import StreamStitcher

    views, shift = synthetic_sequence(3, 160, 224, overlap=0.5, seed=60)
    cfg = ST_CFG.replace(mode="scans")
    ss = StreamStitcher(cfg)
    pano0, m0 = ss.calibrate(views)
    assert pano0.shape[1] > 224 + 2 * shift - 16
    frames = [np.clip(v.astype(np.int32) + 12, 0, 255).astype(np.uint8)
              for v in views]
    pano1 = ss.compose(frames)
    assert pano1.shape == pano0.shape
    assert pano1.std() > 20


def test_stitch_deterministic():
    img1, img2, _ = synthetic_pair(192, 256, overlap=0.5, seed=25)
    p1, m1 = stitch_pair(img1, img2, FAST_CFG, seed=7)
    p2, m2 = stitch_pair(img1, img2, FAST_CFG, seed=7)
    assert np.array_equal(p1, p2)


def test_stitch_multi_image_sequence():
    views, shift = synthetic_sequence(4, 160, 224, overlap=0.5, seed=26)
    pano, metrics = stitch(views, ST_CFG)
    assert metrics["n_images"] == 4
    # pano should cover ~ W + 3*shift
    assert pano.shape[1] > 224 + 2 * shift
    assert pano.std() > 20


def test_stitch_unrelated_images_flagged():
    img1, _, _ = synthetic_pair(192, 256, seed=30)
    img2, _, _ = synthetic_pair(192, 256, seed=31)
    pano, metrics = stitch_pair(img1, img2, FAST_CFG)
    # must not crash; low confidence signals failure
    assert metrics["confidence"] < 1.0 or metrics["num_inliers"] < 20


def test_work_megapix_registration_scale():
    """work_megapix: registration at reduced scale, compositing at full
    res; the pano matches the full-scale pano (VERDICT round-1 #7)."""
    from imagestitch_tpu.pipeline import _work_scale

    i1, i2, shift = synthetic_pair(320, 448, overlap=0.5, seed=6)
    cfg_full = FAST_CFG
    cfg_work = cfg_full.replace(work_megapix=0.036)  # ~160x224 work images
    ws = _work_scale(cfg_work, (320, 448))
    assert 0.3 < ws < 0.7

    p_full, m_full = stitch_pair(i1, i2, cfg_full)
    p_work, m_work = stitch_pair(i1, i2, cfg_work)
    assert m_full["h_valid"] and m_work["h_valid"]
    assert m_work["num_inliers"] > 20
    # same topology: pano sizes agree to a few pixels, content at full res
    assert abs(p_full.shape[1] - p_work.shape[1]) < 12
    assert abs(p_full.shape[0] - p_work.shape[0]) < 12


def test_stitch_chain_jitted_fixed_n():
    """The fully-jitted fixed-N chain path (BASELINE configs 2/4): a 4-image
    pan sequence stitched as ONE XLA program matches the host Stitcher."""
    from imagestitch_tpu.pipeline import stitch_chain

    views, shift = synthetic_sequence(4, 160, 224, overlap=0.5, seed=9)
    pano_c, m_c = stitch_chain(views, CHAIN_CFG)
    assert all(m_c["h_valid"])
    pano_s, m_s = stitch(views, CHAIN_CFG)
    # both drivers recover the same layout
    assert abs(pano_c.shape[1] - pano_s.shape[1]) < 10
    assert pano_c.shape[1] > 224 + 2 * shift


def test_stitch_chain_splice_bridges_broken_link():
    """cfg.chain_splice: a corrupted middle image breaks both of its
    consecutive pairs; the skip pair i-1 -> i+1 bridges its neighbors so
    only the corrupted image drops out (without splice, everything
    downstream of the break is unreachable). Same shapes/config as
    test_stitch_chain_jitted_fixed_n so the no-splice program is a cache
    hit."""
    from imagestitch_tpu.pipeline import stitch_chain

    views, shift = synthetic_sequence(4, 160, 224, overlap=0.7, seed=31)
    views = list(np.asarray(views))
    views[2] = np.asarray(
        np.random.default_rng(0).integers(0, 255, views[2].shape), np.uint8)

    pano0, m0 = stitch_chain(views, CHAIN_CFG)
    assert list(np.asarray(m0["reachable"])) == [True, True, False, False]

    pano1, m1 = stitch_chain(views, CHAIN_CFG.replace(chain_splice=True))
    assert list(np.asarray(m1["reachable"])) == [True, True, False, True]
    # image 3 composes again: the bridged pano extends past the break
    assert pano1.shape[1] > pano0.shape[1] + shift // 2


def test_stitch_chain_splice_scans_mode():
    """chain_splice in SCANS mode: the affine chain bridges a corrupted
    middle image through the skip pair (mirror of the rotation splice
    test)."""
    from imagestitch_tpu.pipeline import stitch_chain

    views, shift = synthetic_sequence(4, 160, 224, overlap=0.7, seed=31)
    views = list(np.asarray(views))
    views[2] = np.asarray(
        np.random.default_rng(0).integers(0, 255, views[2].shape), np.uint8)

    cfg = CHAIN_CFG.replace(mode="scans")
    pano0, m0 = stitch_chain(views, cfg)
    assert list(np.asarray(m0["reachable"])) == [True, True, False, False]

    pano1, m1 = stitch_chain(views, cfg.replace(chain_splice=True))
    assert list(np.asarray(m1["reachable"])) == [True, True, False, True]
    assert pano1.shape[1] > pano0.shape[1] + shift // 2


def test_matcher_affine_confidence_not_zeroed():
    """Heavy overlap pushes the Brown-Lowe confidence past 3: the
    homography matcher zeroes it ('too close to be believable', ref :198)
    but OpenCV's affine matcher does NOT (the zeroing is commented out in
    cv2's matchers.cpp) — a near-identical scans pair must stay usable.
    Manufactured identical feature sets with > 240 matches put the raw
    confidence M/(8+0.3M) above 3 deterministically."""
    from imagestitch_tpu.matching.matcher import match_pair
    from imagestitch_tpu.types import ImageFeatures

    rng = np.random.default_rng(7)
    CAP, n = 512, 320
    f = ImageFeatures(
        xy=jnp.asarray(rng.uniform(0, 200, (CAP, 2)), jnp.float32),
        response=jnp.zeros((CAP,), jnp.float32),
        angle=jnp.zeros((CAP,), jnp.float32),
        size=jnp.zeros((CAP,), jnp.float32),
        level=jnp.zeros((CAP,), jnp.int32),
        valid=jnp.asarray(np.arange(CAP) < n),
        descriptors=jnp.asarray(rng.integers(0, 2, (CAP, 256)), jnp.uint8),
        img_size=jnp.asarray([200, 200], jnp.int32))

    res_h = match_pair(f, f, jax.random.key(0), cfg=MatcherConfig())
    res_a = match_pair(f, f, jax.random.key(0),
                       cfg=MatcherConfig(motion="affine_partial"))
    # identical feature sets: every keypoint self-matches at distance 0
    # and fits the identity transform
    assert int(res_a.num_matches()) >= 241
    assert float(res_h.confidence) == 0.0          # zeroed (> 3)
    assert float(res_a.confidence) > 3.0           # kept


def test_config_rejects_affine_motion_in_panorama_mode():
    with pytest.raises(AssertionError):
        PipelineConfig(matcher=MatcherConfig(motion="affine"))


def test_stitch_pair_mixed_sizes():
    """img1 and img2 with DIFFERENT shapes (cv2.detail supports per-image
    sizes): per-image stages run on each image's own static shape, the
    shared-canvas warp pads with edge replication and bounds samples by the
    true sizes."""
    from imagestitch_tpu.pipeline import stitch_pair

    i1, i2, shift = synthetic_pair(160, 224, overlap=0.6, seed=0)
    i2c = np.asarray(i2)[:144, :192]
    pano, m = stitch_pair(np.asarray(i1), i2c)
    assert m["h_valid"]
    # pano extends past img1's width by roughly the known shift
    assert pano.shape[1] > 224 + shift // 2


def test_stitcher_mixed_sizes():
    """N-image host Stitcher with heterogeneous input sizes: the cropped
    middle image must still register (keypoints masked to its true border)
    and compose (warp bounded by its true extent — no replicate-padding
    streaks in the pano)."""
    from imagestitch_tpu.pipeline import Stitcher

    views, shift = synthetic_sequence(3, 160, 224, overlap=0.7, seed=11)
    views = list(np.asarray(views))
    views[1] = views[1][:144, :200]

    pano, m = Stitcher(CHAIN_CFG).stitch(views)
    assert all(m["reachable"])
    assert pano.shape[1] > 224 + shift
    # uniform-size control: same scene uncropped must also compose wider
    pano_u, mu = Stitcher(CHAIN_CFG).stitch(
        list(np.asarray(synthetic_sequence(3, 160, 224, overlap=0.7,
                                           seed=11)[0])))
    assert all(mu["reachable"])
    assert abs(pano_u.shape[1] - pano.shape[1]) < 64


def test_stitcher_2x2_grid():
    """2-D (non-chain) topology: a 2x2 grid of viewports with horizontal
    AND vertical overlaps. The host Stitcher's MST must register all four
    views (the match graph has row, column, and diagonal edges) and the
    tree-ordered seam resolution must handle both seam orientations. The
    pano must extend in BOTH axes and reach all four corners."""
    from imagestitch_tpu import stitch
    from imagestitch_tpu.utils.io import synthetic_grid

    views, sx, sy = synthetic_grid(2, 2, 160, 224, overlap=0.55, seed=33)
    cfg = ST_CFG.replace(warp=WarpConfig(kind="plane", canvas_scale_w=1.8,
                                         canvas_scale_h=1.8))
    pano, metrics = stitch(views, cfg)
    assert pano.shape[1] > 224 + sx * 0.6
    assert pano.shape[0] > 160 + sy * 0.6
    assert pano.std() > 20
    # every view registered (reachable from the MST center)
    reach = metrics.get("reachable")
    if reach is not None:
        assert all(bool(r) for r in np.asarray(reach))


def test_stage_dump(tmp_path):
    """dump_stages writes per-stage .npz checkpoints (SURVEY §5 analogue of
    the reference's intermediate .bmp dumps)."""
    import os
    from imagestitch_tpu.pipeline import Stitcher

    views, _ = synthetic_sequence(4, 160, 224, overlap=0.5, seed=13)
    d = str(tmp_path / "stages")
    pano, m = Stitcher(ST_CFG).stitch(views, dump_stages=d)
    for name in ("features", "matches", "cameras", "warped", "pano"):
        f = os.path.join(d, f"{name}.npz")
        assert os.path.exists(f), name
    z = np.load(os.path.join(d, "matches.npz"))
    assert z["H"].shape[-2:] == (3, 3)


def test_stream_stitcher_reuses_registration():
    """StreamStitcher: calibrate once, compose new frames with frozen
    cameras/seams; composed pano of the calibration frames matches."""
    from imagestitch_tpu import StreamStitcher

    views, _ = synthetic_sequence(4, 160, 224, overlap=0.5, seed=14)
    ss = StreamStitcher(ST_CFG)
    pano_cal, m = ss.calibrate(views)
    pano_same = ss.compose(views)
    assert pano_cal.shape == pano_same.shape
    assert np.abs(pano_cal.astype(np.int32)
                  - pano_same.astype(np.int32)).mean() < 1.0
    # new frames (brightness-shifted content, same rig) compose fine
    views2 = [np.clip(v.astype(np.int32) + 12, 0, 255).astype(np.uint8)
              for v in views]
    pano2 = ss.compose(views2)
    assert pano2.shape == pano_cal.shape
    assert pano2.astype(np.float32).mean() > pano_cal.astype(np.float32).mean()


def test_wave_correct_on_chain():
    """Wave correction enabled on a 4-image chain: the stitch still
    registers, and the corrected rotations have coplanar camera x-axes
    (the waveCorrect invariant; ref 特征点检测.cpp:1071-1077, commented)."""
    from imagestitch_tpu.pipeline import stitch_chain

    views, shift = synthetic_sequence(4, 160, 224, overlap=0.5, seed=17)
    cfg = CHAIN_CFG.replace(
        camera=CameraConfig(ba_refine=False, wave_correct=True))
    pano, m = stitch_chain(views, cfg)
    assert all(m["h_valid"])
    assert pano.shape[1] > 224 + 2 * shift


def test_stitcher_shuffled_input_order():
    """Seams are resolved along the recovered camera spanning tree, not
    input index order (round-2 weak #5): feeding the same 4-view pan in a
    shuffled order must produce the same pano content."""
    from imagestitch_tpu.pipeline import Stitcher

    views, shift = synthetic_sequence(4, 160, 224, overlap=0.5, seed=33)
    st = Stitcher(ST_CFG)
    pano_sorted, m1 = st.stitch(views)
    order = [2, 0, 3, 1]
    pano_shuf, m2 = st.stitch([views[i] for i in order])

    assert abs(pano_sorted.shape[0] - pano_shuf.shape[0]) <= 4
    assert abs(pano_sorted.shape[1] - pano_shuf.shape[1]) <= 8
    h = min(pano_sorted.shape[0], pano_shuf.shape[0])
    w = min(pano_sorted.shape[1], pano_shuf.shape[1])
    a = pano_sorted[:h, :w].astype(np.float32)
    b = pano_shuf[:h, :w].astype(np.float32)
    # identical content up to RNG-key jitter in the per-pair RANSAC and a
    # few-pixel crop-origin shift (the valid-region crop box moves with
    # the jittered registration): align over small translations first
    best = min(
        np.abs(a[max(0, dy):h + min(0, dy), max(0, dx):w + min(0, dx)]
               - b[max(0, -dy):h - max(0, dy),
                   max(0, -dx):w - max(0, dx)]).mean()
        for dy in range(-6, 7) for dx in range(-6, 7))
    assert best < 8.0


def test_stitcher_leaves_biggest_component():
    """General-topology Stitcher with an unmatchable image: the noise view
    is excluded from the canvas (leaveBiggestComponent semantics) instead
    of composing at identity over the center image, and metrics report
    which images made it in."""
    views, shift = synthetic_sequence(4, 160, 224, overlap=0.5, seed=41)
    rng = np.random.default_rng(3)
    views[3] = rng.integers(0, 255, views[3].shape).astype(np.uint8)  # noise

    pano, m = stitch(views, ST_CFG)
    assert m["reachable"] == [True, True, True, False]
    # pano covers the 3-view span (~W + 2*shift), not the noise image
    assert 224 + shift <= pano.shape[1] <= 224 + 3 * shift
    # and no random-noise block leaked into the composite: a noise region
    # would push local std way above the scene's texture
    assert pano.std() > 20


def test_chain_broken_pair_degrades_gracefully():
    """An unmatchable image mid-chain (round-2 weak #8): the pairs around
    it fail, downstream images are flagged unreachable and excluded from
    the canvas instead of landing at identity on top of image 0."""
    from imagestitch_tpu.pipeline import stitch_chain_core

    views, shift = synthetic_sequence(4, 160, 224, overlap=0.5, seed=5)
    rng = np.random.default_rng(0)
    views[2] = rng.integers(0, 255, views[2].shape).astype(np.uint8)  # noise

    imgs = jnp.asarray(np.stack(views), jnp.float32)
    pano, valid, corner, m = stitch_chain_core(imgs, jax.random.key(0),
                                               CHAIN_CFG)
    reach = np.asarray(m["reachable"])
    assert reach[0] and reach[1]
    assert not reach[2] and not reach[3]
    assert np.isfinite(np.asarray(pano)).all()
    # the composed region covers images 0-1 (≈ W + shift wide), NOT the
    # full 4-image span
    cols = np.asarray(valid).any(axis=0)
    w_used = int(cols.sum())
    assert 224 + shift - 40 <= w_used <= 224 + 2 * shift
