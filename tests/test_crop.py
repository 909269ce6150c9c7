"""utils.crop: largest interior rectangle (scan-DP) vs brute force, and the
pipeline-level crop="interior" option."""

import numpy as np
import jax.numpy as jnp
import pytest

from imagestitch_tpu.utils.crop import largest_interior_rect, autocrop


def _brute_force_area(mask: np.ndarray) -> int:
    """O(H²·W²) exhaustive max all-valid rectangle area via a summed-area
    table — the oracle for the scan-DP implementation."""
    H, W = mask.shape
    sat = np.zeros((H + 1, W + 1), np.int64)
    sat[1:, 1:] = np.cumsum(np.cumsum(mask.astype(np.int64), 0), 1)
    best = 0
    for y0 in range(H):
        for y1 in range(y0 + 1, H + 1):
            for x0 in range(W):
                for x1 in range(x0 + 1, W + 1):
                    a = (y1 - y0) * (x1 - x0)
                    if a <= best:
                        continue
                    s = (sat[y1, x1] - sat[y0, x1]
                         - sat[y1, x0] + sat[y0, x0])
                    if s == a:
                        best = a
    return best


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_brute_force_random(seed):
    rng = np.random.default_rng(seed)
    mask = rng.uniform(size=(13, 17)) > 0.3
    y0, x0, h, w = (int(v) for v in np.asarray(
        largest_interior_rect(jnp.asarray(mask))))
    assert h * w == _brute_force_area(mask)
    # and the reported rectangle itself is all-valid
    if h:
        assert mask[y0:y0 + h, x0:x0 + w].all()


def test_known_cases():
    # full mask -> whole extent
    m = np.ones((6, 9), bool)
    assert [int(v) for v in np.asarray(
        largest_interior_rect(jnp.asarray(m)))] == [0, 0, 6, 9]
    # empty mask -> zero rect
    m = np.zeros((6, 9), bool)
    assert [int(v) for v in np.asarray(
        largest_interior_rect(jnp.asarray(m)))] == [0, 0, 0, 0]
    # irregular pano-like border: valid parallelogram strip
    m = np.zeros((8, 12), bool)
    for i in range(8):
        m[i, i // 2: i // 2 + 7] = True
    y0, x0, h, w = (int(v) for v in np.asarray(
        largest_interior_rect(jnp.asarray(m))))
    assert h * w == _brute_force_area(m)
    assert m[y0:y0 + h, x0:x0 + w].all()


def test_autocrop_slices_pano():
    rng = np.random.default_rng(7)
    mask = np.zeros((20, 30), bool)
    mask[4:15, 6:25] = True
    pano = rng.uniform(0, 255, (20, 30, 3)).astype(np.float32)
    out, (y0, x0, h, w) = autocrop(pano, mask)
    assert (y0, x0, h, w) == (4, 6, 11, 19)
    np.testing.assert_array_equal(out, pano[4:15, 6:25])


def test_pipeline_interior_crop():
    """crop="interior" yields a smaller, fully-covered pano than bbox."""
    from imagestitch_tpu.config import PipelineConfig
    from imagestitch_tpu.pipeline import stitch_pair
    from imagestitch_tpu.utils.io import synthetic_rotation_pair

    img1, img2, _, _ = synthetic_rotation_pair(160, 224, yaw_deg=8.0, seed=0)
    pano_b, mb = stitch_pair(img1, img2, PipelineConfig())
    pano_i, mi = stitch_pair(img1, img2, PipelineConfig(crop="interior"))
    assert bool(mb["h_valid"]) and bool(mi["h_valid"])
    # interior crop fits inside the bbox crop and drops the black borders
    assert pano_i.shape[0] <= pano_b.shape[0]
    assert pano_i.shape[1] <= pano_b.shape[1]
    assert pano_i.size > 0
    # rotation scenes produce non-rectangular valid regions: bbox keeps
    # some invalid (black) pixels, interior keeps none
    gray_i = pano_i.sum(-1)
    assert (gray_i > 0).mean() > 0.99
