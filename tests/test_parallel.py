"""Multi-device tests on the 8-device virtual CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp

from imagestitch_tpu.config import (
    PipelineConfig, DetectorConfig, MatcherConfig, RansacConfig, CameraConfig,
    BlendConfig,
)
from imagestitch_tpu.parallel import (
    make_mesh, stitch_pairs_batched, stitch_pairs_sharded,
)
from imagestitch_tpu.utils.io import synthetic_pair

TINY = PipelineConfig(
    detector=DetectorConfig(nfeatures=96, max_keypoints=288, nlevels=3),
    matcher=MatcherConfig(max_matches=96),
    ransac=RansacConfig(num_hypotheses=128),
    camera=CameraConfig(ba_iters=4),
    blend=BlendConfig(num_bands=2),
)


def _pairs(batch, seed=1):
    ps = []
    for b in range(batch):
        i1, i2, _ = synthetic_pair(144, 192, overlap=0.5, seed=seed + b)
        ps.append(np.stack([i1, i2]))
    return jnp.asarray(np.stack(ps), jnp.float32)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_batched_matches_single():
    # batch of 4 so the batched executable is shared with
    # test_sharded_2d_mesh_matches_unsharded (same shapes, same config)
    pairs = _pairs(4)
    keys = jax.random.split(jax.random.key(0), 4)
    panos, valids, corners, metrics = stitch_pairs_batched(pairs, keys, TINY)
    from imagestitch_tpu.pipeline import stitch_pair_impl
    p0, v0, c0, m0 = jax.jit(
        lambda a, b, k: stitch_pair_impl(a, b, k, TINY))(
            pairs[0, 0], pairs[0, 1], keys[0])
    # batched (vmapped) linalg kernels round differently from single ones,
    # perturbing the LM focal at ~1e-4 relative; compare robustly
    d = np.abs(np.asarray(panos[0]) - np.asarray(p0))
    assert d.mean() < 0.5
    assert np.quantile(d, 0.999) < 30.0
    assert np.array_equal(np.asarray(corners[0]), np.asarray(c0))
    assert int(metrics["num_inliers"][0]) == int(m0["num_inliers"])


def test_sharded_data_mesh():
    mesh = make_mesh({"data": 8})
    pairs = _pairs(8)
    keys = jax.random.split(jax.random.key(1), 8)
    panos, valids, corners, metrics = stitch_pairs_sharded(
        pairs, keys, mesh, TINY)
    jax.block_until_ready(panos)
    assert panos.shape[0] == 8
    assert bool(jnp.all(metrics["h_valid"]))


def test_sharded_2d_mesh_matches_unsharded():
    """data x model mesh: RANSAC hypothesis sharding must not change the
    result (same keys, same hypothesis set, argmax is order-independent up
    to ties broken identically by index)."""
    mesh = make_mesh({"data": 4, "model": 2})
    pairs = _pairs(4, seed=9)
    keys = jax.random.split(jax.random.key(2), 4)
    p_sh, v_sh, c_sh, m_sh = stitch_pairs_sharded(pairs, keys, mesh, TINY)
    p_un, v_un, c_un, m_un = stitch_pairs_batched(pairs, keys, TINY)
    d = np.abs(np.asarray(p_sh) - np.asarray(p_un))
    assert d.mean() < 0.5                    # float-rounding differences only
    assert np.array_equal(np.asarray(c_sh), np.asarray(c_un))
    assert np.array_equal(np.asarray(m_sh["num_inliers"]),
                          np.asarray(m_un["num_inliers"]))
