"""AOT program cache (imagestitch_tpu.aot): export/deserialize round trip,
key invalidation, corrupt-blob fallback, and the stitch_pair convenience."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagestitch_tpu import aot


def _fn():
    def body(x, y):
        return (x @ y).sum(axis=1), x + 1.0
    return jax.jit(body)


class TestCachedExport:
    def test_round_trip_and_hit(self, tmp_path):
        d = str(tmp_path)
        x = jnp.arange(12.0).reshape(3, 4)
        y = jnp.ones((4, 5))
        call, was_cached = aot.cached_export("t", _fn(), (x, y), directory=d)
        assert not was_cached
        a0, b0 = call(x, y)
        call2, was_cached2 = aot.cached_export("t", _fn(), (x, y),
                                               directory=d)
        assert was_cached2
        a1, b1 = call2(x, y)
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
        np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
        ref = _fn()(x, y)
        np.testing.assert_allclose(np.asarray(a0), np.asarray(ref[0]),
                                   rtol=1e-6)

    def test_shape_change_invalidates(self, tmp_path):
        d = str(tmp_path)
        x = jnp.ones((3, 4))
        y = jnp.ones((4, 5))
        aot.cached_export("t", _fn(), (x, y), directory=d)
        _, was_cached = aot.cached_export(
            "t", _fn(), (jnp.ones((2, 4)), y), directory=d)
        assert not was_cached

    def test_tag_change_invalidates(self, tmp_path):
        d = str(tmp_path)
        x = jnp.ones((3, 4))
        y = jnp.ones((4, 5))
        aot.cached_export("t", _fn(), (x, y), directory=d)
        _, was_cached = aot.cached_export("u", _fn(), (x, y), directory=d)
        assert not was_cached

    def test_source_hash_invalidates(self, tmp_path, monkeypatch):
        d = str(tmp_path)
        x = jnp.ones((3, 4))
        y = jnp.ones((4, 5))
        aot.cached_export("t", _fn(), (x, y), directory=d)
        monkeypatch.setattr(aot, "_package_source_hash", lambda: "edited")
        _, was_cached = aot.cached_export("t", _fn(), (x, y), directory=d)
        assert not was_cached

    def test_corrupt_blob_rebuilds(self, tmp_path):
        d = str(tmp_path)
        x = jnp.ones((3, 4))
        y = jnp.ones((4, 5))
        aot.cached_export("t", _fn(), (x, y), directory=d)
        (blob,) = [f for f in os.listdir(d) if f.endswith(".jaxexp")]
        with open(os.path.join(d, blob), "wb") as f:
            f.write(b"garbage")
        call, was_cached = aot.cached_export("t", _fn(), (x, y), directory=d)
        assert not was_cached
        out = call(x, y)
        assert np.asarray(out[0]).shape == (3,)

    def test_clear(self, tmp_path):
        d = str(tmp_path)
        x = jnp.ones((3, 4))
        aot.cached_export("t", _fn(), (x, jnp.ones((4, 2))), directory=d)
        assert aot.clear(d) == 1
        assert aot.clear(d) == 0


class TestStitchPairProgram:
    def test_matches_live_jit(self, tmp_path):
        from imagestitch_tpu.config import PipelineConfig
        from imagestitch_tpu.pipeline import stitch_pair_impl
        from imagestitch_tpu.utils.io import synthetic_pair

        d = str(tmp_path)
        H, W = 96, 128
        cfg = PipelineConfig()
        i1, i2, _ = synthetic_pair(H, W, overlap=0.4, seed=0)
        a1 = jnp.asarray(i1, jnp.float32)
        a2 = jnp.asarray(i2, jnp.float32)
        key = jax.random.key(0)

        call, was_cached = aot.stitch_pair_program(H, W, cfg, directory=d)
        assert not was_cached
        pano, valid, corner, metrics = call(a1, a2, key)
        ref = stitch_pair_impl(a1, a2, key, cfg=cfg)
        np.testing.assert_allclose(np.asarray(pano), np.asarray(ref[0]),
                                   atol=1e-3)
        np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref[1]))
        assert bool(metrics["h_valid"]) == bool(ref[3]["h_valid"])

        # second build: served from disk, identical outputs
        call2, was_cached2 = aot.stitch_pair_program(H, W, cfg, directory=d)
        assert was_cached2
        pano2 = call2(a1, a2, key)[0]
        np.testing.assert_array_equal(np.asarray(pano), np.asarray(pano2))
