"""Stage-level timing of SIFT detect on the real TPU at 1080p.

Times each sub-stage as its OWN jitted program ending in a scalar readback
(tunnel methodology from bench.py), so we can attribute the detect cost:
octave maps (Pallas band pass), top_k selection, subpixel refine,
orientations, descriptors.
"""
from __future__ import annotations

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp


def median_ms(fn, lat, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0 - lat) * 1e3)
    return max(float(np.median(ts)), 1e-3)


def main():
    from imagestitch_tpu.features import sift as S
    from imagestitch_tpu.config import DetectorConfig

    H, W = 1080, 1920
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        (rng.random((H, W)) * 255).astype(np.float32))
    img = jax.device_put(img)

    # tunnel latency
    trivial = jax.jit(lambda x: jnp.sum(x))
    z = jax.device_put(jnp.ones((8,), jnp.float32))
    float(trivial(z))
    lat = median_ms(lambda: float(trivial(z)), 0.0, reps=9) / 1e3
    print(f"tunnel latency: {lat*1e3:.1f} ms", file=sys.stderr)

    cfg = DetectorConfig(kind="sift")
    # the staged programs read their tunables from the SAME config the
    # 'full detect' baseline profiles (features.detect passes cfg.sift_*
    # straight through), so the two can never diverge (ADVICE r4)
    Ssc = cfg.sift_scales
    sigma0 = cfg.sift_sigma
    ct = cfg.sift_contrast_thresh * 255.0 / Ssc
    num_octaves = cfg.sift_octaves
    use_pallas = jax.default_backend() == "tpu"
    shapes = S._octave_shapes(H, W, num_octaves)
    quota = max(cfg.max_keypoints // (2 * len(shapes)), 16)
    print(f"backend={jax.default_backend()} octaves={shapes} quota={quota}",
          file=sys.stderr)

    # ---- full detect ----
    @jax.jit
    def full(g):
        from imagestitch_tpu.features import detect
        f = detect(g, cfg)
        return jnp.sum(f.descriptors) + jnp.sum(f.xy) + jnp.sum(f.valid)

    t0 = time.perf_counter()
    float(full(img))
    print(f"full detect compile+run: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    ms = median_ms(lambda: float(full(img)), lat)
    print(f"full detect: {ms:.2f} ms", file=sys.stderr)

    # ---- octave maps only (all octaves) ----
    @jax.jit
    def maps_only(g):
        base = g.astype(jnp.float32)
        acc = 0.0
        for o, (Hh, Wh) in enumerate(shapes):
            dog, sc, gxs, gys, gS = S._octave_maps(
                base, o == 0, Ssc, sigma0, ct, use_pallas)
            if o + 1 < len(shapes):
                from imagestitch_tpu.ops.image import resize
                base = resize(gS, shapes[o + 1], "linear")
            acc = acc + jnp.sum(dog) + jnp.sum(sc) + jnp.sum(gxs) \
                + jnp.sum(gys)
        return acc

    t0 = time.perf_counter()
    float(maps_only(img))
    print(f"maps compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    ms_maps = median_ms(lambda: float(maps_only(img)), lat)
    print(f"octave maps (all 4): {ms_maps:.2f} ms", file=sys.stderr)

    # ---- maps + topk ----
    @jax.jit
    def maps_topk(g):
        base = g.astype(jnp.float32)
        acc = 0.0
        for o, (Hh, Wh) in enumerate(shapes):
            dog, sc, gxs, gys, gS = S._octave_maps(
                base, o == 0, Ssc, sigma0, ct, use_pallas)
            if o + 1 < len(shapes):
                from imagestitch_tpu.ops.image import resize
                base = resize(gS, shapes[o + 1], "linear")
            top_s, top_i = S._topk_block_candidates(sc, quota)
            # anchor every octave-map output (as maps_only does) so no map
            # is dead-code-eliminated on the XLA-composition path and the
            # stage delta isolates only top_k (ADVICE r4)
            acc = acc + jnp.sum(dog) + jnp.sum(gxs) + jnp.sum(gys) \
                + jnp.sum(top_s) + jnp.sum(top_i)
        return acc

    float(maps_topk(img))
    ms_topk = median_ms(lambda: float(maps_topk(img)), lat)
    print(f"maps+topk: {ms_topk:.2f} ms (topk delta {ms_topk-ms_maps:.2f})",
          file=sys.stderr)

    # ---- maps + topk + refine ----
    @jax.jit
    def maps_refine(g):
        base = g.astype(jnp.float32)
        acc = 0.0
        for o, (Hh, Wh) in enumerate(shapes):
            dog, sc, gxs, gys, gS = S._octave_maps(
                base, o == 0, Ssc, sigma0, ct, use_pallas)
            if o + 1 < len(shapes):
                from imagestitch_tpu.ops.image import resize
                base = resize(gS, shapes[o + 1], "linear")
            top_s, top_i = S._topk_block_candidates(sc, quota)
            li = top_i // (Hh * Wh) + 1
            rem = top_i % (Hh * Wh)
            yk = rem // Wh
            xk = rem % Wh
            li_r, yf, xf, ol, c_ok = S._refine_subpixel(dog, li, yk, xk, ct)
            acc = acc + jnp.sum(sc) + jnp.sum(gxs) + jnp.sum(gys) \
                + jnp.sum(yf) + jnp.sum(xf) + jnp.sum(c_ok)
        return acc

    float(maps_refine(img))
    ms_ref = median_ms(lambda: float(maps_refine(img)), lat)
    print(f"+refine: {ms_ref:.2f} ms (refine delta {ms_ref-ms_topk:.2f})",
          file=sys.stderr)

    # ---- maps + topk + refine + orientations ----
    @jax.jit
    def maps_orient(g):
        base = g.astype(jnp.float32)
        acc = 0.0
        for o, (Hh, Wh) in enumerate(shapes):
            dog, sc, gxs, gys, gS = S._octave_maps(
                base, o == 0, Ssc, sigma0, ct, use_pallas)
            if o + 1 < len(shapes):
                from imagestitch_tpu.ops.image import resize
                base = resize(gS, shapes[o + 1], "linear")
            top_s, top_i = S._topk_block_candidates(sc, quota)
            li = top_i // (Hh * Wh) + 1
            rem = top_i % (Hh * Wh)
            yk = rem // Wh
            xk = rem % Wh
            li_r, yf, xf, ol, c_ok = S._refine_subpixel(dog, li, yk, xk, ct)
            yk_i = jnp.clip(jnp.round(yf).astype(jnp.int32), 0, Hh - 1)
            xk_i = jnp.clip(jnp.round(xf).astype(jnp.int32), 0, Wh - 1)
            si = jnp.clip(li_r - 1, 0, Ssc)
            lf = li_r.astype(jnp.float32) + ol
            sigma_rel = sigma0 * (2.0 ** (jnp.clip(lf, 0.0, Ssc + 1.0) / Ssc))
            th, ok = S._orientations(gxs, gys,
                                     Ssc + 1, Hh, Wh, si, yk_i, xk_i,
                                     sigma_rel)
            acc = acc + jnp.sum(sc) + jnp.sum(dog) \
                + jnp.sum(th) + jnp.sum(ok)
        return acc

    float(maps_orient(img))
    ms_or = median_ms(lambda: float(maps_orient(img)), lat)
    print(f"+orient: {ms_or:.2f} ms (orient delta {ms_or-ms_ref:.2f})",
          file=sys.stderr)
    print(f"descriptors delta (full - orient stage): {ms-ms_or:.2f} ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
