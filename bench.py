"""Benchmark: end-to-end stitch latency + BASELINE.json config sweep on one
TPU chip.

Headline (BASELINE.md, driver-specified: the reference publishes no
numbers): < 50 ms per 1080p pair on one chip. Prints the JSON line
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N, "extra": {...}}
vs_baseline = 50ms / measured  (>1 means faster than target).

ARTIFACT-FIRST STRUCTURE (round-5 fix for the round-4 rc=124/parsed=null
loss): the headline line is printed IMMEDIATELY after the two-scene
medians, then RE-printed with a growing `extra` after EVERY extras
section. The driver records the last parseable line, so a timeout mid-
extras still leaves the freshest complete artifact. All extras run under
a global wall-clock budget = BENCH_TOTAL_S (default 1080 s, the driver's
observed kill window minus margin) minus the environmental tunnel
bootstrap, or BENCH_BUDGET_S verbatim when set (long dev runs); a section
whose estimated cost exceeds the remaining budget is skipped and recorded
in extra["skipped_sections"].

`extra` records the other BASELINE.json configs (all measured here, same
methodology):
  first_call_s            FRESH-PROCESS first stitch via the deploy path:
                          AOT blob deserialize (imagestitch_tpu.aot) +
                          persistent-executable-cache compile + one real
                          stitch, measured in a subprocess that has never
                          traced the pipeline (tools/warm_start_probe.py).
                          Both caches are written by this very bench run
                          first, so the number is reproducible from a
                          clean checkout. Falls back to cold_compile_s if
                          the subprocess fails.
  cold_compile_s          this bench process's own first call (full
                          trace+compile+run when caches are cold; the
                          persistent cache can serve the compile half when
                          neither the package nor bench.py changed)
  mp_per_s                input megapixels/s at the headline latency
  sift_kpts_per_s         SIFT detect+describe throughput, 1080p
  ransac_hyp_per_s        RANSAC hypothesis throughput (2048/dispatch)
  batched_vga_pairs_per_s 32 VGA pairs per dispatch (configs[4])
  batched_1080p_pairs_per_s  8 pairs 1080p per dispatch
  chain8_1080p_ms         8-image 1080p jitted chain (configs[3])
  chain4_cyl_ms           4-image cylindrical chain (configs[1])
  mb_dp_1080p_ms          DP seam + 5-band multiband blend pair (configs[2])

Timing methodology (per-call): the dev environment reaches the TPU through a
tunnel whose block_until_ready acks before device completion, so only a
scalar readback is a true completion barrier. Each measured call is ONE
jitted dispatch returning ONE scalar that depends on every output (full pano
sum + metrics, so XLA cannot dead-code-eliminate any stage), timed
wall-clock; the separately measured tunnel round-trip latency of that same
scalar readback on a trivial program is subtracted. For the headline, two
scenes are measured — a pure x-translation pair and a rotation+perspective
pair (10 deg yaw + pitch/roll, ground-truth homography known) — and the
WORST median of the two is reported, so the headline is not translation-only.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import threading
import time

import numpy as np

_T_START = time.monotonic()
# BENCH_TOTAL_S: total wall-clock the driver allows the bench process
# (round 4 was killed at ~1200 s; leave margin). The measurement budget is
# what remains after the environmental tunnel bootstrap (70-315 s
# observed), unless BENCH_BUDGET_S pins it explicitly (long dev runs).
_TOTAL_S = float(os.environ.get("BENCH_TOTAL_S", "1080"))
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "0")) or None


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T_START)


def time_of(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def median_ms(fn, lat, reps=5):
    """Median wall-clock ms of fn() minus tunnel latency. fn must end in a
    scalar readback."""
    fn()  # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0 - lat) * 1e3)
    # programs faster than the tunnel latency cannot be resolved by a
    # single-dispatch measurement — clamp to a small positive floor (such
    # sections should iterate the op inside one program instead)
    return max(float(np.median(times)), 1e-3)


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


_LAST_GOOD: dict | None = None  # last complete artifact dict (emit() keeps it)


def _watchdog(stage, seconds):
    """Hard-exit with an honest artifact if `stage` wedges.

    When the axon relay drops an RPC, the waiting dispatch blocks on a
    futex FOREVER — no exception, no timeout (observed mid-extras in round
    5: 0% CPU, futex_do_wait). If a good artifact was already emitted,
    re-emit IT (with the wedge noted) so the driver's last parse stays the
    real measurement; only fall back to the value=-1 failure line when the
    wedge hit before any measurement landed.
    """
    def fire():
        _log(f"WATCHDOG: {stage} exceeded {seconds}s — axon tunnel down?")
        if _LAST_GOOD is not None:
            art = dict(_LAST_GOOD)
            art["extra"] = dict(art.get("extra", {}))
            art["extra"]["error"] = (
                f"{stage} wedged after {seconds}s (axon RPC lost); "
                "artifact complete up to that point")
            print(json.dumps(art), flush=True)
            os._exit(0)
        print(json.dumps({
            "metric": "stitch_2x1080p_latency", "value": -1.0,
            "unit": "ms", "vs_baseline": 0.0,
            "extra": {"error": f"{stage} timed out after {seconds}s "
                               "(axon tunnel unreachable)"}}), flush=True)
        os._exit(3)
    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def extras_bench(lat, extra, emit):
    """BASELINE.json configs[0..4] + throughput metrics, highest-priority
    first. Each section is independent, failure-isolated (a compile OOM on
    one config must not kill the artifact), budget-gated, and followed by
    an `emit()` so the freshest artifact is always the last stdout line."""
    import jax
    import jax.numpy as jnp
    from imagestitch_tpu.config import (PipelineConfig, SeamConfig,
                                        BlendConfig, DetectorConfig)
    from imagestitch_tpu.pipeline import stitch_pair_impl, stitch_chain_impl
    from imagestitch_tpu.parallel.batch import stitch_pairs_batched
    from imagestitch_tpu.utils.io import synthetic_pair, synthetic_sequence

    key = jax.random.key(0)

    def run(name, fn, est=90):
        """est = conservative wall-clock estimate (compile + reps), used
        only to decide whether the remaining budget can fit the section."""
        if _remaining() < est:
            _log(f"extras[{name}]: skipped_timeout "
                 f"(needs ~{est}s, {_remaining():.0f}s left)")
            extra.setdefault("skipped_sections", []).append(name)
            emit()
            return
        try:
            t0 = time.perf_counter()
            fn()
            _log(f"extras[{name}]: done ({time.perf_counter() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — isolate config failures
            _log(f"extras[{name}]: FAILED {type(e).__name__}: {e}")
        emit()

    # --- SIFT 1080p pair (the north star names SIFT as the flagship
    # detector) — VERDICT r4 target: < 50 ms -------------------------------
    def sift_1080p_pair():
        from imagestitch_tpu.config import WarpConfig
        cfg = PipelineConfig(
            detector=DetectorConfig(kind="sift"),
            warp=WarpConfig(kind="plane"))
        i1, i2, _ = synthetic_pair(1080, 1920, overlap=0.4, seed=1)
        a1 = jnp.asarray(i1, jnp.float32)
        a2 = jnp.asarray(i2, jnp.float32)

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def f(x, y, k, cfg):
            p, v, c, mt = stitch_pair_impl(x, y, k, cfg=cfg)
            return p.sum() + v.sum() + c.sum() + mt["num_inliers"]

        ms = median_ms(lambda: float(f(a1, a2, key, cfg)), lat)
        extra["sift_1080p_pair_ms"] = round(ms, 2)
        _log(f"  SIFT 1080p pair (plane+feather): {ms:.1f} ms")
    run("sift_1080p_pair", sift_1080p_pair, est=110)

    # --- batched throughput (configs[4]) ----------------------------------
    def batched(B, H, W, label):
        cfg = PipelineConfig()
        i1, i2, _ = synthetic_pair(H, W, overlap=0.4, seed=0)
        pair = np.stack([i1, i2]).astype(np.float32)
        pairs = jnp.asarray(np.broadcast_to(pair, (B,) + pair.shape).copy())
        keys = jax.random.split(key, B)

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def f(ps, ks, cfg):
            p, v, c, mt = stitch_pairs_batched(ps, ks, cfg)
            return (p.sum() + v.sum() + c.sum()
                    + mt["num_inliers"].sum())

        ms = median_ms(lambda: float(f(pairs, keys, cfg)), lat, reps=3)
        extra[f"batched_{label}_pairs_per_s"] = round(B / (ms / 1e3), 1)
        _log(f"  batched {label}: {B} pairs in {ms:.1f} ms")
    run("batched_1080p", lambda: batched(8, 1080, 1920, "1080p"), est=120)

    # --- host-seam split paths at 1080p: GraphCut COST_COLOR is the
    # reference mains' DEFAULT seam (ref 特征点检测.cpp:1134); dp_full is the
    # complete DpSeamFinder machinery. Wall-clock including the host seam +
    # device<->host transfers (np.asarray readbacks are true barriers);
    # seam_megapix=0.1 = the OpenCV stitching_detailed default budget,
    # seam_megapix=-1 = full-resolution seams (the reference's semantics).
    def host_seam_pair(kind, smp, label, full_components=False, reps=3):
        """Times the host-seam split the way a production deployment runs
        it: the front and blend programs end in scalar readbacks (true
        barriers), and only the seam-resolution inputs cross the host
        boundary — the DECIMATED canvases when seam_megapix > 0 (the
        round-4 design; the overlap-cropped canvases otherwise, whose
        transfer is then honestly part of the cost). The final pano stays
        on device (its sum folds into the blend checksum), as in serving.
        Also records a readback/seam/blend wall-clock breakdown for the
        full-resolution path (VERDICT r4 weak #4)."""
        from imagestitch_tpu.pipeline import (_host_seam_blend,
                                              stitch_pair_front)
        cfg = PipelineConfig(
            seam=SeamConfig(kind=kind, seam_megapix=smp,
                            full_components=full_components))
        i1, i2, _ = synthetic_pair(1080, 1920, overlap=0.4, seed=0)
        a1 = jnp.asarray(i1, jnp.float32)
        a2 = jnp.asarray(i2, jnp.float32)

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def front(x, y, k, cfg):
            warped, masks, corner, mt = stitch_pair_front.__wrapped__(
                x, y, k, cfg)
            return warped, masks, (warped.sum() + mt["num_inliers"])

        def once(timings=None):
            warped, masks, chk = front(a1, a2, key, cfg)
            float(chk)  # barrier: front complete
            # the PRODUCTION split driver (pipeline._host_seam_blend):
            # decimated readback when seam_megapix > 0, overlap-bbox uint8
            # readback for full-res graphcut pairs
            pano, valid, _ = _host_seam_blend(warped, masks, cfg,
                                              timings=timings)
            return float(pano.sum() + valid.sum())  # barrier: blend done

        once()  # warm (compiles + native lib)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            once()   # timings=None: the timed path has NO extra barriers
            times.append((time.perf_counter() - t0 - 2 * lat) * 1e3)
        ms = float(np.median(times))
        extra[label] = round(ms, 2)
        _log(f"  {label}: {ms:.1f} ms")
        # phase breakdown from SEPARATE instrumented calls (the timings
        # barriers would inflate the headline number by ~1 tunnel RTT);
        # the first instrumented call compiles the barrier programs, so
        # warm it into a throwaway dict before recording
        once(timings={})
        split = {}
        for _ in range(2):
            once(timings=split)
        if split.get("seam_ms"):
            bd = {k_: round(float(np.median(v)), 1)
                  for k_, v in split.items()}
            extra[label + "_split"] = bd
            _log(f"    split: {bd}")
    run("graphcut_1080p", lambda: host_seam_pair(
        "graphcut", 0.1, "graphcut_1080p_pair_ms"), est=130)
    run("graphcut_fullres_1080p", lambda: host_seam_pair(
        "graphcut", -1.0, "graphcut_fullres_1080p_pair_ms", reps=3),
        est=130)

    # --- warm-start first call (the deploy path): AOT blob + persistent
    # executable cache are built in THIS process (also warming them for any
    # subsequent bench run), then a fresh subprocess measures its first
    # stitch without ever tracing --------------------------------------------
    def warm_start():
        from imagestitch_tpu import aot
        from imagestitch_tpu.utils.io import synthetic_pair as sp
        H, W = 1080, 1920
        cfg = PipelineConfig()
        i1, i2, _ = sp(H, W, overlap=0.4, seed=0)
        t0 = time.perf_counter()
        call, was_cached = aot.stitch_pair_program(H, W, cfg)
        float(call(jnp.asarray(i1, jnp.float32), jnp.asarray(i2, jnp.float32),
                   key)[0].sum())
        _log(f"AOT program build+compile: {time.perf_counter() - t0:.1f}s "
             f"(blob cached: {was_cached})")
        import subprocess
        repo = os.path.dirname(os.path.abspath(__file__))
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + (
            os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "tools",
                                          "warm_start_probe.py"),
             str(H), str(W)],
            capture_output=True, text=True,
            # the probe pays its OWN tunnel bootstrap (70-500 s observed)
            # before the ~10 s deploy-path measurement
            timeout=max(120, min(900, _remaining())), env=env, cwd=repo)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
        probe = json.loads(line)
        if probe.get("was_cached") and probe.get("h_valid"):
            extra["first_call_s"] = round(float(probe["warm_start_s"]), 2)
            for k_ in ("deserialize_s", "compile_s", "run_s"):
                if k_ in probe:
                    extra["warm_start_" + k_] = float(probe[k_])
            _log(f"fresh-process warm-start first call: {probe}")
        else:
            _log(f"warm-start probe unusable: {probe}")
    run("warm_start", warm_start, est=240)

    # --- SIFT kpts/sec, 1080p (BASELINE.json metric string) ---------------
    def sift_bench():
        from imagestitch_tpu.features import detect
        from imagestitch_tpu.ops.image import rgb_to_gray
        dcfg = DetectorConfig(kind="sift")
        img, _, _ = synthetic_pair(1080, 1920, seed=3)
        gray = rgb_to_gray(jnp.asarray(img, jnp.float32))

        @jax.jit
        def f(g):
            ft = detect(g, dcfg)
            return (ft.xy.sum() + ft.descriptors.sum()
                    + ft.valid.sum()), ft.valid.sum()

        _, nkpt = f(gray)
        nkpt = int(nkpt)
        ms = median_ms(lambda: float(f(gray)[0]), lat)
        extra["sift_kpts_per_s"] = round(nkpt / (ms / 1e3), 1)
        extra["sift_detect_1080p_ms"] = round(ms, 2)
        _log(f"  sift: {nkpt} kpts in {ms:.1f} ms")
    run("sift", sift_bench, est=70)

    # --- RANSAC hypotheses/sec (BASELINE.json metric string) --------------
    def ransac_bench():
        from imagestitch_tpu.geometry.ransac import find_homography
        from imagestitch_tpu.config import RansacConfig
        rcfg = RansacConfig()
        rng = np.random.default_rng(0)
        n = 512
        src = rng.uniform(-300, 300, (n, 2)).astype(np.float32)
        Ht = np.array([[1.0, 0.02, 40.0], [-0.015, 1.0, 8.0],
                       [1e-5, -2e-5, 1.0]], np.float32)
        p = np.concatenate([src, np.ones((n, 1), np.float32)], 1) @ Ht.T
        dst = (p[:, :2] / p[:, 2:]).astype(np.float32)
        dst[n // 2:] += rng.uniform(-80, 80, (n - n // 2, 2))  # outliers
        mask = np.ones((n,), bool)

        # one RANSAC solve is faster than the tunnel readback latency, so a
        # single-dispatch timing is below the measurement floor: iterate the
        # solver inside ONE program (key folded per iteration, result carried
        # so XLA cannot hoist it) and divide by the iteration count
        REPS = 32

        @jax.jit
        def f(s, d, m, k):
            def body(i, acc):
                r = find_homography(s, d, m, jax.random.fold_in(k, i), rcfg)
                return acc + r.H.sum() + r.num_inliers
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        s, d, m = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask)
        ms = median_ms(lambda: float(f(s, d, m, key)), lat) / REPS
        extra["ransac_hyp_per_s"] = round(
            rcfg.num_hypotheses / (ms / 1e3), 1)
        _log(f"  ransac: {rcfg.num_hypotheses} hyp in {ms:.2f} ms "
             f"({REPS} solves/readback)")
    run("ransac", ransac_bench, est=30)

    # --- remaining batched configs ----------------------------------------
    run("batched_vga", lambda: batched(32, 480, 640, "vga"), est=100)
    # configs[4] stretch wording is "batched 4K"; 32x4K exceeds one chip's
    # HBM, so record the largest 4K batch that fits (failure-isolated)
    run("batched_4k", lambda: batched(4, 2160, 3840, "4k"), est=130)

    # --- SIFT VGA pair (configs[0]: SIFT + BF + RANSAC + perspective warp
    # + feather blend) -----------------------------------------------------
    def sift_vga_pair():
        from imagestitch_tpu.config import WarpConfig
        cfg = PipelineConfig(
            detector=DetectorConfig(kind="sift"),
            warp=WarpConfig(kind="plane"))
        i1, i2, _ = synthetic_pair(480, 640, overlap=0.4, seed=1)
        a1 = jnp.asarray(i1, jnp.float32)
        a2 = jnp.asarray(i2, jnp.float32)

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def f(x, y, k, cfg):
            p, v, c, mt = stitch_pair_impl(x, y, k, cfg=cfg)
            return p.sum() + v.sum() + c.sum() + mt["num_inliers"]

        ms = median_ms(lambda: float(f(a1, a2, key, cfg)), lat)
        extra["sift_vga_pair_ms"] = round(ms, 2)
        _log(f"  SIFT VGA pair (plane+feather): {ms:.1f} ms")
    run("sift_vga_pair", sift_vga_pair, est=100)

    run("dpfull_1080p", lambda: host_seam_pair(
        "dp_color", 0.1, "dpfull_1080p_pair_ms", full_components=True),
        est=40)

    # --- N-image chains (configs[1], configs[3]) --------------------------
    def chain(n, H, W, label):
        cfg = PipelineConfig()  # default warp is cylindrical, like the ref
        views, _ = synthetic_sequence(n, H, W, overlap=0.5, seed=7)
        imgs = jnp.asarray(np.stack(views), jnp.float32)

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def f(im, k, cfg):
            p, v, c, mt = stitch_chain_impl(im, k, cfg)
            return (p.sum() + v.sum() + c.sum()
                    + mt["num_inliers"].sum()), mt["h_valid"]

        _, hv = f(imgs, key, cfg)
        ok = bool(jnp.all(hv))
        ms = median_ms(lambda: float(f(imgs, key, cfg)[0]), lat, reps=3)
        extra[f"chain{n}_{label}_ms"] = round(ms, 2)
        _log(f"  chain{n} {label}: {ms:.1f} ms all_valid={ok}")
    run("chain4_cyl", lambda: chain(4, 480, 640, "cyl"), est=100)
    run("chain8_1080p", lambda: chain(8, 1080, 1920, "1080p"), est=160)

    # --- SCANS (affine) mode pair, 1080p -----------------------------------
    def scans_pair():
        cfg = PipelineConfig(mode="scans")
        i1, i2, _ = synthetic_pair(1080, 1920, overlap=0.4, seed=0)
        a1 = jnp.asarray(i1, jnp.float32)
        a2 = jnp.asarray(i2, jnp.float32)

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def f(x, y, k, cfg):
            p, v, c, mt = stitch_pair_impl(x, y, k, cfg=cfg)
            return p.sum() + v.sum() + c.sum() + mt["num_inliers"]

        ms = median_ms(lambda: float(f(a1, a2, key, cfg)), lat)
        extra["scans_1080p_pair_ms"] = round(ms, 2)
        _log(f"  scans (affine) 1080p pair: {ms:.1f} ms")
    run("scans_pair", scans_pair, est=90)

    # --- DP seam + multiband blend pair (configs[2]) ----------------------
    def mb_pair():
        cfg = PipelineConfig(
            seam=SeamConfig(kind="dp_color"),
            blend=BlendConfig(kind="multiband", num_bands=5))
        i1, i2, _ = synthetic_pair(1080, 1920, overlap=0.4, seed=0)
        a1 = jnp.asarray(i1, jnp.float32)
        a2 = jnp.asarray(i2, jnp.float32)

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def f(x, y, k, cfg):
            p, v, c, mt = stitch_pair_impl(x, y, k, cfg=cfg)
            return p.sum() + v.sum() + c.sum() + mt["num_inliers"]

        ms = median_ms(lambda: float(f(a1, a2, key, cfg)), lat)
        extra["mb_dp_1080p_ms"] = round(ms, 2)
        _log(f"  multiband+dp 1080p pair: {ms:.1f} ms")
    run("multiband", mb_pair, est=90)

    # --- warp kernel variants: row_rebase flip experiment ------------------
    def warp_variants():
        """Times the Pallas warp at 2x1080p rotation-scene geometry with
        row_rebase off vs on (the tilt-factorized shift window). Records
        both so the default can be flipped on data (ROADMAP round-3)."""
        from imagestitch_tpu.ops.pallas_warp import pallas_warp_batched
        from imagestitch_tpu.warp.warper import roi_bounds
        from imagestitch_tpu.warp.projectors import _camera_mats
        from imagestitch_tpu.utils.io import synthetic_rotation_pair

        H, W = 1080, 1920
        r1, r2, _, _ = synthetic_rotation_pair(H, W, yaw_deg=10.0, seed=0)
        imgs = jnp.asarray(np.stack([r1, r2]), jnp.float32)
        f = 0.9 * W
        K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]],
                        jnp.float32)
        ang = np.deg2rad(10.0)
        ca, sa = np.cos(ang), np.sin(ang)
        Rr = jnp.asarray([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], jnp.float32)
        tilt = np.deg2rad(3.0)
        ct, st = np.cos(tilt), np.sin(tilt)
        Rt = jnp.asarray([[ct, -st, 0], [st, ct, 0], [0, 0, 1]], jnp.float32)
        Rs = [jnp.eye(3, dtype=jnp.float32), Rr @ Rt]
        bounds = [roi_bounds(K, R, f, (H, W), "cylindrical") for R in Rs]
        u0 = jnp.floor(jnp.minimum(bounds[0][0], bounds[1][0]))
        v0 = jnp.floor(jnp.minimum(bounds[0][1], bounds[1][1]))
        corner = jnp.stack([u0, v0]).astype(jnp.int32)
        k_rinvs = jnp.stack([_camera_mats(K, R)[1] for R in Rs])
        roi_uvs = jnp.stack([jnp.stack(b) for b in bounds])
        canvas = (1480, 3456)
        corners = jnp.broadcast_to(corner, (2, 2))

        for flag in (False, True):
            def one():
                o, v = pallas_warp_batched(imgs, k_rinvs, f, corners,
                                           roi_uvs, canvas, "cylindrical",
                                           row_rebase=flag)
                return float(o.sum() + v.sum())
            ms = median_ms(one, lat)
            extra[f"warp_{'rowrebase' if flag else 'base'}_ms"] = round(
                ms, 2)
            _log(f"  warp row_rebase={flag}: {ms:.1f} ms")
    run("warp_variants", warp_variants, est=80)


def main():
    import jax
    import jax.numpy as jnp
    from imagestitch_tpu.config import PipelineConfig
    from imagestitch_tpu.pipeline import stitch_pair_impl
    from imagestitch_tpu.utils.io import synthetic_pair, synthetic_rotation_pair

    H, W = 1080, 1920
    cfg = PipelineConfig()
    key = jax.random.key(0)

    # Tunnel bootstrap: the FIRST device->host readback of a fresh process
    # pays a large one-time axon session cost (measured 70-170 s for an
    # 8-element sum — entirely environmental). Pay it on a trivial program
    # first so first_call_s measures the framework's trace+compile+run, not
    # the tunnel bootstrap. The budget clock excludes it for the same
    # reason (it would otherwise eat most of BENCH_BUDGET_S before any
    # measurement ran).
    t0 = time.perf_counter()
    wd = _watchdog("backend bring-up (first readback)", 600)
    float(jax.jit(lambda x: x.sum())(jnp.ones((8,))))
    wd.cancel()
    boot_s = time.perf_counter() - t0
    global _T_START, _BUDGET_S
    _T_START = time.monotonic()  # budget starts after environmental bootstrap
    if _BUDGET_S is None:
        _BUDGET_S = max(_TOTAL_S - boot_s, 300.0)
    _log(f"tunnel bootstrap (first readback): {boot_s:.1f}s "
         f"(measurement budget {_BUDGET_S:.0f}s)")
    # a wedged RPC mid-extras must convert to a CLEAN exit with the good
    # artifact before the driver's hard kill lands
    wd = _watchdog("benchmark body", _BUDGET_S + 60)

    t1, t2, _ = synthetic_pair(H, W, overlap=0.4, seed=0)
    r1, r2, H_true, _ = synthetic_rotation_pair(H, W, yaw_deg=10.0, seed=0)
    scenes = {
        "translation": (jnp.asarray(t1, jnp.float32),
                        jnp.asarray(t2, jnp.float32)),
        "rotation": (jnp.asarray(r1, jnp.float32),
                     jnp.asarray(r2, jnp.float32)),
    }

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def bench_fn(a1, a2, key, cfg):
        p, v, c, m = stitch_pair_impl(a1, a2, key, cfg=cfg)
        # one scalar depending on ALL outputs: no DCE, one readback
        return (p.sum() + v.sum() + c.sum()
                + m["num_inliers"] + m["confidence"]), m

    # correctness spot-check + warm the executable (both scenes share one
    # compiled program: same static shapes)
    t0 = time.perf_counter()
    s, m = bench_fn(*scenes["translation"], key, cfg)
    first_call_s = time.perf_counter() - t0
    h_valid = bool(m["h_valid"])
    inliers = int(m["num_inliers"])
    _log(f"first call (compile+run): {first_call_s:.1f}s "
         f"backend={jax.default_backend()} h_valid={h_valid} "
         f"inliers={inliers}")
    s2, m2 = bench_fn(*scenes["rotation"], key, cfg)
    rot_valid = bool(m2["h_valid"])
    _log(f"rotation scene: h_valid={rot_valid} "
         f"inliers={int(m2['num_inliers'])}")
    if not (h_valid and rot_valid):
        print(json.dumps({"metric": "stitch_2x1080p_latency", "value": -1.0,
                          "unit": "ms", "vs_baseline": 0.0}), flush=True)
        return

    # measure tunnel readback latency with a trivial program
    triv = jax.jit(lambda x: x.sum())
    small = jnp.ones((8,))
    float(triv(small))
    lat = min(time_of(lambda: float(triv(small))) for _ in range(3))
    _log(f"tunnel readback latency: {lat * 1e3:.1f}ms")

    medians = {}
    for name, (a1, a2) in scenes.items():
        def one():
            s, m = bench_fn(a1, a2, key, cfg)
            return float(s)  # single scalar readback = single barrier
        one()  # warm
        times = []
        # 10 reps (~0.4 s): the tunnel's per-dispatch jitter is the
        # headline's dominant noise term, and the median hardens with reps
        for _ in range(10):
            t0 = time.perf_counter()
            one()
            times.append((time.perf_counter() - t0 - lat) * 1e3)
        medians[name] = float(np.median(times))
        _log(f"{name}: per-stitch ms {[round(t, 1) for t in times]}")

    med = max(medians.values())  # worst scene is the headline
    _log(f"medians: {medians}")

    extra = {
        "first_call_s": round(first_call_s, 1),  # refined by warm_start
        "cold_compile_s": round(first_call_s, 1),
        "tunnel_bootstrap_s": round(boot_s, 1),
        # input megapixels per second at the headline latency
        "mp_per_s": round(2 * H * W / 1e6 / (med / 1e3), 1),
    }

    def emit():
        # the driver records the LAST parseable stdout line: emit early,
        # emit often, so a timeout anywhere still leaves a full artifact
        global _LAST_GOOD
        art = {
            "metric": "stitch_2x1080p_latency",
            "value": round(med, 3),
            "unit": "ms",
            "vs_baseline": round(50.0 / med, 3),
            "extra": extra,
        }
        _LAST_GOOD = art
        print(json.dumps(art), flush=True)

    emit()  # HEADLINE FIRST — everything after this only enriches it
    extras_bench(lat, extra, emit)
    wd.cancel()
    emit()


if __name__ == "__main__":
    main()
