"""Batched-serving demo: a request/response loop over the one-dispatch path.

Production serving of the stitcher is request pipelining into the batched
program (`parallel.stitch_pairs_batched` — detect/warp Pallas kernels fold
the whole batch into their grids, so a B-pair dispatch is ONE launch per
stage). This demo shows the operational shape:

  producer threads enqueue (pair, future) requests
  -> a batcher thread collects up to --batch requests or --linger ms
  -> one jitted dispatch serves the whole batch
  -> each future resolves to its cropped pano

  python tools/serve_demo.py --requests 64 --batch 8 --size 192x256

Padded dispatch: a partial batch is padded to the fixed batch size so ONE
executable serves every load level (XLA static shapes); padding rows are
dropped on the way out.
"""

from __future__ import annotations

import argparse
import os
import queue
import threading
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--linger", type=float, default=20.0,
                    help="max ms the batcher waits to fill a batch")
    ap.add_argument("--size", default="192x256")
    ap.add_argument("--producers", type=int, default=4)
    args = ap.parse_args()

    import numpy as np
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # env var alone does not flip the platform in this build
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from imagestitch_tpu.config import (PipelineConfig, DetectorConfig,
                                        MatcherConfig, RansacConfig,
                                        CameraConfig)
    from imagestitch_tpu.parallel.batch import stitch_pairs_batched
    from imagestitch_tpu.utils.io import synthetic_pair

    H, W = (int(x) for x in args.size.split("x"))
    B = args.batch
    cfg = PipelineConfig(
        detector=DetectorConfig(nfeatures=192, max_keypoints=512, nlevels=3),
        matcher=MatcherConfig(max_matches=192),
        ransac=RansacConfig(num_hypotheses=512),
        camera=CameraConfig(ba_iters=5),
    )

    import functools

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def dispatch(pairs, keys, cfg):
        panos, valids, corners, metrics = stitch_pairs_batched(
            pairs, keys, cfg)
        return panos, valids, metrics["h_valid"]

    # warm the one executable
    warm = jnp.zeros((B, 2, H, W, 3), jnp.float32)
    wkeys = jax.random.split(jax.random.key(0), B)
    t0 = time.perf_counter()
    jax.block_until_ready(dispatch(warm, wkeys, cfg))
    print(f"compile+warm: {time.perf_counter() - t0:.1f}s "
          f"backend={jax.default_backend()} batch={B}")

    reqq: queue.Queue = queue.Queue()

    class Req:
        __slots__ = ("pair", "event", "pano", "ok")

        def __init__(self, pair):
            self.pair = pair
            self.event = threading.Event()
            self.pano = None
            self.ok = False

    stop = object()

    def batcher():
        ki = 0
        while True:
            batch = [reqq.get()]
            if batch[0] is stop:
                return
            deadline = time.perf_counter() + args.linger / 1e3
            while len(batch) < B:
                tleft = deadline - time.perf_counter()
                if tleft <= 0:
                    break
                try:
                    r = reqq.get(timeout=tleft)
                except queue.Empty:
                    break
                if r is stop:
                    reqq.put(stop)  # let the outer loop see it next round
                    break
                batch.append(r)
            n = len(batch)
            pairs = np.zeros((B, 2, H, W, 3), np.float32)
            for i, r in enumerate(batch):
                pairs[i] = r.pair
            keys = jax.random.split(jax.random.key(ki), B)
            ki += 1
            panos, valids, hv = dispatch(jnp.asarray(pairs), keys, cfg)
            panos = np.asarray(panos)
            valids = np.asarray(valids)
            hv = np.asarray(hv)
            for i, r in enumerate(batch):
                v = valids[i]
                ys, xs = np.nonzero(v)
                if len(ys):
                    r.pano = panos[i][ys.min():ys.max() + 1,
                                      xs.min():xs.max() + 1]
                r.ok = bool(hv[i])
                r.event.set()
            print(f"  served batch of {n} "
                  f"({'all valid' if hv[:n].all() else 'SOME INVALID'})")

    bt = threading.Thread(target=batcher, daemon=True)
    bt.start()

    latencies = []
    lock = threading.Lock()

    def producer(seed0, count):
        rng = np.random.default_rng(seed0)
        for k in range(count):
            i1, i2, _ = synthetic_pair(H, W, overlap=0.5,
                                       seed=int(rng.integers(1 << 30)))
            r = Req(np.stack([np.asarray(i1), np.asarray(i2)])
                    .astype(np.float32))
            t = time.perf_counter()
            reqq.put(r)
            r.event.wait()
            with lock:
                latencies.append(time.perf_counter() - t)
            assert r.ok and r.pano is not None

    per = args.requests // args.producers
    t0 = time.perf_counter()
    threads = [threading.Thread(target=producer, args=(7 + i, per))
               for i in range(args.producers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    reqq.put(stop)
    bt.join(timeout=10)

    served = per * args.producers
    lat = np.array(latencies) * 1e3
    print(f"served {served} requests in {wall:.2f}s "
          f"({served / wall:.1f} req/s); latency p50 {np.percentile(lat, 50):.0f} ms "
          f"p95 {np.percentile(lat, 95):.0f} ms")


if __name__ == "__main__":
    main()
