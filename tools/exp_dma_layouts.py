"""Microbenchmark: slab-DMA cost vs source memory layout.

The warp kernel's slab copy reads (C, h, 384) windows from a planar
(N, C, H, W) source: each of the C*h rows is a separate 1536-byte
contiguous run, so one chunk's DMA is ~100+ short descriptors. A
128-column-tiled layout (N, C, W//128, H, 128) makes each (tile, c)
window one h*128*4 = 8-24 KB contiguous run (the kernel's slab x-origin
is already 128-aligned, so a 384-wide slab is exactly 3 tiles).

This kernel isolates the DMA: per grid step it issues the warp kernel's
NCH slab copies at pseudo-random (8,128)-aligned origins (same
distribution of origins/heights as the real kernel), waits, and consumes
one vreg per slab so nothing is DCE'd. Grid size matches the warp's live
chunk count at the bench geometry (~3.7k chunks).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_dma_layouts.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NCH = 8
SLAB_H, SLAB_W = 48, 384
H, W = 1080, 1920
C = 3
STEPS = 468           # x NCH chunks = 3744 ~ the warp's live chunk count


def _origins(step, ch, pad_h, pad_w, h):
    # cheap LCG on (step, ch) -> (8,128)-aligned in-bounds origin
    r = (step.astype(jnp.uint32) * jnp.uint32(2654435761)
         + jnp.uint32(ch * 40503))
    sy = ((r >> 8).astype(jnp.int32) % max((pad_h - h) // 8, 1)) * 8
    sx = ((r >> 19).astype(jnp.int32)
          % max((pad_w - SLAB_W) // 128, 1)) * 128
    return sy, sx


def _kern_planar(src_ref, out_ref, slabs_ref, sems, *, h):
    step = pl.program_id(0)
    for ch in range(NCH):
        sy, sx = _origins(step, ch, src_ref.shape[1], src_ref.shape[2], h)
        pltpu.make_async_copy(
            src_ref.at[:, pl.ds(sy, h), pl.ds(sx, SLAB_W)],
            slabs_ref.at[ch, :, pl.ds(0, h), :], sems.at[ch]).start()
    acc = jnp.zeros((8, 128), jnp.float32)
    for ch in range(NCH):
        sy, sx = _origins(step, ch, src_ref.shape[1], src_ref.shape[2], h)
        pltpu.make_async_copy(
            src_ref.at[:, pl.ds(sy, h), pl.ds(sx, SLAB_W)],
            slabs_ref.at[ch, :, pl.ds(0, h), :], sems.at[ch]).wait()
        acc = acc + slabs_ref[ch, 0, 0:8, 0:128]
    out_ref[...] = acc


def _kern_tiled(src_ref, out_ref, slabs_ref, sems, *, h):
    # src: (C, W//128, H, 128); one DMA per 128-wide tile, C folded in
    step = pl.program_id(0)
    T = SLAB_W // 128
    nt = src_ref.shape[1]
    for ch in range(NCH):
        sy, sx = _origins(step, ch, src_ref.shape[2], nt * 128, h)
        tx = sx // 128
        for t in range(T):
            pltpu.make_async_copy(
                src_ref.at[:, tx + t, pl.ds(sy, h), :],
                slabs_ref.at[ch, :, pl.ds(0, h),
                             pl.ds(t * 128, 128)],
                sems.at[ch, t]).start()
    acc = jnp.zeros((8, 128), jnp.float32)
    for ch in range(NCH):
        sy, sx = _origins(step, ch, src_ref.shape[2], nt * 128, h)
        tx = sx // 128
        for t in range(T):
            pltpu.make_async_copy(
                src_ref.at[:, tx + t, pl.ds(sy, h), :],
                slabs_ref.at[ch, :, pl.ds(0, h),
                             pl.ds(t * 128, 128)],
                sems.at[ch, t]).wait()
        acc = acc + slabs_ref[ch, 0, 0:8, 0:128]
    out_ref[...] = acc


def build(kern, src_shape, h, tiled):
    @jax.jit
    def run(src):
        return pl.pallas_call(
            functools.partial(kern, h=h),
            grid=(STEPS,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((NCH, C, SLAB_H, SLAB_W), jnp.float32),
                (pltpu.SemaphoreType.DMA((NCH, SLAB_W // 128)) if tiled
                 else pltpu.SemaphoreType.DMA((NCH,))),
            ],
        )(src)
    return run


def median_ms(fn, lat, reps=9):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0 - lat) * 1e3)
    return max(float(np.median(ts)), 1e-3)


def main():
    trivial = jax.jit(lambda x: jnp.sum(x))
    z = jnp.ones((8,), jnp.float32)
    float(trivial(z))
    lat = median_ms(lambda: float(trivial(z)), 0.0, reps=9) / 1e3
    print(f"tunnel latency {lat * 1e3:.1f} ms "
          f"backend={jax.default_backend()}", file=sys.stderr)

    Hs, Ws = ((H + 7) // 8) * 8, ((W + 127) // 128) * 128
    rng = np.random.default_rng(0)
    planar = jnp.asarray(rng.random((C, Hs, Ws)), jnp.float32)
    tiled = jnp.asarray(
        np.transpose(np.asarray(planar).reshape(C, Hs, Ws // 128, 128),
                     (0, 2, 1, 3)))

    for h in (16, 24, 32, 48):
        gb = STEPS * NCH * C * h * SLAB_W * 4 / 1e9
        for name, kern, src, is_t in (("planar", _kern_planar, planar, 0),
                                      ("tiled", _kern_tiled, tiled, 1)):
            run = build(kern, src.shape, h, is_t)
            def one(run=run, src=src):
                return float(run(src)[0, 0])
            ms = median_ms(one, lat)
            print(f"  h={h:2d} {name:>6}: {ms:7.2f} ms  "
                  f"({gb:.2f} GB -> {gb / ms * 1e3:6.1f} GB/s)")


if __name__ == "__main__":
    main()
