"""Ahead-of-time program cache: serialized XLA programs on disk.

The full jitted stitch pipeline is a large program: tracing + lowering it
costs ~30 s of pure Python and XLA compilation tens of seconds more (the
reference pays its cost at C++ build time instead — 特征点检测.vcxproj's
role). For production serving that startup cost is paid at DEPLOY time,
not per process: this module serializes the lowered program (jax.export
bytecode) to disk next to JAX's persistent compilation cache, so a fresh
process skips tracing entirely (deserialize is milliseconds) and its XLA
compile hits the persistent executable cache (the exported StableHLO bytes
are frozen, so the compilation-cache key is stable across processes — the
live-traced program's key is NOT, because Mosaic kernel payloads embed
caller source locations that `strip-debuginfo` cannot reach).

Measured (one TPU chip through the dev tunnel, 2x1080p pair): cold first
call ~46 s; warm-start first call via this cache ~9 s in round 4
(tools/warm_start_probe.py now reports the deserialize/compile/run split
so the residual is attributable — see BENCH_r05 `warm_start_*` keys).

Keys hash the package sources, jax version, backend platform + device
kind, the program tag (which folds in the PipelineConfig repr), and every
argument's shape/dtype — any code or config change invalidates the blob
(and a stale/corrupt blob falls back to live tracing).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import jax

__all__ = ["cached_export", "stitch_pair_program", "clear", "default_dir"]


def default_dir() -> str:
    """Blob directory: <compilation cache dir>/exported."""
    base = jax.config.jax_compilation_cache_dir or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    return os.path.join(base, "exported")


def _package_source_hash() -> str:
    """Hash of every .py source in the package (sorted), so code edits
    invalidate AOT blobs. ~10 ms for the whole package."""
    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith((".py", ".cpp", ".h")):
                p = os.path.join(dirpath, fn)
                h.update(fn.encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    return h.hexdigest()


def _avals_sig(args) -> str:
    def one(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return f"{x.dtype}{tuple(x.shape)}"
        return repr(x)
    return ";".join(one(x) for x in jax.tree.leaves(args))


def _key(tag: str, args) -> str:
    dev = jax.devices()[0]
    h = hashlib.sha256()
    for part in (tag, jax.__version__, jax.default_backend(),
                 getattr(dev, "device_kind", "?"), _package_source_hash(),
                 _avals_sig(args)):
        h.update(str(part).encode())
        h.update(b"\0")
    return h.hexdigest()[:32]


def cached_export(tag: str, fn, args: tuple, *, directory: str | None = None,
                  refresh: bool = False):
    """Callable equivalent to jitted `fn`, backed by an on-disk serialized
    export.

    fn must be a `jax.jit` result with no un-bound static arguments (close
    over config and pass the closure to jax.jit). `args` are example
    arguments fixing shapes/dtypes. Returns (call, was_cached): `call`
    re-traces nothing on repeat processes; `was_cached` says whether the
    blob came from disk. The blob is written atomically; unreadable or
    stale blobs are ignored and rebuilt.
    """
    from jax import export as jexp

    directory = directory or default_dir()
    path = os.path.join(directory, f"{tag}-{_key(tag, args)}.jaxexp")
    if not refresh and os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = jexp.deserialize(f.read())
            return exp.call, True
        except Exception:
            pass  # corrupt/incompatible blob: rebuild below
    exp = jexp.export(fn)(*args)
    blob = exp.serialize()
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    except OSError:
        try:
            os.remove(tmp)
        except OSError:
            pass
    return exp.call, False


def stitch_pair_program(h: int, w: int, cfg=None, *,
                        directory: str | None = None, refresh: bool = False):
    """AOT-cached `stitch_pair_core` for (h, w, 3) RGB pairs.

    Returns (call(img1, img2, rng_key) -> (pano, valid, corner, metrics),
    was_cached). First build in a fresh deployment traces + exports
    (~1 min at 1080p on a tunneled TPU); later processes deserialize in
    milliseconds and hit the persistent executable cache.
    """
    import jax.numpy as jnp

    from imagestitch_tpu.config import PipelineConfig
    from imagestitch_tpu.pipeline import stitch_pair_impl

    cfg = cfg or PipelineConfig()

    def body(img1, img2, key):
        return stitch_pair_impl(img1, img2, key, cfg=cfg)

    # the rng argument is a typed PRNG key array, whose aval has no
    # ShapeDtypeStruct spelling — pass a real (tiny) key as the example
    args = (jax.ShapeDtypeStruct((h, w, 3), jnp.float32),
            jax.ShapeDtypeStruct((h, w, 3), jnp.float32),
            jax.random.key(0))
    tag = "stitch_pair_" + hashlib.sha256(repr(cfg).encode()).hexdigest()[:8]
    return cached_export(tag, jax.jit(body), args,
                         directory=directory, refresh=refresh)


def clear(directory: str | None = None) -> int:
    """Delete all AOT blobs; returns how many were removed."""
    directory = directory or default_dir()
    n = 0
    if os.path.isdir(directory):
        for fn in os.listdir(directory):
            if fn.endswith(".jaxexp"):
                os.remove(os.path.join(directory, fn))
                n += 1
    return n
