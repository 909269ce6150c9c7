"""ctypes bindings for the native CCL/flood-fill runtime (ccl.cpp), with a
pure-NumPy fallback when no C++ toolchain is available.

The native path replaces the reference's OpenCV floodFill component analysis
(ref 动态规划....cpp:196-310, :960-1093) for host-side mask bookkeeping.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
# the .so lives in a non-package subdir (no __init__.py) so import
# machinery (pkgutil.walk_packages etc.) never mistakes it for a broken
# Python extension module — it is a plain ctypes library
_LIBDIR = os.path.join(_HERE, "_lib")
_SO = os.path.join(_LIBDIR, "libccl.so")
_SRC = os.path.join(_HERE, "ccl.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


_SRC_MAXFLOW = os.path.join(_HERE, "maxflow.cpp")
_SRC_SEAMDUAL = os.path.join(_HERE, "seamdual.cpp")


def _build() -> bool:
    try:
        os.makedirs(_LIBDIR, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, _SRC_MAXFLOW,
             _SRC_SEAMDUAL, "-o", _SO],
            check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        newest_src = max(os.path.getmtime(_SRC),
                         os.path.getmtime(_SRC_MAXFLOW),
                         os.path.getmtime(_SRC_SEAMDUAL))
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.ccl_label.restype = ctypes.c_int32
        lib.ccl_label.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64]
        lib.flood_fill.restype = ctypes.c_int64
        lib.flood_fill.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_uint8, ctypes.c_uint8]
        lib.grid_maxflow.restype = ctypes.c_double
        lib.grid_maxflow.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.band_dijkstra.restype = ctypes.c_double
        lib.band_dijkstra.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.ccl_stats.restype = None
        lib.ccl_stats.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def have_native() -> bool:
    return _load() is not None


def connected_components(mask: np.ndarray):
    """4-connected labeling. mask: (H, W) bool/uint8. Returns
    (labels int32 (H, W) with 0 = background, n_components)."""
    m = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = m.shape
    labels = np.zeros((h, w), np.int32)
    lib = _load()
    if lib is not None:
        n = lib.ccl_label(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w)
        return labels, int(n)
    return _ccl_numpy(m)


def flood_fill(img: np.ndarray, seed_yx, value: int, new_val: int):
    """In-place seeded 4-connected flood fill. Returns filled pixel count."""
    a = np.ascontiguousarray(img.astype(np.uint8))
    h, w = a.shape
    lib = _load()
    if lib is not None:
        n = lib.flood_fill(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            int(seed_yx[0]), int(seed_yx[1]), int(value), int(new_val))
        img[...] = a
        return int(n)
    return _flood_numpy(img, seed_yx, value, new_val)


def component_stats(labels: np.ndarray, n: int):
    """Pixel counts + inclusive bounding boxes per component.
    Returns (counts (n,) int64, boxes (n, 4) int32 [x0, y0, x1, y1])."""
    lab = np.ascontiguousarray(labels.astype(np.int32))
    h, w = lab.shape
    counts = np.zeros((n,), np.int64)
    boxes = np.zeros((n, 4), np.int32)
    lib = _load()
    if lib is not None and n > 0:
        lib.ccl_stats(
            lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w, n,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return counts, boxes
    for k in range(1, n + 1):
        ys, xs = np.nonzero(lab == k)
        counts[k - 1] = len(ys)
        if len(ys):
            boxes[k - 1] = [xs.min(), ys.min(), xs.max(), ys.max()]
    return counts, boxes


# --- NumPy fallbacks (used when g++ is unavailable) ------------------------

def _ccl_numpy(m: np.ndarray):
    h, w = m.shape
    labels = np.zeros((h, w), np.int32)
    n = 0
    for y in range(h):
        for x in range(w):
            if m[y, x] and labels[y, x] == 0:
                n += 1
                stack = [(y, x)]
                labels[y, x] = n
                while stack:
                    cy, cx = stack.pop()
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = cy + dy, cx + dx
                        if (0 <= ny < h and 0 <= nx < w and m[ny, nx]
                                and labels[ny, nx] == 0):
                            labels[ny, nx] = n
                            stack.append((ny, nx))
    return labels, n


def _flood_numpy(img: np.ndarray, seed_yx, value: int, new_val: int):
    h, w = img.shape
    sy, sx = int(seed_yx[0]), int(seed_yx[1])
    if not (0 <= sy < h and 0 <= sx < w) or img[sy, sx] != value \
            or value == new_val:
        return 0
    stack = [(sy, sx)]
    img[sy, sx] = new_val
    count = 1
    while stack:
        cy, cx = stack.pop()
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ny, nx = cy + dy, cx + dx
            if 0 <= ny < h and 0 <= nx < w and img[ny, nx] == value:
                img[ny, nx] = new_val
                count += 1
                stack.append((ny, nx))
    return count


def grid_maxflow(tcap: np.ndarray, ecap: np.ndarray):
    """BK min-cut on an (H, W) 4-neighbor grid (native maxflow.cpp).

    tcap: (H, W) float32 terminal capacities (>0 source, <0 sink);
    ecap: (H, W, 4) float32 directed edge capacities (left,right,up,down).
    Returns (labels (H, W) uint8 — 1 = source side, flow value). Requires
    the native library (no NumPy fallback: augmenting paths in Python would
    be unusably slow).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native maxflow unavailable (g++ missing?)")
    t = np.ascontiguousarray(tcap, np.float32)
    e = np.ascontiguousarray(ecap, np.float32)
    h, w = t.shape
    lab = np.zeros((h, w), np.uint8)
    flow = lib.grid_maxflow(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        e.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return lab, float(flow)


def band_dijkstra(vcost: np.ndarray, hcost: np.ndarray):
    """Exact min-cut of a vertical seam corridor via the planar dual
    (native seamdual.cpp): Dijkstra over the (H+1) x (W+1) pixel-corner
    lattice.

    vcost: (H, W+1) float32 — cost of cutting between pixels (y, x-1) and
    (y, x) (corner column x); hcost: (H+1, W) float32 — cost of cutting
    between pixels (y-1, x) and (y, x) (corner row y).
    Returns (crossings (H, W+1) uint8 — 1 where the cut separates pixel
    x-1 from x in row y, total cut cost). Requires the native library."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native seamdual unavailable (g++ missing?)")
    v = np.ascontiguousarray(vcost, np.float32)
    hh = np.ascontiguousarray(hcost, np.float32)
    h = v.shape[0]
    w = v.shape[1] - 1
    assert hh.shape == (h + 1, w), (v.shape, hh.shape)
    cr = np.zeros((h, w + 1), np.uint8)
    cost = lib.band_dijkstra(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hh.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        cr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return cr, float(cost)
