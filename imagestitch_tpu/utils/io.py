"""Host-side image I/O and synthetic test-scene generation.

The reference reads hardcoded .bmp/.jpg inputs via cv::imread
(ref 图像融合.cpp:31-34) and writes stage artifacts with cv::imwrite
(ref 特征点检测.cpp:1184). Here I/O is host NumPy/PIL; device code never
touches files.

`synthetic_pair` renders a deterministic textured scene and two overlapping
views of it — the test-fixture replacement for the reference's IFOV image
pair (which is not redistributable), giving known ground-truth geometry.
"""

from __future__ import annotations

import numpy as np


def imread(path: str) -> np.ndarray:
    """Read an image file to (H, W, 3) uint8 RGB."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def imwrite(path: str, img: np.ndarray) -> None:
    """Write (H, W[, 3]) uint8 (or float in [0,255]) to an image file."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def _render_scene(height: int, width: int, seed: int) -> np.ndarray:
    """Deterministic corner-rich texture: random rectangles + blobs + grid."""
    rng = np.random.default_rng(seed)
    img = np.zeros((height, width, 3), np.float32)
    # low-frequency background
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    img[..., 0] = 90 + 50 * np.sin(xx / 97.0) * np.cos(yy / 71.0)
    img[..., 1] = 100 + 40 * np.cos(xx / 53.0 + 1.0)
    img[..., 2] = 110 + 45 * np.sin(yy / 83.0 + 2.0)
    # random filled rectangles (strong corners for FAST)
    for _ in range(160):
        h = int(rng.integers(8, height // 6))
        w = int(rng.integers(8, width // 6))
        y = int(rng.integers(0, height - h))
        x = int(rng.integers(0, width - w))
        color = rng.uniform(0, 255, size=3).astype(np.float32)
        img[y:y + h, x:x + w] = 0.25 * img[y:y + h, x:x + w] + 0.75 * color
    # random bright dots
    for _ in range(300):
        y = int(rng.integers(2, height - 2))
        x = int(rng.integers(2, width - 2))
        color = rng.uniform(0, 255, size=3).astype(np.float32)
        img[y - 1:y + 2, x - 1:x + 2] = color
    return np.clip(img, 0, 255).astype(np.uint8)


def synthetic_pair(height: int = 480, width: int = 640, overlap: float = 0.4,
                   seed: int = 7, focal: float | None = None):
    """Two overlapping views of one scene, related by a pure x-translation of
    the viewport (the reference's IFOV pair geometry: small parallax-free
    shift; ref driver stitches exactly such a pair).

    Returns (img1, img2, true_shift_x): both (height, width, 3) uint8; pixel
    (x, y) of img2 equals pixel (x + true_shift_x, y) of img1 inside overlap.
    """
    shift = int(round(width * (1.0 - overlap)))
    scene = _render_scene(height, width + shift, seed)
    img1 = scene[:, :width]
    img2 = scene[:, shift:shift + width]
    return np.ascontiguousarray(img1), np.ascontiguousarray(img2), shift


def synthetic_sequence(n: int, height: int = 480, width: int = 640,
                       overlap: float = 0.5, seed: int = 7):
    """N overlapping views sliding across one wide scene (the multi-image
    panorama fixture). Returns (list of (H, W, 3) uint8, shift per step)."""
    shift = int(round(width * (1.0 - overlap)))
    scene = _render_scene(height, width + shift * (n - 1), seed)
    views = [np.ascontiguousarray(scene[:, i * shift:i * shift + width])
             for i in range(n)]
    return views, shift
