"""Timelapse compositor (OpenCV cv2.detail.Timelapser equivalent).

stitching_detailed's --timelapse mode: instead of blending, each warped
frame is placed ALONE on the common panorama canvas and written out as its
own image ("fixed_<name>"), so consecutive frames are registered against
one static canvas. Not part of the reference's seven programs — provided
for cv2.detail API completeness (see MIGRATING.md).

Semantics pinned against cv2 5.0 (tests/test_opencv_parity.py):
  - AS_IS: canvas ROI = resultRoi (union of all frame rectangles); process
    writes the frame's pixels at its corner, everything else stays 0.
  - CROP: canvas ROI = the intersection of all frame rectangles.
  - The mask argument of process is IGNORED (OpenCV's Timelapser::process
    ignores it too — the whole rectangle is written).

In this framework's shared-frame pipeline the per-frame canvases are
directly available (Stitcher dump_stages "warped.npz": warped * mask), so
Timelapser is host NumPy — it exists for users migrating corner/size-based
cv2.detail code.
"""

from __future__ import annotations

import numpy as np


class Timelapser:
    """kind: "as_is" (cv2.detail.Timelapser_AS_IS) or "crop"
    (Timelapser_CROP)."""

    def __init__(self, kind: str = "as_is"):
        if kind not in ("as_is", "crop"):
            raise ValueError(f"unknown timelapser kind: {kind!r}")
        self.kind = kind
        self._roi = None  # (x0, y0, x1, y1)

    def initialize(self, corners, sizes):
        """corners: [(x, y)] top-left per frame; sizes: [(w, h)] per frame
        (OpenCV's Size order). Computes the common canvas ROI."""
        corners = [(int(x), int(y)) for x, y in corners]
        rects = [(x, y, x + int(w), y + int(h))
                 for (x, y), (w, h) in zip(corners, sizes)]
        if self.kind == "as_is":                      # resultRoi: union
            x0 = min(r[0] for r in rects)
            y0 = min(r[1] for r in rects)
            x1 = max(r[2] for r in rects)
            y1 = max(r[3] for r in rects)
        else:                                         # crop: intersection
            x0 = max(r[0] for r in rects)
            y0 = max(r[1] for r in rects)
            x1 = min(r[2] for r in rects)
            y1 = min(r[3] for r in rects)
            if x1 <= x0 or y1 <= y0:
                raise ValueError("crop timelapser: frames do not all "
                                 "intersect")
        self._roi = (x0, y0, x1, y1)
        return self

    @property
    def dst_roi(self):
        return self._roi

    def process(self, img, corner) -> np.ndarray:
        """Place one frame alone on the canvas. img: (h, w, C); corner:
        (x, y) of its top-left in pano coords. Returns the (H, W, C)
        canvas (dtype preserved), zeros outside the frame."""
        if self._roi is None:
            raise RuntimeError("initialize() first")
        x0, y0, x1, y1 = self._roi
        img = np.asarray(img)
        h, w = img.shape[:2]
        dst = np.zeros((y1 - y0, x1 - x0) + img.shape[2:], img.dtype)
        cx, cy = int(corner[0]), int(corner[1])
        # clip the frame rectangle to the canvas
        sx0, sy0 = max(x0 - cx, 0), max(y0 - cy, 0)
        sx1, sy1 = min(x1 - cx, w), min(y1 - cy, h)
        if sx1 > sx0 and sy1 > sy0:
            dst[cy + sy0 - y0:cy + sy1 - y0,
                cx + sx0 - x0:cx + sx1 - x0] = img[sy0:sy1, sx0:sx1]
        return dst
