"""Differential tests: full-parity DpSeamFinder vs cv2.detail.DpSeamFinder.

The reference's correctness standard is "matches OpenCV output"
(SURVEY.md §4); cv2's DpSeamFinder runs the same component/conflict
machinery the reference transcribes (ref 动态规划....cpp:87-1093), so masks
must agree. Scenes cover the cases the round-1 verdict called out as
missing: overlaps that fragment into multiple INTERS components, and
vertically-arranged pairs (horizontal seams)."""

from __future__ import annotations

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from imagestitch_tpu.seam.dp_full import DpSeamFinder, dp_seam_find_full


def _textured(h, w, seed, base=0.0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    # smooth it so seams have meaningful structure
    k = np.ones((5, 5), np.float32) / 25.0
    img = cv2.filter2D(img, -1, k) + base
    return img.astype(np.float32)


def _cv2_masks(images, corners, masks, cost="color"):
    # NB: createDefault(DpSeamFinder_COLOR) silently builds a NoSeamFinder
    # (COLOR == 0 == SeamFinder::NO); the string ctor selects the real one
    finder = cv2.detail_DpSeamFinder(
        "COLOR" if cost == "color" else "COLOR_GRAD")
    umasks = [cv2.UMat(m.astype(np.uint8) * 255) for m in masks]
    # our convention is RGB; cv2's COLOR_GRAD gray conversion assumes BGR,
    # so hand cv2 channel-reversed arrays (color costs are order-invariant)
    uimgs = [cv2.UMat(np.ascontiguousarray(im[..., ::-1].astype(np.float32)))
             for im in images]
    out = finder.find(uimgs, [tuple(int(v) for v in c) for c in corners],
                      umasks)
    return [np.asarray(m.get() if hasattr(m, "get") else m) > 0
            for m in out]


def _agree(ours, theirs):
    total = sum(m.size for m in theirs)
    diff = sum(int((a != b).sum()) for a, b in zip(ours, theirs))
    return 1.0 - diff / total


def test_simple_horizontal_pair_matches_cv2():
    """Side-by-side pair (vertical seam), single INTERS component."""
    h, w = 120, 160
    img1 = _textured(h, w, 0)
    img2 = _textured(h, w, 1)
    masks = [np.ones((h, w), bool), np.ones((h, w), bool)]
    corners = [(0, 0), (100, 7)]
    ours = DpSeamFinder("color").find([img1, img2], corners, masks)
    ref = _cv2_masks([img1, img2], corners, masks)
    assert _agree(ours, ref) > 0.999


def test_vertically_arranged_pair_matches_cv2():
    """Stacked pair -> the seam runs HORIZONTALLY (the round-1 on-device DP
    only handled vertical seams)."""
    h, w = 140, 150
    img1 = _textured(h, w, 2)
    img2 = _textured(h, w, 3)
    masks = [np.ones((h, w), bool), np.ones((h, w), bool)]
    corners = [(0, 0), (9, 90)]
    ours = DpSeamFinder("color").find([img1, img2], corners, masks)
    ref = _cv2_masks([img1, img2], corners, masks)
    assert _agree(ours, ref) > 0.999
    # the resolved masks actually split the overlap between the images:
    # each image keeps part of it, and the dual-claimed area is small
    ov1 = ours[0][95:135, 20:140]
    ov2 = ours[1][95:135, 20:140]
    assert ov1.sum() > 0 and ov2.sum() > 0
    assert (ov1 & ov2).mean() < 0.5


def test_multi_component_overlap_matches_cv2():
    """Irregular masks make the intersection fragment into >= 2 INTERS
    components (ref findComponents/resolveConflicts :196-548)."""
    h, w = 130, 170
    img1 = _textured(h, w, 4)
    img2 = _textured(h, w, 5)
    m1 = np.ones((h, w), bool)
    m2 = np.ones((h, w), bool)
    # notch img1's right side across the whole overlap so the intersection
    # splits into two INTERS components
    m1[50:80, 100:] = False
    corners = [(0, 0), (100, 0)]

    # sanity: the overlap region really has 2 components
    from imagestitch_tpu.native.ccl import connected_components
    u1 = np.zeros((h, w + 100), bool)
    u2 = np.zeros((h, w + 100), bool)
    u1[:, :w] = m1
    u2[:, 100:] = m2
    _, ncomp = connected_components(u1 & u2)
    assert ncomp >= 2

    ours = DpSeamFinder("color").find([img1, img2], corners, [m1, m2])
    ref = _cv2_masks([img1, img2], corners, [m1, m2])
    assert _agree(ours, ref) > 0.999


def test_color_grad_cost_matches_cv2():
    h, w = 110, 140
    img1 = _textured(h, w, 6)
    img2 = _textured(h, w, 7)
    masks = [np.ones((h, w), bool), np.ones((h, w), bool)]
    corners = [(0, 0), (80, 0)]
    ours = DpSeamFinder("color_grad").find([img1, img2], corners, masks)
    ref = _cv2_masks([img1, img2], corners, masks, cost="color_grad")
    assert _agree(ours, ref) > 0.995


def test_shared_frame_wrapper():
    """dp_seam_find_full over equal-size shared canvases (the Stitcher's
    calling convention): masks partition the overlap, nothing lost."""
    H, W = 100, 220
    img = _textured(H, W, 8)
    i1 = np.zeros((H, W, 3), np.float32)
    i2 = np.zeros((H, W, 3), np.float32)
    m1 = np.zeros((H, W), bool)
    m2 = np.zeros((H, W), bool)
    m1[:, :140] = True
    m2[:, 80:] = True
    i1[m1] = img[m1]
    i2[m2] = img[m2] + 3.0
    out = dp_seam_find_full(
        [i1, i2], [(0, 0), (0, 0)], [m1, m2])
    ov = m1 & m2
    assert not (out[0] & out[1] & ov).any() or \
        ((out[0] & out[1] & ov).sum() / ov.sum()) < 0.01
    # union coverage preserved
    assert ((out[0] | out[1]) == (m1 | m2)).mean() > 0.999
