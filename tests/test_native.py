"""Native CCL/flood-fill runtime tests (C++ lib with NumPy fallback)."""

import numpy as np

from imagestitch_tpu.native import (
    connected_components, flood_fill, component_stats, have_native,
)


def test_native_library_builds():
    # the toolchain is present in this environment; the native path must load
    assert have_native()


def test_ccl_two_blobs():
    m = np.zeros((10, 12), bool)
    m[1:4, 1:4] = True
    m[6:9, 7:11] = True
    labels, n = connected_components(m)
    assert n == 2
    assert labels[2, 2] != labels[7, 8]
    assert labels[2, 2] > 0 and labels[7, 8] > 0
    assert (labels[~m] == 0).all()
    counts, boxes = component_stats(labels, n)
    assert sorted(counts.tolist()) == [9, 12]
    l1 = labels[2, 2] - 1
    assert boxes[l1].tolist() == [1, 1, 3, 3]


def test_ccl_diagonal_not_connected():
    m = np.zeros((4, 4), bool)
    m[0, 0] = m[1, 1] = True
    _, n = connected_components(m)
    assert n == 2  # 4-connectivity


def test_flood_fill_region():
    img = np.zeros((8, 8), np.uint8)
    img[2:6, 2:6] = 7
    n = flood_fill(img, (3, 3), 7, 9)
    assert n == 16
    assert (img[2:6, 2:6] == 9).all()
    assert (img[0] == 0).all()


def test_flood_fill_out_of_region():
    img = np.zeros((4, 4), np.uint8)
    assert flood_fill(img, (0, 0), 5, 6) == 0


def test_ccl_matches_fallback():
    from imagestitch_tpu.native.ccl import _ccl_numpy
    rng = np.random.default_rng(0)
    m = (rng.uniform(size=(20, 25)) > 0.55).astype(np.uint8)
    l1, n1 = connected_components(m)
    l2, n2 = _ccl_numpy(m)
    assert n1 == n2
    # same partition (labels may permute): compare co-membership on samples
    ys, xs = np.nonzero(m)
    for i in range(0, len(ys), 7):
        for j in range(0, len(ys), 11):
            a = l1[ys[i], xs[i]] == l1[ys[j], xs[j]]
            b = l2[ys[i], xs[i]] == l2[ys[j], xs[j]]
            assert a == b
