"""Camera rotation recovery: spanning tree + rotation chaining.

Reconstruction of ref 恢复相机内参数.cpp HomographyBasedEstimator1 (:132-284):
focal estimation (autocalib), max spanning tree over pairwise inlier counts
(findMaxSpanningTree :145-213, Kruskal + BFS center selection), rotation
chaining along tree edges R_to = R_from · K_from⁻¹ · H⁻¹ · K_to
(CalcRotation :215-244), and principal-point re-centering (:266-282).

The graph logic runs host-side in NumPy (tiny: N images; SURVEY.md §3.3 calls
this out as not-hot), with `estimate_cameras` as a jittable fast path for the
fixed sequential-chain topology (cameras 0..N-1 connected i -> i+1), which is
what the end-to-end jitted pipeline uses.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from imagestitch_tpu.types import CameraParams
from imagestitch_tpu.geometry.autocalib import estimate_focal


def max_spanning_tree(num_images: int, pair_from: np.ndarray,
                      pair_to: np.ndarray, weights: np.ndarray):
    """Kruskal maximum spanning tree + center node (host side).

    Mirrors ref findMaxSpanningTree (:145-213): edges sorted by descending
    weight (pairwise num_inliers), union-find merge, then the center is the
    node minimizing the maximum BFS hop distance to any leaf.

    Returns (edges, center, reachable): edges is a list of (from, to)
    directed from the center outward in BFS order; `reachable` is a bool
    (num_images,) mask of the LARGEST connected match component — the
    OpenCV driver's leaveBiggestComponent semantics (images with no
    confident path to the panorama must be excluded, not composed at
    identity; an unmatched image would otherwise even win the min-max-depth
    center rule with its trivial depth of 0 and hijack the layout).
    """
    order = np.argsort(-np.asarray(weights))
    parent = list(range(num_images))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    adj: list[list[int]] = [[] for _ in range(num_images)]
    for e in order:
        a, b = int(pair_from[e]), int(pair_to[e])
        if weights[e] <= 0:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            adj[a].append(b)
            adj[b].append(a)

    roots = np.asarray([find(i) for i in range(num_images)])
    root_ids, counts = np.unique(roots, return_counts=True)
    big_root = root_ids[np.argmax(counts)]
    reachable = roots == big_root

    def bfs_depths(start):
        depth = np.full(num_images, -1, np.int32)
        depth[start] = 0
        q = [start]
        while q:
            u = q.pop(0)
            for v in adj[u]:
                if depth[v] < 0:
                    depth[v] = depth[u] + 1
                    q.append(v)
        return depth

    # center = argmin over the big component's nodes of max depth within it
    # (ref :184-212 uses the "min of max leaf distance" rule)
    best_center, best_max = int(np.nonzero(reachable)[0][0]), None
    for c in np.nonzero(reachable)[0]:
        d = bfs_depths(int(c))
        mx = d[reachable].max()
        if best_max is None or mx < best_max:
            best_center, best_max = int(c), mx

    # BFS edge order from the center
    edges = []
    seen = {best_center}
    q = [best_center]
    while q:
        u = q.pop(0)
        for v in adj[u]:
            if v not in seen:
                seen.add(v)
                edges.append((u, v))
                q.append(v)
    return edges, best_center, reachable


def _K_of(focal, aspect, ppx, ppy):
    K = np.eye(3, dtype=np.float64)
    K[0, 0] = focal
    K[0, 2] = ppx
    K[1, 1] = focal * aspect
    K[1, 2] = ppy
    return K


def estimate_cameras_host(Hs: np.ndarray, pair_from: np.ndarray,
                          pair_to: np.ndarray, num_inliers: np.ndarray,
                          pair_valid: np.ndarray, img_sizes: np.ndarray,
                          return_tree: bool = False):
    """General-topology camera recovery (host, NumPy; ref estimate :246-284).

    Hs: (P, 3, 3) with H[p] mapping points of pair_from[p] into pair_to[p]
    in CENTER-NORMALIZED coordinates (the matcher subtracts image centers,
    ref 特征点匹配.cpp:170-178). Returns CameraParams with principal points
    re-centered to pixel coordinates (ref :266-282); with
    `return_tree=True`, returns (CameraParams, edges, reachable) where
    edges are the max-spanning-tree (u, v) pairs in BFS order from the
    center image — the actual adjacency topology, which the Stitcher uses
    to order pairwise seam resolution — and `reachable` marks the largest
    match component (leaveBiggestComponent semantics): images outside it
    keep R = identity and must be excluded from compositing by the caller.
    """
    Hs = np.asarray(Hs, np.float64)
    num_images = int(img_sizes.shape[0])
    focal = float(estimate_focal(jnp.asarray(Hs, jnp.float32),
                                 jnp.asarray(pair_valid),
                                 jnp.asarray(img_sizes), num_images))

    valid_idx = np.nonzero(np.asarray(pair_valid))[0]
    edges, center, reachable = max_spanning_tree(
        num_images,
        np.asarray(pair_from)[valid_idx],
        np.asarray(pair_to)[valid_idx],
        np.asarray(num_inliers)[valid_idx])

    # H lookup both directions: H maps from->to; to->from uses inv
    Hmap = {}
    for p in valid_idx:
        a, b = int(pair_from[p]), int(pair_to[p])
        Hmap[(a, b)] = Hs[p]
        Hmap[(b, a)] = np.linalg.inv(Hs[p])

    R = np.tile(np.eye(3, dtype=np.float64), (num_images, 1, 1))
    K = _K_of(focal, 1.0, 0.0, 0.0)
    Kinv = np.linalg.inv(K)
    for (u, v) in edges:
        H_uv = Hmap[(u, v)]
        # ref CalcRotation :236-237: R_to = R_from * K_from^-1 * H^-1 * K_to
        R[v] = R[u] @ (Kinv @ np.linalg.inv(H_uv) @ K)

    sizes = np.asarray(img_sizes, np.float64)
    cams = CameraParams(
        focal=jnp.full((num_images,), focal, jnp.float32),
        aspect=jnp.ones((num_images,), jnp.float32),
        ppx=jnp.asarray(0.5 * sizes[:, 1], jnp.float32),
        ppy=jnp.asarray(0.5 * sizes[:, 0], jnp.float32),
        R=jnp.asarray(R, jnp.float32),
        t=jnp.zeros((num_images, 3), jnp.float32),
    )
    if return_tree:
        return cams, edges, reachable
    return cams


def affine_cameras(Gs) -> CameraParams:
    """CameraParams carrying global affine transforms: K = I (focal 1,
    pp 0) and R = G_i (image-i pixel coords -> canvas coords). The plane
    projector's backward map K·R⁻¹·[u, v, 1] then IS the affine warp
    G_i⁻¹·[u, v, 1] at scale 1 — the warp kernels serve the SCANS mode
    unchanged (k_rinv is data). Shared by the host estimator below and
    the jitted pair/chain paths (pipeline)."""
    Gs = jnp.asarray(Gs, jnp.float32)
    n = Gs.shape[0]
    return CameraParams(
        focal=jnp.ones((n,), jnp.float32),
        aspect=jnp.ones((n,), jnp.float32),
        ppx=jnp.zeros((n,), jnp.float32),
        ppy=jnp.zeros((n,), jnp.float32),
        R=Gs,
        t=jnp.zeros((n, 3), jnp.float32))


def estimate_affine_host(Hs: np.ndarray, pair_from: np.ndarray,
                         pair_to: np.ndarray, num_inliers: np.ndarray,
                         pair_valid: np.ndarray, num_images: int,
                         return_tree: bool = False):
    """General-topology AFFINE camera recovery (the cv2.Stitcher SCANS
    family's AffineBasedEstimator): global transforms G_i chained along
    the max spanning tree with the center image as the canvas frame.

    Hs: (P, 3, 3) with H[p] mapping pair_from[p]'s RAW pixel coords into
    pair_to[p]'s (the affine matcher does not center-normalize), last row
    (0, 0, 1). G_v = G_u · H_uv⁻¹ along tree edges; G_center = I.

    Returns CameraParams carrying the affine model (K = I: focal 1, pp 0,
    R = G_i — see pipeline._affine_cameras for why the plane projector
    then IS the affine warp), plus (edges, reachable) if return_tree.
    """
    Hs = np.asarray(Hs, np.float64)
    valid_idx = np.nonzero(np.asarray(pair_valid))[0]
    edges, center, reachable = max_spanning_tree(
        num_images,
        np.asarray(pair_from)[valid_idx],
        np.asarray(pair_to)[valid_idx],
        np.asarray(num_inliers)[valid_idx])

    Gmap = {}
    for p in valid_idx:
        a, b = int(pair_from[p]), int(pair_to[p])
        Gmap[(a, b)] = Hs[p]
        Gmap[(b, a)] = np.linalg.inv(Hs[p])

    G = np.tile(np.eye(3, dtype=np.float64), (num_images, 1, 1))
    for (u, v) in edges:
        G[v] = G[u] @ np.linalg.inv(Gmap[(u, v)])

    cams = affine_cameras(G)
    if return_tree:
        return cams, edges, reachable
    return cams


def estimate_cameras_spliced(H1: jnp.ndarray, valid1: jnp.ndarray,
                             good1: jnp.ndarray, H2: jnp.ndarray,
                             valid2: jnp.ndarray, good2: jnp.ndarray,
                             img_sizes: jnp.ndarray):
    """Jittable chain camera recovery with one-gap indirect splice.

    H1 (N-1, 3, 3): consecutive i -> i+1 center-normalized homographies;
    H2 (N-2, 3, 3): skip i -> i+2. `valid*` are h_valid masks (feed the
    focal median, like estimate_cameras); `good*` additionally gate on
    match confidence (feed the chain accumulation). A broken consecutive
    link i -> i+1 is bridged by the skip pair i-1 -> i+1 when that pair is
    usable and image i-1 was reached; an unbridgeable image stays
    unreachable and the caller excludes it from the canvas (the
    leaveBiggestComponent analogue for the fixed-N chain program, where the
    host MST path is unavailable).

    Returns (CameraParams, reachable (N,) bool).
    """
    n1 = H1.shape[0]
    num_images = n1 + 1
    focal = estimate_focal(jnp.concatenate([H1, H2], axis=0),
                           jnp.concatenate([valid1, valid2], axis=0),
                           img_sizes, num_images)

    K = jnp.eye(3, dtype=jnp.float32) * jnp.array([focal, focal, 1.0])
    Kinv = jnp.eye(3, dtype=jnp.float32) * jnp.array(
        [1.0 / focal, 1.0 / focal, 1.0])
    step1 = jax.vmap(lambda Hm: Kinv @ jnp.linalg.inv(Hm) @ K)(H1)
    step2 = jax.vmap(lambda Hm: Kinv @ jnp.linalg.inv(Hm) @ K)(H2)

    Rs = [jnp.eye(3, dtype=jnp.float32)]
    reach = [jnp.asarray(True)]
    for i in range(n1):
        cand1 = Rs[i] @ step1[i]
        ok1 = good1[i] & reach[i]
        if i >= 1:
            cand2 = Rs[i - 1] @ step2[i - 1]
            ok2 = good2[i - 1] & reach[i - 1]
            R_next = jnp.where(ok1, cand1, jnp.where(ok2, cand2, cand1))
            reach_next = ok1 | ok2
        else:
            R_next = cand1
            reach_next = ok1
        Rs.append(R_next)
        reach.append(reach_next)

    sizes = img_sizes.astype(jnp.float32)
    cams = CameraParams(
        focal=jnp.full((num_images,), focal, jnp.float32),
        aspect=jnp.ones((num_images,), jnp.float32),
        ppx=0.5 * sizes[:, 1],
        ppy=0.5 * sizes[:, 0],
        R=jnp.stack(Rs),
        t=jnp.zeros((num_images, 3), jnp.float32),
    )
    return cams, jnp.stack(reach)


def estimate_cameras(Hs_chain: jnp.ndarray, pair_valid: jnp.ndarray,
                     img_sizes: jnp.ndarray) -> CameraParams:
    """Jittable camera recovery for the sequential-chain topology.

    Hs_chain: (N-1, 3, 3) with Hs_chain[i] mapping image i's center-normalized
    points into image i+1's. The spanning tree of a chain is the chain itself
    rooted at image 0; rotations accumulate with a scan-style cumulative
    product (unrolled — N is tiny and static).
    """
    n_minus_1 = Hs_chain.shape[0]
    num_images = n_minus_1 + 1
    focal = estimate_focal(Hs_chain, pair_valid, img_sizes, num_images)

    K = jnp.eye(3, dtype=jnp.float32) * jnp.array([focal, focal, 1.0])
    Kinv = jnp.eye(3, dtype=jnp.float32) * jnp.array(
        [1.0 / focal, 1.0 / focal, 1.0])

    Rs = [jnp.eye(3, dtype=jnp.float32)]
    for i in range(n_minus_1):
        step = Kinv @ jnp.linalg.inv(Hs_chain[i]) @ K
        Rs.append(Rs[-1] @ step)
    R = jnp.stack(Rs)

    sizes = img_sizes.astype(jnp.float32)
    return CameraParams(
        focal=jnp.full((num_images,), focal, jnp.float32),
        aspect=jnp.ones((num_images,), jnp.float32),
        ppx=0.5 * sizes[:, 1],
        ppy=0.5 * sizes[:, 0],
        R=R,
        t=jnp.zeros((num_images, 3), jnp.float32),
    )
