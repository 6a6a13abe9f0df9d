"""Batched keypoint -> map-model matching.

TPU-native re-design of KeypointsMatcher (KeypointsMatcher.cxx:33-480): the
per-keypoint OpenMP loop with kd-tree queries becomes one fused batched
pipeline per keypoint type — bucket-index k-NN, masked neighborhood PCA, the
full set of validity gates, and Mahalanobis residual parameters, all
vectorized over the fixed keypoint capacity:

- edges, localization mode: 2-point RANSAC line neighbors
  (GetRansacLineNeighbors 408-480) evaluated as a dense (k-1)x(k-1) inlier
  matrix; line model A = I - n n^T (BuildLineMatch 106-187);
- edges, ego-motion mode: one-neighbor-per-ring filter excluding the closest
  point's own ring, rings limited to +-4 of it
  (GetPerRingLineNeighbors 349-405);
- planes: planarity gate l1/l2 >= threshold, model A = n n^T
  (BuildPlaneMatch 190-273);
- blobs: ellipsoid model A = Cov^(-1/2) (BuildBlobMatch 276-346).

Each match yields (A, P, X, weight, status) where the residual used by the
solver is  w * A @ (R X + t - P), with fit-quality weight
w = 1 - sqrt(mse)/max_model_error (1.0 for blobs) and a MatchStatus rejection
code for the debug/confidence surface.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidarslam_tpu.config import MatchStatus, MatchingConfig
from lidarslam_tpu.core import pca, se3
from lidarslam_tpu.ops.voxel_map import SubmapView, brute_knn


class Matches(NamedTuple):
    """Per-keypoint match parameters (slots align with the keypoint arrays).

    The Mahalanobis square-root information matrix A (symmetric for all
    three match models: n n^T, I - d d^T, V s V^T) is stored
    structure-of-arrays as its six unique entries in (6, Q) layout — on TPU
    a (Q, 3, 3) array tiles to T(4,128) (42x padding waste) and every
    einsum against it lowers to a bf16 batched matmul bracketed by layout
    copies (~2.2 ms/frame at 64-beam scale, measured). The solver consumes
    the planes directly; use the `A` property for (Q, 3, 3) debug views."""

    A6: jax.Array       # (6, Q) symmetric A entries [a00,a01,a02,a11,a12,a22]
    P: jax.Array        # (Q, 3) model position (neighborhood mean)
    X: jax.Array        # (Q, 3) keypoint in BASE coordinates
    weight: jax.Array   # (Q,) fit-quality weight
    status: jax.Array   # (Q,) uint8 MatchStatus
    valid: jax.Array    # (Q,) bool == (status == SUCCESS)

    @property
    def n_matches(self):
        return jnp.sum(self.valid)

    @property
    def A(self):
        """(Q, 3, 3) dense view of A6 (tests / debug export only)."""
        a00, a01, a02, a11, a12, a22 = self.A6
        row0 = jnp.stack([a00, a01, a02], axis=-1)
        row1 = jnp.stack([a01, a11, a12], axis=-1)
        row2 = jnp.stack([a02, a12, a22], axis=-1)
        return jnp.stack([row0, row1, row2], axis=-2)

    @classmethod
    def from_dense(cls, A, **kw):
        """Construct from a dense (Q, 3, 3) symmetric A (test convenience)."""
        A = jnp.asarray(A)
        return cls(A6=jnp.stack([A[:, 0, 0], A[:, 0, 1], A[:, 0, 2],
                                 A[:, 1, 1], A[:, 1, 2], A[:, 2, 2]]), **kw)


def _a6(a00, a01, a02, a11, a12, a22):
    """Stack six symmetric-entry planes into the (6, Q) A6 layout."""
    return jnp.stack([a00, a01, a02, a11, a12, a22], axis=0)


def _finish(A6, P, X, weight, ok, status):
    status = jnp.where(ok, MatchStatus.SUCCESS, status).astype(jnp.uint8)
    z = ok[:, None]
    return Matches(
        A6=jnp.where(ok[None, :], A6, 0.0),
        P=jnp.where(z, P, 0.0),
        X=X,
        weight=jnp.where(ok, weight, 0.0),
        status=status,
        valid=ok,
    )


def _knn(index: SubmapView, world, k, params: MatchingConfig, geom=None,
         q_valid=None, prepared=None, need_rings=True):
    """Neighbor search. Returns (d2 (Q,k), nbr (Q,k,3), rings (Q,k), found).

    `need_rings=False` skips the per-neighbor ring gather and returns a
    constant-zero plane of the same shape: only the ego-motion edge filter
    (`single_edge_per_ring`) consumes rings, and a localization SubmapView's
    ring plane is all-zeros anyway (voxel_map.extract_submap_view) — yet the
    gather itself is an emulated (Q*k)-row loop that profiled at ~0.58 ms
    PER TYPE per frame at 64-beam scale (round-5 trace: the two hottest
    non-kernel fusions bracketing the plane k-NN were exactly this gather
    of broadcast zeros).

    `geom` is the static per-call index geometry: None for a plain local
    SubmapView scan; ("map_shard", axis_name) when `index` is this device's
    slab of a mesh-sharded map (parallel/sharded_map.py) — queries
    all_gather, each device scans its 1/n slab, the per-slab top-k merge
    over ICI, and this device keeps its own query rows again."""
    if isinstance(geom, tuple) and len(geom) == 2 and geom[0] == "map_shard":
        from lidarslam_tpu.parallel import sharded_map

        axis = geom[1]
        q = world.shape[0]
        q_full = jax.lax.all_gather(world, axis, tiled=True)
        d2f, nbrf, ringf = sharded_map.shard_knn(index, q_full, k, axis)
        start = jax.lax.axis_index(axis) * q
        d2 = jax.lax.dynamic_slice_in_dim(d2f, start, q, 0)
        nbr = jax.lax.dynamic_slice_in_dim(nbrf, start, q, 0)
        rings = jax.lax.dynamic_slice_in_dim(ringf, start, q, 0)
        return d2, nbr, rings, jnp.isfinite(d2)
    # exact brute-force scan (see SubmapView); blocks beyond the neighbor
    # gate are skipped on the Pallas path — any dropped neighbor would have
    # been rejected by the `near` check below anyway. Neighbor coordinates
    # come straight out of the kernel (with_coords): the post-kernel xyz
    # gather measured 8.1 ms/FRAME at 64-beam scale (round-4 profile) —
    # that is the SUM over 2 types x 3 ICP rounds of (Q=8192, k=10)
    # gathers, ~490k rows/frame at XLA-TPU's ~20 ns/gather-row,
    # independent of whether the source was the HBM map table or the
    # kernel's VMEM plane operands (a single plane-operand gather is only
    # ~0.13 ms — it is the per-frame multiplicity that made it hot).
    d2, idx, nbr = brute_knn(index, world, k,
                             prune_radius=float(params.max_neighbors_distance),
                             q_valid=q_valid, prepared=prepared,
                             with_coords=True)
    found = jnp.isfinite(d2)
    rings = index.ring[idx] if need_rings else jnp.zeros(idx.shape, jnp.int32)
    return d2, nbr, rings, found


# public alias: the ICP loop's reuse_knn mode queries neighbors itself in
# round 0 and hands the cached (nbr, rings, found) back into match_*
knn_query = _knn


def _reuse_d2(world, nbr, found):
    """Exact squared distances of re-posed queries to CACHED neighbor
    coordinates (the reuse_knn path: coordinates from round 0, distances
    against the current round's pose)."""
    diff = world[:, None, :] - nbr
    d2 = jnp.sum(diff * diff, axis=-1)
    return jnp.where(found, d2, jnp.inf)


def match_planes(kp_xyz, kp_valid, index: SubmapView, pose, params: MatchingConfig, geom,
                 prepared=None, knn=None):
    """Point-to-plane matches (BuildPlaneMatch semantics). `knn`: cached
    (nbr, rings, found) from a previous round (reuse_knn mode)."""
    k = params.plane_nb_neighbors
    world = se3.japply_pose(pose, kp_xyz)
    if knn is None:
        d2, nbr, _, found = _knn(index, world, k, params, geom, kp_valid,
                                 prepared, need_rings=False)
    else:
        nbr, _, found = knn
        d2 = _reuse_d2(world, nbr, found)

    n_found = jnp.sum(found, axis=1)
    enough = kp_valid & (n_found >= k)
    # farthest of the k must be close enough (KeypointsMatcher.cxx:217)
    near = jnp.where(found, d2, 0.0).max(axis=1) <= params.max_neighbors_distance**2

    # SoA PCA: no (Q, 3, 3) cov/eigvec intermediates (see core/pca.py)
    mean, c6, _ = pca.masked_cov6(nbr, found)
    (l0, l1, l2), (n, _, _) = pca.eigh6(c6)
    planar = l1 >= params.planarity_threshold * jnp.maximum(l2, 1e-30)
    A = _a6(n[0] * n[0], n[0] * n[1], n[0] * n[2],
            n[1] * n[1], n[1] * n[2], n[2] * n[2])
    mse = l0
    mse_ok = mse < params.plane_max_model_error**2
    finite = (jnp.isfinite(n[0]) & jnp.isfinite(n[1]) & jnp.isfinite(n[2])
              & (l2 > 1e-20))

    ok = enough & near & planar & mse_ok & finite
    weight = jnp.where(mse <= 1e-6, 1.0, 1.0 - jnp.sqrt(jnp.maximum(mse, 0.0)) / params.plane_max_model_error)

    status = _status_chain(kp_valid, enough, near, [(planar, MatchStatus.BAD_PCA_STRUCTURE),
                                                    (finite, MatchStatus.INVALID_NUMERICAL),
                                                    (mse_ok, MatchStatus.MSE_TOO_LARGE)])
    return _finish(A, mean, kp_xyz, weight, ok, status)


def match_edges(kp_xyz, kp_valid, index: SubmapView, pose, params: MatchingConfig, geom,
                prepared=None, knn=None):
    """Point-to-line matches; neighbor filter per params.single_edge_per_ring.
    `knn`: cached (nbr, rings, found) from a previous round (reuse_knn)."""
    k = params.edge_nb_neighbors
    world = se3.japply_pose(pose, kp_xyz)
    if knn is None:
        d2, nbr, rings, found = _knn(index, world, k, params, geom, kp_valid,
                                     prepared,
                                     need_rings=params.single_edge_per_ring)
    else:
        nbr, rings, found = knn
        d2 = _reuse_d2(world, nbr, found)

    if params.single_edge_per_ring:
        sel = _per_ring_filter(rings, found)
    else:
        sel = _ransac_line_filter(nbr, found, params.edge_max_model_error)

    n_sel = jnp.sum(sel, axis=1)
    enough = kp_valid & (n_sel >= params.edge_min_nb_neighbors)
    far_sel = jnp.where(sel, d2, 0.0).max(axis=1)
    near = far_sel <= params.max_neighbors_distance**2

    mean, c6, _ = pca.masked_cov6(nbr, sel)
    (l0, l1, l2), (_, _, n) = pca.eigh6(c6)     # n = line direction
    A = _a6(1.0 - n[0] * n[0], -n[0] * n[1], -n[0] * n[2],
            1.0 - n[1] * n[1], -n[1] * n[2], 1.0 - n[2] * n[2])
    mse = l0 + l1
    mse_ok = mse < params.edge_max_model_error**2
    finite = (jnp.isfinite(n[0]) & jnp.isfinite(n[1]) & jnp.isfinite(n[2])
              & (l2 > 1e-20))

    ok = enough & near & mse_ok & finite
    weight = jnp.where(mse <= 1e-6, 1.0, 1.0 - jnp.sqrt(jnp.maximum(mse, 0.0)) / params.edge_max_model_error)
    status = _status_chain(kp_valid, enough, near, [(finite, MatchStatus.INVALID_NUMERICAL),
                                                    (mse_ok, MatchStatus.MSE_TOO_LARGE)])
    return _finish(A, mean, kp_xyz, weight, ok, status)


def match_blobs(kp_xyz, kp_valid, index: SubmapView, pose, params: MatchingConfig, geom,
                prepared=None, knn=None):
    """Point-to-ellipsoid matches (BuildBlobMatch semantics). `knn`: cached
    (nbr, rings, found) from a previous round (reuse_knn mode)."""
    k = params.blob_nb_neighbors
    world = se3.japply_pose(pose, kp_xyz)
    if knn is None:
        d2, nbr, _, found = _knn(index, world, k, params, geom, kp_valid,
                                 prepared, need_rings=False)
    else:
        nbr, _, found = knn
        d2 = _reuse_d2(world, nbr, found)

    n_found = jnp.sum(found, axis=1)
    enough = kp_valid & (n_found >= k)
    near = jnp.where(found, d2, 0.0).max(axis=1) <= params.max_neighbors_distance**2

    mean, c6, _ = pca.masked_cov6(nbr, found)
    lams, vecs = pca.eigh6(c6)
    pca_ok = lams[0] > 1e-12
    # Floor the ellipsoid sigma (see MatchingConfig.blob_min_sigma): sparse
    # single-arc neighborhoods otherwise produce near-singular covariances
    # whose Mahalanobis weights drown the edge/plane constraints.
    lam_floor = jnp.float32(params.blob_min_sigma**2)
    # A = sum_j rsqrt(max(l_j, floor)) v_j v_j^T, assembled entrywise
    s = [jax.lax.rsqrt(jnp.maximum(l, lam_floor)) for l in lams]
    a00 = sum(s[j] * vecs[j][0] * vecs[j][0] for j in range(3))
    a01 = sum(s[j] * vecs[j][0] * vecs[j][1] for j in range(3))
    a02 = sum(s[j] * vecs[j][0] * vecs[j][2] for j in range(3))
    a11 = sum(s[j] * vecs[j][1] * vecs[j][1] for j in range(3))
    a12 = sum(s[j] * vecs[j][1] * vecs[j][2] for j in range(3))
    a22 = sum(s[j] * vecs[j][2] * vecs[j][2] for j in range(3))
    A = _a6(a00, a01, a02, a11, a12, a22)
    finite = (jnp.isfinite(a00) & jnp.isfinite(a01) & jnp.isfinite(a02)
              & jnp.isfinite(a11) & jnp.isfinite(a12) & jnp.isfinite(a22))

    ok = enough & near & pca_ok & finite
    weight = jnp.ones_like(d2[:, 0])
    status = _status_chain(kp_valid, enough, near, [(pca_ok, MatchStatus.BAD_PCA_STRUCTURE),
                                                    (finite, MatchStatus.INVALID_NUMERICAL)])
    return _finish(A, mean, kp_xyz, weight, ok, status)


def _per_ring_filter(rings, found):
    """One neighbor per ring, the closest ring excluded, rings beyond +-4 of
    the closest excluded (GetPerRingLineNeighbors 349-405). Neighbors arrive
    in ascending-distance order from top_k."""
    k = rings.shape[1]
    r0 = rings[:, 0]
    allowed = found & (jnp.abs(rings - r0[:, None]) <= 4) & (rings != r0[:, None])
    # first occurrence of each ring among allowed neighbors
    same_ring_before = (rings[:, :, None] == rings[:, None, :]) & \
        (jnp.arange(k)[None, :] < jnp.arange(k)[:, None])[None, :, :]
    taken = jnp.any(same_ring_before & allowed[:, None, :], axis=2)
    return allowed & ~taken


def _ransac_line_filter(nbr, found, max_dist_inlier):
    """2-point RANSAC around the closest neighbor
    (GetRansacLineNeighbors 408-480): lines (P1, Pi) for i>=1 score inliers
    among candidates j>=1; keep the best line's inliers plus P1."""
    Q, k, _ = nbr.shape
    p1 = nbr[:, 0:1, :]
    dirs = nbr[:, 1:, :] - p1                              # (Q, k-1, 3)
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    rel = nbr[:, 1:, :] - p1                               # candidates j>=1
    # inlier[i, j]: candidate j fits line i (candidate j == i counts itself)
    cr = jnp.cross(rel[:, None, :, :], dirs[:, :, None, :])
    d2l = jnp.sum(cr * cr, axis=-1)                        # (Q, k-1 lines, k-1 cands)
    self_pair = jnp.eye(k - 1, dtype=bool)[None]
    inlier = (self_pair | (d2l < max_dist_inlier**2)) & found[:, None, 1:]
    line_ok = found[:, 1:]
    scores = jnp.where(line_ok, jnp.sum(inlier, axis=2), -1)
    best = jnp.argmax(scores, axis=1)
    best_inliers = jnp.take_along_axis(inlier, best[:, None, None], axis=1)[:, 0, :]
    sel = jnp.concatenate([found[:, 0:1], best_inliers], axis=1)
    return sel & found


def _status_chain(kp_valid, enough, near, gates):
    """Rejection codes with the reference's precedence order."""
    status = jnp.full(kp_valid.shape, int(MatchStatus.UNKNOWN), jnp.uint8)
    # applied in reverse so earlier gates take precedence
    for gate, code in reversed(gates):
        status = jnp.where(~gate, int(code), status)
    status = jnp.where(~near, int(MatchStatus.NEIGHBORS_TOO_FAR), status)
    status = jnp.where(~enough, int(MatchStatus.NOT_ENOUGH_NEIGHBORS), status)
    status = jnp.where(~kp_valid, int(MatchStatus.UNKNOWN), status)
    return status


def rejection_histogram(matches: Matches):
    """Counts per MatchStatus (MatchingResults::RejectionsHistogram parity)."""
    return jnp.bincount(matches.status.astype(jnp.int32), length=int(MatchStatus.UNKNOWN) + 1)
