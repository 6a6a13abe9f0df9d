"""Match -> optimize ICP loops, fully jitted.

The reference runs `EgoMotionICPMaxIter` / `LocalizationICPMaxIter` rounds of
(KeypointsMatcher::BuildMatchResiduals then LocalOptimizer::Solve) with a
linearly shrinking Tukey saturation distance and an early exit when LM makes
no progress (Slam.cxx:892-954, 1071-1156). Here the whole loop — bucket-index
k-NN, batched PCA matching, robust LM — is one compiled function: the ICP
rounds are statically unrolled (the saturation schedule is compile-time) and
the early-exit / minimum-match guards become `where`-gated state updates.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from lidarslam_tpu.config import Keypoint, MatchingConfig, SolverConfig, UndistortionMode
from lidarslam_tpu.ops import matcher, solver, undistortion, voxel_map


class ICPInputs(NamedTuple):
    """Per-keypoint-type matching inputs (entries may be None when unused).

    The (half, bucket, rings) index geometry is passed separately as a static
    argument (`geoms`) since it shapes the compiled kernels."""

    kp_xyz: tuple       # (Q, 3) per type, BASE coordinates (map-origin-relative target)
    kp_valid: tuple     # (Q,) per type
    index: tuple        # SubmapView per type
    kp_time: tuple = (None, None, None)  # (Q,) per type, for undistortion


class ICPResult(NamedTuple):
    pose: jax.Array             # (6,) optimized pose
    failed: jax.Array           # () bool — too few matches at some round
    total_matches: jax.Array    # () int32 from the last executed matching
    match_counts: jax.Array     # (3,) int32 per keypoint type
    H: jax.Array                # (6, 6) robust Hessian at the last solve
    statuses: tuple             # (Q,) uint8 per type — last-round debug codes
    weights: tuple              # (Q,) f32 per type
    warp: object = None         # final sweep WarpParams (None when disabled)


def icp_register(
    inputs: ICPInputs,
    types: Sequence[Keypoint],
    pose0,
    params: MatchingConfig,
    solver_cfg: SolverConfig,
    icp_iters: int,
    lm_max_iter: int,
    min_matches: int,
    geoms: Sequence,
    axis_name=None,
    undistort_mode: UndistortionMode = UndistortionMode.NONE,
    prev_pose=None,
    t_prev=0.0,
    t_cur=1.0,
    time_range=(0.0, 0.0),
    max_extrapolation_ratio: float = 3.0,
    extras=(),
    prepared=None,
) -> ICPResult:
    """Run the full ICP-LM loop. All structure args must be static.

    With `axis_name` (inside shard_map over a keypoint-sharded mesh axis),
    match counts and normal equations are psum-reduced so every device steps
    the same pose while matching only its keypoint shard."""
    match_fns = {
        Keypoint.EDGE: matcher.match_edges,
        Keypoint.PLANE: matcher.match_planes,
        Keypoint.BLOB: matcher.match_blobs,
    }

    pose = jnp.asarray(pose0, jnp.float32)
    active = jnp.ones((), bool)
    failed = jnp.zeros((), bool)
    total = jnp.zeros((), jnp.int32)
    counts = jnp.zeros((3,), jnp.int32)
    H = jnp.zeros((6, 6))
    statuses = tuple(jnp.zeros(inputs.kp_xyz[int(t)].shape[0], jnp.uint8) for t in types)
    weights = tuple(jnp.zeros(inputs.kp_xyz[int(t)].shape[0], jnp.float32) for t in types)

    undistort = undistort_mode != UndistortionMode.NONE and prev_pose is not None

    def make_warp(p):
        return undistortion.compute_warp(prev_pose, p, t_prev, t_cur,
                                         time_range[0], time_range[1],
                                         max_extrapolation_ratio)

    prior_warp = make_warp(pose) if undistort else None

    # loop-invariant map-side k-NN inputs, built OUTSIDE the fori body: XLA
    # re-executes body producers every round, so coordinate planes / block
    # AABBs computed inside the matcher would run icp_iters times per frame
    k_of = {Keypoint.EDGE: params.edge_nb_neighbors,
            Keypoint.PLANE: params.plane_nb_neighbors,
            Keypoint.BLOB: params.blob_nb_neighbors}
    prepared = list(prepared) if prepared is not None else [None, None, None]
    for t in types:
        ti = int(t)
        if prepared[ti] is None and geoms[ti] is None \
                and isinstance(inputs.index[ti], voxel_map.SubmapView):
            prepared[ti] = voxel_map.prepare_knn_index(inputs.index[ti], k_of[t])

    # reuse_knn (MatchingConfig): query the map k-NN only in round 0 and
    # carry the neighbor coordinates through later rounds — the hottest
    # kernel then runs once per frame instead of once per round. Exact
    # distances are recomputed against every refined pose; disabled on the
    # slab-sharded geometry (its k-NN embeds collectives, which must not
    # sit under a round-index cond) and on single-round loops.
    reuse = (params.reuse_knn and icp_iters > 1
             and all(geoms[int(t)] is None for t in types))
    k_by_type = {Keypoint.EDGE: params.edge_nb_neighbors,
                 Keypoint.PLANE: params.plane_nb_neighbors,
                 Keypoint.BLOB: params.blob_nb_neighbors}

    def _fresh_knn(x_by_type, p):
        out = []
        from lidarslam_tpu.core import se3

        for t in types:
            ti = int(t)
            w = se3.japply_pose(p, x_by_type[ti])
            # rings only feed the single_edge_per_ring filter (edges);
            # skipping the gather elsewhere saves ~0.58 ms/type/frame at
            # 64-beam (see matcher._knn need_rings)
            need_rings = (t == Keypoint.EDGE) and params.single_edge_per_ring
            _, nbr, rings, found = matcher.knn_query(
                inputs.index[ti], w, k_by_type[t], params, geoms[ti],
                inputs.kp_valid[ti], prepared[ti], need_rings=need_rings)
            out.append((nbr, rings, found))
        return tuple(out)

    def _empty_knn():
        out = []
        for t in types:
            ti = int(t)
            Q, k = inputs.kp_xyz[ti].shape[0], k_by_type[t]
            out.append((jnp.zeros((Q, k, 3), jnp.float32),
                        jnp.zeros((Q, k), jnp.int32),
                        jnp.zeros((Q, k), bool)))
        return tuple(out)

    # one fori_loop over ICP rounds: the matcher graph is traced once (compile
    # time) and the shrinking saturation schedule is computed from the round
    # index; early-exit/minimum-match guards are where-gated state
    def body(it, state):
        pose, active, failed, total, counts, H, statuses, weights, knn_cache = state
        ratio = it.astype(jnp.float32) / max(icp_iters - 1, 1)
        sat = ((1.0 - ratio) * params.init_saturation_distance
               + ratio * params.final_saturation_distance)

        if undistort:
            if undistort_mode == UndistortionMode.REFINED:
                warp = jax.tree.map(
                    lambda a, b: jnp.where(it > 0, a, b), make_warp(pose), prior_warp)
            else:
                warp = prior_warp

        xs = [None, None, None]
        for t in types:
            ti = int(t)
            x = inputs.kp_xyz[ti]
            if undistort:
                x = undistortion.warp_points(x, inputs.kp_time[ti], warp)
            xs[ti] = x

        if reuse:
            knn_cache = jax.lax.cond(it == 0,
                                     lambda: _fresh_knn(xs, pose),
                                     lambda: knn_cache)

        blocks = []
        for i, t in enumerate(types):
            ti = int(t)
            blocks.append(match_fns[t](xs[ti], inputs.kp_valid[ti],
                                       inputs.index[ti], pose, params, geoms[ti],
                                       prepared=prepared[ti],
                                       knn=knn_cache[i] if reuse else None))

        it_counts = jnp.stack([b.n_matches.astype(jnp.int32) for b in blocks])
        if axis_name is not None:
            it_counts = jax.lax.psum(it_counts, axis_name)
        it_total = jnp.sum(it_counts)
        enough = it_total >= min_matches

        res = solver.robust_lm(blocks, pose, sat, solver_cfg, lm_max_iter, axis_name,
                               extras=extras)

        step_ok = active & enough
        pose = jnp.where(step_ok, res.pose, pose)
        H = jnp.where(step_ok, res.H, H)
        total = jnp.where(active, it_total, total)
        full_counts = jnp.zeros((3,), jnp.int32)
        for i, t in enumerate(types):
            full_counts = full_counts.at[int(t)].set(it_counts[i])
        counts = jnp.where(active, full_counts, counts)
        statuses = tuple(jnp.where(active, b.status, s) for b, s in zip(blocks, statuses))
        weights = tuple(jnp.where(active, b.weight, w) for b, w in zip(blocks, weights))
        failed = failed | (active & ~enough)
        converged = res.n_success == 1
        active = step_ok & ~converged
        return (pose, active, failed, total, counts, H, statuses, weights,
                knn_cache)

    # while_loop, not fori: the reference BREAKS out of the ICP loop when LM
    # converges in one step (Slam.cxx:950, 1151). A fori body would still
    # execute the remaining rounds' matcher+kernel+LM with where-gated
    # results — each skipped round saves a full match+solve on device.
    state = (pose, active, failed, total, counts, H, statuses, weights,
             _empty_knn() if reuse else ())

    def w_cond(carry):
        it, st = carry
        return (it < icp_iters) & st[1]   # st[1] = active

    def w_body(carry):
        it, st = carry
        return it + 1, body(it, st)

    _, state = jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), state))
    pose, active, failed, total, counts, H, statuses, weights, _ = state

    final_warp = None
    if undistort:
        final_warp = make_warp(pose) if undistort_mode == UndistortionMode.REFINED \
            else prior_warp
    return ICPResult(pose=pose, failed=failed, total_matches=total,
                     match_counts=counts, H=H, statuses=statuses, weights=weights,
                     warp=final_warp)
