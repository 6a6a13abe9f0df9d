"""Differential test: the fused `icp_register` pipeline vs the sequential
numpy localization oracle (tests/oracle_localization.py).

The oracle re-implements match -> Tukey-IRLS-LM -> ICP rounds with scipy
kd-trees and per-point loops (KeypointsMatcher.cxx / LocalOptimizer.cxx /
Slam.cxx:1071-1156 semantics); the production path must agree on the match
decisions and land on the same pose to ~1e-4.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle_localization as oracle
from lidarslam_tpu.config import (Keypoint, MatchingConfig, MatchStatus,
                                  SolverConfig)
from lidarslam_tpu.ops import icp, matcher
from lidarslam_tpu.ops.voxel_map import SubmapView


def _scene(seed, n_map=600, q=96, noise=0.008):
    """Structured scene: ground + two walls (planes) and three poles (edges),
    with keypoints sampled off the same surfaces."""
    rng = np.random.default_rng(seed)
    ground = np.stack([rng.uniform(-10, 10, n_map // 2),
                       rng.uniform(-10, 10, n_map // 2),
                       np.zeros(n_map // 2)], 1)
    wall1 = np.stack([rng.uniform(-10, 10, n_map // 4),
                      np.full(n_map // 4, 7.0),
                      rng.uniform(0, 5, n_map // 4)], 1)
    wall2 = np.stack([np.full(n_map // 4, -8.0),
                      rng.uniform(-10, 10, n_map // 4),
                      rng.uniform(0, 5, n_map // 4)], 1)
    plane_map = np.concatenate([ground, wall1, wall2]).astype(np.float64)

    poles = []
    for (px, py) in [(3.0, -2.0), (-4.0, 4.0), (6.0, 2.5)]:
        z = np.linspace(0, 5, 60)
        poles.append(np.stack([np.full_like(z, px), np.full_like(z, py), z], 1))
    edge_map = np.concatenate(poles).astype(np.float64)

    kp_p = plane_map[rng.integers(0, len(plane_map), q)] \
        + rng.normal(0, noise, (q, 3))
    kp_e = edge_map[rng.integers(0, len(edge_map), q)] \
        + rng.normal(0, noise, (q, 3))
    return edge_map, plane_map, kp_e, kp_p


def _run_jax(edge_map, plane_map, kp_e, kp_p, pose0, params, scfg,
             icp_iters, lm_max_iter, min_matches):
    def view(pts):
        return SubmapView(xyz=jnp.asarray(pts, jnp.float32),
                          ring=jnp.zeros(len(pts), jnp.int32),
                          valid=jnp.ones(len(pts), bool))
    q = len(kp_e)
    inputs = icp.ICPInputs(
        kp_xyz=(jnp.asarray(kp_e, jnp.float32), jnp.asarray(kp_p, jnp.float32), None),
        kp_valid=(jnp.ones(q, bool), jnp.ones(q, bool), None),
        index=(view(edge_map), view(plane_map), None))
    return icp.icp_register(
        inputs, types=(Keypoint.EDGE, Keypoint.PLANE),
        pose0=jnp.asarray(pose0, jnp.float32), params=params, solver_cfg=scfg,
        icp_iters=icp_iters, lm_max_iter=lm_max_iter, min_matches=min_matches,
        geoms=(None, None, None))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_icp_register_matches_oracle(seed):
    edge_map, plane_map, kp_e, kp_p = _scene(seed)
    rng = np.random.default_rng(100 + seed)
    pose0 = np.concatenate([rng.uniform(-0.08, 0.08, 3),
                            rng.uniform(-0.02, 0.02, 3)])
    params = MatchingConfig()
    scfg = SolverConfig()

    res = _run_jax(edge_map, plane_map, kp_e, kp_p, pose0, params, scfg,
                   icp_iters=3, lm_max_iter=15, min_matches=20)
    pose_o, failed_o, total_o, counts_o = oracle.icp_register_oracle(
        kp_e, np.ones(len(kp_e), bool), edge_map,
        kp_p, np.ones(len(kp_p), bool), plane_map,
        pose0, params, scfg, icp_iters=3, lm_max_iter=15, min_matches=20)

    assert not bool(res.failed) and not failed_o
    pose_j = np.asarray(res.pose, np.float64)
    # both must undo the same perturbation: near-zero pose, agreeing to 1e-4
    assert np.abs(pose_j[:3] - pose_o[:3]).max() < 1e-4, (pose_j, pose_o)
    assert np.abs(pose_j[3:] - pose_o[3:]).max() < 1e-4, (pose_j, pose_o)
    # the recovered pose actually solves the problem
    assert np.abs(pose_o[:3]).max() < 5e-3


def test_match_decisions_agree():
    """Per-keypoint match statuses and model parameters, both types."""
    edge_map, plane_map, kp_e, kp_p = _scene(7)
    pose = np.array([0.03, -0.02, 0.01, 0.005, -0.004, 0.008])
    params = MatchingConfig()

    def view(pts):
        return SubmapView(xyz=jnp.asarray(pts, jnp.float32),
                          ring=jnp.zeros(len(pts), jnp.int32),
                          valid=jnp.ones(len(pts), bool))

    mj = matcher.match_planes(jnp.asarray(kp_p, jnp.float32),
                              jnp.ones(len(kp_p), bool), view(plane_map),
                              jnp.asarray(pose, jnp.float32), params, None)
    mo = oracle.match_planes_oracle(kp_p, np.ones(len(kp_p), bool),
                                    plane_map, pose, params)
    st_j = np.asarray(mj.status)
    st_o = np.array([int(m["status"]) for m in mo])
    assert (st_j == st_o).mean() > 0.97, (st_j, st_o)  # float32 gate slack
    both = (st_j == int(MatchStatus.SUCCESS)) & (st_o == int(MatchStatus.SUCCESS))
    assert both.sum() >= 50
    P_j = np.asarray(mj.P)[both]
    P_o = np.stack([m["P"] for m, b in zip(mo, both) if b])
    np.testing.assert_allclose(P_j, P_o, atol=2e-4)
    A_j = np.asarray(mj.A)[both]
    A_o = np.stack([m["A"] for m, b in zip(mo, both) if b])
    np.testing.assert_allclose(A_j, A_o, atol=5e-3)
    w_j = np.asarray(mj.weight)[both]
    w_o = np.array([m["weight"] for m, b in zip(mo, both) if b])
    np.testing.assert_allclose(w_j, w_o, atol=5e-3)

    me_j = matcher.match_edges(jnp.asarray(kp_e, jnp.float32),
                               jnp.ones(len(kp_e), bool), view(edge_map),
                               jnp.asarray(pose, jnp.float32), params, None)
    me_o = oracle.match_edges_oracle(kp_e, np.ones(len(kp_e), bool),
                                     edge_map, pose, params)
    st_j = np.asarray(me_j.status)
    st_o = np.array([int(m["status"]) for m in me_o])
    assert (st_j == st_o).mean() > 0.95, (st_j, st_o)


def test_lm_solver_matches_oracle():
    """The LM path alone (fixed matches) must agree tightly."""
    rng = np.random.default_rng(11)
    q = 120
    P = rng.normal(0, 5, (q, 3))
    normals = rng.normal(0, 1, (q, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    true_pose = np.array([0.05, -0.04, 0.03, 0.01, -0.02, 0.015])
    R, t = oracle.pose_to_rt(true_pose)
    X = (R.T @ (P - t).T).T + normals * rng.normal(0, 0.002, (q, 1))
    weights = rng.uniform(0.5, 1.0, q)

    mo = [{"status": MatchStatus.SUCCESS, "A": np.outer(n, n), "P": p,
           "X": x, "weight": w}
          for n, p, x, w in zip(normals, P, X, weights)]
    pose_o, nsucc_o, cost_o, _ = oracle.robust_lm_oracle(
        mo, np.zeros(6), 1.0, SolverConfig(), 15)

    from lidarslam_tpu.ops import solver
    A = np.einsum("qi,qj->qij", normals, normals)
    mj = matcher.Matches.from_dense(
        jnp.asarray(A, jnp.float32), P=jnp.asarray(P, jnp.float32),
        X=jnp.asarray(X, jnp.float32), weight=jnp.asarray(weights, jnp.float32),
        status=jnp.zeros(q, jnp.uint8), valid=jnp.ones(q, bool))
    rj = solver.robust_lm([mj], jnp.zeros(6, jnp.float32), 1.0,
                          SolverConfig(), 15)
    pose_j = np.asarray(rj.pose, np.float64)
    assert np.abs(pose_j - pose_o).max() < 2e-4, (pose_j, pose_o)
    np.testing.assert_allclose(pose_o, true_pose, atol=5e-3)


def test_per_ring_edge_filter_matches_oracle():
    """Ego-motion edge matching (single_edge_per_ring): one neighbor per
    ring, closest point's ring excluded, rings beyond +-4 excluded
    (GetPerRingLineNeighbors 349-405 semantics)."""
    rng = np.random.default_rng(5)
    # a previous sweep: each of 16 rings samples each of 6 poles ONCE
    # (spinning-LiDAR geometry — ego-motion matches prev-sweep keypoints)
    poles_xy = rng.uniform(-6, 6, (6, 2))
    pts, rings = [], []
    for px, py in poles_xy:
        for r in range(16):
            pts.append([px + rng.normal(0, 0.005),
                        py + rng.normal(0, 0.005), 0.4 * r])
            rings.append(r)
    pole = np.asarray(pts, np.float64)
    rings = np.asarray(rings, np.int32)
    kp = pole[rng.integers(0, len(pole), 64)] + rng.normal(0, 0.01, (64, 3))
    pose = np.array([0.02, -0.01, 0.015, 0.004, -0.003, 0.006])
    params = dataclasses_replace_ego()

    view = SubmapView(xyz=jnp.asarray(pole, jnp.float32),
                      ring=jnp.asarray(rings),
                      valid=jnp.ones(len(pole), bool))
    mj = matcher.match_edges(jnp.asarray(kp, jnp.float32),
                             jnp.ones(len(kp), bool), view,
                             jnp.asarray(pose, jnp.float32), params, None)
    mo = oracle.match_edges_oracle(kp, np.ones(len(kp), bool), pole, pose,
                                   params, rings=rings)
    st_j = np.asarray(mj.status)
    st_o = np.array([int(m["status"]) for m in mo])
    agree = (st_j == st_o).mean()
    assert agree > 0.9, (agree, st_j, st_o)
    both = (st_j == int(MatchStatus.SUCCESS)) & (st_o == int(MatchStatus.SUCCESS))
    assert both.sum() >= 20
    P_j = np.asarray(mj.P)[both]
    P_o = np.stack([m["P"] for m, b in zip(mo, both) if b])
    np.testing.assert_allclose(P_j, P_o, atol=3e-3)


def dataclasses_replace_ego():
    import dataclasses
    from lidarslam_tpu.config import SlamConfig
    return SlamConfig().ego_matching
