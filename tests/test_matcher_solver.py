"""Matcher validity gates, solver convergence, and the full ICP loop."""

import numpy as np
import jax.numpy as jnp
import pytest

from lidarslam_tpu.config import (Keypoint, MatchStatus, MatchingConfig, SolverConfig)
from lidarslam_tpu.core import se3
from lidarslam_tpu.ops import icp, matcher, solver
from lidarslam_tpu.ops.voxel_map import SubmapView

GEOM = None
RNG = np.random.default_rng(0)


def _index(pts, ring=None):
    pts = np.asarray(pts, np.float32)
    ring = np.zeros(len(pts), np.int32) if ring is None else np.asarray(ring, np.int32)
    return SubmapView(xyz=jnp.asarray(pts), ring=jnp.asarray(ring),
                      valid=jnp.ones(len(pts), bool))


def _wall(n, normal_axis=1, offset=5.0, extent=8.0, jitter=0.0):
    pts = RNG.uniform(-extent, extent, (n, 3))
    pts[:, normal_axis] = offset + RNG.normal(0, jitter, n)
    return pts.astype(np.float32)


# ---------------------------------------------------------------------------
# Tukey loss parity
# ---------------------------------------------------------------------------

def test_tukey_matches_ceres_formulas():
    a = 2.0
    s = jnp.asarray([0.0, 1.0, 3.9, 4.0, 10.0])
    rho = np.asarray(solver.tukey_rho(s, a))
    want = np.where(np.asarray(s) <= a**2,
                    a**2 / 3 * (1 - (1 - np.asarray(s) / a**2) ** 3), a**2 / 3)
    np.testing.assert_allclose(rho, want, atol=1e-6)
    w = np.asarray(solver.tukey_weight(s, a))
    np.testing.assert_allclose(w, np.where(np.asarray(s) <= a**2,
                                           (1 - np.asarray(s) / a**2) ** 2, 0.0), atol=1e-6)


def test_rotation_derivatives_match_autodiff():
    import jax

    rpy = jnp.asarray([0.3, -0.2, 0.9])
    x = jnp.asarray([1.0, -2.0, 0.5])
    dRr, dRp, dRy = solver.rotation_derivatives(rpy)
    jac = jax.jacfwd(lambda r: se3.jrpy_to_matrix(r) @ x)(rpy)  # (3, 3) d(Rx)/d rpy
    np.testing.assert_allclose(np.asarray(jac[:, 0]), np.asarray(dRr @ x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jac[:, 1]), np.asarray(dRp @ x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jac[:, 2]), np.asarray(dRy @ x), atol=1e-5)


# ---------------------------------------------------------------------------
# Matcher
# ---------------------------------------------------------------------------

def test_plane_matching_and_gates():
    params = MatchingConfig()
    wall = _wall(400, normal_axis=1, offset=5.0, jitter=0.002)
    idx = _index(wall)
    kp = np.array([[0.0, 5.01, 0.0], [3.0, 4.99, 1.0],       # on the wall
                   [0.0, 5.0, 30.0],                          # far outside wall extent
                   ], np.float32)
    m = matcher.match_planes(jnp.asarray(kp), jnp.ones(3, bool), idx,
                             jnp.zeros(6), params, GEOM)
    status = np.asarray(m.status)
    assert status[0] == MatchStatus.SUCCESS and status[1] == MatchStatus.SUCCESS
    assert status[2] in (MatchStatus.NOT_ENOUGH_NEIGHBORS, MatchStatus.NEIGHBORS_TOO_FAR)
    # A = n n^T with n ~ +-y
    A0 = np.asarray(m.A)[0]
    np.testing.assert_allclose(np.abs(A0[1, 1]), 1.0, atol=0.05)
    assert abs(A0[0, 0]) < 0.05 and abs(A0[2, 2]) < 0.05
    assert 0.9 < float(m.weight[0]) <= 1.0


def test_plane_rejects_unstructured():
    params = MatchingConfig()
    # sparse isotropic cluster: the 5-NN neighborhood spreads ~0.5 m in every
    # direction, so the plane model's RMSE exceeds plane_max_model_error
    blob = np.random.default_rng(42).uniform(-1.5, 1.5, (30, 3)).astype(np.float32)
    idx = _index(blob)
    kp = np.zeros((1, 3), np.float32)
    m = matcher.match_planes(jnp.asarray(kp), jnp.ones(1, bool), idx,
                             jnp.zeros(6), params, GEOM)
    assert np.asarray(m.status)[0] in (MatchStatus.BAD_PCA_STRUCTURE, MatchStatus.MSE_TOO_LARGE)


def test_edge_ransac_matching():
    params = MatchingConfig()
    t = np.linspace(-3, 3, 60)
    pole = np.stack([np.full_like(t, 2.0), np.full_like(t, 1.0), t], 1).astype(np.float32)
    pole += RNG.normal(0, 0.003, pole.shape).astype(np.float32)
    idx = _index(pole)
    kp = np.array([[2.0, 1.0, 0.3]], np.float32)
    m = matcher.match_edges(jnp.asarray(kp), jnp.ones(1, bool), idx,
                            jnp.zeros(6), params, GEOM)
    assert np.asarray(m.status)[0] == MatchStatus.SUCCESS
    # A = I - nn^T annihilates the line direction (z)
    A = np.asarray(m.A)[0]
    np.testing.assert_allclose(A @ np.array([0, 0, 1.0]), 0, atol=0.05)
    np.testing.assert_allclose(A @ np.array([1.0, 0, 0]), [1, 0, 0], atol=0.05)


def test_edge_ransac_rejects_outlier_contamination():
    """RANSAC keeps the dominant line's inliers; the fitted model must stay
    clean even with an off-line cluster nearby."""
    params = MatchingConfig()
    t = np.linspace(-1.5, 1.5, 30)
    pole = np.stack([np.full_like(t, 2.0), np.full_like(t, 1.0), t], 1)
    outliers = np.array([[2.6, 1.6, 0.25], [2.62, 1.58, 0.3]])
    pts = np.concatenate([pole, outliers]).astype(np.float32)
    idx = _index(pts)
    kp = np.array([[2.0, 1.0, 0.28]], np.float32)
    m = matcher.match_edges(jnp.asarray(kp), jnp.ones(1, bool), idx,
                            jnp.zeros(6), params, GEOM)
    assert np.asarray(m.status)[0] == MatchStatus.SUCCESS
    A = np.asarray(m.A)[0]
    np.testing.assert_allclose(A @ np.array([0, 0, 1.0]), 0, atol=0.08)


def test_edge_per_ring_filter():
    params = MatchingConfig(single_edge_per_ring=True, edge_nb_neighbors=8,
                            edge_min_nb_neighbors=3)
    # vertical pole sampled by rings 0..7 (one point per ring) + a second
    # point on ring 3 that must be skipped
    z = np.arange(8) * 0.4
    pole = np.stack([np.full(8, 2.0), np.full(8, 1.0), z], 1)
    extra = np.array([[2.05, 1.0, 1.25]])
    pts = np.concatenate([pole, extra]).astype(np.float32)
    rings = np.concatenate([np.arange(8), [3]])
    idx = _index(pts, ring=rings)
    kp = np.array([[2.0, 1.0, 1.3]], np.float32)
    m = matcher.match_edges(jnp.asarray(kp), jnp.ones(1, bool), idx,
                            jnp.zeros(6), params, GEOM)
    assert np.asarray(m.status)[0] == MatchStatus.SUCCESS
    A = np.asarray(m.A)[0]
    np.testing.assert_allclose(A @ np.array([0, 0, 1.0]), 0, atol=0.05)


# ---------------------------------------------------------------------------
# Solver
# ---------------------------------------------------------------------------

def _synthetic_blocks(true_pose, n=300, outlier_frac=0.0):
    """Plane + line matches consistent with `true_pose` mapping X -> world."""
    R, t = se3.pose_to_rt(true_pose)
    # three orthogonal wall normals + one line direction
    normals = np.eye(3)
    A_list, P_list, X_list = [], [], []
    for i in range(n):
        axis = i % 3
        n_vec = normals[axis]
        Xw = RNG.uniform(-5, 5, 3)
        A = np.outer(n_vec, n_vec)
        # choose P so that A(R X + t - P) = 0 at the true pose
        X = R.T @ (Xw - t)
        P = Xw + np.cross(n_vec, RNG.uniform(-1, 1, 3))  # move P within the plane
        A_list.append(A)
        P_list.append(P)
        X_list.append(X)
    A = np.stack(A_list)
    P = np.stack(P_list)
    X = np.stack(X_list)
    n_out = int(n * outlier_frac)
    if n_out:
        P[:n_out] += RNG.uniform(3, 6, (n_out, 3)) * np.sign(RNG.normal(size=(n_out, 3)))
    return matcher.Matches.from_dense(
        A=jnp.asarray(A, jnp.float32), P=jnp.asarray(P, jnp.float32),
        X=jnp.asarray(X, jnp.float32), weight=jnp.ones(n, jnp.float32),
        status=jnp.zeros(n, jnp.uint8), valid=jnp.ones(n, bool))


def test_lm_recovers_pose():
    true_pose = np.array([0.4, -0.2, 0.1, 0.03, -0.02, 0.08])
    blocks = [_synthetic_blocks(true_pose)]
    res = solver.robust_lm(blocks, jnp.zeros(6), 1.0, SolverConfig(), 25)
    got = np.asarray(res.pose, np.float64)
    np.testing.assert_allclose(got, true_pose, atol=2e-3)
    assert int(res.n_success) > 1


def test_lm_robust_to_outliers():
    true_pose = np.array([0.3, 0.1, -0.05, 0.02, 0.04, -0.06])
    blocks = [_synthetic_blocks(true_pose, n=600, outlier_frac=0.25)]
    res = solver.robust_lm(blocks, jnp.zeros(6), 0.7, SolverConfig(), 30)
    got = np.asarray(res.pose, np.float64)
    np.testing.assert_allclose(got, true_pose, atol=2e-2)


def test_lm_already_converged_reports_single_success():
    true_pose = np.array([0.2, 0.0, 0.0, 0.0, 0.0, 0.05])
    blocks = [_synthetic_blocks(true_pose)]
    res = solver.robust_lm(blocks, jnp.asarray(true_pose, jnp.float32), 1.0,
                           SolverConfig(), 25)
    # starting at the optimum: no successful LM step beyond the initial eval
    assert int(res.n_success) <= 2
    np.testing.assert_allclose(np.asarray(res.pose), true_pose, atol=5e-3)


def test_two_d_mode_freezes_z_roll_pitch():
    true_pose = np.array([0.4, -0.3, 0.2, 0.05, -0.04, 0.1])
    blocks = [_synthetic_blocks(true_pose)]
    cfg = SolverConfig(two_d_mode=True)
    res = solver.robust_lm(blocks, jnp.zeros(6), 1.0, cfg, 25)
    got = np.asarray(res.pose)
    assert got[2] == 0.0 and got[3] == 0.0 and got[4] == 0.0
    np.testing.assert_allclose(got[[0, 1]], true_pose[[0, 1]], atol=0.15)


def test_registration_error_shapes():
    blocks = [_synthetic_blocks(np.zeros(6))]
    res = solver.robust_lm(blocks, jnp.zeros(6), 1.0, SolverConfig(), 10)
    err = solver.registration_error(res.H)
    assert err.covariance.shape == (6, 6)
    assert float(err.position_error) >= 0.0
    assert np.isfinite(float(err.orientation_error))


# ---------------------------------------------------------------------------
# Full ICP loop
# ---------------------------------------------------------------------------

def _structured_scene():
    """Ground plane + 2 walls + 4 pole edges, as map point sets."""
    planes = np.concatenate([
        _wall(500, normal_axis=2, offset=0.0, extent=10, jitter=0.005),   # ground
        _wall(400, normal_axis=1, offset=8.0, extent=8, jitter=0.005),    # wall y=8
        _wall(400, normal_axis=0, offset=-7.0, extent=8, jitter=0.005),   # wall x=-7
    ])
    edges = []
    for (px, py) in [(3, 2), (-4, 5), (6, -3), (-2, -6)]:
        t = np.linspace(0, 4, 40)
        edges.append(np.stack([np.full_like(t, px), np.full_like(t, py), t], 1))
    edges = np.concatenate(edges).astype(np.float32)
    edges += RNG.normal(0, 0.004, edges.shape).astype(np.float32)
    return planes.astype(np.float32), edges


def test_icp_recovers_pose():
    planes, edges = _structured_scene()
    true_pose = np.array([0.3, -0.2, 0.05, 0.01, -0.015, 0.04])
    Hinv = se3.hmat_inverse(se3.pose_to_hmat(true_pose))
    # keypoints = scene points observed from the sensor at true_pose
    kp_planes = (planes[::3] @ Hinv[:3, :3].T + Hinv[:3, 3]).astype(np.float32)
    kp_edges = (edges[::2] @ Hinv[:3, :3].T + Hinv[:3, 3]).astype(np.float32)

    QE, QP = 128, 512
    kp_e = np.zeros((QE, 3), np.float32)
    kp_e[:len(kp_edges)] = kp_edges[:QE]
    val_e = np.arange(QE) < len(kp_edges)
    kp_p = np.zeros((QP, 3), np.float32)
    kp_p[:len(kp_planes)] = kp_planes[:QP]
    val_p = np.arange(QP) < min(len(kp_planes), QP)

    inputs = icp.ICPInputs(
        kp_xyz=(jnp.asarray(kp_e), jnp.asarray(kp_p), None),
        kp_valid=(jnp.asarray(val_e), jnp.asarray(val_p), None),
        index=(_index(edges), _index(planes), None),
    )
    res = icp.icp_register(inputs, (Keypoint.EDGE, Keypoint.PLANE), jnp.zeros(6),
                           MatchingConfig(), SolverConfig(), icp_iters=3,
                           lm_max_iter=15, min_matches=20, geoms=(GEOM, GEOM, GEOM))
    got = np.asarray(res.pose, np.float64)
    assert not bool(res.failed)
    assert int(res.total_matches) > 100
    np.testing.assert_allclose(got[:3], true_pose[:3], atol=0.01)
    np.testing.assert_allclose(got[3:], true_pose[3:], atol=0.01)


def test_icp_fails_gracefully_without_map():
    empty = np.zeros((8, 3), np.float32)
    idx = SubmapView(xyz=jnp.asarray(empty), ring=jnp.zeros(8, jnp.int32),
                     valid=jnp.zeros(8, bool))
    kp = jnp.asarray(RNG.uniform(-5, 5, (64, 3)).astype(np.float32))
    inputs = icp.ICPInputs(
        kp_xyz=(kp, kp, None), kp_valid=(jnp.ones(64, bool), jnp.ones(64, bool), None),
        index=(idx, idx, None))
    res = icp.icp_register(inputs, (Keypoint.EDGE, Keypoint.PLANE), jnp.zeros(6),
                           MatchingConfig(), SolverConfig(), icp_iters=3,
                           lm_max_iter=15, min_matches=20, geoms=(GEOM, GEOM, GEOM))
    assert bool(res.failed)
    np.testing.assert_allclose(np.asarray(res.pose), 0.0)  # pose untouched
