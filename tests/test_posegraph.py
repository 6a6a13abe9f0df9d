"""SE(3) maps, trajectory registration, pose-graph optimization, PGO e2e."""

import numpy as np
import pytest

from lidarslam_tpu.backend import posegraph, registration
from lidarslam_tpu.core import se3


def test_se3_log_exp_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        xi = rng.normal(0, 0.6, 6)
        if np.linalg.norm(xi[3:]) >= np.pi:  # log is principal-branch only
            xi[3:] *= 0.9 * np.pi / np.linalg.norm(xi[3:])
        H = se3.se3_exp(xi)
        np.testing.assert_allclose(se3.se3_log(H), xi, atol=1e-9)
    # exp(log(H)) == H for arbitrary isometries (incl. angle > pi twists)
    for _ in range(50):
        H = se3.se3_exp(rng.normal(0, 1.5, 6))
        np.testing.assert_allclose(se3.se3_exp(se3.se3_log(H)), H, atol=1e-8)
    np.testing.assert_allclose(se3.se3_log(se3.se3_exp(np.zeros(6))), np.zeros(6), atol=1e-12)


def test_adjoint_identity():
    rng = np.random.default_rng(1)
    H = se3.se3_exp(rng.normal(0, 0.5, 6))
    xi = rng.normal(0, 0.1, 6)
    # Ad(H) xi == log(H exp(xi) H^-1)
    lhs = se3.adjoint(H) @ xi
    rhs = se3.se3_log(H @ se3.se3_exp(xi) @ se3.hmat_inverse(H))
    np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_trajectory_registration_recovers_transform():
    rng = np.random.default_rng(2)
    t = np.linspace(0, 10, 60)
    traj = np.stack([t, np.sin(t * 0.5) * 3, 0.05 * t], axis=1)
    T_true = se3.pose_to_hmat([4.0, -2.0, 0.5, 0.0, 0.0, 0.8])
    moved = traj @ T_true[:3, :3].T + T_true[:3, 3] + rng.normal(0, 0.01, traj.shape)
    T_est = registration.compute_transform_offset(traj, moved)
    np.testing.assert_allclose(T_est, T_true, atol=0.05)


def test_pose_graph_corrects_drift():
    """Drifting odometry + accurate sparse GPS -> near-ground-truth poses."""
    rng = np.random.default_rng(3)
    N = 60
    # ground truth: circle arc
    gt = []
    for i in range(N):
        th = i * 0.05
        gt.append(se3.pose_to_hmat([10 * np.sin(th), 10 * (1 - np.cos(th)), 0, 0, 0, th]))
    times = np.arange(N) * 0.5
    # odometry: relative motions with a small bias -> drift
    drift = se3.pose_to_hmat([0.02, 0.005, 0, 0, 0, 0.002])
    odo = [gt[0]]
    for i in range(1, N):
        rel = se3.hmat_inverse(gt[i - 1]) @ gt[i]
        odo.append(odo[-1] @ rel @ drift)
    final_drift = np.linalg.norm(odo[-1][:3, 3] - gt[-1][:3, 3])
    assert final_drift > 0.5  # drift is significant

    covs = [np.eye(6) * 1e-3 for _ in range(N)]
    gps_idx = np.arange(0, N, 5)
    gps_pos = np.stack([gt[i][:3, 3] for i in gps_idx]) + rng.normal(0, 0.02, (len(gps_idx), 3))
    opt, cost = posegraph.optimize_pose_graph(
        odo, times, covs, gps_positions=gps_pos, gps_times=times[gps_idx],
        gps_covariances=np.broadcast_to(np.eye(3) * 1e-4, (len(gps_idx), 3, 3)))
    errs = [np.linalg.norm(opt[i][:3, 3] - gt[i][:3, 3]) for i in range(N)]
    assert max(errs) < 0.12, f"max err {max(errs)} (drift was {final_drift:.2f})"


def test_pose_graph_no_gps_keeps_gauge():
    """Without GPS, the gauge prior keeps the first pose fixed and the
    chain consistent."""
    N = 10
    poses = [se3.pose_to_hmat([i * 0.5, 0, 0, 0, 0, 0]) for i in range(N)]
    times = np.arange(N, dtype=float)
    covs = [np.eye(6) * 1e-3] * N
    opt, cost = posegraph.optimize_pose_graph(poses, times, covs)
    np.testing.assert_allclose(opt[0], poses[0], atol=1e-4)
    np.testing.assert_allclose(opt[-1], poses[-1], atol=1e-3)


def test_slam_pgo_end_to_end():
    """Full loop: run SLAM, feed GPS from ground truth, optimize, check the
    trajectory tightened and maps were rebuilt."""
    import jax.numpy as jnp
    from lidarslam_tpu import Slam
    from lidarslam_tpu.config import ExtractorConfig, Keypoint, MapConfig, SlamConfig
    from lidarslam_tpu.io import synthetic

    cfg = SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024, max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26))
    frames = synthetic.generate_sequence(n_frames=10, motion_distortion=False)
    slam = Slam(cfg)
    for f in frames:
        r = slam.add_frame(f)
        assert not r["failure"]

    gt0 = frames[0]["gt_pose"]
    gps_pos = np.stack([(se3.hmat_inverse(gt0) @ f["gt_pose"])[:3, 3] for f in frames])
    gps_times = np.array([f["stamp"] for f in frames])
    ok = slam.run_pose_graph_optimization(gps_pos, gps_times)
    assert ok
    # optimized trajectory should be within GPS noise of ground truth
    for e, f in zip(slam.log_trajectory, frames):
        gt = se3.hmat_inverse(gt0) @ f["gt_pose"]
        assert np.linalg.norm(e["pose"][:3, 3] - gt[:3, 3]) < 0.05
    # maps rebuilt and populated
    pts, *_ = slam.get_map_points(Keypoint.PLANE)
    assert len(pts) > 200
