"""ATE / RPE evaluation metrics."""

import numpy as np

from lidarslam_tpu import evaluation
from lidarslam_tpu.core import se3


def _traj(n=30, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n):
        th = i * 0.05
        p = [10 * np.sin(th), 10 * (1 - np.cos(th)), 0.1 * i, 0, 0, th]
        if noise:
            p = np.asarray(p, float)
            p[:3] += rng.normal(0, noise, 3)
        poses.append(se3.pose_to_hmat(p))
    return poses


def test_ate_zero_for_identical():
    gt = _traj()
    r = evaluation.absolute_trajectory_error(gt, gt)
    assert r.rmse < 1e-12 and r.n == len(gt)


def test_ate_alignment_removes_rigid_offset():
    gt = _traj()
    T = se3.pose_to_hmat([5, -3, 1, 0, 0, 0.7])
    est = [T @ p for p in gt]
    r = evaluation.absolute_trajectory_error(est, gt, align=True)
    assert r.rmse < 1e-9
    r_noalign = evaluation.absolute_trajectory_error(est, gt, align=False)
    assert r_noalign.rmse > 1.0


def test_ate_measures_noise():
    gt = _traj()
    est = _traj(noise=0.05, seed=1)
    r = evaluation.absolute_trajectory_error(est, gt)
    assert 0.02 < r.rmse < 0.15


def test_rpe_detects_drift():
    gt = _traj()
    # estimate with a constant per-frame translation bias
    drift = se3.pose_to_hmat([0.02, 0, 0, 0, 0, 0.001])
    est = [gt[0]]
    for i in range(1, len(gt)):
        rel = se3.hmat_inverse(gt[i - 1]) @ gt[i]
        est.append(est[-1] @ rel @ drift)
    t, r = evaluation.relative_pose_error(est, gt, delta=1)
    assert abs(t.mean - 0.02) < 0.005
    assert abs(r.mean - np.rad2deg(0.001)) < 0.02
