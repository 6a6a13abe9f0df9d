"""Sensor-constraint managers and their solver residual blocks."""

import numpy as np
import jax.numpy as jnp
import pytest

from lidarslam_tpu.config import SolverConfig
from lidarslam_tpu.ops import solver
from lidarslam_tpu.sensors.constraints import (GravityResidual, ImuManager,
                                               OdomResidual, WheelOdometryManager)


def test_wheel_odom_interpolation_and_gating():
    m = WheelOdometryManager(weight=1.0, relative=True)
    assert not m.can_be_used()
    for t, d in [(0.0, 0.0), (1.0, 2.0), (2.0, 4.0)]:
        m.add_measurement(t, d)
    assert m.can_be_used()
    # outside span -> None
    assert m.compute_constraint(5.0) is None
    # first in-span call only seeds the reference distance
    assert m.compute_constraint(0.5) is None
    r = m.compute_constraint(1.5)
    assert r is not None
    np.testing.assert_allclose(float(r.distance), 2.0, atol=1e-9)  # 3.0 - 1.0


def test_imu_gravity_ref_voting():
    m = ImuManager(weight=1.0)
    rng = np.random.default_rng(0)
    # 80 measurements near -z, 10 outliers
    for i in range(80):
        m.add_measurement(i * 0.01, np.array([0.02, -0.01, -9.81]) + rng.normal(0, 0.05, 3))
    for i in range(10):
        m.add_measurement(1.0 + i * 0.01, rng.normal(0, 3.0, 3))
    m.compute_gravity_ref()
    np.testing.assert_allclose(m.gravity_ref, [0, 0, -1], atol=0.05)
    r = m.compute_constraint(0.4)
    assert r is not None
    np.testing.assert_allclose(np.asarray(r.g_cur), [0, 0, -1], atol=0.05)


def test_odometry_residual_constrains_distance():
    """With a weak under-constrained geometry, the odometry block pins the
    travelled distance."""
    # only a single plane normal x -> translation along y/z unconstrained;
    # the odometer says: we moved 1.0 m from the origin
    n = np.array([1.0, 0, 0])
    Q = 100
    rng = np.random.default_rng(1)
    A = np.broadcast_to(np.outer(n, n), (Q, 3, 3)).astype(np.float32)
    X = rng.uniform(-3, 3, (Q, 3)).astype(np.float32)
    P = (X + np.array([0.6, 0, 0])).astype(np.float32)  # plane wants tx=0.6
    from lidarslam_tpu.ops.matcher import Matches
    blocks = [Matches.from_dense(A=jnp.asarray(A), P=jnp.asarray(P), X=jnp.asarray(X),
                      weight=jnp.ones(Q), status=jnp.zeros(Q, jnp.uint8),
                      valid=jnp.ones(Q, bool))]
    odo = OdomResidual(prev_pos=jnp.zeros(3), distance=jnp.float32(0.6),
                       weight=jnp.float32(50.0), valid=jnp.ones((), bool))
    res = solver.robust_lm(blocks, jnp.asarray([0.1, 0.0, 0.0, 0, 0, 0], jnp.float32),
                           1.0, SolverConfig(), 25, extras=(odo,))
    pose = np.asarray(res.pose)
    np.testing.assert_allclose(pose[0], 0.6, atol=0.02)
    np.testing.assert_allclose(np.linalg.norm(pose[:3]), 0.6, atol=0.05)


def test_gravity_residual_constrains_roll_pitch():
    """Gravity alignment pulls roll/pitch toward the reference direction."""
    from lidarslam_tpu.ops.matcher import Matches
    # no point matches at all: pure gravity alignment from a tilted start
    blocks = [Matches.from_dense(A=jnp.zeros((4, 3, 3)), P=jnp.zeros((4, 3)), X=jnp.zeros((4, 3)),
                      weight=jnp.zeros(4), status=jnp.zeros(4, jnp.uint8),
                      valid=jnp.zeros(4, bool))]
    g = GravityResidual(g_ref=jnp.asarray([0.0, 0, -1]), g_cur=jnp.asarray([0.0, 0, -1]),
                        weight=jnp.float32(10.0), valid=jnp.ones((), bool))
    res = solver.robust_lm(blocks, jnp.asarray([0, 0, 0, 0.2, -0.15, 0.0], jnp.float32),
                           1.0, SolverConfig(), 30, extras=(g,))
    pose = np.asarray(res.pose)
    # g_cur measured in BASE equals g_ref in world only when roll=pitch=0
    assert abs(pose[3]) < 0.01 and abs(pose[4]) < 0.01


def test_slam_accepts_sensor_measurements():
    from lidarslam_tpu import Slam
    from lidarslam_tpu.config import ExtractorConfig, MapConfig, SlamConfig
    from lidarslam_tpu.io import synthetic

    cfg = SlamConfig(
        wheel_odom_weight=1.0, wheel_odom_relative=True, imu_weight=0.5,
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024, max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26))
    frames = synthetic.generate_sequence(n_frames=6, motion_distortion=False)
    slam = Slam(cfg)
    # feed consistent sensor data: 2 m/s forward, gravity -z
    for t in np.arange(-0.1, 1.0, 0.02):
        slam.add_wheel_odom_measurement(t, 2.0 * max(t, 0))
        slam.add_gravity_measurement(t, np.array([0.0, 0.0, -9.81]))
    from lidarslam_tpu.core import se3
    gt0 = frames[0]["gt_pose"]
    for f in frames:
        r = slam.add_frame(f)
        assert not r["failure"]
    gt = se3.hmat_inverse(gt0) @ frames[-1]["gt_pose"]
    err = np.linalg.norm(r["pose"][:3, 3] - gt[:3, 3])
    assert err < 0.15, err
