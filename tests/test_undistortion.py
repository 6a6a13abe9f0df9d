"""Within-sweep undistortion: warp kernel units + e2e benefit on distorted data."""

import numpy as np
import jax.numpy as jnp
import pytest

from lidarslam_tpu.config import (ExtractorConfig, MapConfig, SlamConfig,
                                  UndistortionMode)
from lidarslam_tpu.core import se3
from lidarslam_tpu.ops import undistortion


def test_warp_points_endpoints_and_midpoint():
    # sweep motion: +1 m in x and 90 deg yaw between time 0 and 1
    H0 = np.eye(4)
    H1 = se3.pose_to_hmat([1.0, 0, 0, 0, 0, np.pi / 2])
    w = undistortion.WarpParams(
        q0=jnp.asarray(se3.quat_from_matrix(H0[:3, :3]), jnp.float32),
        t0v=jnp.asarray(H0[:3, 3], jnp.float32),
        q1=jnp.asarray(se3.quat_from_matrix(H1[:3, :3]), jnp.float32),
        t1v=jnp.asarray(H1[:3, 3], jnp.float32),
        time0=jnp.float32(0.0), time1=jnp.float32(1.0),
        enabled=jnp.asarray(True))
    pts = jnp.asarray([[2.0, 0, 0]] * 3, jnp.float32)
    times = jnp.asarray([0.0, 1.0, 0.5], jnp.float32)
    out = np.asarray(undistortion.warp_points(pts, times, w))
    np.testing.assert_allclose(out[0], [2, 0, 0], atol=1e-5)
    np.testing.assert_allclose(out[1], H1[:3, :3] @ [2, 0, 0] + H1[:3, 3], atol=1e-5)
    # midpoint: slerp 45 deg yaw, translation 0.5
    Hm = se3.pose_to_hmat([0.5, 0, 0, 0, 0, np.pi / 4])
    np.testing.assert_allclose(out[2], Hm[:3, :3] @ [2, 0, 0] + Hm[:3, 3], atol=1e-4)


def test_warp_disabled_is_identity():
    w = undistortion.identity_warp()
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)), jnp.float32)
    out = np.asarray(undistortion.warp_points(pts, jnp.zeros(10), w))
    np.testing.assert_allclose(out, np.asarray(pts))


def test_compute_warp_static_pose_is_identityish():
    p = jnp.asarray([1.0, 2.0, 0.5, 0.0, 0.0, 0.3], jnp.float32)
    w = undistortion.compute_warp(p, p, 0.0, 0.1, 0.0, 0.1, 3.0)
    pts = jnp.asarray([[5.0, 1.0, 0.0]], jnp.float32)
    out = np.asarray(undistortion.warp_points(pts, jnp.asarray([0.05]), w))
    np.testing.assert_allclose(out, np.asarray(pts), atol=1e-5)


def _cfg(mode):
    return SlamConfig(
        undistortion=mode,
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024, max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
    )


@pytest.mark.parametrize("mode", [UndistortionMode.ONCE, UndistortionMode.REFINED])
def test_e2e_distorted_sequence(mode):
    """Fast motion with rolling-shutter distortion: the undistorted pipeline
    must stay locked on the ground truth."""
    from lidarslam_tpu import Slam
    from lidarslam_tpu.io import synthetic

    traj = synthetic.straight_then_turn_trajectory(speed=4.0, yaw_rate_deg=18.0,
                                                   turn_start=0.4)
    frames = synthetic.generate_sequence(n_frames=12, trajectory=traj,
                                         motion_distortion=True,
                                         sensor=synthetic.SensorModel(range_noise=0.005))
    slam = Slam(_cfg(mode))
    gt0 = frames[0]["gt_pose"]
    errs = []
    for f in frames:
        r = slam.add_frame(f)
        assert not r["failure"]
        gt = se3.hmat_inverse(gt0) @ f["gt_pose"]
        errs.append(np.linalg.norm(r["pose"][:3, 3] - gt[:3, 3]))
    errs = np.asarray(errs)
    assert errs.max() < 0.25, f"undistorted ({mode.name}) errors {errs}"
    assert errs[-1] < 0.2
