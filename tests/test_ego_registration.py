"""Scan-to-scan ego-motion registration (EgoMotionMode REGISTRATION / BOTH)."""

import numpy as np
import pytest

from lidarslam_tpu import Slam
from lidarslam_tpu.config import (EgoMotionMode, ExtractorConfig, MapConfig,
                                  SlamConfig)
from lidarslam_tpu.core import se3
from lidarslam_tpu.io import synthetic


def _cfg(mode):
    return SlamConfig(
        ego_motion_mode=mode,
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024, max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26))


@pytest.mark.parametrize("mode", [EgoMotionMode.REGISTRATION,
                                  EgoMotionMode.MOTION_EXTRAPOLATION_AND_REGISTRATION])
def test_ego_registration_tracks(mode):
    """With scan-to-scan registration the pipeline must track even though
    the motion between sweeps is large relative to extrapolation quality."""
    frames = synthetic.generate_sequence(n_frames=10, motion_distortion=False,
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
    assert errs.max() < 0.15, f"{mode.name}: errors {errs}"


def test_registration_mode_survives_velocity_jump():
    """Pure REGISTRATION has no extrapolation: a sudden velocity change
    must still converge thanks to the scan-to-scan prior."""
    def traj(t):
        # abrupt speed change at t=0.4: 1.5 m/s then 4 m/s
        x = 1.5 * min(t, 0.4) + 4.0 * max(t - 0.4, 0.0)
        return se3.pose_to_hmat([x, 0.0, 1.8, 0, 0, 0])

    frames = synthetic.generate_sequence(n_frames=9, trajectory=traj,
                                         motion_distortion=False)
    slam = Slam(_cfg(EgoMotionMode.REGISTRATION))
    gt0 = frames[0]["gt_pose"]
    for f in frames:
        r = slam.add_frame(f)
    gt = se3.hmat_inverse(gt0) @ frames[-1]["gt_pose"]
    err = np.linalg.norm(r["pose"][:3, 3] - gt[:3, 3])
    assert err < 0.2, err
