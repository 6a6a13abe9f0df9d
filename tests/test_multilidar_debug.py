"""Multi-LiDAR aggregation, calibration offsets, and debug-array APIs."""

import numpy as np
import pytest

from lidarslam_tpu import Slam
from lidarslam_tpu.config import (ExtractorConfig, Keypoint, MapConfig, MatchStatus,
                                  SlamConfig)
from lidarslam_tpu.core import se3
from lidarslam_tpu.io import synthetic


def _cfg():
    return SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024, max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26))


def _split_frame(f, offset_hmat):
    """Emulate a 2-LiDAR rig: device 0 sees azimuths in front, device 1 the
    rest, with device 1's points expressed in its own (offset) frame."""
    xyz = f["xyz"]
    front = xyz[:, 0] >= 0
    inv = se3.hmat_inverse(offset_hmat)
    f0 = {"xyz": xyz[front], "intensity": f["intensity"][front],
          "laser_id": f["laser_id"][front], "time": f["time"][front],
          "stamp": f["stamp"], "device_id": 0}
    pts1 = (xyz[~front] @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    f1 = {"xyz": pts1, "intensity": f["intensity"][~front],
          "laser_id": f["laser_id"][~front], "time": f["time"][~front],
          "stamp": f["stamp"], "device_id": 1}
    return [f0, f1]


def test_two_lidar_rig_tracks():
    offset = se3.pose_to_hmat([0.5, 0.2, 0.1, 0.0, 0.0, 0.3])
    frames = synthetic.generate_sequence(n_frames=8, motion_distortion=False)
    slam = Slam(_cfg())
    slam.set_base_to_lidar_offset(1, offset)
    gt0 = frames[0]["gt_pose"]
    for f in frames:
        r = slam.add_frames(_split_frame(f, offset))
        assert "skipped" not in r
        assert not r["failure"]
    gt = se3.hmat_inverse(gt0) @ frames[-1]["gt_pose"]
    err = np.linalg.norm(r["pose"][:3, 3] - gt[:3, 3])
    assert err < 0.15, err


def test_add_frames_single_delegates():
    frames = synthetic.generate_sequence(n_frames=3, motion_distortion=False)
    slam = Slam(_cfg())
    for f in frames:
        r = slam.add_frames([f])
        assert not r["failure"]
    assert slam.n_frames == 3


def test_debug_arrays():
    frames = synthetic.generate_sequence(n_frames=4, motion_distortion=False)
    slam = Slam(_cfg())
    for f in frames:
        slam.add_frame(f)
    dbg = slam.get_debug_array()
    assert "edge_match_status" in dbg and "plane_match_weight" in dbg
    st = dbg["plane_match_status"]
    assert len(st) > 0
    assert (st == MatchStatus.SUCCESS).sum() > 100
    w = dbg["plane_match_weight"]
    assert np.all((w >= 0) & (w <= 1))
    grids = slam.extract_debug(frames[-1])
    for key in ("sin_angle", "depth_gap", "saliency", "intensity_gap",
                "edge_keypoint", "plane_keypoint"):
        assert key in grids
        assert grids[key].shape == (16, 1024)
