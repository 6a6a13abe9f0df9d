"""Per-device extractor configs + streaming multi-LiDAR.

Reference: Slam.h:239-245 (KeyframeExtractors map keyed by device), and
LidarSlamNode.cxx:791-817 (one extractor initialised per LiDAR device with
its own parameters). Streaming multi-LiDAR has no reference analog (the
reference is synchronous); here it is the device-chained pipeline fed by
merged per-device keypoints.
"""

import numpy as np
import pytest

from lidarslam_tpu import Slam
from lidarslam_tpu.config import ExtractorConfig, Keypoint, MapConfig, SlamConfig
from lidarslam_tpu.core import se3
from lidarslam_tpu.io import synthetic


OFFSET = se3.pose_to_hmat([0.4, 0.15, 0.05, 0.0, 0.0, 0.25])


def _cfg(device_extractors=()):
    return SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024,
                                  max_keypoints=1024),
        device_extractors=device_extractors,
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26))


def _two_sensor_sequences(n_frames):
    """Two rigidly-mounted LiDARs on one base: device 0 a 16-ring, device 1
    an 8-ring unit mounted at OFFSET; each renders in its own frame."""
    world = synthetic.default_world(0)
    base_traj = synthetic.straight_then_turn_trajectory()

    def traj1(t):
        return base_traj(t) @ OFFSET

    s0 = synthetic.SensorModel(n_rings=16)
    s1 = synthetic.SensorModel(n_rings=8, elevation_min_deg=-10.0,
                               elevation_max_deg=10.0)
    f0 = [synthetic.render_sweep(world, s0, base_traj, i * s0.sweep_duration,
                                 seed=i, motion_distortion=False)
          for i in range(n_frames)]
    f1 = [synthetic.render_sweep(world, s1, traj1, i * s1.sweep_duration,
                                 seed=100 + i, motion_distortion=False)
          for i in range(n_frames)]
    for a, b in zip(f0, f1):
        a["device_id"], b["device_id"] = 0, 1
    return f0, f1


def test_extractor_for_lookup():
    e8 = ExtractorConfig(n_rings=8)
    cfg = _cfg(device_extractors=((1, e8),))
    assert cfg.extractor_for(1) is e8
    assert cfg.extractor_for(0).n_rings == 16
    assert cfg.extractor_for(7).n_rings == 16  # unknown device -> default
    hash(cfg)  # stays hashable (static under jit)


def test_heterogeneous_rig_tracks():
    """Two devices with different ring counts, each with its own extractor."""
    n = 8
    f0, f1 = _two_sensor_sequences(n)
    cfg = _cfg(device_extractors=(
        (1, ExtractorConfig(n_rings=8, max_ring_points=1024,
                            max_keypoints=1024)),))
    slam = Slam(cfg)
    slam.set_base_to_lidar_offset(1, OFFSET)
    gt0 = f0[0]["gt_pose"]
    for a, b in zip(f0, f1):
        r = slam.add_frames([a, b])
        assert "skipped" not in r
        assert not r["failure"]
    gt = se3.hmat_inverse(gt0) @ f0[-1]["gt_pose"]
    err = np.linalg.norm(r["pose"][:3, 3] - gt[:3, 3])
    assert err < 0.15, err


def test_streaming_multilidar_matches_sync():
    """add_frames_async + flush lands within cm of the synchronous path."""
    n = 8
    f0, f1 = _two_sensor_sequences(n)
    cfg = _cfg(device_extractors=(
        (1, ExtractorConfig(n_rings=8, max_ring_points=1024,
                            max_keypoints=1024)),))

    sync = Slam(cfg)
    sync.set_base_to_lidar_offset(1, OFFSET)
    for a, b in zip(f0, f1):
        rs = sync.add_frames([a, b])

    stream = Slam(cfg)
    stream.set_base_to_lidar_offset(1, OFFSET)
    for a, b in zip(f0, f1):
        idx = stream.add_frames_async([a, b])
        assert idx >= 0
    outs = stream.flush()
    assert len(outs) == n
    for o in outs:
        assert not o["failure"]
    d = np.linalg.norm(outs[-1]["pose"][:3, 3] - rs["pose"][:3, 3])
    assert d < 0.03, d
    # per-frame motion-limit verdicts are live, not stale (VERDICT weak-2)
    assert all("comply_motion_limits" in o for o in outs)


def test_streaming_multilidar_single_device_delegates():
    frames = synthetic.generate_sequence(n_frames=3, motion_distortion=False)
    slam = Slam(_cfg())
    for f in frames:
        idx = slam.add_frames_async([f])
        assert idx >= 0
    outs = slam.flush()
    assert len(outs) == 3
    assert slam.n_frames == 3


def test_single_device_with_own_extractor_does_not_delegate():
    """A lone frame from a device with its OWN ExtractorConfig must keep the
    per-device host-extraction path even without a calibration offset —
    delegating to add_frame_async would extract with the default config
    (wrong n_rings), diverging from the synchronous add_frames path."""
    _, f1 = _two_sensor_sequences(3)
    ecfg8 = ExtractorConfig(n_rings=8, max_ring_points=1024, max_keypoints=1024)
    slam = Slam(_cfg(device_extractors=((1, ecfg8),)))

    def boom(*a, **k):
        raise AssertionError("delegated to the default-extractor path")
    slam.add_frame_async = boom
    for f in f1:
        assert slam.add_frames_async([f]) >= 0
    outs = slam.flush()
    assert len(outs) == 3

    # a default-configured device without calibration still delegates
    slam2 = Slam(_cfg())
    called = []
    orig = slam2.add_frame_async
    slam2.add_frame_async = lambda f: (called.append(1), orig(f))[1]
    f0, _ = _two_sensor_sequences(1)
    slam2.add_frames_async([f0[0]])
    assert called
