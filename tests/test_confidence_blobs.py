"""Overlap estimation in the fused pipeline + blob keypoints enabled e2e."""

import numpy as np
import pytest

from lidarslam_tpu import Slam
from lidarslam_tpu.config import (ConfidenceConfig, ExtractorConfig, Keypoint,
                                  MapConfig, SlamConfig)
from lidarslam_tpu.core import se3
from lidarslam_tpu.io import synthetic


def _base(**kw):
    return SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024, max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26), **kw)


def test_overlap_estimation():
    cfg = _base(confidence=ConfidenceConfig(overlap_sampling_ratio=0.3,
                                            overlap_max_samples=2048,
                                            time_window_duration=0.5))
    frames = synthetic.generate_sequence(n_frames=8, motion_distortion=False)
    slam = Slam(cfg)
    overlaps = []
    for f in frames:
        r = slam.add_frame(f)
        overlaps.append(r["overlap"])
        assert r["comply_motion_limits"] in (True, False)
    # first frame has no map -> -1; steady state is positive and stable
    # (absolute value is scene-dependent: synthetic sweeps reach 80 m where
    # the keypoint maps are sparse, so the mean Gaussian score sits well
    # below the reference's indoor 'good > 0.6' band)
    assert overlaps[0] == -1.0
    steady = np.asarray(overlaps[3:])
    assert np.all(steady > 0.15), steady
    assert np.all(steady <= 1.0)
    assert steady.std() < 0.1


def test_overlap_drops_after_pose_corruption():
    cfg = _base(confidence=ConfidenceConfig(overlap_sampling_ratio=0.3,
                                            overlap_max_samples=2048))
    frames = synthetic.generate_sequence(n_frames=8, motion_distortion=False)
    slam = Slam(cfg)
    for f in frames[:6]:
        r = slam.add_frame(f)
    good = r["overlap"]
    # corrupt the pose far from the mapped region and lock localization off
    bad_pose = se3.pose_to_hmat([60.0, 60.0, 0, 0, 0, 2.0])
    slam.set_world_transform_from_guess(bad_pose)
    r = slam.add_frame(frames[6])
    # either localization fails outright or overlap collapses
    assert r["failure"] or r["overlap"] < good - 0.2


def test_blobs_enabled_pipeline():
    """Blob (ellipsoid) matching is usable at slow motion where map arcs
    accumulate into dense coverage. (At motion per frame >> arc spacing,
    point-to-ellipsoid matches anchor to the previous sweep's arcs — an
    inherent property of the formulation, which is why the reference ships
    blobs disabled by default; so do we.)"""
    cfg = _base(use_blobs=True)
    # indoor room: all surfaces 3-5 m away, so ring arcs are ~10 cm apart and
    # blob neighborhoods span multiple rings (real 3-D ellipsoids)
    world = synthetic.World(ground_z=0.0, max_range=30.0)
    for lo, hi in [([-5, -5, 0], [5, -4.5, 3.0]), ([-5, 4.5, 0], [5, 5, 3.0]),
                   ([-5, -5, 0], [-4.5, 5, 3.0]), ([4.5, -5, 0], [5, 5, 3.0])]:
        world.boxes.append(synthetic.Box(np.array(lo, float), np.array(hi, float)))

    def traj(t):
        return se3.pose_to_hmat([0.4 * t, 0.1 * t, 1.5, 0, 0, 0.05 * t])

    frames = synthetic.generate_sequence(n_frames=8, world=world, trajectory=traj,
                                         motion_distortion=False,
                                         sensor=synthetic.SensorModel(range_noise=0.003))
    slam = Slam(cfg)
    gt0 = frames[0]["gt_pose"]
    for f in frames:
        r = slam.add_frame(f)
        assert not r["failure"]
    # blob matches contribute and the blob map is populated
    assert slam.match_counts[int(Keypoint.BLOB)] > 0
    pts, *_ = slam.get_map_points(Keypoint.BLOB)
    assert len(pts) > 100
    gt = se3.hmat_inverse(gt0) @ frames[-1]["gt_pose"]
    assert np.linalg.norm(r["pose"][:3, 3] - gt[:3, 3]) < 0.15
