"""YAML config loader: reference-namespace parity and preset files."""

import numpy as np
import pytest

from lidarslam_tpu.config import (EgoMotionMode, MappingMode, SamplingMode,
                                  UndistortionMode)
from lidarslam_tpu.io.yaml_config import load_config


def test_outdoor_preset_matches_reference_defaults():
    cfg = load_config("/root/repo/configs/slam_config_outdoor.yaml")
    assert cfg.ego_motion_mode == EgoMotionMode.MOTION_EXTRAPOLATION
    assert cfg.undistortion == UndistortionMode.REFINED
    assert cfg.edge_map.leaf_size == 0.30
    assert cfg.plane_map.leaf_size == 0.60
    assert cfg.loc_matching.edge_nb_neighbors == 10
    assert cfg.loc_matching.init_saturation_distance == 2.0
    assert cfg.ego_matching.single_edge_per_ring is True
    assert cfg.loc_matching.single_edge_per_ring is False
    assert cfg.kf_distance_threshold == 0.5
    assert cfg.ego_motion_icp_max_iter == 4
    assert cfg.localization_icp_max_iter == 3
    assert cfg.mapping_mode == MappingMode.UPDATE
    assert cfg.edge_map.sampling == SamplingMode.MAX_INTENSITY


def test_indoor_preset_differences():
    cfg = load_config("/root/repo/configs/slam_config_indoor.yaml")
    assert cfg.loc_matching.max_neighbors_distance == 3.0
    assert cfg.loc_matching.edge_max_model_error == 0.1
    assert cfg.loc_matching.plane_nb_neighbors == 7
    assert cfg.edge_map.leaf_size == 0.20
    assert cfg.kf_distance_threshold == 0.2
    assert cfg.confidence.overlap_sampling_ratio == 0.33
    assert cfg.extractor.edge_depth_gap_threshold == 0.5


def test_partial_yaml_keeps_defaults():
    cfg = load_config(text="slam:\n  use_blobs: true\n")
    assert cfg.use_blobs is True
    assert cfg.loc_matching.edge_nb_neighbors == 10   # untouched default


def test_loaded_config_runs():
    from lidarslam_tpu import Slam
    from lidarslam_tpu.io import synthetic
    import dataclasses

    cfg = load_config("/root/repo/configs/slam_config_outdoor.yaml")
    # shrink capacities for test speed
    cfg = dataclasses.replace(
        cfg,
        undistortion=UndistortionMode.NONE,
        extractor=dataclasses.replace(cfg.extractor, max_ring_points=1024,
                                      max_keypoints=1024),
        edge_map=dataclasses.replace(cfg.edge_map, capacity=1 << 15, grid_size=26),
        plane_map=dataclasses.replace(cfg.plane_map, capacity=1 << 15, grid_size=26),
        blob_map=dataclasses.replace(cfg.blob_map, capacity=1 << 15, grid_size=26))
    frames = synthetic.generate_sequence(n_frames=3, motion_distortion=False)
    slam = Slam(cfg)
    for f in frames:
        r = slam.add_frame(f)
        assert not r["failure"]
    reg = slam.get_registered_frame(frames[-1])
    assert reg.shape == frames[-1]["xyz"].shape
    assert np.isfinite(reg).all()


def test_reference_shipped_yaml_loads_directly():
    """The reference's own production configs load through our loader —
    the strongest namespace-parity check. Skipped when the reference tree
    is not mounted (the test suite stays self-contained)."""
    import os
    import pytest

    base = "/root/reference/ros_wrapping/lidar_slam/params"
    if not os.path.isdir(base):
        pytest.skip("reference tree not mounted")
    from lidarslam_tpu.io.yaml_config import load_config

    for name in ("slam_config_outdoor.yaml", "slam_config_indoor.yaml"):
        path = os.path.join(base, name)
        if not os.path.exists(path):
            continue
        cfg = load_config(path)
        # spot-check a few deep fields made it through
        assert cfg.extractor.min_distance_to_sensor > 0
        assert cfg.plane_map.leaf_size > 0
        assert 0 <= cfg.confidence.overlap_sampling_ratio <= 1
