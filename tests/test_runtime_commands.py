"""Runtime SlamCommand surface (LidarSlamNode.cxx:244-349): live mapping
switches without recompilation, mid-run map save/load, GPS commands."""

import numpy as np
import pytest

from lidarslam_tpu import Slam
from lidarslam_tpu.config import (ExtractorConfig, Keypoint, MapConfig,
                                  MappingMode, SlamConfig)
from lidarslam_tpu.io import synthetic


def _cfg(**kw):
    return SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024,
                                  max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        **kw)


def test_live_map_update_switch_no_recompile():
    """SlamCommand 8/10 mid-stream: map freezes/unfreezes live, and the
    compiled-program cache does not grow (the switch is a traced input)."""
    frames = synthetic.generate_sequence(n_frames=10, motion_distortion=False)
    slam = Slam(_cfg())
    for f in frames[:4]:
        slam.add_frame_async(f)
    jitted = slam._process_stream
    slam.execute_command(Slam.DISABLE_SLAM_MAP_UPDATE)  # mid-stream, no flush
    # snapshot AFTER the command's window drain so both per-frame graph
    # variants (first and steady) are compiled; the switch itself — and
    # everything after it — must not add programs
    n_cache0 = jitted._cache_size()
    assert n_cache0 >= 1
    for f in frames[4:7]:
        slam.add_frame_async(f)
    outs = slam.flush()
    assert all(not o["failure"] for o in outs)
    frozen_n = len(slam.get_map_points(Keypoint.PLANE)[0])

    # frames 4..6 must not have touched the map: rebuild the same prefix
    # with updates always on and compare
    ref = Slam(_cfg())
    for f in frames[:4]:
        ref.add_frame_async(f)
    ref.flush()
    assert frozen_n == len(ref.get_map_points(Keypoint.PLANE)[0])
    for f in frames[4:7]:
        ref.add_frame_async(f)
    ref.flush()
    assert len(ref.get_map_points(Keypoint.PLANE)[0]) > frozen_n

    # re-enable: map grows again, still no recompile
    slam.execute_command(Slam.ENABLE_SLAM_MAP_UPDATE)
    for f in frames[7:]:
        slam.add_frame_async(f)
    outs = slam.flush()
    assert all(not o["failure"] for o in outs)
    assert len(slam.get_map_points(Keypoint.PLANE)[0]) > frozen_n
    assert jitted._cache_size() == n_cache0, "mode switch must not recompile"
    assert slam.get_map_update() == MappingMode.UPDATE


def test_sync_path_live_switch():
    frames = synthetic.generate_sequence(n_frames=6, motion_distortion=False)
    slam = Slam(_cfg())
    for f in frames[:3]:
        slam.add_frame(f)
    n_cache0 = slam._process._cache_size()
    slam.execute_command(Slam.DISABLE_SLAM_MAP_UPDATE)
    n_frozen = len(slam.get_map_points(Keypoint.PLANE)[0])
    for f in frames[3:]:
        r = slam.add_frame(f)
        assert not r["failure"]
    assert len(slam.get_map_points(Keypoint.PLANE)[0]) == n_frozen
    assert slam._process._cache_size() == n_cache0


def test_save_load_commands_mid_run(tmp_path):
    frames = synthetic.generate_sequence(n_frames=6, motion_distortion=False)
    slam = Slam(_cfg())
    for f in frames[:4]:
        slam.add_frame_async(f)
    prefix = str(tmp_path / "cmdmap_")
    slam.execute_command(Slam.SAVE_KEYPOINTS_MAPS, prefix)  # flushes stream
    assert (tmp_path / "cmdmap_planes.pcd").exists()
    assert slam.n_frames == 4

    # expansion mode: loaded map is fixed, new keypoints still aggregate
    slam.execute_command(Slam.ENABLE_SLAM_MAP_EXPANSION)
    slam.execute_command(Slam.LOAD_KEYPOINTS_MAPS, prefix)
    n_loaded = len(slam.get_map_points(Keypoint.PLANE)[0])
    assert n_loaded > 0
    for f in frames[4:]:
        r = slam.add_frame(f)
        assert not r["failure"]
    assert len(slam.get_map_points(Keypoint.PLANE)[0]) >= n_loaded

    with pytest.raises(ValueError):
        slam.execute_command(99)


def test_gps_commands():
    frames = synthetic.generate_sequence(n_frames=8, motion_distortion=False)
    slam = Slam(_cfg())
    for f in frames:
        slam.add_frame(f)
    slam_xyz = np.stack([e["pose"][:3, 3] for e in slam.log_trajectory])
    # fake GPS = SLAM trajectory in a rotated/translated world frame
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    gps = slam_xyz @ R.T + np.array([5.0, -2.0, 0.3])
    T = slam.execute_command(Slam.GPS_SLAM_CALIBRATION, gps_positions=gps)
    assert np.allclose(T[:3, :3], R, atol=1e-3)
    assert np.allclose(T[:3, 3], [5.0, -2.0, 0.3], atol=0.05)

    slam.execute_command(Slam.SET_SLAM_POSE_FROM_GPS,
                         pose=np.eye(4))
    assert np.allclose(slam.get_world_transform(), np.eye(4))


def test_target_submap_and_live_sensor_tuning():
    """GetTargetSubMap parity + runtime sensor-weight setters (Slam.h:158,
    SetWheelOdomWeight/SetGravityWeight — traced data, no recompile)."""
    import numpy as np
    from lidarslam_tpu.config import Keypoint
    from lidarslam_tpu.io import synthetic

    frames = synthetic.generate_sequence(n_frames=4, motion_distortion=False)
    slam = Slam(_cfg())
    for f in frames:
        slam.add_frame(f)
    sub = slam.get_target_submap(Keypoint.PLANE)
    full = slam.get_map_points(Keypoint.PLANE)[0]
    assert 0 < len(sub) <= len(full)
    # the submap is a subset of the map (same world frame)
    fs = {tuple(np.round(p, 4)) for p in full}
    assert all(tuple(np.round(p, 4)) in fs for p in sub[:50])
    slam.set_wheel_odom_weight(2.5)
    slam.set_gravity_weight(1.5)
    slam.set_sensor_time_offset(0.01)
    assert slam.wheel_odom.weight == 2.5
    assert slam.imu.weight == 1.5
    assert slam.get_sensor_time_offset() == 0.01
    r = slam.add_frame({**frames[-1], "stamp": frames[-1]["stamp"] + 0.1})
    assert r["n_matches"] > 0


def test_target_submap_stale_selection_falls_back_to_full_map():
    """After a map update/roll re-sorts the slots, the carried selection
    mask indexes dead positions — get_target_submap must fall back to the
    full map until the matcher rebuilds (Slam.cxx:1008 discipline)."""
    import numpy as np
    from lidarslam_tpu.config import Keypoint
    from lidarslam_tpu.io import synthetic

    frames = synthetic.generate_sequence(n_frames=4, motion_distortion=False)
    slam = Slam(_cfg())
    for f in frames:
        slam.add_frame(f)
    slam._cache_stale = np.bool_(True)
    sub = slam.get_target_submap(Keypoint.PLANE)
    full = slam.get_map_points(Keypoint.PLANE)[0]
    assert len(sub) == len(full)
