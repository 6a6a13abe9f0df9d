"""ParaView plugin core (lidarslam_tpu/paraview_plugin.py), vtk-free.

The pure core must reproduce the reference filter's input handling —
vendor array auto-detection (vtkSlam.cxx:531-612), PolyDataToPointCloud
null-point drop + frame-end time rebasing (:668-707), calibration laser
re-ranking (:615-629) — bind the XML-proxy parameter surface onto the
engine config, and drive a full timestep sequence matching the direct
API (the vtkSlamManager streaming role)."""

import numpy as np
import pytest

from lidarslam_tpu import Slam
from lidarslam_tpu.config import Keypoint
from lidarslam_tpu.io import synthetic
from lidarslam_tpu.paraview_plugin import (SlamFilterCore, arrays_to_frame,
                                           config_from_proxy,
                                           identify_input_arrays,
                                           laser_id_mapping)


def _cfg():
    from tests.test_slam_e2e import small_config

    return small_config()


def test_identify_input_arrays_vendor_table():
    # Velodyne (vtkSlam.cxx:573-578): µs time
    a = identify_input_arrays(["adjustedtime", "intensity", "laser_id"])
    assert (a.vendor, a.time_factor) == ("Velodyne", 1e-6)
    # Ouster (:581-587): ns time; calib column picked up when present
    a = identify_input_arrays(["Raw Timestamp", "Signal Photons", "Channel"],
                              calib_columns=["Altitude Angles"])
    assert (a.vendor, a.time_factor, a.calib) == \
        ("Ouster", 1e-9, "Altitude Angles")
    # Hesai (:590-596): seconds
    a = identify_input_arrays(["Timestamp", "Intensity", "LaserID"])
    assert (a.vendor, a.time_factor) == ("Hesai", 1.0)
    # priority order: Velodyne wins when several match (:573)
    a = identify_input_arrays(["adjustedtime", "intensity", "laser_id",
                               "Timestamp", "Intensity", "LaserID"])
    assert a.vendor == "Velodyne"
    with pytest.raises(ValueError):   # :604 vtkErrorMacro
        identify_input_arrays(["x", "y"])


def test_laser_id_mapping_is_rank_by_vertical_angle():
    # SortIdx(SortIdx(angles)) (vtkSlam.cxx:615-629): laser i -> its rank
    angles = [10.0, -30.0, 0.0, -15.0]
    np.testing.assert_array_equal(laser_id_mapping(angles), [3, 0, 2, 1])


def test_arrays_to_frame_rebase_and_null_drop():
    xyz = np.array([[1, 0, 0], [0, 0, 0], [0, 2, 0]], np.float32)
    t_us = np.array([100.0, 150.0, 300.0])            # Velodyne µs
    f = arrays_to_frame(xyz, t_us, [7.0, 8.0, 9.0], [0, 1, 2],
                        time_factor=1e-6,
                        mapping=np.asarray([5, 6, 7]))
    # (0,0,0) dropped (PolyDataToPointCloud :691), flag reports it
    assert len(f["xyz"]) == 2 and not f["all_points_valid"]
    # stamp = frame-end time in seconds (:683-685)
    assert f["stamp"] == pytest.approx(300e-6)
    # per-point time rebased to <= 0 relative to frame end (:697)
    np.testing.assert_allclose(f["time"], [-200e-6, 0.0], atol=1e-12)
    np.testing.assert_array_equal(f["laser_id"], [5, 7])   # mapping applied
    np.testing.assert_array_equal(f["intensity"], [7.0, 9.0])


def test_config_from_proxy_binds_reference_namespace():
    cfg = config_from_proxy({
        "LocalizationICPMaxIter": 5,
        "VoxelGridLeafSizePlanes": 0.45,
        "KeyframeDistanceThreshold": 1.25,
        "EdgeSinAngleThreshold": 0.9,
        "UseBlobs": False,
    })
    assert cfg.localization_icp_max_iter == 5
    assert cfg.plane_map.leaf_size == pytest.approx(0.45)
    assert cfg.kf_distance_threshold == pytest.approx(1.25)
    assert cfg.extractor.edge_sin_angle_threshold == pytest.approx(0.9)
    assert Keypoint.BLOB not in cfg.used_types
    with pytest.raises(KeyError):
        config_from_proxy({"NotAProxyProperty": 1})


def test_filter_core_matches_direct_api():
    frames = synthetic.generate_sequence(
        n_frames=5, motion_distortion=False,
        sensor=synthetic.SensorModel(range_noise=0.005))
    direct = Slam(_cfg())
    want = [np.asarray(direct.add_frame(f)["pose"]) for f in frames]

    core = SlamFilterCore(slam=Slam(_cfg()))
    core.identify(["adjustedtime", "intensity", "laser_id"])
    outs = []
    for f in frames:
        # Velodyne-format arrays: µs times, same relative layout
        t_us = (np.asarray(f["time"], np.float64)
                + float(f["stamp"])) * 1e6
        outs.append(core.process(f["xyz"], t_us, f["intensity"],
                                 f["laser_id"]))

    traj = outs[-1]["trajectory"]
    assert traj["points"].shape == (5, 3)
    for i, w in enumerate(want):
        assert np.linalg.norm(traj["points"][i] - w[:3, 3]) < 1e-4, i
    # trajectory arrays carry the vtkSlam port schema (:631-665)
    assert traj["Orientation(Quaternion)"].shape == (5, 4)
    assert traj["Orientation(AxisAngle)"].shape == (5, 4)
    assert traj["Covariance"].shape == (5, 36)
    # quaternion is wxyz of the pose rotation
    from lidarslam_tpu.core.se3 import quat_to_matrix
    R = quat_to_matrix(traj["Orientation(Quaternion)"][-1])
    assert np.abs(R - want[-1][:3, :3]).max() < 1e-6
    # per-frame ports
    out = outs[-1]
    assert out["registered_frame"]["xyz"].shape == frames[-1]["xyz"].shape
    assert len(out["edge_map"]["xyz"]) > 0
    assert out["plane_keypoints"]["xyz"].shape[1] == 3
    # reset clears the trajectory (vtkSlam reset semantics)
    core.reset()
    assert core.trajectory_arrays()["points"].shape == (0,)
