"""Vendor converters and GPS->UTM."""

import numpy as np
import pytest

from lidarslam_tpu.io import conversions as cv


def _spin_cloud(n=3600, rings=4, clockwise=True):
    """Interleaved multi-ring spinning cloud over one revolution."""
    az = np.linspace(0, 2 * np.pi, n, endpoint=False)
    if clockwise:
        az = -az
    r = 10.0
    pts = []
    ring_ids = []
    for i, a in enumerate(az):
        ring = i % rings
        z = 0.2 * ring
        pts.append([r * np.cos(a), r * np.sin(a), z])
        ring_ids.append(ring)
    return np.asarray(pts), np.asarray(ring_ids)


def test_frame_advancement_monotone_and_spans_revolution():
    pts, _ = _spin_cloud()
    adv = cv.estimate_frame_advancement(pts)
    assert np.all(np.diff(adv) >= 0)
    assert adv[0] == 0.0
    assert adv[-1] > 0.95


def test_velodyne_conversion_synthesizes_time():
    pts, rings = _spin_cloud()
    pts[5] = np.nan  # a NaN point must be dropped
    f = cv.velodyne_to_frame(pts, np.full(len(pts), 10.0), rings, stamp=1.5)
    assert len(f["xyz"]) == len(pts) - 1
    assert f["stamp"] == 1.5
    assert f["time"].max() > 0.09 and f["time"].min() >= 0.0
    assert np.isfinite(f["xyz"]).all()


def test_robosense_dedup_and_remap():
    pts, rings = _spin_cloud(n=100, rings=16)
    pts = np.repeat(pts, 2, axis=0)      # dual returns: every point twice
    rings = np.repeat(rings, 2, axis=0)
    f = cv.robosense_to_frame(pts, np.zeros(len(pts)), rings, stamp=0.0)
    assert len(f["xyz"]) == 100
    assert f["laser_id"].max() < 16


def test_robosense_rs16_table_matches_reference():
    """The RS16 laser remap must be byte-identical to the reference's
    LASER_ID_MAPPING_RS16 (RobosenseToLidarNode.cxx:32)."""
    np.testing.assert_array_equal(
        cv.RS16_RING_REMAP,
        [0, 1, 2, 3, 4, 5, 6, 7, 15, 14, 13, 12, 11, 10, 9, 8])
    # round-trip: every ring appears exactly once
    assert sorted(cv.RS16_RING_REMAP.tolist()) == list(range(16))


def test_robosense_remap_gated_on_16_rings():
    """Non-16-laser RoboSense clouds pass rings through unchanged
    (RobosenseToLidarNode.cxx:104-109: RS16 table iff nLasers == 16)."""
    pts, rings = _spin_cloud(n=128, rings=32)
    f = cv.robosense_to_frame(pts, np.zeros(len(pts)), rings, stamp=0.0)
    np.testing.assert_array_equal(f["laser_id"], rings)
    # explicit vertical angles derive the remap for RS32-class sensors
    angles = np.concatenate([np.arange(16), -1.0 - np.arange(16)])  # interleaved banks
    f2 = cv.robosense_to_frame(pts, np.zeros(len(pts)), rings, stamp=0.0,
                               vertical_angles=angles)
    expect = cv.laser_id_mapping(angles)[rings]
    np.testing.assert_array_equal(f2["laser_id"], expect)


def test_leishen_conversion_remaps_interleaved_banks():
    pts, rings = _spin_cloud(n=128, rings=32)
    pts[3] = np.nan
    # LSC32-style interleave: even lasers lower bank, odd lasers upper bank
    angles = np.empty(32)
    angles[0::2] = -16.0 + np.arange(16)
    angles[1::2] = 0.0 + np.arange(16)
    f = cv.leishen_to_frame(pts, np.zeros(len(pts)), rings, stamp=2.0,
                            vertical_angles=angles)
    assert len(f["xyz"]) == len(pts) - 1
    assert f["stamp"] == 2.0
    # bottom-up: laser 0 (lowest angle) -> ring 0, laser 1 (angle 0) -> ring 16
    lid = f["laser_id"]
    raw = rings[np.isfinite(pts).all(axis=1)]
    assert (lid[raw == 0] == 0).all()
    assert (lid[raw == 1] == 16).all()
    assert f["time"].max() > 0.05


def test_gps_to_utm_geodetic_invariants():
    # on a zone's central meridian the easting is exactly the 500 km offset
    e, n, zone, band = cv.gps_to_utm(48.0, 3.0)  # zone 31 central meridian
    assert int(zone) == 31 and band == "U"
    assert abs(e - 500000.0) < 1e-3
    # scaled quarter-meridian: northing(89.9999..N on meridian) ~ k0 * 10001965.73
    _, n90, _, _ = cv.gps_to_utm(89.99999, 3.0)
    assert abs(n90 - 0.9996 * 10001965.729) < 5.0
    # one degree of latitude along the meridian ~ 110.6-111.7 km
    _, n0, _, _ = cv.gps_to_utm(45.0, 3.0)
    _, n1, _, _ = cv.gps_to_utm(46.0, 3.0)
    assert 110.5e3 < (n1 - n0) / 0.9996 < 111.8e3
    # southern hemisphere gets the 10,000 km false northing
    e, n, zone, band = cv.gps_to_utm(-33.8568, 151.2153)
    assert int(zone) == 56 and band == "H"
    assert n > 6e6


def test_gps_to_utm_local_metric_consistency():
    """Small lat/lon offsets map to the right local metric distances."""
    lat0, lon0 = 48.8584, 2.2945
    e0, n0, _, _ = cv.gps_to_utm(lat0, lon0)
    # +100 m north ~ +100/111132 deg latitude; the ~0.9 m easting drift is
    # genuine UTM grid convergence (~0.53 deg at 0.7 deg off the central
    # meridian), not an error
    e1, n1, _, _ = cv.gps_to_utm(lat0 + 100 / 111132.0, lon0)
    assert abs((n1 - n0) - 100.0) < 0.5 and abs(e1 - e0) < 1.5
    # +100 m east ~ +100/(111320 cos(lat)) deg longitude
    dlon = 100.0 / (111320.0 * np.cos(np.deg2rad(lat0)))
    e2, n2, _, _ = cv.gps_to_utm(lat0, lon0 + dlon)
    assert abs((e2 - e0) - 100.0) < 0.5 and abs(n2 - n0) < 1.5


def test_sensor_csv_loading(tmp_path):
    """load_sensor_csv parity with vtkSlam::SetSensorData
    (vtkSlam.cxx:406-458): time+odom rows feed wheel odometry, acc_x/y/z
    feed IMU gravity; mixed delimiters accepted."""
    from lidarslam_tpu.io.sensor_csv import load_sensor_csv
    from lidarslam_tpu.sensors.constraints import ImuManager, WheelOdometryManager

    p = tmp_path / "sensors.csv"
    p.write_text("time,odom,acc_x,acc_y,acc_z\n"
                 "0.0,0.0,0.0,0.0,-9.81\n"
                 "0.1;1.5;0.0;0.0;-9.81\n"
                 "0.2 3.0 0.1 0.0 -9.8\n")
    odom = WheelOdometryManager(weight=1.0)
    imu = ImuManager(weight=1.0)
    counts = load_sensor_csv(str(p), wheel_odom=odom, imu=imu)
    assert counts == {"odometry": 3, "imu": 3}
    assert odom.can_be_used() and imu.can_be_used()
    assert odom.compute_constraint(0.05) is None  # first call sets the ref
    r = odom.compute_constraint(0.15)
    assert r is not None and float(r.distance) > 0


def test_identify_input_arrays():
    """Vendor autodetect (vtkSlam.cxx:574-601): Velodyne, Ouster, Hesai by
    their characteristic array names with the right time unit."""
    from lidarslam_tpu.io.sensor_csv import identify_input_arrays

    v = identify_input_arrays(["adjustedtime", "intensity", "laser_id", "x"],
                              ["verticalCorrection"])
    assert v.vendor == "velodyne" and v.time_to_seconds == 1e-6
    assert v.calibration == "verticalCorrection"
    o = identify_input_arrays(["Raw Timestamp", "Signal Photons", "Channel"])
    assert o.vendor == "ouster" and o.time_to_seconds == 1e-9
    assert o.calibration is None
    h = identify_input_arrays(["Timestamp", "Intensity", "LaserID"])
    assert h.vendor == "hesai" and h.time_to_seconds == 1.0
    assert identify_input_arrays(["x", "y", "z"]) is None


def test_slam_set_sensor_data(tmp_path):
    """Slam.set_sensor_data clears and reloads the managers."""
    import jax
    from lidarslam_tpu.config import ExtractorConfig, SlamConfig
    from lidarslam_tpu.slam import Slam

    p = tmp_path / "odo.txt"
    p.write_text("time odom\n0.0 0.0\n0.1 1.0\n")
    cfg = SlamConfig(extractor=ExtractorConfig(n_rings=4, max_ring_points=64,
                                               max_keypoints=64),
                     wheel_odom_weight=2.0)
    slam = Slam(cfg)
    counts = slam.set_sensor_data(str(p))
    assert counts == {"odometry": 2, "imu": 0}
    assert slam.wheel_odom.can_be_used()
    assert slam.set_sensor_data("") == {"odometry": 0, "imu": 0}
    assert not slam.wheel_odom.can_be_used()


# -----------------------------------------------------------------------------
# Vendor array autodetection (vtkSlam::IdentifyInputArrays, vtkSlam.cxx:531-612)
# -----------------------------------------------------------------------------

def _vendor_arrays(vendor, n=100, rings=8):
    rng = np.random.default_rng(3)
    xyz = rng.normal(0, 10, (n, 3))
    xyz[5] = 0.0  # all-zero point: must be dropped (PolyDataToPointCloud)
    lid = rng.integers(0, rings, n)
    inten = rng.uniform(0, 255, n)
    t_s = np.linspace(100.0, 100.1, n)  # seconds
    if vendor == "velodyne":
        return xyz, {"adjustedtime": t_s * 1e6, "intensity": inten,
                     "laser_id": lid}, t_s
    if vendor == "ouster":
        return xyz, {"Raw Timestamp": t_s * 1e9, "Signal Photons": inten,
                     "Channel": lid}, t_s
    return xyz, {"Timestamp": t_s, "Intensity": inten, "LaserID": lid}, t_s


@pytest.mark.parametrize("vendor", ["velodyne", "ouster", "hesai"])
def test_autodetect_vendor_time_units(vendor):
    xyz, arrays, t_s = _vendor_arrays(vendor)
    f = cv.autodetect_frame(xyz, arrays)
    assert f["vendor"] == vendor
    assert len(f["xyz"]) == 99  # zero point dropped
    # frame stamp = frame-end time in seconds; per-point time rebased <= 0
    np.testing.assert_allclose(f["stamp"], t_s[-1], atol=2e-5)
    assert np.all(f["time"] <= 1e-6)
    np.testing.assert_allclose(f["time"].min(), t_s[0] - t_s[-1], atol=2e-5)


def test_autodetect_unknown_arrays_raises():
    with pytest.raises(ValueError, match="unable to identify"):
        cv.autodetect_frame(np.zeros((4, 3)), {"foo": np.zeros(4)})


def test_autodetect_laser_id_calibration_remap():
    xyz, arrays, _ = _vendor_arrays("ouster", rings=4)
    # vertical angles out of order: laser 0 is the topmost
    angles = np.array([15.0, -5.0, 5.0, -15.0])
    f = cv.autodetect_frame(xyz, arrays, calibration={"Altitude Angles": angles})
    raw = np.asarray(arrays["Channel"])[np.any(xyz != 0, axis=1)]
    want = np.array([3, 1, 2, 0])[raw]  # bottom-up rank of each laser
    np.testing.assert_array_equal(f["laser_id"], want)


def test_advise_extractor_params():
    from lidarslam_tpu.config import ExtractorConfig

    cfg = ExtractorConfig()  # defaults: gap 50, width 4, min dist 1.5
    assert cv.advise_extractor_params("velodyne", cfg) == []
    assert len(cv.advise_extractor_params("ouster", cfg)) == 2
    assert len(cv.advise_extractor_params("hesai", cfg)) == 3


def test_autodetect_to_slam_end_to_end():
    """Vendor-shaped arrays (Ouster naming, ns timestamps) drive the full
    engine through autodetect_frame."""
    import jax

    jax.config.update("jax_platform_name", "cpu")
    from lidarslam_tpu import Slam
    from lidarslam_tpu.config import ExtractorConfig, MapConfig, SlamConfig
    from lidarslam_tpu.io import synthetic

    frames = synthetic.generate_sequence(n_frames=4, motion_distortion=False)
    cfg = SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024,
                                  max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26))
    slam = Slam(cfg)
    for f in frames:
        # re-encode the synthetic sweep as Ouster-shaped vendor arrays
        raw_t_ns = (np.asarray(f["time"], np.float64) + f["stamp"]) * 1e9
        arrays = {"Raw Timestamp": raw_t_ns,
                  "Signal Photons": f["intensity"],
                  "Channel": f["laser_id"]}
        conv = cv.autodetect_frame(f["xyz"], arrays)
        assert conv["vendor"] == "ouster"
        r = slam.add_frame(conv)
        assert not r.get("failure", False)
    assert r["n_matches"] > 100


def test_robosense_structural_laser_count_overrides_data_max():
    """RS16 remap gating uses the sensor's structural laser count when
    given: a frame whose top beam has no return must still be remapped
    (inferring 15 lasers from ring.max()+1 would silently skip it)."""
    from lidarslam_tpu.io.conversions import RS16_RING_REMAP

    n = 64
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(n, 3)) * 5 + np.array([10.0, 0, 0])
    ring = np.arange(n) % 15          # laser 15 absent this frame
    f = cv.robosense_to_frame(xyz, np.ones(n), ring, stamp=0.0,
                                       n_lasers=16)
    want = np.asarray(RS16_RING_REMAP)[np.arange(n) % 15]
    np.testing.assert_array_equal(f["laser_id"], want)
