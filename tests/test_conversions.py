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
