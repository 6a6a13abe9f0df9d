"""GPS conversion nodes: inverse UTM, heading-from-motion, odom->GPS.

Parity targets: GpsToUtmNode.cxx:94-263, OdomToGpsNode.cxx:50-135.
"""

import numpy as np
import pytest

from lidarslam_tpu.core import se3
from lidarslam_tpu.io.conversions import gps_to_utm
from lidarslam_tpu.io.gps import GpsToUtmConverter, odom_to_gps, utm_to_gps


def test_utm_roundtrip_northern():
    lat, lon = 45.7640, 4.8357   # Lyon
    e, n, zone, band = gps_to_utm(lat, lon)
    lat2, lon2, _ = utm_to_gps(e, n, zone, band)
    assert abs(float(lat2) - lat) < 1e-8
    assert abs(float(lon2) - lon) < 1e-8


def test_utm_roundtrip_southern():
    lat, lon = -33.8688, 151.2093   # Sydney
    e, n, zone, band = gps_to_utm(lat, lon)
    assert band < "N"
    lat2, lon2, _ = utm_to_gps(e, n, zone, band)
    assert abs(float(lat2) - lat) < 1e-8
    assert abs(float(lon2) - lon) < 1e-8


def test_utm_known_point():
    # On the central meridian of zone 31 (lon=3), easting is exactly 500 km
    # and northing = k0 * meridian arc: 50 N 3 E -> 31U (500000, 5538630.7)
    e, n, zone, band = gps_to_utm(50.0, 3.0)
    assert zone == 31 and band == "U"
    assert abs(e - 500000.0) < 0.01
    assert abs(n - 5538630.7) < 0.5


def _walk_fixes(headings_deg, step=2.0, lat0=45.0, lon0=4.0, alt=100.0):
    """Fixes along a polyline with the given per-segment ENU headings."""
    e0, n0, _, _ = gps_to_utm(lat0, lon0)
    e, n = float(e0), float(n0)
    fixes = [{"lat": lat0, "lon": lon0, "alt": alt, "stamp": 0.0}]
    for i, h in enumerate(np.deg2rad(headings_deg)):
        e += step * np.cos(h)
        n += step * np.sin(h)
        zone = int(np.floor((lon0 + 180) / 6) % 60) + 1
        lat, lon, _ = utm_to_gps(e, n, zone, "N")
        fixes.append({"lat": float(lat), "lon": float(lon), "alt": alt,
                      "stamp": (i + 1) * 0.1})
    return fixes


def test_heading_from_motion():
    conv = GpsToUtmConverter()
    outs = [conv.process(f) for f in _walk_fixes([0.0, 0.0, 0.0])]
    # first fix yields nothing (needs the next position), others lag by one
    assert outs[0] is None
    got = [o for o in outs if o is not None]
    assert len(got) == 3
    for o in got:
        # moving due east => ENU heading ~ 0 (up to UTM roundtrip error)
        assert abs(o["rpy"][2]) < 1e-3
        assert o["frame"] == "utm"
        assert o["zone"] == 31 and o["band"] == "T"


def test_heading_smoothing_at_low_speed():
    # 0.1 m steps: innovation = 0.2, so a 90-degree turn is only partially
    # believed (GpsToUtmNode.cxx:44-49)
    conv = GpsToUtmConverter()
    outs = [conv.process(f)
            for f in _walk_fixes([0.0, 0.0, 90.0], step=0.1)]
    got = [o for o in outs if o is not None]
    yaw = got[-1]["rpy"][2]
    assert 0.05 < yaw < np.pi / 2 - 0.05


def test_time_jump_resets_heading_guess():
    fixes = _walk_fixes([0.0, 0.0])
    fixes[2]["stamp"] += 100.0   # jump before the last segment
    conv = GpsToUtmConverter()
    outs = [conv.process(f) for f in fixes]
    # the fix preceding the jump is never completed/emitted
    assert sum(o is not None for o in outs) < 2


def test_full_orientation_passthrough():
    conv = GpsToUtmConverter()
    out = conv.process({"lat": 45.0, "lon": 4.0, "alt": 0.0, "stamp": 0.0,
                        "roll": 1.0, "pitch": 2.0, "dip": 30.0,
                        "err_roll": 2.0, "speed": 3.5})
    assert out is not None
    assert np.allclose(np.rad2deg(out["rpy"]), [1.0, 2.0, 30.0], atol=1e-9)
    assert out["covariance"][3, 3] == pytest.approx(1.0)   # (2/2)^2
    assert out["speed"] == 3.5


def test_track_bearing_to_enu_heading():
    conv = GpsToUtmConverter()
    # true bearing 90 deg (east) -> ENU heading 0
    out = conv.process({"lat": 45.0, "lon": 4.0, "alt": 0.0, "stamp": 0.0,
                        "track": 90.0})
    assert abs(out["rpy"][2]) < 1e-12


def test_origin_on_first_pose():
    conv = GpsToUtmConverter(origin_on_first_pose=True)
    fixes = _walk_fixes([45.0, 45.0, 45.0])
    outs = [o for o in (conv.process(f) for f in fixes) if o is not None]
    # first emitted pose is the local-map origin with identity rotation
    assert np.allclose(outs[0]["position"], 0.0, atol=1e-9)
    assert np.allclose(outs[0]["rpy"], 0.0, atol=1e-9)
    assert outs[0]["frame"] == "map"
    # subsequent motion is along local +x (heading constant)
    assert outs[1]["position"][0] > 1.0
    assert abs(outs[1]["position"][1]) < 1e-6


def test_odom_to_gps_roundtrip():
    conv = GpsToUtmConverter()
    out = conv.process({"lat": 45.764, "lon": 4.8357, "alt": 200.0,
                        "stamp": 0.0, "track": 30.0})
    pose6 = np.zeros((6, 6))
    pose6[:3, :3] = np.eye(3) * 0.25
    pose6[5, 5] = 0.01
    fix = odom_to_gps(out["position"], quaternion=out["quaternion"],
                      covariance=pose6, zone=conv.zone, band=conv.band)
    assert abs(fix["lat"] - 45.764) < 1e-7
    assert abs(fix["lon"] - 4.8357) < 1e-7
    assert abs(fix["alt"] - 200.0) < 1e-6
    assert abs((fix["track"] % 360.0) - 30.0) < 1e-6
    assert fix["err_dip"] == pytest.approx(0.2)   # sqrt(0.01)*2
    assert np.allclose(fix["position_covariance"], np.eye(3) * 0.25)


def test_odom_to_gps_with_map_to_utm_transform():
    # map frame rotated 90 deg CCW about z and shifted in UTM
    e0, n0, zone, band = gps_to_utm(45.0, 4.0)
    T = np.eye(4)
    T[:3, :3] = se3.rpy_to_matrix(np.array([0.0, 0.0, np.pi / 2]))
    T[:3, 3] = [float(e0), float(n0), 50.0]
    # a pose 100 m along local +x = 100 m UTM north
    fix = odom_to_gps(np.array([100.0, 0.0, 0.0]),
                      rotation=np.eye(3), zone=zone, band=band,
                      T_utm_from_odom=T)
    lat_ref, _, _ = utm_to_gps(e0, float(n0) + 100.0, zone, band)
    assert abs(fix["lat"] - float(lat_ref)) < 1e-9
    assert fix["dip"] == pytest.approx(90.0)      # facing ENU north
    assert fix["track"] == pytest.approx(0.0)     # = true-bearing north


def test_odom_requires_zone():
    with pytest.raises(ValueError):
        odom_to_gps(np.zeros(3), rotation=np.eye(3))


def test_zero_valued_orientation_is_a_measurement():
    """track=0.0 (due north) / roll=pitch=dip=0.0 (level) must be treated
    as supplied measurements, not as 'absent' (truthiness trap)."""
    conv = GpsToUtmConverter()
    out = conv.process({"lat": 45.0, "lon": 4.0, "alt": 0.0, "stamp": 0.0,
                        "track": 0.0})
    assert out is not None                       # emitted immediately
    assert out["rpy"][2] == pytest.approx(np.pi / 2)   # north -> ENU yaw 90
    conv = GpsToUtmConverter()
    out = conv.process({"lat": 45.0, "lon": 4.0, "alt": 0.0, "stamp": 0.0,
                        "roll": 0.0, "pitch": 0.0, "dip": 0.0})
    assert out is not None
    assert np.allclose(out["rpy"], 0.0)


def test_heading_blend_wraps_at_pi():
    """Motion-derived headings straddling the +-pi seam must blend along
    the shortest arc (just-south-of-west stays ~pi, never ~0/east)."""
    # walk just above/below due west: headings alternate around +-pi
    outs = [o for o in (GpsToUtmConverter().process(f) for f in _walk_fixes(
        [179.0, -179.0, 179.0, -179.0], step=0.1)) if o is not None]
    for o in outs[1:]:
        assert abs(o["rpy"][2]) > np.pi - 0.1, o["rpy"]
