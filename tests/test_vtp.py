"""VTK XML PolyData writer (io/vtp.py): format invariants + round-trips.

ParaView itself is not in this environment, so the tests pin the standard
format facts a VTK reader relies on (header/base64 framing, declared
sizes, cell arrays) and round-trip through our minimal reader.
"""

import base64
import struct
import xml.etree.ElementTree as ET

import numpy as np

from lidarslam_tpu.io import vtp


def test_point_cloud_vtp_structure(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-5, 5, (50, 3)).astype(np.float32)
    inten = rng.uniform(0, 255, 50).astype(np.float32)
    p = tmp_path / "cloud.vtp"
    vtp.write_point_cloud_vtp(str(p), xyz, {"Intensity": inten})

    root = ET.parse(p).getroot()
    assert root.get("type") == "PolyData"
    assert root.get("byte_order") == "LittleEndian"
    assert root.get("header_type") == "UInt32"
    piece = root.find("PolyData/Piece")
    assert piece.get("NumberOfPoints") == "50"
    assert piece.get("NumberOfVerts") == "50"
    pts = piece.find("Points/DataArray")
    assert pts.get("type") == "Float32" and pts.get("NumberOfComponents") == "3"
    # inline "binary" = base64( u32 byte-count + payload )
    raw = base64.b64decode(pts.text.strip())
    (nbytes,) = struct.unpack("<I", raw[:4])
    assert nbytes == 50 * 3 * 4 and len(raw) == 4 + nbytes
    np.testing.assert_array_equal(
        np.frombuffer(raw[4:], np.float32).reshape(50, 3), xyz)

    points, pdata, cells = vtp.read_vtp(str(p))
    np.testing.assert_array_equal(points, xyz)
    np.testing.assert_array_equal(pdata["Intensity"], inten)
    conn, offs = cells["verts"]
    np.testing.assert_array_equal(conn, np.arange(50))
    np.testing.assert_array_equal(offs, np.arange(1, 51))


def test_trajectory_vtp_from_slam(tmp_path):
    from lidarslam_tpu import Slam
    from lidarslam_tpu.io import synthetic
    from tests.test_slam_e2e import small_config

    frames = synthetic.generate_sequence(
        n_frames=5, motion_distortion=False,
        sensor=synthetic.SensorModel(range_noise=0.005))
    slam = Slam(small_config())
    for f in frames:
        slam.add_frame(f)
    p = tmp_path / "traj.vtp"
    vtp.write_trajectory_vtp(str(p), slam)

    points, pdata, cells = vtp.read_vtp(str(p))
    assert len(points) == 5
    # the vtkSlam trajectory arrays (vtkSlam.cxx:631-665)
    assert pdata["covariance"].shape == (5, 36)
    assert pdata["quaternion_wxyz"].shape == (5, 4)
    np.testing.assert_allclose(np.linalg.norm(pdata["quaternion_wxyz"], axis=1),
                               1.0, atol=1e-6)
    assert pdata["axis_angle"].shape == (5, 4)
    assert np.all(np.diff(pdata["time"]) > 0)
    # one polyline through all poses
    conn, offs = cells["lines"]
    np.testing.assert_array_equal(conn, np.arange(5))
    np.testing.assert_array_equal(offs, [5])
    # positions match the engine trajectory
    want = np.stack([e["pose"][:3, 3] for e in slam.log_trajectory])
    np.testing.assert_allclose(points, want, atol=1e-5)
