"""PCL `binary_compressed` PCD interop (PointCloudStorage.h:249-312).

Covers: the LZF codec (native + pure-Python fallback, cross-checked, plus a
hand-built stream pinning the wire format conventions), field-major PCD
round-trips, and Slam.save_maps_to_pcd/load_maps_from_pcd with compression.
"""

import numpy as np
import pytest

from lidarslam_tpu.io import lzf, pcd


def test_lzf_known_vector():
    # literal 'a' (ctrl 0x00), then back-ref: l=6 -> len 8, off=0 -> dist 1
    assert lzf.decompress(b"\x00a\xc0\x00", 9) == b"a" * 9
    # extended length: l=7+3 -> len 12
    assert lzf.decompress(b"\x00b\xe0\x03\x00", 13) == b"b" * 13


@pytest.mark.parametrize("n", [0, 1, 5, 1000, 65537])
def test_lzf_roundtrip_random(n):
    rng = np.random.default_rng(n)
    # mix of compressible (repeated structure) and incompressible bytes
    a = rng.integers(0, 4, n // 2, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, n - n // 2, dtype=np.uint8).tobytes()
    data = a + b
    comp = lzf.compress(data)
    assert lzf.decompress(comp, len(data)) == data


def test_lzf_python_fallback_matches_native():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 8, 4096, dtype=np.uint8).tobytes() * 3
    comp_native = lzf.compress(data)
    comp_py = lzf._compress_py(data)
    # both encoders produce valid streams decoding to the same data,
    # under BOTH decoders
    for comp in (comp_native, comp_py):
        assert lzf._decompress_py(comp, len(data)) == data
        assert lzf.decompress(comp, len(data)) == data


def test_lzf_compresses_structured_data():
    data = (b"\x01\x02\x03\x04" * 5000)
    comp = lzf.compress(data)
    assert len(comp) < len(data) // 4


def test_pcd_binary_compressed_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 1234
    xyz = rng.normal(0, 10, (n, 3)).astype(np.float32)
    inten = rng.uniform(0, 255, n).astype(np.float32)
    t = rng.uniform(0, 0.1, n).astype(np.float64)
    lid = rng.integers(0, 16, n).astype(np.uint16)
    label = rng.integers(0, 2, n).astype(np.uint8)

    p = tmp_path / "cloud.pcd"
    pcd.save_pcd(p, xyz, intensity=inten, time=t, laser_id=lid, label=label,
                 compressed=True)
    out = pcd.load_pcd(p)
    np.testing.assert_array_equal(out["xyz"], xyz)
    np.testing.assert_array_equal(out["intensity"], inten)
    np.testing.assert_array_equal(out["time"], t)
    np.testing.assert_array_equal(out["laser_id"], lid)
    np.testing.assert_array_equal(out["label"], label)

    # compressed encoding declared in the header, and smaller than binary
    # on a quantized (repetitive-byte) cloud
    header = p.read_bytes()[:400]
    assert b"DATA binary_compressed" in header

    pq = tmp_path / "cloud_q.pcd"
    xyz_q = np.round(xyz).astype(np.float32)
    pcd.save_pcd(pq, xyz_q, intensity=np.zeros(n, np.float32), compressed=True)
    pb = tmp_path / "cloud_b.pcd"
    pcd.save_pcd(pb, xyz_q, intensity=np.zeros(n, np.float32), binary=True)
    assert pq.stat().st_size < pb.stat().st_size


def test_pcd_fields_compressed_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(0, 5, (77, 3)).astype(np.float32)
    extra = {"curvature": rng.uniform(0, 1, 77).astype(np.float32)}
    p = tmp_path / "dbg.pcd"
    pcd.save_pcd_fields(p, xyz, extra=extra, compressed=True)
    out = pcd.load_pcd(p)
    np.testing.assert_array_equal(out["xyz"], xyz)
    np.testing.assert_array_equal(out["curvature"], extra["curvature"])


def test_slam_maps_compressed_roundtrip(tmp_path):
    import jax

    jax.config.update("jax_platform_name", "cpu")
    from lidarslam_tpu import Slam, SlamConfig
    from lidarslam_tpu.io import synthetic

    frames = synthetic.generate_sequence(n_frames=3, motion_distortion=False)
    slam = Slam(SlamConfig())
    for f in frames:
        slam.add_frame(f)
    prefix = str(tmp_path / "map_")
    slam.save_maps_to_pcd(prefix, compressed=True)

    from lidarslam_tpu.config import KEYPOINT_NAMES, Keypoint

    n_src = len(slam.get_map_points(Keypoint.PLANE)[0])
    assert n_src > 100

    slam2 = Slam(SlamConfig())
    slam2.load_maps_from_pcd(prefix)
    n_dst = len(slam2.get_map_points(Keypoint.PLANE)[0])
    assert n_dst == n_src
