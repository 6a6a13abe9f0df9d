"""Native C++ ingest kernel vs the numpy reference path."""

import numpy as np
import pytest

from lidarslam_tpu.io import native
from lidarslam_tpu.ops.frame import XYZ_QUANT_SCALE


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _data(n=5000, rings=16, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-60, 60, (n, 3)).astype(np.float32)
    inten = rng.uniform(0, 300, n).astype(np.float32)
    lid = rng.integers(-1, rings + 2, n)  # includes out-of-range ids
    t = rng.uniform(0, 0.1, n).astype(np.float32)
    return xyz, inten, lid, t


def _numpy_reference(xyz, inten, lid, t, R, C):
    out_xyz = np.zeros((R, C, 3), np.float32)
    out_int = np.zeros((R, C), np.float32)
    out_time = np.zeros((R, C), np.float32)
    out_valid = np.zeros((R, C), bool)
    counts = np.zeros(R, np.int64)
    for i in range(len(xyz)):
        r = lid[i]
        if r < 0 or r >= R:
            continue
        c = counts[r]
        counts[r] += 1
        if c >= C:
            continue
        out_xyz[r, c] = xyz[i]
        out_int[r, c] = inten[i]
        out_time[r, c] = t[i]
        out_valid[r, c] = True
    return out_xyz, out_int, out_time, out_valid


def test_native_matches_reference_scatter():
    xyz, inten, lid, t = _data()
    R, C = 16, 256  # small C forces overflow handling
    got = native.build_range_image_native(xyz, inten, lid, t, R, C)
    want = _numpy_reference(xyz, inten, lid, t, R, C)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_array_equal(got[2], want[2])
    np.testing.assert_array_equal(got[3].astype(bool), want[3])


def test_native_packed_quantization():
    xyz, inten, lid, t = _data(n=2000)
    R, C = 16, 256
    q, i8, t16, valid = native.build_range_image_packed_native(
        xyz, inten, lid, t, R, C, XYZ_QUANT_SCALE)
    ref_xyz, ref_int, ref_time, ref_valid = _numpy_reference(xyz, inten, lid, t, R, C)
    v = valid.astype(bool)
    np.testing.assert_array_equal(v, ref_valid)
    # dequantized coords within half an LSB
    deq = q.astype(np.float32) * XYZ_QUANT_SCALE
    np.testing.assert_allclose(deq[v], ref_xyz[ref_valid],
                               atol=XYZ_QUANT_SCALE * 0.51)
    # intensity clamped to uint8
    np.testing.assert_array_equal(
        i8[v], np.clip(ref_int[ref_valid], 0, 255).astype(np.uint8))
    # f16 times match numpy's conversion
    np.testing.assert_array_equal(t16[v], ref_time[ref_valid].astype(np.float16))


def test_full_pipeline_uses_native():
    from lidarslam_tpu.ops.frame import (build_range_image, ByteRangeImage,
                                         ensure_range_image)

    xyz, inten, lid, t = _data(n=3000)
    ri = build_range_image(xyz, inten, lid, t, 16, 256, packed=True)
    # packed ingest ships one wire buffer (a single host->device transfer)
    assert isinstance(ri, ByteRangeImage)
    assert ri.shape == (16, 256)
    assert int(np.asarray(ensure_range_image(ri).valid).sum()) > 2000


def test_byte_range_image_roundtrip_matches_unpacked():
    from lidarslam_tpu.ops.frame import build_range_image, ensure_range_image

    xyz, inten, lid, t = _data(n=3000)
    packed = ensure_range_image(build_range_image(xyz, inten, lid, t, 16, 256,
                                                  packed=True))
    plain = build_range_image(xyz, inten, lid, t, 16, 256, packed=False)
    np.testing.assert_array_equal(np.asarray(packed.valid), np.asarray(plain.valid))
    np.testing.assert_allclose(np.asarray(packed.xyz), np.asarray(plain.xyz),
                               atol=XYZ_QUANT_SCALE * 0.51)
    v = np.asarray(plain.valid)
    np.testing.assert_allclose(np.asarray(packed.time)[v],
                               np.asarray(plain.time)[v], rtol=1e-3, atol=2e-4)


def test_flatten_keypoints_view_roundtrip():
    """flatten_keypoints <-> KeypointsView layout contract (the streaming
    keypoint-log wire format)."""
    import jax.numpy as jnp
    from lidarslam_tpu.ops.frame import Keypoints, KeypointsView, flatten_keypoints

    rng = np.random.default_rng(0)
    K = 96
    kp = Keypoints(
        xyz=jnp.asarray(rng.uniform(-5, 5, (K, 3)).astype(np.float32)),
        intensity=jnp.asarray(rng.uniform(0, 255, K).astype(np.float32)),
        time=jnp.asarray(rng.uniform(0, 0.1, K).astype(np.float32)),
        ring=jnp.asarray(rng.integers(0, 64, K).astype(np.int32)),
        valid=jnp.asarray(rng.uniform(size=K) < 0.7),
        count=jnp.int32(42))
    v = KeypointsView(flatten_keypoints(kp))
    assert v.capacity == K
    np.testing.assert_allclose(v.xyz, np.asarray(kp.xyz), rtol=1e-6)
    np.testing.assert_allclose(v.intensity, np.asarray(kp.intensity), rtol=1e-6)
    np.testing.assert_allclose(v.time, np.asarray(kp.time), rtol=1e-6)
    np.testing.assert_array_equal(v.ring, np.asarray(kp.ring))
    np.testing.assert_array_equal(v.valid, np.asarray(kp.valid))
    assert int(v.count) == 42
    assert v.device_nbytes == (7 * K + 1) * 4


def test_packed2_wire_format_matches_python():
    """The C++-assembled windowed wire format (packed2) matches the python
    _pack_planes fallback bit-for-bit on coords/intensity/counts and to one
    u8 quantization step on times."""
    import jax
    import lidarslam_tpu.io.native as nm
    from lidarslam_tpu.ops import frame as fm

    if not nm.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    n = 20000
    xyz = rng.normal(0, 10, (n, 3)).astype(np.float32)
    inten = rng.uniform(0, 300, n).astype(np.float32)
    lid = rng.integers(0, 16, n).astype(np.int64)
    t = rng.uniform(-0.1, 0.0, n).astype(np.float32)

    ri_native = fm.build_range_image(xyz, inten, lid, t, 16, 2048,
                                     packed=True, device=False)
    assert isinstance(ri_native, fm.PackedRangeImage)
    orig = nm.build_range_image_packed2_native
    nm.build_range_image_packed2_native = lambda *a, **k: None
    try:
        ri_py = fm.build_range_image(xyz, inten, lid, t, 16, 2048,
                                     packed=True, device=False)
    finally:
        nm.build_range_image_packed2_native = orig

    u1 = jax.device_get(ri_native.unpack())
    u2 = jax.device_get(ri_py.unpack())
    np.testing.assert_array_equal(np.asarray(u1.valid), np.asarray(u2.valid))
    np.testing.assert_array_equal(np.asarray(u1.xyz), np.asarray(u2.xyz))
    np.testing.assert_array_equal(np.asarray(u1.intensity),
                                  np.asarray(u2.intensity))
    d = np.abs(np.asarray(u1.time) - np.asarray(u2.time)).max()
    assert d < 1e-3, d  # <= one u8 time-quantization step
