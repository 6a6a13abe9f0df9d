"""Unit tests for SE(3) conventions against independent numpy oracles."""

import numpy as np
import pytest

from lidarslam_tpu.core import se3


def _reference_rpy_to_matrix(r, p, y):
    """Independent oracle: R = Rz(y) Ry(p) Rx(r) built from axis rotations."""
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def test_rpy_to_matrix_matches_axis_composition():
    rng = np.random.default_rng(0)
    for _ in range(50):
        r, p, y = rng.uniform(-np.pi, np.pi, 3)
        got = se3.rpy_to_matrix([r, p, y])
        want = _reference_rpy_to_matrix(r, p, y)
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_matrix_to_rpy_roundtrip_and_ranges():
    """The decomposition must land in [-pi,pi]x[-pi/2,pi/2]x[-pi,pi]
    (Utilities.cxx:41-59) and round-trip through rpy_to_matrix."""
    rng = np.random.default_rng(1)
    for _ in range(200):
        # random rotation via QR
        M = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(M)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        rpy = se3.matrix_to_rpy(Q)
        assert -np.pi <= rpy[0] <= np.pi
        assert -np.pi / 2 <= rpy[1] <= np.pi / 2
        assert -np.pi <= rpy[2] <= np.pi
        np.testing.assert_allclose(se3.rpy_to_matrix(rpy), Q, atol=1e-9)


def test_matrix_to_rpy_exact_formula():
    """rx=atan2(R21,R22), ry=-asin(R20), rz=atan2(R10,R00)."""
    R = se3.rpy_to_matrix([0.3, -0.4, 2.0])
    rpy = se3.matrix_to_rpy(R)
    np.testing.assert_allclose(
        rpy,
        [np.arctan2(R[2, 1], R[2, 2]), -np.arcsin(R[2, 0]), np.arctan2(R[1, 0], R[0, 0])],
        atol=1e-12,
    )


def test_hmat_roundtrip_and_inverse():
    pose = np.array([1.0, -2.0, 3.0, 0.2, -0.3, 1.5])
    H = se3.pose_to_hmat(pose)
    np.testing.assert_allclose(se3.hmat_to_pose(H), pose, atol=1e-12)
    np.testing.assert_allclose(se3.hmat_inverse(H) @ H, np.eye(4), atol=1e-12)


def test_interpolation_endpoints_and_midpoint():
    H0 = se3.pose_to_hmat([0, 0, 0, 0, 0, 0])
    H1 = se3.pose_to_hmat([2, 0, 0, 0, 0, np.pi / 2])
    np.testing.assert_allclose(se3.interpolate_hmat(H0, H1, 0.0), H0, atol=1e-12)
    np.testing.assert_allclose(se3.interpolate_hmat(H0, H1, 1.0), H1, atol=1e-9)
    Hm = se3.interpolate_hmat(H0, H1, 0.5)
    np.testing.assert_allclose(Hm[:3, 3], [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(se3.matrix_to_rpy(Hm[:3, :3]), [0, 0, np.pi / 4], atol=1e-9)


def test_interpolation_extrapolates():
    """Constant-velocity extrapolation at t=2 doubles the motion
    (used by Slam::ComputeEgoMotion, Slam.cxx:833)."""
    H0 = se3.pose_to_hmat([0, 0, 0, 0, 0, 0])
    H1 = se3.pose_to_hmat([1, 2, 0, 0, 0, 0.3])
    H2 = se3.interpolate_hmat(H0, H1, 2.0, 0.0, 1.0)
    np.testing.assert_allclose(H2[:3, 3], [2, 4, 0], atol=1e-9)
    np.testing.assert_allclose(se3.matrix_to_rpy(H2[:3, :3])[2], 0.6, atol=1e-9)


def test_interpolation_degenerate_returns_h0():
    H0 = se3.pose_to_hmat([1, 2, 3, 0.1, 0.2, 0.3])
    H1 = se3.pose_to_hmat([9, 9, 9, 1, 1, 1])
    np.testing.assert_allclose(se3.interpolate_hmat(H0, H1, 0.7, 1.0, 1.0), H0)
    np.testing.assert_allclose(se3.interpolate_hmat(H0, H0, 0.7, 0.0, 1.0), H0)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(100):
        M = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(M)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        q = se3.quat_from_matrix(Q)
        np.testing.assert_allclose(se3.quat_to_matrix(q), Q, atol=1e-9)


def test_jax_bindings_match_numpy():
    import jax.numpy as jnp

    pose = np.array([0.5, 1.0, -0.7, 0.1, -0.2, 0.9], dtype=np.float32)
    Rj, tj = se3.jpose_to_rt(jnp.asarray(pose))
    Rn, tn = se3.pose_to_rt(pose)
    np.testing.assert_allclose(np.asarray(Rj), Rn, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tj), tn, atol=1e-6)
    # composition oracle
    pa = np.array([1.0, 0, 0, 0, 0, np.pi / 2], dtype=np.float32)
    pb = np.array([1.0, 0, 0, 0, 0, 0], dtype=np.float32)
    pc = np.asarray(se3.jcompose_pose(jnp.asarray(pa), jnp.asarray(pb)))
    Hc = se3.pose_to_hmat(pa) @ se3.pose_to_hmat(pb)
    np.testing.assert_allclose(se3.pose_to_hmat(pc), Hc, atol=1e-5)


def test_batched_apply_pose():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pose = np.array([1.0, 2.0, 3.0, 0.1, 0.2, 0.3], dtype=np.float32)
    got = np.asarray(se3.japply_pose(jnp.asarray(pose), jnp.asarray(pts)))
    H = se3.pose_to_hmat(pose)
    want = pts @ H[:3, :3].T + H[:3, 3]
    np.testing.assert_allclose(got, want, atol=1e-5)
