"""SE(3) pose math with the reference's exact conventions.

The pose parameterization is the 6-vector [x, y, z, rX, rY, rZ] with
R = Rz(rZ) @ Ry(rY) @ Rx(rX)  (Utilities.cxx:33-38) and the *specific stable
Euler decomposition* with ranges [-pi,pi] x [-pi/2,pi/2] x [-pi,pi]
(Utilities.cxx:41-59):

    rX = atan2(R21, R22);  rY = -asin(R20);  rZ = atan2(R10, R00)

which the reference deliberately uses for optimizer stability — the solver in
ops/solver.py optimizes exactly these 6 parameters, so the convention is
load-bearing and covered by unit tests against the formulas above.

Pose interpolation is linear translation + quaternion slerp between two
timestamped isometries (MotionModel.h:115-124), returning H0 for degenerate
inputs (t0==t1 or H0~H1).

Every function is written generically over the array namespace so the same
formulas run in host numpy (float64 — trajectory bookkeeping) and in
jax.numpy (float32 — jitted kernels). The jnp variants are exported with a
``j`` prefix, numpy variants with no prefix.
"""

from __future__ import annotations

import numpy as _np
import jax.numpy as _jnp


# -----------------------------------------------------------------------------
# Generic implementations (xp = numpy or jax.numpy)
# -----------------------------------------------------------------------------

def _rpy_to_matrix(xp, rpy):
    """(..., 3) roll/pitch/yaw -> (..., 3, 3) with R = Rz @ Ry @ Rx."""
    rpy = xp.asarray(rpy)
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = xp.cos(r), xp.sin(r)
    cp, sp = xp.cos(p), xp.sin(p)
    cy, sy = xp.cos(y), xp.sin(y)
    row0 = xp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = xp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = xp.stack([-sp, cp * sr, cp * cr], axis=-1)
    return xp.stack([row0, row1, row2], axis=-2)


def _matrix_to_rpy(xp, R):
    """(..., 3, 3) -> (..., 3) rpy in [-pi,pi]x[-pi/2,pi/2]x[-pi,pi]."""
    R = xp.asarray(R)
    rx = xp.arctan2(R[..., 2, 1], R[..., 2, 2])
    ry = -xp.arcsin(xp.clip(R[..., 2, 0], -1.0, 1.0))
    rz = xp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return xp.stack([rx, ry, rz], axis=-1)


def _pose_to_rt(xp, pose):
    """(..., 6) xyzrpy -> ((..., 3, 3) rotation, (..., 3) translation)."""
    pose = xp.asarray(pose)
    return _rpy_to_matrix(xp, pose[..., 3:6]), pose[..., 0:3]


def _rt_to_pose(xp, R, t):
    return xp.concatenate([xp.asarray(t), _matrix_to_rpy(xp, R)], axis=-1)


def _quat_from_matrix(xp, R):
    """(..., 3, 3) -> (..., 4) quaternion (w, x, y, z), branch-free.

    Uses the 4-branch Shepperd method evaluated on all branches and selected
    by mask so it vectorizes/jits cleanly.
    """
    R = xp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(v):
        return xp.sqrt(xp.maximum(v, 1e-30))

    # branch 0: trace dominant
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = xp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    # branch 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = xp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # branch 2: m11 dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = xp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # branch 3: m22 dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = xp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    use0 = (tr > 0.0)[..., None]
    use1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    use2 = (m11 >= m22)[..., None]
    q = xp.where(use0, q0, xp.where(use1, q1, xp.where(use2, q2, q3)))
    norm = xp.sqrt(xp.sum(q * q, axis=-1, keepdims=True))
    return q / xp.maximum(norm, 1e-30)


def _quat_to_matrix(xp, q):
    """(..., 4) (w,x,y,z) unit quaternion -> (..., 3, 3)."""
    q = xp.asarray(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = xp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1)
    row1 = xp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1)
    row2 = xp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return xp.stack([row0, row1, row2], axis=-2)


def _quat_slerp(xp, q0, q1, u):
    """Slerp between quaternions, shortest arc; u broadcastable (...,)."""
    q0 = xp.asarray(q0)
    q1 = xp.asarray(q1)
    u = xp.asarray(u)[..., None]
    dot = xp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = xp.where(dot < 0.0, -q1, q1)
    dot = xp.abs(dot)
    dot = xp.clip(dot, -1.0, 1.0)
    theta = xp.arccos(dot)
    sin_theta = xp.sin(theta)
    # fall back to lerp for tiny angles
    small = sin_theta < 1e-6
    w0 = xp.where(small, 1.0 - u, xp.sin((1.0 - u) * theta) / xp.where(small, 1.0, sin_theta))
    w1 = xp.where(small, u, xp.sin(u * theta) / xp.where(small, 1.0, sin_theta))
    q = w0 * q0 + w1 * q1
    norm = xp.sqrt(xp.sum(q * q, axis=-1, keepdims=True))
    return q / xp.maximum(norm, 1e-30)


def _interpolate_rt(xp, R0, t0v, R1, t1v, t, t0, t1):
    """Linear translation + slerp rotation between (R0,t0v)@t0 and (R1,t1v)@t1
    evaluated at times t (broadcastable). Extrapolates outside [t0, t1].
    (MotionModel.h:115-124, MotionModel.cxx:27-35)."""
    u = (xp.asarray(t) - t0) / (t1 - t0)
    q0 = _quat_from_matrix(xp, R0)
    q1 = _quat_from_matrix(xp, R1)
    q = _quat_slerp(xp, q0, q1, u)
    R = _quat_to_matrix(xp, q)
    tv = xp.asarray(t0v) + u[..., None] * (xp.asarray(t1v) - xp.asarray(t0v))
    return R, tv


# -----------------------------------------------------------------------------
# numpy (host, float64) bindings
# -----------------------------------------------------------------------------

def rpy_to_matrix(rpy):
    return _rpy_to_matrix(_np, _np.asarray(rpy, dtype=_np.float64))


def matrix_to_rpy(R):
    return _matrix_to_rpy(_np, _np.asarray(R, dtype=_np.float64))


def pose_to_rt(pose):
    return _pose_to_rt(_np, _np.asarray(pose, dtype=_np.float64))


def rt_to_pose(R, t):
    return _rt_to_pose(_np, R, t)


def pose_to_hmat(pose):
    """(6,) xyzrpy -> (4, 4) homogeneous matrix."""
    R, t = pose_to_rt(pose)
    H = _np.eye(4)
    H[:3, :3] = R
    H[:3, 3] = t
    return H


def hmat_to_pose(H):
    H = _np.asarray(H, dtype=_np.float64)
    return rt_to_pose(H[:3, :3], H[:3, 3])


def hmat_inverse(H):
    H = _np.asarray(H, dtype=_np.float64)
    Hi = _np.eye(4)
    R = H[:3, :3]
    Hi[:3, :3] = R.T
    Hi[:3, 3] = -R.T @ H[:3, 3]
    return Hi


def interpolate_hmat(H0, H1, t, t0=0.0, t1=1.0):
    """Interpolate/extrapolate between two (4,4) isometries.

    Returns H0 when t0==t1 or H0~H1 (degenerate-case behavior of
    MotionModel.h:115-124)."""
    H0 = _np.asarray(H0, dtype=_np.float64)
    H1 = _np.asarray(H1, dtype=_np.float64)
    if abs(t1 - t0) < 1e-12 or _np.allclose(H0, H1, atol=1e-12):
        return H0.copy()
    R, tv = _interpolate_rt(_np, H0[:3, :3], H0[:3, 3], H1[:3, :3], H1[:3, 3],
                            _np.float64(t), t0, t1)
    H = _np.eye(4)
    H[:3, :3] = R
    H[:3, 3] = tv
    return H


def hat(w):
    """(3,) -> (3, 3) skew-symmetric cross-product matrix."""
    w = _np.asarray(w, dtype=_np.float64)
    return _np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])


def so3_log(R):
    """Rotation matrix -> rotation vector (angle * axis)."""
    R = _np.asarray(R, dtype=_np.float64)
    c = _np.clip((_np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = _np.arccos(c)
    if theta < 1e-9:
        return _np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) / 2.0
    if abs(_np.pi - theta) < 1e-6:
        # near pi: use the symmetric part
        A = (R + _np.eye(3)) / 2.0
        axis = _np.sqrt(_np.maximum(_np.diag(A), 0.0))
        # fix signs from off-diagonals
        if A[0, 1] < 0:
            axis[1] = -axis[1]
        if A[0, 2] < 0:
            axis[2] = -axis[2]
        return theta * axis / max(_np.linalg.norm(axis), 1e-12)
    v = _np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return theta / (2.0 * _np.sin(theta)) * v


def so3_exp(w):
    """Rotation vector -> rotation matrix (Rodrigues)."""
    w = _np.asarray(w, dtype=_np.float64)
    theta = _np.linalg.norm(w)
    W = hat(w)
    if theta < 1e-9:
        return _np.eye(3) + W
    return (_np.eye(3) + _np.sin(theta) / theta * W
            + (1 - _np.cos(theta)) / theta**2 * (W @ W))


def se3_log(H):
    """(4,4) isometry -> (6,) twist [rho, phi] with H = exp([rho, phi])."""
    H = _np.asarray(H, dtype=_np.float64)
    phi = so3_log(H[:3, :3])
    theta = _np.linalg.norm(phi)
    W = hat(phi)
    if theta < 1e-9:
        Vinv = _np.eye(3) - 0.5 * W
    else:
        Vinv = (_np.eye(3) - 0.5 * W
                + (1.0 / theta**2 - (1.0 + _np.cos(theta)) / (2.0 * theta * _np.sin(theta)))
                * (W @ W))
    return _np.concatenate([Vinv @ H[:3, 3], phi])


def se3_exp(xi):
    """(6,) twist [rho, phi] -> (4,4) isometry."""
    xi = _np.asarray(xi, dtype=_np.float64)
    rho, phi = xi[:3], xi[3:]
    theta = _np.linalg.norm(phi)
    W = hat(phi)
    R = so3_exp(phi)
    if theta < 1e-9:
        V = _np.eye(3) + 0.5 * W
    else:
        V = (_np.eye(3) + (1 - _np.cos(theta)) / theta**2 * W
             + (theta - _np.sin(theta)) / theta**3 * (W @ W))
    H = _np.eye(4)
    H[:3, :3] = R
    H[:3, 3] = V @ rho
    return H


def adjoint(H):
    """(4,4) -> (6,6) adjoint of SE(3) for [rho, phi] twist order."""
    H = _np.asarray(H, dtype=_np.float64)
    R = H[:3, :3]
    t = H[:3, 3]
    Ad = _np.zeros((6, 6))
    Ad[:3, :3] = R
    Ad[:3, 3:] = hat(t) @ R
    Ad[3:, 3:] = R
    return Ad


def quat_from_matrix(R):
    return _quat_from_matrix(_np, _np.asarray(R, dtype=_np.float64))


def quat_to_matrix(q):
    return _quat_to_matrix(_np, _np.asarray(q, dtype=_np.float64))


# -----------------------------------------------------------------------------
# jax.numpy (device) bindings
# -----------------------------------------------------------------------------

def jrpy_to_matrix(rpy):
    return _rpy_to_matrix(_jnp, rpy)


def jmatrix_to_rpy(R):
    return _matrix_to_rpy(_jnp, R)


def jpose_to_rt(pose):
    return _pose_to_rt(_jnp, pose)


def jrt_to_pose(R, t):
    return _rt_to_pose(_jnp, R, t)


def jquat_from_matrix(R):
    return _quat_from_matrix(_jnp, R)


def jquat_to_matrix(q):
    return _quat_to_matrix(_jnp, q)


def jquat_slerp(q0, q1, u):
    return _quat_slerp(_jnp, q0, q1, u)


def jinterpolate_rt(R0, t0v, R1, t1v, t, t0, t1):
    return _interpolate_rt(_jnp, R0, t0v, R1, t1v, t, t0, t1)


def japply_pose(pose, pts):
    """Apply (6,) xyzrpy pose to (..., 3) points."""
    R, t = jpose_to_rt(pose)
    return pts @ R.T + t


def jcompose_pose(pose_a, pose_b):
    """Pose of (A @ B) where A, B are xyzrpy 6-vectors."""
    Ra, ta = jpose_to_rt(pose_a)
    Rb, tb = jpose_to_rt(pose_b)
    return jrt_to_pose(Ra @ Rb, Ra @ tb + ta)


# -----------------------------------------------------------------------------
# Batched SE(3) Lie ops (device, branch-free) — the building blocks of the
# device-side pose-graph backend (backend/posegraph.py). All functions accept
# leading batch dimensions and follow the input dtype (run under
# jax.experimental.enable_x64 for float64 graphs).
# -----------------------------------------------------------------------------

def jhat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrices."""
    z = _jnp.zeros_like(w[..., 0])
    return _jnp.stack([
        _jnp.stack([z, -w[..., 2], w[..., 1]], -1),
        _jnp.stack([w[..., 2], z, -w[..., 0]], -1),
        _jnp.stack([-w[..., 1], w[..., 0], z], -1)], -2)


def jso3_log(R):
    """(..., 3, 3) -> (..., 3) rotation vectors, branch-free.

    Accurate for |theta| < pi - 1e-3 (pose-graph residuals and consecutive
    relative motions are far inside this domain); the exact-pi axis ambiguity
    is not handled."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    c = _jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = _jnp.arccos(c)
    v = _jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                    R[..., 0, 2] - R[..., 2, 0],
                    R[..., 1, 0] - R[..., 0, 1]], -1)
    s = _jnp.sin(theta)
    small = theta < 1e-5
    big = theta > _jnp.pi - 1e-3
    # theta / (2 sin theta); Taylor 0.5 + theta^2/12 near 0
    f = _jnp.where(small, 0.5 + theta * theta / 12.0,
                   theta / _jnp.maximum(2.0 * s, 1e-20))
    general = f[..., None] * v
    # near pi: axis from the symmetric part's diagonal, signs from v
    A = 0.5 * (R + _jnp.eye(3, dtype=R.dtype))
    diag = _jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], -1)
    axis = _jnp.sqrt(_jnp.clip(diag, 0.0, None))
    sign = _jnp.where(v >= 0, 1.0, -1.0)
    axis = axis * sign
    axis = axis / _jnp.maximum(_jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    return _jnp.where(big[..., None], theta[..., None] * axis, general)


def jso3_exp(w):
    """(..., 3) rotation vectors -> (..., 3, 3) matrices (Rodrigues)."""
    theta2 = _jnp.sum(w * w, -1)
    theta = _jnp.sqrt(_jnp.maximum(theta2, 1e-40))
    W = jhat(w)
    W2 = W @ W
    small = theta2 < 1e-12
    a = _jnp.where(small, 1.0 - theta2 / 6.0, _jnp.sin(theta) / theta)
    b = _jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - _jnp.cos(theta)) / theta2)
    eye = _jnp.broadcast_to(_jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def jse3_log(H):
    """(..., 4, 4) -> (..., 6) twists [rho, phi] (se3_log parity)."""
    phi = jso3_log(H[..., :3, :3])
    theta2 = _jnp.sum(phi * phi, -1)
    theta = _jnp.sqrt(_jnp.maximum(theta2, 1e-40))
    W = jhat(phi)
    W2 = W @ W
    small = theta2 < 1e-12
    s, c = _jnp.sin(theta), _jnp.cos(theta)
    coef = _jnp.where(small, 1.0 / 12.0,
                      1.0 / _jnp.maximum(theta2, 1e-40)
                      - (1.0 + c) / _jnp.maximum(2.0 * theta * s, 1e-20))
    eye = _jnp.broadcast_to(_jnp.eye(3, dtype=H.dtype), W.shape)
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    rho = _jnp.einsum("...ij,...j->...i", Vinv, H[..., :3, 3])
    return _jnp.concatenate([rho, phi], -1)


def jse3_exp(xi):
    """(..., 6) twists [rho, phi] -> (..., 4, 4) isometries."""
    rho, phi = xi[..., :3], xi[..., 3:]
    theta2 = _jnp.sum(phi * phi, -1)
    theta = _jnp.sqrt(_jnp.maximum(theta2, 1e-40))
    W = jhat(phi)
    W2 = W @ W
    R = jso3_exp(phi)
    small = theta2 < 1e-12
    b = _jnp.where(small, 0.5 - theta2 / 24.0,
                   (1.0 - _jnp.cos(theta)) / _jnp.maximum(theta2, 1e-40))
    cc = _jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                    (theta - _jnp.sin(theta)) / _jnp.maximum(theta2 * theta, 1e-40))
    eye = _jnp.broadcast_to(_jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b[..., None, None] * W + cc[..., None, None] * W2
    t = _jnp.einsum("...ij,...j->...i", V, rho)
    top = _jnp.concatenate([R, t[..., None]], -1)
    bottom = _jnp.broadcast_to(
        _jnp.asarray([0.0, 0.0, 0.0, 1.0], xi.dtype), top[..., :1, :].shape)
    return _jnp.concatenate([top, bottom], -2)


def jhmat_inverse(H):
    """(..., 4, 4) isometry inverse."""
    R = H[..., :3, :3]
    t = H[..., :3, 3]
    Rt = _jnp.swapaxes(R, -1, -2)
    ti = -_jnp.einsum("...ij,...j->...i", Rt, t)
    top = _jnp.concatenate([Rt, ti[..., None]], -1)
    bottom = _jnp.broadcast_to(
        _jnp.asarray([0.0, 0.0, 0.0, 1.0], H.dtype), top[..., :1, :].shape)
    return _jnp.concatenate([top, bottom], -2)


def jadjoint(H):
    """(..., 4, 4) -> (..., 6, 6) SE(3) adjoints for [rho, phi] order."""
    R = H[..., :3, :3]
    tW = jhat(H[..., :3, 3])
    z = _jnp.zeros_like(R)
    top = _jnp.concatenate([R, tW @ R], -1)
    bot = _jnp.concatenate([z, R], -1)
    return _jnp.concatenate([top, bot], -2)
