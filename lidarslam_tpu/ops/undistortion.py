"""Within-sweep motion undistortion (rolling-shutter correction).

Device-side equivalent of the reference's WithinFrameMotion machinery
(Slam.cxx:1271-1352 + MotionModel.h): the scan pose is interpolated between
the previous and current frame poses, the BASE-frame motion over the sweep's
[time0, time1] point-time range is extracted, and every keypoint is warped by
the slerp-interpolated transform at its own timestamp.

One deliberate deviation: the reference incrementally re-warps the already-
undistorted cloud by (new o prev^-1) interpolators each refinement
(Slam.cxx:1336-1351); we always warp the *raw* keypoints by the absolute
current interpolator, which avoids compounding slerp-of-composition error
and keeps the refinement a pure function of the current pose estimate —
which is what lets it live inside the jitted ICP loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from lidarslam_tpu.core import se3


class WarpParams(NamedTuple):
    """BASE-frame sweep motion: H(time0) = (q0, t0v), H(time1) = (q1, t1v)."""

    q0: jnp.ndarray   # (4,) quaternion wxyz
    t0v: jnp.ndarray  # (3,)
    q1: jnp.ndarray   # (4,)
    t1v: jnp.ndarray  # (3,)
    time0: jnp.ndarray  # ()
    time1: jnp.ndarray  # ()
    enabled: jnp.ndarray  # () bool — False => identity warp


def jinterpolate_pose(pose_a, pose_b, t, ta, tb, max_ratio):
    """Device pose interpolation/extrapolation between xyzrpy poses.

    Mirrors Slam::InterpolateScanPose (Slam.cxx:1271-1285): returns pose_b
    when extrapolating farther than max_ratio or when the time base is
    degenerate."""
    Ra, tva = se3.jpose_to_rt(pose_a)
    Rb, tvb = se3.jpose_to_rt(pose_b)
    span = tb - ta
    safe_span = jnp.where(jnp.abs(span) < 1e-9, 1.0, span)
    R, tv = se3.jinterpolate_rt(Ra, tva, Rb, tvb, t, tb - safe_span, tb)
    bad = (jnp.abs(span) < 1e-9) | (jnp.abs((t - tb) / safe_span) > max_ratio)
    R = jnp.where(bad, Rb, R)
    tv = jnp.where(bad, tvb, tv)
    return R, tv


def compute_warp(prev_pose, cur_pose, t_prev, t_cur, time0, time1, max_ratio) -> WarpParams:
    """BASE-frame within-sweep motion from the (prev, cur) world pose pair.

    H_base(time) = cur_pose^-1 o interp(prev_pose, cur_pose)(t_cur + time)
    evaluated at the sweep's first/last point times (Slam.cxx:1322-1334)."""
    Rc, tc = se3.jpose_to_rt(cur_pose)

    def base_motion(time):
        Rw, tw = jinterpolate_pose(prev_pose, cur_pose, t_cur + time, t_prev, t_cur,
                                   max_ratio)
        Rb = Rc.T @ Rw
        tb = Rc.T @ (tw - tc)
        return se3.jquat_from_matrix(Rb), tb

    q0, t0v = base_motion(time0)
    q1, t1v = base_motion(time1)
    enabled = (time1 - time0) > 1e-6
    return WarpParams(q0=q0, t0v=t0v, q1=q1, t1v=t1v,
                      time0=jnp.asarray(time0), time1=jnp.asarray(time1),
                      enabled=jnp.asarray(enabled))


def identity_warp() -> WarpParams:
    return WarpParams(q0=jnp.array([1.0, 0, 0, 0]), t0v=jnp.zeros(3),
                      q1=jnp.array([1.0, 0, 0, 0]), t1v=jnp.zeros(3),
                      time0=jnp.zeros(()), time1=jnp.ones(()),
                      enabled=jnp.zeros((), bool))


def warp_points(xyz, times, w: WarpParams):
    """Apply the per-point slerp warp: p' = H(time_p) p (batched)."""
    span = jnp.where(w.enabled, w.time1 - w.time0, 1.0)
    u = jnp.clip((times - w.time0) / span, -2.0, 3.0)
    q = se3.jquat_slerp(jnp.broadcast_to(w.q0, (xyz.shape[0], 4)),
                        jnp.broadcast_to(w.q1, (xyz.shape[0], 4)), u)
    R = se3.jquat_to_matrix(q)                        # (N, 3, 3)
    tv = w.t0v + u[:, None] * (w.t1v - w.t0v)
    out = jnp.einsum("nij,nj->ni", R, xyz) + tv
    return jnp.where(w.enabled, out, xyz)
