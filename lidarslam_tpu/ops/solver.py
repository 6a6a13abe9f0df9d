"""Batched robust Levenberg-Marquardt registration solver.

Replaces Ceres (LocalOptimizer.cxx:74-140 + CeresCostFunctions.h:105-152)
with an explicit 6-DoF [x,y,z,rX,rY,rZ] solver built for the TPU:

- residuals  e_i = A_i (R(rpy) X_i + t - P_i)  with analytic 3x6 Jacobians
  (dR/d(rpy) in the reference's Rz·Ry·Rx convention),
- Tukey robust loss at scale `saturation` applied as IRLS weights
  rho'(s) = (1 - s/a^2)^2 (the exact derivative of Ceres' TukeyLoss, so the
  normal equations match Ceres' robustified Gauss-Newton), scaled by the
  per-match fit-quality weight (ScaledLoss, KeypointsMatcher.cxx:90-101),
- normal equations H = sum w J^T J (6x6), g = sum w J^T e reduced over all
  matches in one batched contraction — the shard axis for multi-chip psum,
- LM damping loop in `lax.while_loop`, termination on Ceres-style relative
  function tolerance; `n_successful_steps` starts at 1 (the initial
  evaluation) so the caller can reproduce the reference's ICP early exit on
  `num_successful_steps == 1` (Slam.cxx:950, 1151),
- pose covariance = pinv of the robust Gauss-Newton Hessian, matching
  Ceres' DENSE_SVD covariance with apply_loss_function=true
  (LocalOptimizer.cxx:112-140).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from lidarslam_tpu.config import SolverConfig
from lidarslam_tpu.core import se3
from lidarslam_tpu.ops.matcher import Matches


def tukey_rho(s, a):
    """Ceres TukeyLoss on squared residual s (KeypointsMatcher.cxx:85-89)."""
    a2 = a * a
    u = jnp.clip(1.0 - s / a2, 0.0, 1.0)
    return a2 / 3.0 * (1.0 - u * u * u)


def tukey_weight(s, a):
    """d rho / d s — the IRLS weight."""
    u = jnp.clip(1.0 - s / (a * a), 0.0, 1.0)
    return u * u


def rotation_derivatives(rpy):
    """dR/d(roll, pitch, yaw) for R = Rz(y) Ry(p) Rx(r), each (3, 3)."""
    r, p, y = rpy[0], rpy[1], rpy[2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    Rx = jnp.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = jnp.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = jnp.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    dRx = jnp.array([[0, 0, 0], [0, -sr, -cr], [0, cr, -sr]])
    dRy = jnp.array([[-sp, 0, cp], [0, 0, 0], [-cp, 0, -sp]])
    dRz = jnp.array([[-sy, -cy, 0], [cy, -sy, 0], [0, 0, 0]])
    return Rz @ Ry @ dRx, Rz @ dRy @ Rx, dRz @ Ry @ Rx


def _extra_terms(extras, pose):
    """Cost/H/g contributions of sensor residual blocks (wheel odometry,
    IMU gravity) — plain scaled least squares, no robust loss, matching the
    reference's ScaledLoss(NULL, weight) wrapping (SensorConstraints.cxx)."""
    from lidarslam_tpu.sensors.constraints import GravityResidual, OdomResidual

    H = jnp.zeros((6, 6))
    g = jnp.zeros((6,))
    cost = jnp.zeros(())
    if not extras:
        return cost, H, g
    R, t = se3.jpose_to_rt(pose)
    dRr, dRp, dRy = rotation_derivatives(pose[3:6])
    for ex in extras:
        w = jnp.where(ex.valid, ex.weight, 0.0)
        if isinstance(ex, OdomResidual):
            m = t - ex.prev_pos
            sq = jnp.sum(m * m)
            norm = jnp.sqrt(jnp.maximum(sq, 1e-12))
            e = jnp.where(sq < 1e-6, 0.0, norm) - ex.distance
            Jt = jnp.where(sq < 1e-6, jnp.zeros(3), m / norm)
            J = jnp.concatenate([Jt, jnp.zeros(3)])          # (6,)
            H = H + w * jnp.outer(J, J)
            g = g + w * J * e
            cost = cost + w * e * e
        elif isinstance(ex, GravityResidual):
            e = R @ ex.g_cur - ex.g_ref                       # (3,)
            Jr = jnp.stack([dRr @ ex.g_cur, dRp @ ex.g_cur, dRy @ ex.g_cur], axis=-1)
            J = jnp.concatenate([jnp.zeros((3, 3)), Jr], axis=-1)  # (3, 6)
            H = H + w * J.T @ J
            g = g + w * J.T @ e
            cost = cost + w * jnp.sum(e * e)
        else:  # pragma: no cover
            raise TypeError(f"unknown extra residual {type(ex)}")
    return cost, H, g


def _apply_sym6(A6, vx, vy, vz):
    """(A v) for symmetric A given as six (Q,) entry planes."""
    a00, a01, a02, a11, a12, a22 = A6
    return (a00 * vx + a01 * vy + a02 * vz,
            a01 * vx + a11 * vy + a12 * vz,
            a02 * vx + a12 * vy + a22 * vz)


def _evaluate(blocks: Sequence[Matches], pose, saturation, axis_name=None, extras=()):
    """Robust cost, normal equations H (6,6) and gradient g (6,) at `pose`.

    Fully structure-of-arrays: every per-match quantity is a (Q,) plane, so
    the whole evaluation fuses into a handful of elementwise+reduce passes.
    The previous (Q,3,6) Jacobian einsums lowered to bf16 batched matmuls
    bracketed by T(4,128) layout copies — ~2.2 ms/frame at 64-beam scale
    for what is arithmetically ~100 flops/match.

    With `axis_name`, the per-shard partial sums are `psum`-reduced over the
    mesh axis — this is the multi-chip reduction point: keypoints shard over
    devices, each chip contributes its 6x6/6 partials over ICI, and every
    chip then solves the same tiny system (SURVEY.md §2.2 P7/P8)."""
    R, t = se3.jpose_to_rt(pose)
    dRs = rotation_derivatives(pose[3:6])
    H = jnp.zeros((6, 6))
    g = jnp.zeros((6,))
    cost = jnp.zeros(())
    for m in blocks:
        xx, xy, xz = m.X[:, 0], m.X[:, 1], m.X[:, 2]
        # d = R X + t - P, per component
        dx = R[0, 0] * xx + R[0, 1] * xy + R[0, 2] * xz + t[0] - m.P[:, 0]
        dy = R[1, 0] * xx + R[1, 1] * xy + R[1, 2] * xz + t[1] - m.P[:, 1]
        dz = R[2, 0] * xx + R[2, 1] * xy + R[2, 2] * xz + t[2] - m.P[:, 2]
        e = _apply_sym6(m.A6, dx, dy, dz)                  # 3 planes
        s = e[0] * e[0] + e[1] * e[1] + e[2] * e[2]
        w = jnp.where(m.valid, m.weight, 0.0)
        irls = w * tukey_weight(s, saturation)
        # J columns (each 3 planes): translation -> columns of symmetric A,
        # rotation -> A (dR/dparam X)
        a00, a01, a02, a11, a12, a22 = m.A6
        cols = [(a00, a01, a02), (a01, a11, a12), (a02, a12, a22)]
        for dR in dRs:
            ux = dR[0, 0] * xx + dR[0, 1] * xy + dR[0, 2] * xz
            uy = dR[1, 0] * xx + dR[1, 1] * xy + dR[1, 2] * xz
            uz = dR[2, 0] * xx + dR[2, 1] * xy + dR[2, 2] * xz
            cols.append(_apply_sym6(m.A6, ux, uy, uz))
        # H = sum_q irls J^T J, g = sum_q irls J^T e — 21 + 6 fused
        # multiply-reduce passes over (Q,) planes
        Hb = [[None] * 6 for _ in range(6)]
        gb = []
        for c in range(6):
            jc = cols[c]
            for d in range(c, 6):
                jd = cols[d]
                Hb[c][d] = Hb[d][c] = jnp.sum(
                    irls * (jc[0] * jd[0] + jc[1] * jd[1] + jc[2] * jd[2]))
            gb.append(jnp.sum(irls * (jc[0] * e[0] + jc[1] * e[1] + jc[2] * e[2])))
        H = H + jnp.stack([jnp.stack(row) for row in Hb])
        g = g + jnp.stack(gb)
        cost = cost + jnp.sum(w * tukey_rho(s, saturation))
    if axis_name is not None:
        # ONE 43-float psum per LM evaluation instead of three (cost, H, g):
        # at ~7 ICP rounds x <=15 LM evals/frame the per-collective latency —
        # not the payload — dominates the SPMD overhead (round-3 VERDICT
        # item 6: +29% at N=8)
        flat = jax.lax.psum(
            jnp.concatenate([cost[None], g, H.reshape(36)]), axis_name)
        cost, g, H = flat[0], flat[1:7], flat[7:].reshape(6, 6)
    # sensor constraints are replicated, added after the cross-shard reduce
    ec, eH, eg = _extra_terms(extras, pose)
    return cost + ec, H + eH, g + eg


class LMResult(NamedTuple):
    pose: jax.Array        # (6,) optimized
    n_success: jax.Array   # () int32 — accepted steps incl. the initial eval
    cost: jax.Array        # () final robust cost
    H: jax.Array           # (6, 6) robust GN Hessian at the solution


_FREE_MASK_2D = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0, 1.0])


def robust_lm(blocks: Sequence[Matches], pose0, saturation, cfg: SolverConfig,
              lm_max_iter: int, axis_name=None, extras=()) -> LMResult:
    """LM minimization of the robustified match cost starting at pose0."""
    # Concatenate the per-type blocks: one fused contraction per LM
    # iteration instead of one per type (the LM while body dominates the
    # streaming step; fewer, larger ops cut its fixed per-op cost).
    if len(blocks) > 1:
        blocks = [Matches(
            A6=jnp.concatenate([b.A6 for b in blocks], axis=1),
            P=jnp.concatenate([b.P for b in blocks]),
            X=jnp.concatenate([b.X for b in blocks]),
            weight=jnp.concatenate([b.weight for b in blocks]),
            status=jnp.concatenate([b.status for b in blocks]),
            valid=jnp.concatenate([b.valid for b in blocks]))]
    # Pin the match blocks: without this barrier XLA sinks their producer
    # graph (k-NN gather + PCA + gates) into the LM while-loop body and
    # re-runs the entire matcher on every LM iteration (~30x per-frame cost,
    # observed via jax.profiler on TPU).
    blocks = jax.lax.optimization_barrier(tuple(blocks))
    if extras:
        extras = jax.lax.optimization_barrier(tuple(extras))
    cost0, H0, g0 = _evaluate(blocks, pose0, saturation, axis_name, extras)

    def cond(st):
        pose, cost, H, g, lam, nsucc, it, done = st
        return (it < lm_max_iter) & ~done

    def body(st):
        pose, cost, H, g, lam, nsucc, it, done0 = st
        D = jnp.maximum(jnp.diag(H), 1e-12)
        Hd = H + lam * jnp.diag(D)
        delta = -jnp.linalg.solve(Hd, g)
        if cfg.two_d_mode:
            delta = delta * _FREE_MASK_2D
        pose_new = pose + delta
        cost_new, H_new, g_new = _evaluate(blocks, pose_new, saturation, axis_name, extras)
        finite = jnp.isfinite(cost_new) & jnp.all(jnp.isfinite(delta))
        # once converged (unrolled form re-enters the body) everything no-ops
        accept = finite & (cost_new < cost) & ~done0
        small_decrease = accept & (cost - cost_new <= cfg.function_tolerance * jnp.maximum(cost, 1e-30))
        pose = jnp.where(accept, pose_new, pose)
        cost = jnp.where(accept, cost_new, cost)
        H = jnp.where(accept, H_new, H)
        g = jnp.where(accept, g_new, g)
        lam = jnp.where(done0, lam,
                        jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12),
                                  jnp.minimum(lam * 4.0, 1e12)))
        nsucc = nsucc + accept.astype(jnp.int32)
        done = done0 | small_decrease | (~accept & ~done0 & (lam >= 1e10))
        return pose, cost, H, g, lam, nsucc, it + 1, done

    init = (pose0, cost0, H0, g0, jnp.asarray(cfg.initial_lm_lambda, pose0.dtype),
            jnp.ones((), jnp.int32), jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    if cfg.lm_unroll > 0:
        # statically unrolled: no while-loop per-iteration overhead (the
        # dominant cost of the fused step on TPU); convergence gates the body
        st = init
        for _ in range(min(cfg.lm_unroll, lm_max_iter)):
            st = body(st)
        pose, cost, H, g, lam, nsucc, it, done = st
    else:
        pose, cost, H, g, lam, nsucc, it, done = jax.lax.while_loop(cond, body, init)
    return LMResult(pose=pose, n_success=nsucc, cost=cost, H=H)


def pose_covariance(H):
    """6x6 pose covariance = pseudo-inverse of the robust GN Hessian."""
    return jnp.linalg.pinv(H, rcond=1e-10, hermitian=True)


class RegistrationError(NamedTuple):
    """LocalOptimizer::RegistrationError parity (LocalOptimizer.h:34-49)."""

    covariance: jax.Array            # (6, 6)
    position_error: jax.Array        # () [m] sqrt of largest position eigval
    position_direction: jax.Array    # (3,)
    orientation_error: jax.Array     # () [deg]
    orientation_direction: jax.Array  # (3,)


def registration_error(H) -> RegistrationError:
    cov = pose_covariance(H)
    lam_p, V_p = jnp.linalg.eigh(cov[:3, :3])
    lam_o, V_o = jnp.linalg.eigh(cov[3:, 3:])
    return RegistrationError(
        covariance=cov,
        position_error=jnp.sqrt(jnp.maximum(lam_p[2], 0.0)),
        position_direction=V_p[:, 2],
        orientation_error=jnp.rad2deg(jnp.sqrt(jnp.maximum(lam_o[2], 0.0))),
        orientation_direction=V_o[:, 2],
    )
