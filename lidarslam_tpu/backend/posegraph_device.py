"""Device-side (JAX) pose-graph optimization — the scalable backend.

Same graph and semantics as `backend/posegraph.py` (the numpy oracle;
reference PoseGraphOptimization.cxx:112-285): SE(3) chain edges weighted by
inverse SLAM covariances, 3-D GPS priors through the GPS<->sensor offset, a
gauge prior when no GPS is present, constant-damped Gauss-Newton with a
function-tolerance stop. Everything is batched:

- residual/Jacobian assembly is one `vmap`-shaped batch over all chain edges
  and all GPS edges (batched SE(3) log/exp/adjoint from core/se3.py),
- the block-tridiagonal normal system is solved either by a `lax.scan`
  forward/backward block-LDL sweep (exact, sequential over poses), or by a
  **segment-Schur (domain-decomposition) solve**: the chain is split into S
  contiguous segments whose interiors are eliminated *in parallel* (vmap),
  the reduced (S-1)-separator system — itself block tridiagonal — is solved
  by the scan sweep, and interiors back-substitute in parallel. This is the
  split a multi-host partitioning consumes: each host owns a keyframe-range
  segment, eliminates it locally, and only the tiny separator system needs
  cross-host reduction (SURVEY.md §7 hard-part 6).

Numerics: pose graphs carry world-scale coordinates (UTM magnitudes after
GPS alignment), so the solve runs in float64 under
`jax.experimental.enable_x64` — scoped to these calls only.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lidarslam_tpu.backend import registration
from lidarslam_tpu.backend.posegraph import PoseGraphConfig, _closest
from lidarslam_tpu.core import se3


# -----------------------------------------------------------------------------
#   Block-tridiagonal solvers
# -----------------------------------------------------------------------------

def solve_block_tridiag_scan(D, U, rhs):
    """Exact block-LDL solve of the symmetric block-tridiagonal system.

    D: (N, 6, 6) diagonal blocks, U: (N-1, 6, 6) super-diagonal blocks
    (sub-diagonal = U^T), rhs: (N, 6, r) or (N, 6). Returns x, same shape as
    rhs. Sequential `lax.scan` over N — each step is 6x6 work.
    """
    squeeze = rhs.ndim == 2
    if squeeze:
        rhs = rhs[..., None]
    N = D.shape[0]
    if N == 1:
        x = jnp.linalg.solve(D[0], rhs[0])[None]
        return x[..., 0] if squeeze else x

    def fwd(carry, inp):
        C_prev, y_prev = carry
        Di, Ui_prev, ri = inp
        G = jnp.linalg.solve(C_prev.T, Ui_prev).T      # U^T C^-1
        Ci = Di - G @ Ui_prev
        yi = ri - G @ y_prev
        return (Ci, yi), (Ci, yi)

    (CN, yN), (Cs, ys) = jax.lax.scan(
        fwd, (D[0], rhs[0]), (D[1:], U, rhs[1:]))
    C_all = jnp.concatenate([D[:1], Cs])
    y_all = jnp.concatenate([rhs[:1], ys])

    xN = jnp.linalg.solve(CN, yN)

    def bwd(x_next, inp):
        Ci, yi, Ui = inp
        xi = jnp.linalg.solve(Ci, yi - Ui @ x_next)
        return xi, xi

    _, xs_rev = jax.lax.scan(bwd, xN, (C_all[:-1][::-1], y_all[:-1][::-1],
                                       U[::-1]))
    x = jnp.concatenate([xs_rev[::-1], xN[None]])
    return x[..., 0] if squeeze else x


@partial(jax.jit, static_argnames=("n_segments", "mesh"))
def solve_block_tridiag_schur(D, U, rhs, n_segments: int, mesh=None):
    """Segment-Schur solve: parallel interior elimination, scan on the
    (n_segments - 1)-separator reduced system, parallel back-substitution.

    Exact (up to roundoff) for any symmetric positive-definite block
    tridiagonal system. The chain is padded with decoupled identity blocks
    so every segment interior has equal length m (padding unknowns solve to
    zero and cannot affect the rest: their couplings are zero).

    With `mesh` (a jax.sharding.Mesh), the per-segment interior work — the
    dominant cost, eliminated here by vmap — is SHARDED over the mesh's
    devices via GSPMD sharding constraints: each device owns a contiguous
    range of segments (the keyframe-range partitioning of SURVEY §7
    hard-part 6), eliminates its interiors locally, and only the tiny
    (S-1)-separator system is solved replicated. Cross-device traffic is
    the segment-endpoint blocks only.
    """
    squeeze = rhs.ndim == 2
    if squeeze:
        rhs = rhs[..., None]
    N, B = D.shape[0], D.shape[1]
    r = rhs.shape[-1]
    S = n_segments
    if S <= 1 or N < 2 * S:
        x = solve_block_tridiag_scan(D, U, rhs)
        return x[..., 0] if squeeze else x

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        seg_axis = mesh.axis_names[0]
        _seg_sharding = NamedSharding(mesh, PartitionSpec(seg_axis))

        def shard_segments(a):
            return jax.lax.with_sharding_constraint(a, _seg_sharding)
    else:
        def shard_segments(a):
            return a

    # layout: [int_0 (m) | sep_0 | int_1 (m) | sep_1 | ... | int_{S-1} (m)]
    m = -(-(N - (S - 1)) // S)
    Np = S * (m + 1) - 1
    padD = jnp.broadcast_to(jnp.eye(B, dtype=D.dtype), (Np - N, B, B))
    D_p = jnp.concatenate([D, padD])
    U_p = jnp.concatenate([U, jnp.zeros((Np - N, B, B), U.dtype)])  # len Np-1 -> pad to Np
    rhs_p = jnp.concatenate([rhs, jnp.zeros((Np - N, B, r), rhs.dtype)])

    # reshape into per-segment rows of length m+1: [m interiors, 1 separator]
    D_rows = jnp.concatenate([D_p, jnp.zeros((1, B, B), D.dtype)]).reshape(S, m + 1, B, B)
    U_rows = jnp.concatenate([U_p, jnp.zeros((2, B, B), U.dtype)]).reshape(S, m + 1, B, B)
    r_rows = jnp.concatenate([rhs_p, jnp.zeros((1, B, r), rhs.dtype)]).reshape(S, m + 1, B, r)

    D_int = D_rows[:, :m]            # (S, m, B, B)
    U_int = U_rows[:, :m - 1]        # (S, m-1, B, B)
    rhs_int = r_rows[:, :m]          # (S, m, B, r)
    D_sep = D_rows[:-1, m]           # (S-1, B, B)
    rhs_sep = r_rows[:-1, m]         # (S-1, B, r)
    a = U_rows[:, m - 1]             # (S, B, B)  block (last_int_s, sep_s); a[S-1] unused
    c = U_rows[:, m]                 # (S, B, B)  block (sep_s, first_int_{s+1}); c[S-1]=0
    c_prev = jnp.concatenate([jnp.zeros((1, B, B), U.dtype), c[:-1]])  # left coupling per seg

    # per-segment multi-RHS solve: [rhs | e_0 c_prev^T | e_last a]
    BL = jnp.zeros((S, m, B, B), D.dtype).at[:, 0].set(
        jnp.swapaxes(c_prev, -1, -2))
    BR = jnp.zeros((S, m, B, B), D.dtype).at[:, m - 1].set(a)
    big_rhs = jnp.concatenate([rhs_int, BL, BR], -1)      # (S, m, B, r+2B)
    D_int = shard_segments(D_int)
    U_int = shard_segments(U_int)
    big_rhs = shard_segments(big_rhs)
    sol = shard_segments(jax.vmap(solve_block_tridiag_scan)(
        D_int, U_int, big_rhs))
    y = sol[..., :r]                                      # A^-1 rhs
    FL = sol[..., r:r + B]                                # A^-1 (e_0 (x) c_prev^T)
    FR = sol[..., r + B:]                                 # A^-1 (e_last (x) a)

    aT = jnp.swapaxes(a, -1, -2)
    # reduced separator system (S-1 blocks, block tridiagonal)
    D_red = (D_sep - aT[:-1] @ FR[:-1, m - 1] - c[:-1] @ FL[1:, 0])
    U_red = -c[:-1][:-1] @ FR[1:-1, 0] if S > 2 else jnp.zeros((0, B, B), D.dtype)
    rhs_red = rhs_sep - aT[:-1] @ y[:-1, m - 1] - c[:-1] @ y[1:, 0]
    x_sep = solve_block_tridiag_scan(D_red, U_red, rhs_red)  # (S-1, B, r)

    # parallel interior back-substitution:
    # x_int_s = y_s - FL_s x_sep_{s-1} - FR_s x_sep_s
    zpad = jnp.zeros((1, B, r), rhs.dtype)
    x_left = jnp.concatenate([zpad, x_sep])                # (S, B, r)
    x_right = jnp.concatenate([x_sep, zpad])
    x_int = shard_segments(y - FL @ x_left[:, None] - FR @ x_right[:, None])

    # stitch back into chain order and drop padding
    x_full = jnp.concatenate([x_int, jnp.concatenate([x_sep, zpad])[:, None]],
                             axis=1).reshape(S * (m + 1), B, r)[:N]
    return x_full[..., 0] if squeeze else x_full


# -----------------------------------------------------------------------------
#   Gauss-Newton pose-graph iterations
# -----------------------------------------------------------------------------

def _assemble(X, Z, W_rel, gps_pos, gps_W, gps_vertex, offset, anchor,
              gauge_weight, has_gps: bool):
    """Batched D/U/b assembly (mirrors the numpy loop in posegraph.py)."""
    N = X.shape[0]
    Xi, Xj = X[:-1], X[1:]
    Hij = se3.jhmat_inverse(Xi) @ Xj
    E = se3.jse3_log(se3.jhmat_inverse(Z) @ Hij)          # (N-1, 6)
    Ji = -se3.jadjoint(se3.jhmat_inverse(Hij))            # (N-1, 6, 6)
    JiW = jnp.swapaxes(Ji, -1, -2) @ W_rel                # Ji^T W

    D = jnp.zeros((N, 6, 6), X.dtype)
    b = jnp.zeros((N, 6), X.dtype)
    D = D.at[:-1].add(JiW @ Ji).at[1:].add(W_rel)
    U = JiW                                               # block (i, i+1)
    We = jnp.einsum("nij,nj->ni", W_rel, E)
    b = b.at[:-1].add(jnp.einsum("nij,nj->ni", JiW, E)).at[1:].add(We)
    cost = jnp.sum(E * We)

    if has_gps:
        Xg = X[gps_vertex]                                # (M, 4, 4)
        R = Xg[:, :3, :3]
        pred = (Xg @ offset)[:, :3, 3]
        e = pred - gps_pos
        J = jnp.concatenate([R, -R @ se3.jhat(
            jnp.broadcast_to(offset[:3, 3], (R.shape[0], 3)))], -1)  # (M, 3, 6)
        JW = jnp.swapaxes(J, -1, -2) @ gps_W
        D = D.at[gps_vertex].add(JW @ J)
        b = b.at[gps_vertex].add(jnp.einsum("mij,mj->mi", JW, e))
        cost = cost + jnp.sum(e * jnp.einsum("mij,mj->mi", gps_W, e))
    else:
        D = D.at[0].add(jnp.eye(6, dtype=X.dtype) * gauge_weight)
        e0 = se3.jse3_log(se3.jhmat_inverse(anchor) @ X[0])
        b = b.at[0].add(gauge_weight * e0)
        cost = cost + gauge_weight * jnp.sum(e0 * e0)
    return D, U, b, cost


@partial(jax.jit, static_argnames=("n_iterations", "has_gps", "n_segments",
                                   "mesh"))
def _pgo_iterations(X0, Z, W_rel, gps_pos, gps_W, gps_vertex, offset, anchor,
                    n_iterations: int, lam, ftol, gauge_weight,
                    has_gps: bool, n_segments: int, mesh=None):
    def cond(st):
        X, prev_cost, cost, it, done = st
        return (it < n_iterations) & ~done

    def body(st):
        X, prev_cost, _, it, _ = st
        D, U, b, cost = _assemble(X, Z, W_rel, gps_pos, gps_W, gps_vertex,
                                  offset, anchor, gauge_weight, has_gps)
        done = jnp.abs(prev_cost - cost) <= ftol * jnp.maximum(cost, 1e-12)
        diag = jnp.maximum(jnp.diagonal(D, axis1=-2, axis2=-1), 1e-9)
        Dd = D + lam * jax.vmap(jnp.diag)(diag)
        if n_segments > 1:
            delta = solve_block_tridiag_schur(Dd, U, -b, n_segments, mesh=mesh)
        else:
            delta = solve_block_tridiag_scan(Dd, U, -b)
        X_new = X @ se3.jse3_exp(delta)
        X = jnp.where(done, X, X_new)
        return X, cost, cost, it + 1, done

    init = (X0, jnp.asarray(jnp.inf, X0.dtype), jnp.asarray(jnp.inf, X0.dtype),
            jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    X, _, cost, it, _ = jax.lax.while_loop(cond, body, init)
    return X, cost, it


def optimize_pose_graph_device(
    slam_poses: Sequence[np.ndarray],
    slam_times: np.ndarray,
    slam_covariances: Sequence[np.ndarray],
    gps_positions: Optional[np.ndarray] = None,
    gps_times: Optional[np.ndarray] = None,
    gps_covariances: Optional[np.ndarray] = None,
    gps_to_sensor_offset: Optional[np.ndarray] = None,
    config: PoseGraphConfig = PoseGraphConfig(),
    n_segments: int = 0,
    verbose: bool = False,
    mesh=None,
):
    """Drop-in device-backed replacement for posegraph.optimize_pose_graph.

    n_segments > 1 selects the segment-Schur solve (parallel interior
    elimination); 0/1 selects the sequential scan sweep. With `mesh`, the
    interiors are additionally sharded over the mesh devices (keyframe-range
    partitioning — the distributed pose graph). Returns
    (optimized_poses list[(4,4)], final_cost).
    """
    if mesh is not None and mesh.devices.flat[0].platform != "cpu":
        # the f64 solve is pinned to the CPU backend below; sharding
        # constraints over a non-CPU mesh would either force f64 LU onto
        # an accelerator (no lowering) or conflict with the pin — run the
        # Schur split unsharded instead
        mesh = None
    if mesh is not None and n_segments < 2:
        n_segments = 4 * mesh.devices.size
    N = len(slam_poses)
    X = np.stack([np.asarray(p, np.float64) for p in slam_poses])
    slam_times = np.asarray(slam_times, np.float64)
    offset = np.eye(4) if gps_to_sensor_offset is None \
        else np.asarray(gps_to_sensor_offset, np.float64)

    has_gps = gps_positions is not None and len(gps_positions) >= 2
    if has_gps:
        gps_positions = np.asarray(gps_positions, np.float64)
        gps_times = np.asarray(gps_times, np.float64)
        if gps_covariances is None:
            gps_covariances = np.broadcast_to(np.eye(3) * 1e-2,
                                              (len(gps_positions), 3, 3))
        positions = np.stack([(p @ offset)[:3, 3] for p in X])
        T = registration.compute_transform_offset(positions, gps_positions)
        X = np.einsum("ij,njk->nik", T, X)
        gps_vertex = np.array([_closest(slam_times, t) for t in gps_times])
        gps_W = np.linalg.inv(np.asarray(gps_covariances, np.float64)
                              + np.eye(3) * 1e-9)
    else:
        gps_vertex = np.zeros(1, np.int64)
        gps_positions = np.zeros((1, 3))
        gps_W = np.zeros((1, 3, 3))

    Z = np.stack([se3.hmat_inverse(np.asarray(slam_poses[i], np.float64))
                  @ np.asarray(slam_poses[i + 1], np.float64)
                  for i in range(N - 1)])
    W_rel = np.stack([np.linalg.inv(np.asarray(slam_covariances[i + 1],
                                               np.float64) + np.eye(6) * 1e-8)
                      for i in range(N - 1)])

    # float64 linalg (world-scale coordinates) is host-side: TPU backends
    # implement no f64 LU/solve, so the graph solve always runs on the CPU
    # backend — it is 6x6-block work, not accelerator-shaped
    import contextlib
    try:
        ctx = jax.default_device(jax.devices("cpu")[0])
    except Exception:   # no CPU backend registered: try the default device
        ctx = contextlib.nullcontext()
    with ctx, jax.enable_x64(True):
        Xj, cost, it = _pgo_iterations(
            jnp.asarray(X), jnp.asarray(Z), jnp.asarray(W_rel),
            jnp.asarray(gps_positions), jnp.asarray(gps_W),
            jnp.asarray(gps_vertex), jnp.asarray(offset),
            jnp.asarray(X[0]),
            n_iterations=config.n_iterations,
            lam=jnp.float64(config.init_lambda),
            ftol=jnp.float64(config.function_tolerance),
            gauge_weight=jnp.float64(config.gauge_weight),
            has_gps=has_gps, n_segments=max(int(n_segments), 0), mesh=mesh)
        Xj, cost, it = jax.device_get((Xj, cost, it))
    if verbose:
        print(f"[pgo-device] {int(it)} iterations, cost {float(cost):.6e}")
    return [np.asarray(Xj[i], np.float64) for i in range(N)], float(cost)
