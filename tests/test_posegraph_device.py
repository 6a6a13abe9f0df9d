"""Device-side PGO: batched SE3 ops, block-tridiag solvers (scan + Schur),
Gauss-Newton parity with the numpy oracle, 1000-pose scalability, g2o dump."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def enable_x64():
    return jax.enable_x64(True)

from lidarslam_tpu.backend import posegraph
from lidarslam_tpu.backend.posegraph_device import (
    optimize_pose_graph_device, solve_block_tridiag_scan,
    solve_block_tridiag_schur)
from lidarslam_tpu.core import se3

RNG = np.random.default_rng(0)


def _random_hmat(scale_rot=0.8, scale_t=2.0, rng=RNG):
    w = rng.normal(0, scale_rot, 3)
    H = np.eye(4)
    H[:3, :3] = se3.so3_exp(w)
    H[:3, 3] = rng.normal(0, scale_t, 3)
    return H


# ---------------------------------------------------------------------------
#   Batched Lie ops vs numpy scalar oracles
# ---------------------------------------------------------------------------

def test_batched_se3_ops_match_numpy():
    Hs = np.stack([_random_hmat() for _ in range(32)])
    with enable_x64():
        logs = np.asarray(se3.jse3_log(jnp.asarray(Hs)))
        exps = np.asarray(se3.jse3_exp(jnp.asarray(logs)))
        adjs = np.asarray(se3.jadjoint(jnp.asarray(Hs)))
        invs = np.asarray(se3.jhmat_inverse(jnp.asarray(Hs)))
    for i in range(len(Hs)):
        np.testing.assert_allclose(logs[i], se3.se3_log(Hs[i]), atol=1e-9)
        np.testing.assert_allclose(exps[i], Hs[i], atol=1e-9)
        np.testing.assert_allclose(adjs[i], se3.adjoint(Hs[i]), atol=1e-9)
        np.testing.assert_allclose(invs[i], se3.hmat_inverse(Hs[i]), atol=1e-9)


def test_so3_log_small_and_large_angles():
    for theta in (1e-9, 1e-6, 0.5, 2.0, np.pi - 0.01):
        axis = np.array([0.6, -0.64, 0.48])
        axis /= np.linalg.norm(axis)
        R = se3.so3_exp(theta * axis)
        with enable_x64():
            w = np.asarray(se3.jso3_log(jnp.asarray(R)))
        np.testing.assert_allclose(w, theta * axis, atol=1e-6)


# ---------------------------------------------------------------------------
#   Block-tridiagonal solvers
# ---------------------------------------------------------------------------

def _random_spd_tridiag(n, b=6, rng=RNG):
    U = rng.normal(0, 0.3, (n - 1, b, b))
    D = []
    for i in range(n):
        A = rng.normal(0, 1, (b, b))
        D.append(A @ A.T + np.eye(b) * (b + 2.0))
    return np.stack(D), U


def _dense(D, U):
    n, b = D.shape[0], D.shape[1]
    A = np.zeros((n * b, n * b))
    for i in range(n):
        A[i * b:(i + 1) * b, i * b:(i + 1) * b] = D[i]
    for i in range(n - 1):
        A[i * b:(i + 1) * b, (i + 1) * b:(i + 2) * b] = U[i]
        A[(i + 1) * b:(i + 2) * b, i * b:(i + 1) * b] = U[i].T
    return A


@pytest.mark.parametrize("n", [1, 2, 3, 7, 40])
def test_scan_solve_matches_dense(n):
    D, U = _random_spd_tridiag(n)
    rhs = RNG.normal(0, 1, (n, 6))
    with enable_x64():
        x = np.asarray(solve_block_tridiag_scan(
            jnp.asarray(D), jnp.asarray(U), jnp.asarray(rhs)))
    ref = np.linalg.solve(_dense(D, U), rhs.ravel()).reshape(n, 6)
    np.testing.assert_allclose(x, ref, atol=1e-8)


@pytest.mark.parametrize("n,s", [(7, 2), (40, 4), (41, 4), (64, 8), (9, 3)])
def test_schur_solve_matches_dense(n, s):
    D, U = _random_spd_tridiag(n)
    rhs = RNG.normal(0, 1, (n, 6))
    with enable_x64():
        x = np.asarray(solve_block_tridiag_schur(
            jnp.asarray(D), jnp.asarray(U), jnp.asarray(rhs), s))
    ref = np.linalg.solve(_dense(D, U), rhs.ravel()).reshape(n, 6)
    np.testing.assert_allclose(x, ref, atol=1e-7)


# ---------------------------------------------------------------------------
#   Full PGO parity + scale
# ---------------------------------------------------------------------------

def _make_graph(n=60, drift=0.02, rng=None):
    rng = rng or np.random.default_rng(7)
    gt, noisy = [np.eye(4)], [np.eye(4)]
    for i in range(1, n):
        step = np.eye(4)
        step[:3, :3] = se3.so3_exp([0, 0, 0.02])
        step[0, 3] = 1.0
        gt.append(gt[-1] @ step)
        nstep = step.copy()
        nstep[:3, 3] += rng.normal(0, drift, 3)
        nstep[:3, :3] = nstep[:3, :3] @ se3.so3_exp(rng.normal(0, 0.002, 3))
        noisy.append(noisy[-1] @ nstep)
    times = np.arange(n) * 0.1
    covs = [np.eye(6) * 1e-3 for _ in range(n)]
    gps_t = times[::5]
    gps_p = np.stack([gt[i][:3, 3] for i in range(0, n, 5)])
    gps_p = gps_p + rng.normal(0, 0.01, gps_p.shape)
    return noisy, times, covs, gps_p, gps_t, gt


def test_device_pgo_matches_numpy_oracle():
    noisy, times, covs, gps_p, gps_t, gt = _make_graph(50)
    ref_poses, ref_cost = posegraph.optimize_pose_graph(
        noisy, times, covs, gps_positions=gps_p, gps_times=gps_t)
    dev_poses, dev_cost = optimize_pose_graph_device(
        noisy, times, covs, gps_positions=gps_p, gps_times=gps_t)
    for a, b in zip(ref_poses, dev_poses):
        np.testing.assert_allclose(a[:3, 3], b[:3, 3], atol=2e-3)
        np.testing.assert_allclose(a[:3, :3], b[:3, :3], atol=2e-3)
    # both should land close to GT after GPS fusion
    err = max(np.linalg.norm(p[:3, 3] - g[:3, 3])
              for p, g in zip(dev_poses, gt))
    assert err < 0.15, err


def test_device_pgo_schur_matches_scan():
    noisy, times, covs, gps_p, gps_t, _ = _make_graph(47)
    a, _ = optimize_pose_graph_device(noisy, times, covs,
                                      gps_positions=gps_p, gps_times=gps_t,
                                      n_segments=0)
    b, _ = optimize_pose_graph_device(noisy, times, covs,
                                      gps_positions=gps_p, gps_times=gps_t,
                                      n_segments=4)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-6)


def test_device_pgo_no_gps_gauge():
    noisy, times, covs, _, _, _ = _make_graph(20)
    ref, _ = posegraph.optimize_pose_graph(noisy, times, covs)
    dev, _ = optimize_pose_graph_device(noisy, times, covs)
    for a, b in zip(ref, dev):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_thousand_pose_graph_is_fast():
    noisy, times, covs, gps_p, gps_t, gt = _make_graph(1000)
    # warm the compile (shape-specific), then time the solve itself
    optimize_pose_graph_device(noisy, times, covs, gps_positions=gps_p,
                               gps_times=gps_t, n_segments=8)
    t0 = time.perf_counter()
    poses, cost = optimize_pose_graph_device(
        noisy, times, covs, gps_positions=gps_p, gps_times=gps_t, n_segments=8)
    dt = time.perf_counter() - t0
    err = max(np.linalg.norm(p[:3, 3] - g[:3, 3]) for p, g in zip(poses, gt))
    assert err < 0.3, err
    assert dt < 10.0, f"1000-pose PGO took {dt:.1f}s"


def test_g2o_dump(tmp_path):
    noisy, times, covs, gps_p, gps_t, _ = _make_graph(10)
    path = str(tmp_path / "graph.g2o")
    gps_vertex = [int(np.argmin(np.abs(times - t))) for t in gps_t]
    posegraph.save_g2o(path, noisy, times,
                       rel_information=[np.linalg.inv(c) for c in covs[1:]],
                       gps_positions=gps_p, gps_vertex=gps_vertex)
    lines = open(path).read().strip().splitlines()
    kinds = [ln.split()[0] for ln in lines]
    assert kinds.count("VERTEX_SE3:QUAT") == 10
    assert kinds.count("EDGE_SE3:QUAT") == 9
    assert kinds.count("VERTEX_TRACKXYZ") == len(gps_p)
    assert kinds.count("EDGE_SE3_TRACKXYZ") == len(gps_p)
    assert kinds[0] == "PARAMS_SE3OFFSET"
    # vertex 3 round-trips through quaternion text
    v3 = [ln for ln in lines if ln.startswith("VERTEX_SE3:QUAT 3 ")][0].split()
    t = np.array([float(x) for x in v3[2:5]])
    np.testing.assert_allclose(t, noisy[3][:3, 3], atol=1e-6)


def test_device_pgo_sharded_over_mesh():
    """Distributed pose graph: segment interiors eliminated across an
    8-device mesh (keyframe-range partitioning, SURVEY §7 hard-part 6) must
    reproduce the single-device solve on a 1000+-pose graph."""
    if len(jax.devices()) < 8:
        pytest.skip("needs XLA_FLAGS=--xla_force_host_platform_device_count=8")
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("seg",))
    noisy, times, covs, gps_p, gps_t, gt = _make_graph(1024)
    ref, ref_cost = optimize_pose_graph_device(
        noisy, times, covs, gps_positions=gps_p, gps_times=gps_t,
        n_segments=32)
    t0 = time.perf_counter()
    got, cost = optimize_pose_graph_device(
        noisy, times, covs, gps_positions=gps_p, gps_times=gps_t, mesh=mesh)
    dt = time.perf_counter() - t0
    for a, b in zip(ref, got):
        np.testing.assert_allclose(a, b, atol=1e-6)
    np.testing.assert_allclose(cost, ref_cost, rtol=1e-6)
    err = max(np.linalg.norm(p[:3, 3] - g[:3, 3]) for p, g in zip(got, gt))
    assert err < 0.3, err
    assert dt < 30.0, f"sharded 1024-pose PGO took {dt:.1f}s (incl. compile)"
