"""Batched 3x3 eigensolver + masked PCA vs numpy.linalg.eigh oracle."""

import numpy as np
import jax.numpy as jnp

from lidarslam_tpu.core import pca


def _random_sym(rng, n, cond=None):
    A = rng.normal(size=(n, 3, 3))
    A = A + np.swapaxes(A, -1, -2)
    return A.astype(np.float32)


def test_eigvals_match_numpy():
    rng = np.random.default_rng(0)
    A = _random_sym(rng, 500)
    lam, V = pca.eigh_3x3(jnp.asarray(A))
    lam = np.asarray(lam)
    want = np.linalg.eigvalsh(A.astype(np.float64))
    np.testing.assert_allclose(lam, want, atol=1e-4, rtol=1e-4)
    # ascending order
    assert np.all(np.diff(lam, axis=-1) >= -1e-5)


def test_eigvecs_satisfy_eigen_equation():
    rng = np.random.default_rng(1)
    A = _random_sym(rng, 500)
    lam, V = pca.eigh_3x3(jnp.asarray(A))
    lam, V = np.asarray(lam, dtype=np.float64), np.asarray(V, dtype=np.float64)
    A64 = A.astype(np.float64)
    for i in range(3):
        resid = np.einsum("nij,nj->ni", A64, V[..., i]) - lam[..., i, None] * V[..., i]
        scale = np.maximum(np.abs(lam).max(axis=-1), 1.0)
        assert np.max(np.linalg.norm(resid, axis=-1) / scale) < 5e-3
    # orthonormality
    VtV = np.einsum("nij,nik->njk", V, V)
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape), atol=5e-3)


def test_diagonal_and_degenerate():
    mats = np.stack([
        np.diag([3.0, 1.0, 2.0]),
        np.diag([5.0, 5.0, 5.0]),
        np.zeros((3, 3)),
        np.diag([1.0, 1.0, 2.0]),
    ]).astype(np.float32)
    lam, V = pca.eigh_3x3(jnp.asarray(mats))
    lam = np.asarray(lam)
    np.testing.assert_allclose(lam[0], [1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(lam[1], [5, 5, 5], atol=1e-5)
    np.testing.assert_allclose(lam[2], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(lam[3], [1, 1, 2], atol=1e-5)
    # eigenvector of distinct eigenvalue must be correct even when degenerate pairs exist
    v_top = np.asarray(V)[3][:, 2]
    np.testing.assert_allclose(np.abs(v_top), [0, 0, 1], atol=1e-3)


def test_masked_mean_and_cov():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(4, 10, 3)).astype(np.float32)
    mask = rng.uniform(size=(4, 10)) > 0.3
    mask[0] = False  # fully masked row
    mean, cov, count = pca.masked_mean_and_cov(jnp.asarray(pts), jnp.asarray(mask))
    mean, cov, count = map(np.asarray, (mean, cov, count))
    for b in range(4):
        sel = pts[b][mask[b]]
        if len(sel) == 0:
            np.testing.assert_allclose(mean[b], 0, atol=1e-6)
            continue
        np.testing.assert_allclose(mean[b], sel.mean(axis=0), atol=1e-5)
        centered = sel - sel.mean(axis=0)
        want_cov = centered.T @ centered / len(sel)  # normalized (PCL convention)
        np.testing.assert_allclose(cov[b], want_cov, atol=1e-5)
        assert count[b] == len(sel)


def test_line_fit_recovers_direction():
    rng = np.random.default_rng(3)
    d = np.array([1.0, 2.0, -0.5])
    d /= np.linalg.norm(d)
    t = np.linspace(-1, 1, 8)
    pts = (np.array([5.0, -3.0, 2.0]) + t[:, None] * d).astype(np.float32)
    pts += rng.normal(scale=1e-4, size=pts.shape).astype(np.float32)
    pos, direction, lam, count = pca.line_fit(jnp.asarray(pts[None]), jnp.ones((1, 8), bool))
    direction = np.asarray(direction)[0]
    assert abs(abs(direction @ d) - 1) < 1e-3
    np.testing.assert_allclose(np.asarray(pos)[0], pts.mean(axis=0), atol=1e-4)
    # distance of on-line points to the fit is ~0
    sq = pca.sq_dist_to_line(jnp.asarray(pts), jnp.asarray(pos)[0], jnp.asarray(direction))
    assert float(jnp.max(sq)) < 1e-6
