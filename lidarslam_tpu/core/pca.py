"""Batched closed-form symmetric 3x3 eigendecomposition and masked PCA.

This replaces the reference's per-neighborhood `Utils::ComputeMeanAndPCA`
(Utilities.h:247-262 — PCL `computeMeanAndCovarianceMatrix` + `eigen33`) with
a fully batched, branch-free implementation that vectorizes over millions of
neighborhoods on the TPU VPU. Conventions match the reference:

- covariance is *normalized* (divided by the number of points), so the
  eigenvalues are variances,
- eigenvalues are returned in ascending order; eigenvector columns follow the
  same order (col 0 = smallest = plane normal, col 2 = largest = line
  direction).

Eigenvalues use the trigonometric (Smith) method on the shifted/scaled matrix;
eigenvectors use the cross-product-of-rows method with argmax row-pair
selection, which is robust for the well-separated eigenvalues the matcher
gates on. Degenerate (near-spherical) neighborhoods fall back to identity
axes — callers gate those out via planarity / MSE checks anyway.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def masked_mean_and_cov(pts, mask):
    """Masked mean and normalized covariance.

    Args:
      pts: (..., N, 3) points.
      mask: (..., N) boolean/float validity.

    Returns:
      mean (..., 3), cov (..., 3, 3), count (...,)  — cov is zero where
      count == 0.
    """
    m = mask.astype(pts.dtype)
    count = jnp.sum(m, axis=-1)
    denom = jnp.maximum(count, 1.0)
    mean = jnp.sum(pts * m[..., None], axis=-2) / denom[..., None]
    centered = (pts - mean[..., None, :]) * m[..., None]
    cov = jnp.einsum("...ni,...nj->...ij", centered, centered) / denom[..., None, None]
    return mean, cov, count


def eigh_3x3(A):
    """Batched symmetric 3x3 eigendecomposition.

    Args:
      A: (..., 3, 3) symmetric matrices.

    Returns:
      (eigvals (..., 3) ascending, eigvecs (..., 3, 3) with eigvecs[..., :, i]
      the unit eigenvector of eigvals[..., i]).
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))

    # Scale for conditioning: work on A/s with s = max |a_ij| (>= eps).
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)), _EPS)
    As = A / scale[..., None, None]

    a00, a01, a02 = As[..., 0, 0], As[..., 0, 1], As[..., 0, 2]
    a11, a12, a22 = As[..., 1, 1], As[..., 1, 2], As[..., 2, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))

    safe_p = jnp.maximum(p, _EPS)
    B = (As - q[..., None, None] * jnp.eye(3, dtype=A.dtype)) / safe_p[..., None, None]
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam_hi = q + 2.0 * p * jnp.cos(phi)
    lam_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_hi - lam_lo

    # nearly diagonal matrices: eigenvalues = diagonal, sorted
    diag = jnp.stack([a00, a11, a22], axis=-1)
    diag_sorted = jnp.sort(diag, axis=-1)
    is_diag = p1 < _EPS
    lam = jnp.stack([lam_lo, lam_mid, lam_hi], axis=-1)
    lam = jnp.where(is_diag[..., None], diag_sorted, lam)

    v_lo = _eigvec(As, lam[..., 0])
    v_hi = _eigvec(As, lam[..., 2])
    # orthogonalize v_lo against v_hi to guarantee an orthonormal frame
    v_lo = v_lo - jnp.sum(v_lo * v_hi, axis=-1, keepdims=True) * v_hi
    v_lo_norm = jnp.linalg.norm(v_lo, axis=-1, keepdims=True)
    v_lo = jnp.where(v_lo_norm > 1e-6, v_lo / jnp.maximum(v_lo_norm, _EPS),
                     _any_orthonormal(v_hi))
    v_mid = jnp.cross(v_hi, v_lo)

    V = jnp.stack([v_lo, v_mid, v_hi], axis=-1)

    # nearly diagonal: eigenvectors are identity columns permuted by diag
    # order; build the permutation matrix P[i, j] = (order[j] == i) from an
    # iota comparison rather than a take_along_axis gather (fuses on the VPU)
    order = jnp.argsort(diag, axis=-1)
    V_diag = (order[..., None, :] ==
              jnp.arange(3, dtype=order.dtype)[:, None]).astype(A.dtype)
    V = jnp.where(is_diag[..., None, None], V_diag, V)

    return lam * scale[..., None], V


def _eigvec(A, lam):
    """Unit eigenvector of symmetric 3x3 A for eigenvalue lam, batched.

    Uses the largest cross product of the rows of (A - lam I); for a rank-2
    (A - lam I) that cross product spans the null space = eigenvector.
    """
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    # branch-free argmax-of-3 select: a take_along_axis gather here lowers
    # to a ~560 us lane-padded (N, 3) gather per call on TPU (it was a top
    # per-frame op); nested wheres fuse into the elementwise chain instead
    n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
    n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
    n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
    use01 = (n01 >= n02) & (n01 >= n12)
    v = jnp.where(use01, c01, jnp.where(n02 >= n12, c02, c12))
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # degenerate (repeated eigenvalue): pick any unit axis; callers gate on
    # eigenvalue ratios so this choice is not load-bearing.
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=A.dtype), v.shape)
    return jnp.where(n > 1e-12, v / jnp.maximum(n, _EPS), fallback)


def _any_orthonormal(v):
    """A unit vector orthogonal to unit vector v, branch-free."""
    # choose the coordinate axis least aligned with v (one-hot via iota
    # comparison, not an eye[ax] gather)
    ax = jnp.argmin(jnp.abs(v), axis=-1)
    e = (ax[..., None] == jnp.arange(3, dtype=ax.dtype)).astype(v.dtype)
    u = e - jnp.sum(e * v, axis=-1, keepdims=True) * v
    return u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), _EPS)


def line_fit(pts, mask):
    """Batched PCA line fit: position (centroid), direction (largest eigvec).

    Returns (position (...,3), direction (...,3), eigvals (...,3), count)."""
    mean, cov, count = masked_mean_and_cov(pts, mask)
    lam, V = eigh_3x3(cov)
    return mean, V[..., :, 2], lam, count


def sq_dist_to_line(pts, position, direction):
    """Squared distance of (..., 3) points to line(position, direction)
    (SpinningSensorKeypointExtractor.cxx:111-114 semantics)."""
    d = pts - position
    c = jnp.cross(d, direction)
    return jnp.sum(c * c, axis=-1)
