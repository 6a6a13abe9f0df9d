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

Layout: the core (`masked_cov6` / `eigh6`) is structure-of-arrays — six
covariance planes in, three eigenvalue planes and nine eigenvector-component
planes out. (..., 3, 3) arrays on TPU tile to T(4,128) (a 3x3 minor block
pads to 4x128 — 42x wasted lanes) and the cov einsum lowers to a bf16
batched matmul bracketed by layout copies; at 64-beam scale those copies
and converts were ~4.5 ms/frame of the profile. The SoA planes stay in
native (N,)-major layout and fuse into the surrounding elementwise chains.
The (…, 3, 3) API (`masked_mean_and_cov` / `eigh_3x3`) wraps the core for
callers that want matrices.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


# -----------------------------------------------------------------------------
# SoA core
# -----------------------------------------------------------------------------

def masked_cov6(pts, mask):
    """Masked mean and normalized covariance, SoA form.

    Args:
      pts: (..., N, 3) points.
      mask: (..., N) boolean/float validity.

    Returns:
      (mean (..., 3),
       c6 = (c00, c01, c02, c11, c12, c22) each (...,),
       count (...,)) — covariances are zero where count == 0.
    """
    m = mask.astype(pts.dtype)
    count = jnp.sum(m, axis=-1)
    denom = jnp.maximum(count, 1.0)
    px, py, pz = pts[..., 0], pts[..., 1], pts[..., 2]      # (..., N)
    mx = jnp.sum(px * m, axis=-1) / denom
    my = jnp.sum(py * m, axis=-1) / denom
    mz = jnp.sum(pz * m, axis=-1) / denom
    cx = (px - mx[..., None]) * m
    cy = (py - my[..., None]) * m
    cz = (pz - mz[..., None]) * m
    c6 = (jnp.sum(cx * cx, axis=-1) / denom,
          jnp.sum(cx * cy, axis=-1) / denom,
          jnp.sum(cx * cz, axis=-1) / denom,
          jnp.sum(cy * cy, axis=-1) / denom,
          jnp.sum(cy * cz, axis=-1) / denom,
          jnp.sum(cz * cz, axis=-1) / denom)
    mean = jnp.stack([mx, my, mz], axis=-1)
    return mean, c6, count


def _cross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _eigvec6(a00, a01, a02, a11, a12, a22, lam):
    """Unit eigenvector (3 component planes) for eigenvalue plane lam.

    Largest cross product of the rows of (A - lam I); for a rank-2
    (A - lam I) that cross product spans the null space = eigenvector.
    """
    m00, m11, m22 = a00 - lam, a11 - lam, a22 - lam
    # rows r0 = (m00, a01, a02), r1 = (a01, m11, a12), r2 = (a02, a12, m22)
    c01 = _cross(m00, a01, a02, a01, m11, a12)
    c02 = _cross(m00, a01, a02, a02, a12, m22)
    c12 = _cross(a01, m11, a12, a02, a12, m22)
    n01 = c01[0] * c01[0] + c01[1] * c01[1] + c01[2] * c01[2]
    n02 = c02[0] * c02[0] + c02[1] * c02[1] + c02[2] * c02[2]
    n12 = c12[0] * c12[0] + c12[1] * c12[1] + c12[2] * c12[2]
    # branch-free argmax-of-3 select: a take_along_axis gather here lowers
    # to a ~560 us lane-padded (N, 3) gather per call on TPU (it was a top
    # per-frame op); nested wheres fuse into the elementwise chain instead
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = n02 >= n12
    v = tuple(jnp.where(use01, c01[i], jnp.where(use02, c02[i], c12[i]))
              for i in range(3))
    n = jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
    # degenerate (repeated eigenvalue): pick any unit axis; callers gate on
    # eigenvalue ratios so this choice is not load-bearing.
    ok = n > 1e-12
    inv = 1.0 / jnp.maximum(n, _EPS)
    return (jnp.where(ok, v[0] * inv, 1.0),
            jnp.where(ok, v[1] * inv, 0.0),
            jnp.where(ok, v[2] * inv, 0.0))


def eigh6(c6):
    """Symmetric 3x3 eigendecomposition from six covariance planes.

    Args:
      c6: (c00, c01, c02, c11, c12, c22), each (...,).

    Returns:
      (lams = (l0, l1, l2) ascending, each (...,),
       vecs = (v0, v1, v2) unit eigenvectors, each a (vx, vy, vz) tuple of
       (...,) planes; v0 pairs with l0).
    """
    c00, c01, c02, c11, c12, c22 = (jnp.asarray(c) for c in c6)

    # Scale for conditioning: work on A/s with s = max |a_ij| (>= eps).
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(c00), jnp.abs(c11)), jnp.abs(c22)),
        jnp.maximum(jnp.maximum(jnp.abs(c01), jnp.abs(c02)), jnp.abs(c12)))
    scale = jnp.maximum(scale, _EPS)
    a00, a01, a02 = c00 / scale, c01 / scale, c02 / scale
    a11, a12, a22 = c11 / scale, c12 / scale, c22 / scale

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))

    safe_p = jnp.maximum(p, _EPS)
    b00, b11, b22 = d0 / safe_p, d1 / safe_p, d2 / safe_p
    b01, b02, b12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam_hi = q + 2.0 * p * jnp.cos(phi)
    lam_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_hi - lam_lo

    # nearly diagonal matrices: eigenvalues = diagonal, sorted
    is_diag = p1 < _EPS
    dmin = jnp.minimum(jnp.minimum(a00, a11), a22)
    dmax = jnp.maximum(jnp.maximum(a00, a11), a22)
    dmid = a00 + a11 + a22 - dmin - dmax
    l0 = jnp.where(is_diag, dmin, lam_lo)
    l1 = jnp.where(is_diag, dmid, lam_mid)
    l2 = jnp.where(is_diag, dmax, lam_hi)

    v_lo = _eigvec6(a00, a01, a02, a11, a12, a22, l0)
    v_hi = _eigvec6(a00, a01, a02, a11, a12, a22, l2)
    # orthogonalize v_lo against v_hi to guarantee an orthonormal frame
    dot = (v_lo[0] * v_hi[0] + v_lo[1] * v_hi[1] + v_lo[2] * v_hi[2])
    u = tuple(v_lo[i] - dot * v_hi[i] for i in range(3))
    un = jnp.sqrt(u[0] * u[0] + u[1] * u[1] + u[2] * u[2])
    alt = _any_orthonormal6(v_hi)
    inv = 1.0 / jnp.maximum(un, _EPS)
    ok = un > 1e-6
    v_lo = tuple(jnp.where(ok, u[i] * inv, alt[i]) for i in range(3))
    v_mid = _cross(*v_hi, *v_lo)

    # nearly diagonal: eigenvectors are identity columns permuted by the
    # stable argsort of the diagonal (ties -> lower index first for the
    # min slot, higher index last for the max slot, matching jnp.argsort)
    i_lo = jnp.where((a00 <= a11) & (a00 <= a22), 0,
                     jnp.where(a11 <= a22, 1, 2))
    i_hi = jnp.where((a22 >= a00) & (a22 >= a11), 2,
                     jnp.where(a11 >= a00, 1, 0))
    i_mid = 3 - i_lo - i_hi

    def onehot(i):
        return tuple((i == c).astype(l0.dtype) for c in range(3))

    def pick(v, i):
        oh = onehot(i)
        return tuple(jnp.where(is_diag, oh[c], v[c]) for c in range(3))

    v_lo = pick(v_lo, i_lo)
    v_mid = pick(v_mid, i_mid)
    v_hi = pick(v_hi, i_hi)

    return (l0 * scale, l1 * scale, l2 * scale), (v_lo, v_mid, v_hi)


def _any_orthonormal6(v):
    """A unit vector orthogonal to unit vector v = (vx, vy, vz) planes."""
    ax_, ay, az = jnp.abs(v[0]), jnp.abs(v[1]), jnp.abs(v[2])
    # coordinate axis least aligned with v (argmin, ties -> lowest index)
    i = jnp.where((ax_ <= ay) & (ax_ <= az), 0, jnp.where(ay <= az, 1, 2))
    e = tuple((i == c).astype(v[0].dtype) for c in range(3))
    dot = e[0] * v[0] + e[1] * v[1] + e[2] * v[2]
    u = tuple(e[c] - dot * v[c] for c in range(3))
    un = jnp.sqrt(u[0] * u[0] + u[1] * u[1] + u[2] * u[2])
    inv = 1.0 / jnp.maximum(un, _EPS)
    return tuple(u[c] * inv for c in range(3))


# -----------------------------------------------------------------------------
# (..., 3, 3) API wrappers
# -----------------------------------------------------------------------------

def masked_mean_and_cov(pts, mask):
    """Masked mean and normalized covariance.

    Args:
      pts: (..., N, 3) points.
      mask: (..., N) boolean/float validity.

    Returns:
      mean (..., 3), cov (..., 3, 3), count (...,)  — cov is zero where
      count == 0.
    """
    mean, (c00, c01, c02, c11, c12, c22), count = masked_cov6(pts, mask)
    row0 = jnp.stack([c00, c01, c02], axis=-1)
    row1 = jnp.stack([c01, c11, c12], axis=-1)
    row2 = jnp.stack([c02, c12, c22], axis=-1)
    return mean, jnp.stack([row0, row1, row2], axis=-2), count


def eigh_3x3(A):
    """Batched symmetric 3x3 eigendecomposition.

    Args:
      A: (..., 3, 3) symmetric matrices.

    Returns:
      (eigvals (..., 3) ascending, eigvecs (..., 3, 3) with eigvecs[..., :, i]
      the unit eigenvector of eigvals[..., i]).
    """
    c6 = (A[..., 0, 0],
          0.5 * (A[..., 0, 1] + A[..., 1, 0]),
          0.5 * (A[..., 0, 2] + A[..., 2, 0]),
          A[..., 1, 1],
          0.5 * (A[..., 1, 2] + A[..., 2, 1]),
          A[..., 2, 2])
    (l0, l1, l2), (v0, v1, v2) = eigh6(c6)
    lam = jnp.stack([l0, l1, l2], axis=-1)
    V = jnp.stack([jnp.stack(v0, axis=-1), jnp.stack(v1, axis=-1),
                   jnp.stack(v2, axis=-1)], axis=-1)
    return lam, V


def line_fit(pts, mask):
    """Batched PCA line fit: position (centroid), direction (largest eigvec).

    Returns (position (...,3), direction (...,3), eigvals (...,3), count)."""
    mean, c6, count = masked_cov6(pts, mask)
    (l0, l1, l2), (_, _, v2) = eigh6(c6)
    return (mean, jnp.stack(v2, axis=-1),
            jnp.stack([l0, l1, l2], axis=-1), count)


def sq_dist_to_line(pts, position, direction):
    """Squared distance of (..., 3) points to line(position, direction)
    (SpinningSensorKeypointExtractor.cxx:111-114 semantics)."""
    d = pts - position
    c = jnp.cross(d, direction)
    return jnp.sum(c * c, axis=-1)
