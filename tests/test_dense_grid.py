"""Dense cell-table grid: build/query exactness vs brute force."""

import numpy as np
import jax.numpy as jnp

from lidarslam_tpu.ops import voxel_map as vm


def test_dense_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (4000, 3)).astype(np.float32)
    dims = (24, 24, 24)
    bucket = 1.0
    cap = 32
    corner = jnp.asarray([-12.0, -12.0, -12.0], jnp.float32)
    grid = vm.build_dense_grid(jnp.asarray(pts), jnp.ones(4000, bool), corner,
                               dims, bucket, cap)
    q = rng.uniform(-9, 9, (300, 3)).astype(np.float32)
    d2, rows = vm.dense_knn(grid, jnp.asarray(q), 5, dims, bucket, cap, rings=2)
    d2, rows = np.asarray(d2), np.asarray(rows)
    cover = 2 * bucket  # guaranteed search radius with 2 rings
    for i in range(300):
        bd = np.sum((pts - q[i]) ** 2, axis=1)
        want = np.sort(bd)[:5]
        for j in range(5):
            if want[j] <= cover**2:
                np.testing.assert_allclose(d2[i, j], want[j], rtol=1e-4, atol=1e-5)
            if np.isfinite(d2[i, j]):
                dd = np.sum((pts[rows[i, j]] - q[i]) ** 2)
                np.testing.assert_allclose(dd, d2[i, j], rtol=1e-4, atol=1e-6)


def test_dense_grid_out_of_window_and_empty():
    pts = np.array([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]], np.float32)  # 2nd outside
    dims = (8, 8, 8)
    corner = jnp.asarray([-4.0, -4.0, -4.0], jnp.float32)
    grid = vm.build_dense_grid(jnp.asarray(pts), jnp.ones(2, bool), corner,
                               dims, 1.0, 4)
    assert int(grid.n) == 1
    # query near the in-window point
    d2, rows = vm.dense_knn(grid, jnp.asarray([[0.1, 0.0, 0.0]], np.float32),
                            3, dims, 1.0, 4, rings=1)
    d2 = np.asarray(d2)[0]
    assert np.isclose(d2[0], 0.01, atol=1e-5)
    assert np.isinf(d2[1]) and np.isinf(d2[2])
    # query at the window border must not read the overflow dump slot
    d2b, _ = vm.dense_knn(grid, jnp.asarray([[50.0, 50.0, 50.0]], np.float32),
                          3, dims, 1.0, 4, rings=1)
    assert np.all(np.isinf(np.asarray(d2b)))


def test_dense_grid_capacity_overflow_drops():
    rng = np.random.default_rng(1)
    # 100 points in one cell, cap 8 -> only 8 indexed
    pts = (rng.uniform(0, 0.9, (100, 3))).astype(np.float32)
    dims = (4, 4, 4)
    corner = jnp.zeros(3, jnp.float32)
    grid = vm.build_dense_grid(jnp.asarray(pts), jnp.ones(100, bool), corner,
                               dims, 1.0, 8)
    d2, rows = vm.dense_knn(grid, jnp.asarray([[0.5, 0.5, 0.5]], np.float32),
                            16, dims, 1.0, 8, rings=1)
    finite = np.isfinite(np.asarray(d2)[0])
    assert finite.sum() == 8
