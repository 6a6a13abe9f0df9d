"""Brute-force k-NN exactness (kd-tree parity) and submap view selection."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from lidarslam_tpu.config import MapConfig
from lidarslam_tpu.ops import voxel_map as vm


def _view(pts, valid=None):
    pts = np.asarray(pts, np.float32)
    v = np.ones(len(pts), bool) if valid is None else np.asarray(valid, bool)
    return vm.SubmapView(xyz=jnp.asarray(pts), ring=jnp.zeros(len(pts), jnp.int32),
                         valid=jnp.asarray(v))


def test_brute_knn_exact_vs_numpy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (5000, 3)).astype(np.float32)
    valid = rng.uniform(size=5000) > 0.2
    q = rng.uniform(-40, 40, (200, 3)).astype(np.float32)
    d2, idx = vm.brute_knn(_view(pts, valid), jnp.asarray(q), 8, chunk=1024,
                           recall_target=1.0)
    d2, idx = np.asarray(d2), np.asarray(idx)
    for i in range(200):
        bd = np.sum((pts - q[i]) ** 2, axis=1)
        bd[~valid] = np.inf
        want_order = np.argsort(bd)[:8]
        np.testing.assert_allclose(d2[i], bd[want_order], rtol=1e-4, atol=1e-4)
        # indices agree up to ties
        np.testing.assert_allclose(bd[idx[i]], bd[want_order], rtol=1e-4, atol=1e-4)
    # ascending order
    assert np.all(np.diff(d2, axis=1) >= -1e-6)


def test_brute_knn_handles_small_and_empty_targets():
    d2, idx = vm.brute_knn(_view(np.zeros((3, 3))), jnp.zeros((4, 3)), 5)
    d2 = np.asarray(d2)
    assert np.isfinite(d2[:, :3]).all() and np.isinf(d2[:, 3:]).all()
    d2, idx = vm.brute_knn(_view(np.zeros((3, 3)), valid=[False] * 3),
                           jnp.zeros((4, 3)), 5)
    assert np.isinf(np.asarray(d2)).all()


def test_extract_submap_view_filters():
    cfg = dataclasses.replace(MapConfig(grid_size=10, voxel_resolution=2.0,
                                        leaf_size=0.5, capacity=4096),
                              min_frames_per_voxel=2)
    m = vm.VoxelMap.empty(cfg)
    pts = np.array([[1.0, 1.0, 0.0], [8.0, 8.0, 0.0]], np.float32)
    m = vm.add_points(m, jnp.asarray(pts), jnp.zeros(2), jnp.float32(0),
                      jnp.ones(2, bool), jnp.float32(0), cfg)
    m = vm.add_points(m, jnp.asarray(pts[:1]), jnp.zeros(1), jnp.float32(1),
                      jnp.ones(1, bool), jnp.float32(1), cfg)
    view = vm.extract_submap_view(m, jnp.asarray([-3.0] * 3), jnp.asarray([4.0] * 3),
                                  jnp.int32(1), cfg)
    sel = np.asarray(view.valid)
    xyz = np.asarray(view.xyz)[sel]
    assert len(xyz) == 1
    np.testing.assert_allclose(xyz, [[1.0, 1.0, 0.0]], atol=1e-5)


def test_brute_knn_default_recall_close_to_exact():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-50, 50, (20000, 3)).astype(np.float32)
    q = rng.uniform(-40, 40, (256, 3)).astype(np.float32)
    view = _view(pts)
    d_ex, _ = vm.brute_knn(view, jnp.asarray(q), 10, recall_target=1.0)
    d_ap, _ = vm.brute_knn(view, jnp.asarray(q), 10)  # default 0.99 recall
    d_ex, d_ap = np.asarray(d_ex), np.asarray(d_ap)
    # the approx path may miss a borderline neighbor occasionally, never badly
    agree = np.isclose(d_ex, d_ap, rtol=1e-4, atol=1e-5).mean()
    assert agree > 0.97, agree
