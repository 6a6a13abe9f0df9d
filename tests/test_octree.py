"""Octree compression codec (io/octree.py) — the OCTREE logging backend.

Parity target: the reference's octree-compressed-RAM PointCloudStorage
backend (PointCloudStorage.h:169-242): lossy positions at leaf resolution,
~5x size reduction on real clouds, exact point counts and attributes.
"""

import numpy as np
import pytest

from lidarslam_tpu.io import octree, storage
from lidarslam_tpu.config import LoggingStorage


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 1 << 21, size=(4096, 3), dtype=np.uint32)
    codes = octree.morton_encode(q)
    back = octree.morton_decode(codes)
    np.testing.assert_array_equal(back, q)


def test_morton_order_locality():
    # codes of equal prefixes share octree nodes: children of one parent
    # differ only in the low 3 bits
    q = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.uint32)
    c = octree.morton_encode(q)
    assert set(c) == {0, 1, 2, 4}


@pytest.mark.parametrize("n", [0, 1, 7, 5000])
def test_roundtrip_bounds(n):
    rng = np.random.default_rng(n)
    xyz = rng.uniform(-40, 40, size=(n, 3))
    inten = rng.uniform(0, 200, size=n).astype(np.float32)
    tim = rng.uniform(-0.05, 0.05, size=n).astype(np.float32)
    ring = rng.integers(0, 64, size=n).astype(np.int32)
    res = 0.004
    oc = octree.encode(xyz, intensity=inten, time=tim, ring=ring, resolution=res)
    assert oc.n == n
    d = octree.decode(oc)
    assert len(d["xyz"]) == n
    if n == 0:
        return
    # decoded points are the leaf centers in Morton order: recompute the
    # expected centers host-side and compare positionally (f32 rounding only)
    origin = xyz.min(axis=0)
    q = np.floor((xyz - origin) / res)
    exp_centers = origin + (q + 0.5) * res
    order = np.argsort(octree.morton_encode(q.astype(np.uint64)), kind="stable")
    assert np.abs(exp_centers[order] - d["xyz"].astype(np.float64)).max() <= 5e-6
    # and the quantization error bound holds per axis
    assert np.abs(exp_centers - xyz).max() <= res / 2 + 1e-12
    # attributes are exact (u8/f16 casts) and aligned with the point order
    assert d["intensity"].max() <= 255
    assert np.abs(np.sort(d["time"]) - np.sort(tim.astype(np.float16).astype(np.float32))).max() == 0
    assert set(d["ring"]) <= set(ring)


def test_duplicate_points_counts():
    # >255 copies of one point exercise the u32 count escape
    xyz = np.zeros((300, 3)) + [1.0, 2.0, 3.0]
    xyz = np.concatenate([xyz, [[5.0, 5.0, 5.0]]])
    oc = octree.encode(xyz)
    d = octree.decode(oc)
    assert len(d["xyz"]) == 301
    assert (np.abs(d["xyz"] - [1, 2, 3]).max(axis=1) < 0.005).sum() == 300


def test_compression_ratio_on_coherent_cloud():
    # a spatially coherent (scan-like) cloud: the occupancy stream shares
    # prefixes and DEFLATE squeezes it. Target: >= 4x vs raw float32 layout
    # (the reference quotes ~5x for PCL octree compression).
    rng = np.random.default_rng(3)
    t = np.linspace(0, 60, 20000)
    xyz = np.stack([t, 3 * np.sin(t * 0.3), 0.05 * t], 1)
    xyz += rng.normal(scale=0.15, size=xyz.shape)
    inten = rng.uniform(0, 100, len(xyz)).astype(np.float32)
    tim = np.linspace(0, 0.1, len(xyz)).astype(np.float32)
    ring = (np.arange(len(xyz)) % 16).astype(np.int32)
    oc = octree.encode(xyz, intensity=inten, time=tim, ring=ring)
    raw_bytes = len(xyz) * (12 + 4 + 4 + 4)  # f32 xyz + intensity + time + ring
    ratio = raw_bytes / len(oc.blob)
    assert ratio >= 4.0, f"ratio {ratio:.2f}"
    # codec must also beat the int16 COMPRESSED layout (10 B/point)
    assert len(oc.blob) < len(xyz) * 10


def test_storage_backend_integration():
    # store()/restore()/memory_size() speak OCTREE end-to-end
    from typing import NamedTuple

    rng = np.random.default_rng(7)
    n = 500

    class FakeKp(NamedTuple):
        count: int
        xyz: np.ndarray
        intensity: np.ndarray
        time: np.ndarray
        ring: np.ndarray

    kp = FakeKp(count=n,
                xyz=rng.uniform(-10, 10, size=(n, 3)).astype(np.float32),
                intensity=rng.uniform(0, 90, n).astype(np.float32),
                time=rng.uniform(0, 0.1, n).astype(np.float32),
                ring=rng.integers(0, 16, n).astype(np.int32))
    obj = storage.store(kp, LoggingStorage.OCTREE)
    assert isinstance(obj, octree.OctreeCloud)
    h = storage.restore(obj)
    assert len(h.xyz) == n
    # decoded = leaf centers in Morton order; check against recomputed centers
    origin = kp.xyz.astype(np.float64).min(axis=0)
    q = np.floor((kp.xyz.astype(np.float64) - origin) / storage.QUANT)
    centers = origin + (q + 0.5) * storage.QUANT
    order = np.argsort(octree.morton_encode(q.astype(np.uint64)), kind="stable")
    assert np.abs(centers[order] - h.xyz.astype(np.float64)).max() <= 5e-6
    mem = storage.memory_size(obj)
    assert 0 < mem["ram"] < n * 24  # smaller than the raw HOST layout
    assert mem["disk"] == 0


def test_yaml_storage_mapping():
    # reference logging_storage: 1 = octree-compressed RAM
    from lidarslam_tpu.io.yaml_config import load_config

    cfg = load_config(text="slam:\n  logging_storage: 1\n")
    assert cfg.logging_storage == LoggingStorage.OCTREE
