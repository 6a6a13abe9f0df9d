"""Map-block sharding over the 8-device mesh: insert / query / roll
equivalence against the single-device VoxelMap (VERDICT r1 item 2)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidarslam_tpu.config import MapConfig
from lidarslam_tpu.ops import voxel_map
from lidarslam_tpu.parallel import sharded, sharded_map


# capacity sized so each of the 8 slab shards (capacity/8 slots) holds its
# share of ~3k uniform points with headroom — per-shard overflow is tested
# separately below
CFG = MapConfig(leaf_size=0.5, voxel_resolution=2.0, grid_size=8,
                capacity=1 << 13, submap_capacity=1 << 11)


@pytest.fixture(scope="module")
def mesh():
    return sharded.make_mesh(8)


def _points(n, seed, lo=-7.5, hi=7.5):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    inten = rng.uniform(0, 100, n).astype(np.float32)
    return xyz, inten


def _content(m):
    """Canonically sorted (xyz, intensity, count, fixed) of the valid slots."""
    v = np.asarray(m.valid)
    xyz = np.asarray(m.xyz)[v]
    rows = np.lexsort((xyz[:, 2], xyz[:, 1], xyz[:, 0]))
    return (xyz[rows], np.asarray(m.intensity)[v][rows],
            np.asarray(m.count)[v][rows], np.asarray(m.fixed)[v][rows])


def _insert(m_ref, m_sh, mesh, xyz, inten, t):
    ones = jnp.ones(len(xyz), bool)
    m_ref = voxel_map.add_points(m_ref, jnp.asarray(xyz), jnp.asarray(inten),
                                 jnp.float32(t), ones, jnp.float32(t), CFG)
    m_sh = sharded_map.add_points_sharded(mesh, m_sh, jnp.asarray(xyz),
                                          jnp.asarray(inten), jnp.float32(t),
                                          ones, jnp.float32(t), CFG)
    return m_ref, m_sh


def test_sharded_insert_matches_global(mesh):
    m_ref = voxel_map.VoxelMap.empty(CFG)
    m_sh = voxel_map.VoxelMap.empty(CFG)
    for batch, seed in ((2000, 0), (1500, 1)):
        xyz, inten = _points(batch, seed)
        m_ref, m_sh = _insert(m_ref, m_sh, mesh, xyz, inten, float(seed))
    a, b = _content(m_ref), _content(m_sh)
    assert len(a[0]) == len(b[0]) > 500
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert int(m_sh.overflow) == 0


def test_sharded_knn_matches_global(mesh):
    m_ref = voxel_map.VoxelMap.empty(CFG)
    m_sh = voxel_map.VoxelMap.empty(CFG)
    xyz, inten = _points(3000, 2)
    m_ref, m_sh = _insert(m_ref, m_sh, mesh, xyz, inten, 0.0)

    q, _ = _points(256, 3, lo=-6.0, hi=6.0)
    view = voxel_map.SubmapView(xyz=m_ref.xyz,
                                ring=jnp.zeros(CFG.capacity, jnp.int32),
                                valid=m_ref.valid)
    d_ref, rows = voxel_map.brute_knn(view, jnp.asarray(q), 8)
    d_sh, nbr_sh, _ = sharded_map.knn_sharded(mesh, m_sh, jnp.asarray(q), 8, CFG)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-6)
    # positions of the winners agree where distances are unique
    nbr_ref = np.asarray(view.xyz)[np.asarray(rows)]
    match = np.isclose(np.asarray(nbr_sh), nbr_ref, atol=1e-5).all(-1)
    assert match.mean() > 0.99


@pytest.mark.parametrize("offset,hops", [((1, 0, 0), 1), ((-1, 2, 0), 1),
                                         ((2, 0, 1), 2)])
def test_sharded_roll_migrates(mesh, offset, hops):
    """Rolling moves points across slab boundaries: ppermute migration must
    reproduce the single-device roll exactly, attributes included."""
    m_ref = voxel_map.VoxelMap.empty(CFG)
    m_sh = voxel_map.VoxelMap.empty(CFG)
    for batch, seed in ((2500, 4), (1000, 5)):  # two inserts -> counts > 1
        xyz, inten = _points(batch, seed)
        m_ref, m_sh = _insert(m_ref, m_sh, mesh, xyz, inten, float(seed))

    off = jnp.asarray(offset, jnp.int32)
    m_ref_r = voxel_map.roll_by_offset(m_ref, off, CFG)
    m_sh_r = sharded_map.roll_sharded(mesh, m_sh, off, CFG, max_hops=hops)
    a, b = _content(m_ref_r), _content(m_sh_r)
    assert len(a[0]) == len(b[0]) > 100
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert int(m_sh_r.overflow) == 0
    # slab invariant: every shard only holds keys it owns
    n = 8
    kx, _, _ = voxel_map._leaf_keys(m_sh_r.xyz, m_sh_r.valid, CFG)
    owner = np.asarray(sharded_map.owner_of(kx, CFG, n))
    valid = np.asarray(m_sh_r.valid)
    cap = CFG.capacity // n
    for d in range(n):
        seg = valid[d * cap:(d + 1) * cap]
        assert (owner[d * cap:(d + 1) * cap][seg] == d).all()


def test_sharded_roll_insufficient_hops_counts_overflow(mesh):
    """A jump larger than max_hops slabs drops migrants into overflow
    instead of silently corrupting shards."""
    m_sh = voxel_map.VoxelMap.empty(CFG)
    xyz, inten = _points(2000, 6)
    ones = jnp.ones(len(xyz), bool)
    m_sh = sharded_map.add_points_sharded(mesh, m_sh, jnp.asarray(xyz),
                                          jnp.asarray(inten), jnp.float32(0),
                                          ones, jnp.float32(0), CFG)
    # offset 2 voxels = 8 leaves > slab width 5 -> needs 2 hops; allow 1
    m_r = sharded_map.roll_sharded(mesh, m_sh, jnp.asarray([2, 0, 0]), CFG,
                                   max_hops=1)
    assert int(m_r.overflow) > 0
    kx, _, _ = voxel_map._leaf_keys(m_r.xyz, m_r.valid, CFG)
    owner = np.asarray(sharded_map.owner_of(kx, CFG, 8))
    valid = np.asarray(m_r.valid)
    cap = CFG.capacity // 8
    for d in range(8):
        seg = valid[d * cap:(d + 1) * cap]
        assert (owner[d * cap:(d + 1) * cap][seg] == d).all()
