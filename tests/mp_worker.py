"""Worker process for the jax.distributed multi-process CPU test.

Usage: python mp_worker.py <process_id> <num_processes> <port>

Each process exposes 4 virtual CPU devices; the global mesh spans
num_processes * 4 devices across OS processes with gloo collectives — the
DCN stand-in for multi-host TPU (SURVEY.md §4 pod-slice testing). The
worker drives the slab-sharded rolling map (insert / exact k-NN with the
cross-process top-k merge / roll with ppermute migration) and the
keypoint-sharded ICP against single-device references computed locally,
then prints MP_OK.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
jax.distributed.initialize(f"localhost:{port}", nproc, pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lidarslam_tpu.config import Keypoint, MapConfig, MatchingConfig, \
    SolverConfig  # noqa: E402
from lidarslam_tpu.ops import icp, voxel_map  # noqa: E402
from lidarslam_tpu.parallel import sharded, sharded_map  # noqa: E402

n_dev = nproc * 4
assert jax.device_count() == n_dev, jax.device_count()
mesh = Mesh(np.asarray(jax.devices()), (sharded_map.AXIS,))

CFG = MapConfig(leaf_size=0.5, voxel_resolution=2.0, grid_size=8,
                capacity=1 << 13, submap_capacity=1 << 11)

rng = np.random.default_rng(0)
pts = rng.uniform(-7.5, 7.5, (3000, 3)).astype(np.float32)
inten = rng.uniform(0, 100, 3000).astype(np.float32)
queries = rng.uniform(-6, 6, (256, 3)).astype(np.float32)

# ---- sharded map across processes ----
gmap = jax.tree.map(
    lambda a, s: jax.device_put(np.asarray(a), NamedSharding(mesh, s)),
    voxel_map.VoxelMap.empty(CFG), sharded_map.map_spec())
ones = jnp.ones(len(pts), bool)
gmap = sharded_map.add_points_sharded(mesh, gmap, pts, inten,
                                      jnp.float32(0), ones, jnp.float32(0), CFG)
d2_sh, nbr_sh, _ = sharded_map.knn_sharded(mesh, gmap, queries, 8, CFG)
gmap = sharded_map.roll_sharded(mesh, gmap, jnp.asarray([1, 0, 0]), CFG,
                                max_hops=2)
d2_sh2, _, _ = sharded_map.knn_sharded(mesh, gmap, queries - np.asarray(
    [2.0, 0, 0], np.float32), 8, CFG)

# ---- single-device reference (identical on every process) ----
m_ref = voxel_map.add_points(voxel_map.VoxelMap.empty(CFG), jnp.asarray(pts),
                             jnp.asarray(inten), jnp.float32(0), ones,
                             jnp.float32(0), CFG)
view = voxel_map.SubmapView(xyz=m_ref.xyz,
                            ring=jnp.zeros(CFG.capacity, jnp.int32),
                            valid=m_ref.valid)
d2_ref, _ = voxel_map.brute_knn(view, jnp.asarray(queries), 8)
m_ref2 = voxel_map.roll_by_offset(m_ref, jnp.asarray([1, 0, 0]), CFG)
view2 = voxel_map.SubmapView(xyz=m_ref2.xyz,
                             ring=jnp.zeros(CFG.capacity, jnp.int32),
                             valid=m_ref2.valid)
d2_ref2, _ = voxel_map.brute_knn(
    view2, jnp.asarray(queries - np.asarray([2.0, 0, 0], np.float32)), 8)

np.testing.assert_allclose(np.asarray(d2_sh), np.asarray(d2_ref),
                           rtol=1e-5, atol=1e-6)
np.testing.assert_allclose(np.asarray(d2_sh2), np.asarray(d2_ref2),
                           rtol=1e-5, atol=1e-6)
assert int(gmap.overflow) == 0

# ---- keypoint-sharded ICP across processes ----
sys.path.insert(0, "/root/repo")
import __graft_entry__ as g  # noqa: E402

q = 64 * n_dev // 8 * 8 or 64
inputs, geoms, pose0 = g._tiny_icp_setup(q=max(64, n_dev * 8))
res = sharded.sharded_icp_register(
    mesh, inputs, (Keypoint.EDGE, Keypoint.PLANE), pose0,
    MatchingConfig(), SolverConfig(), icp_iters=3, lm_max_iter=15,
    min_matches=20, geoms=(None, None, None))
single = icp.icp_register(
    inputs, types=(Keypoint.EDGE, Keypoint.PLANE), pose0=pose0,
    params=MatchingConfig(), solver_cfg=SolverConfig(), icp_iters=3,
    lm_max_iter=15, min_matches=20, geoms=(None, None, None))
np.testing.assert_allclose(np.asarray(res.pose), np.asarray(single.pose),
                           atol=1e-4)
assert int(res.total_matches) == int(single.total_matches)

print(f"MP_OK pid={pid} devices={n_dev} matches={int(res.total_matches)}",
      flush=True)
