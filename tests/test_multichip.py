"""Sharded registration on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_matches_single_device():
    """The psum-reduced sharded solve must produce the same pose as the
    single-device solve (same inputs, same schedule)."""
    import __graft_entry__ as g
    from lidarslam_tpu.config import Keypoint, MatchingConfig, SolverConfig
    from lidarslam_tpu.ops import icp
    from lidarslam_tpu.parallel import sharded

    inputs, geoms, pose0 = g._tiny_icp_setup(q=64)
    kwargs = dict(types=(Keypoint.EDGE, Keypoint.PLANE), params=MatchingConfig(),
                  solver_cfg=SolverConfig(), icp_iters=3, lm_max_iter=15,
                  min_matches=20, geoms=geoms)
    single = icp.icp_register(inputs, pose0=pose0, **kwargs)
    mesh = sharded.make_mesh(8)
    multi = sharded.sharded_icp_register(mesh, inputs, kwargs["types"], pose0,
                                         kwargs["params"], kwargs["solver_cfg"],
                                         3, 15, 20, geoms)
    assert int(multi.total_matches) == int(single.total_matches)
    np.testing.assert_allclose(np.asarray(multi.pose), np.asarray(single.pose),
                               atol=1e-4)


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    pose = jax.jit(fn)(*args)
    pose = np.asarray(pose)
    assert pose.shape == (6,) and np.all(np.isfinite(pose))


def _golden(n_frames=15):
    from lidarslam_tpu.io import synthetic

    return synthetic.generate_sequence(
        n_frames=n_frames, motion_distortion=False,
        sensor=synthetic.SensorModel(range_noise=0.005))


def test_sharded_full_pipeline_matches_single_device():
    """The REAL pipeline (extraction -> ego-motion -> scan-to-map ICP ->
    keyframe gate -> rolling-map update) under an 8-device mesh must track
    the single-device result over a golden sequence (VERDICT r1 item 1)."""
    from lidarslam_tpu.parallel import sharded
    from lidarslam_tpu.slam import Slam
    from tests.test_slam_e2e import small_config

    frames = _golden()
    ref = Slam(small_config())
    ref_poses = [ref.add_frame(f)["pose"] for f in frames]

    mesh = sharded.make_mesh(8)
    spmd = Slam(small_config(), mesh=mesh)
    spmd_poses = [spmd.add_frame(f)["pose"] for f in frames]

    for i, (a, b) in enumerate(zip(ref_poses, spmd_poses)):
        dt = np.linalg.norm(a[:3, 3] - b[:3, 3])
        dR = a[:3, :3].T @ b[:3, :3]
        ang = np.rad2deg(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        # identical math up to psum reassociation; bounds leave room for the
        # reassociated float32 normal equations feeding back through ICP
        # pure float32 reassociation across the psum: measured ~6e-5 m
        # on 15 frames (dryrun equivalence); bound at ~1e-3
        assert dt < 1e-3, f"frame {i}: position diff {dt}"
        assert ang < 0.01, f"frame {i}: rotation diff {ang}"
    # identical map content scale
    k = list(ref.maps)[0]
    n_ref = len(ref.get_map_points(k)[0])
    n_spmd = len(spmd.get_map_points(k)[0])
    assert abs(n_ref - n_spmd) <= max(10, 0.02 * n_ref)
    # per-keypoint debug surface is reassembled (all_gather) to full size
    dbg = spmd.get_debug_array()
    assert any(v.size > 0 for v in dbg.values())


def test_sharded_map_pipeline_matches_single_device():
    """Full pipeline with the ROLLING MAPS slab-sharded over the mesh
    (Slam(shard_maps=True)): slab-local k-NN + ICI top-k merge, slab-masked
    inserts, ppermute roll migration — must reproduce the single-device
    trajectory and map content (VERDICT r1 item 2)."""
    import jax.numpy as jnp

    from lidarslam_tpu.ops import voxel_map
    from lidarslam_tpu.parallel import sharded, sharded_map
    from lidarslam_tpu.slam import Slam
    from tests.test_slam_e2e import small_config

    frames = _golden(n_frames=10)
    ref = Slam(small_config())
    ref_poses = [ref.add_frame(f)["pose"] for f in frames]

    mesh = sharded.make_mesh(8)
    sm = Slam(small_config(), mesh=mesh, shard_maps=True)
    sm_poses = [sm.add_frame(f)["pose"] for f in frames]

    for i, (a, b) in enumerate(zip(ref_poses, sm_poses)):
        dt = np.linalg.norm(a[:3, 3] - b[:3, 3])
        assert dt < 1e-3, f"frame {i}: position diff {dt}"
    # identical map content (the sharded map holds the same leaves)
    for k in ref.maps:
        pr = ref.get_map_points(k)[0]
        ps = sm.get_map_points(k)[0]
        assert abs(len(pr) - len(ps)) <= max(5, 0.02 * len(pr))
        # slab invariant: every shard only holds keys it owns
        m = sm.maps[k]
        cfg_k = sm.map_cfgs[k]
        kx, _, _ = voxel_map._leaf_keys(jnp.asarray(np.asarray(m.xyz)),
                                        jnp.asarray(np.asarray(m.valid)), cfg_k)
        owner = np.asarray(sharded_map.owner_of(kx, cfg_k, 8))
        valid = np.asarray(m.valid)
        cap = cfg_k.capacity // 8
        for d in range(8):
            seg = valid[d * cap:(d + 1) * cap]
            assert (owner[d * cap:(d + 1) * cap][seg] == d).all()
    assert sm.get_debug_information()["map_overflow_plane"] == 0


def test_sharded_streaming_matches_sync():
    """Streaming (device-chained) mode under the mesh == sharded sync mode."""
    from lidarslam_tpu.parallel import sharded
    from lidarslam_tpu.slam import Slam
    from tests.test_slam_e2e import small_config

    frames = _golden(n_frames=8)
    mesh = sharded.make_mesh(8)
    sync = Slam(small_config(), mesh=mesh)
    sync_poses = [sync.add_frame(f)["pose"] for f in frames]

    stream = Slam(small_config(), mesh=mesh)
    for f in frames:
        stream.add_frame_async(f)
    outs = stream.flush()
    assert len(outs) == len(frames)
    for i, (a, o) in enumerate(zip(sync_poses, outs)):
        dt = np.linalg.norm(a[:3, 3] - o["pose"][:3, 3])
        assert dt < 1e-3, f"frame {i}: stream-vs-sync diff {dt}"


def test_shard_extraction_matches_single_device():
    """Ring-sharded extraction (shard_extraction=True): every extraction
    stage is per-ring independent, so the sharded extractor must reproduce
    the single-device trajectory on an unsaturated scene (keypoint sets
    identical up to compaction order)."""
    import dataclasses

    from lidarslam_tpu.io import synthetic
    from lidarslam_tpu.parallel import sharded
    from lidarslam_tpu.slam import Slam
    from tests.test_slam_e2e import small_config

    frames = synthetic.generate_sequence(n_frames=6, motion_distortion=False)
    cfg = small_config()
    # unsaturated keypoint budget: at saturation the global even-spread
    # compaction and the per-slice K/n budgets legitimately keep different
    # subsets (extract_sharded docstring), so equivalence needs headroom
    cfg = dataclasses.replace(
        cfg, extractor=dataclasses.replace(cfg.extractor, max_keypoints=4096))
    ref = Slam(cfg)
    for f in frames:
        rr = ref.add_frame(f)

    mesh = sharded.make_mesh(8)
    sx = Slam(cfg, mesh=mesh, shard_extraction=True)
    for f in frames:
        rs = sx.add_frame(f)
    dt = np.linalg.norm(rs["pose"][:3, 3] - rr["pose"][:3, 3])
    assert dt < 1e-3, dt
    assert abs(rs["n_matches"] - rr["n_matches"]) <= max(
        10, 0.02 * rr["n_matches"])

    # streaming + windowed path too
    st = Slam(cfg, mesh=mesh, shard_extraction=True)
    for f in frames:
        st.add_frame_async(f)
    outs = st.flush()
    d2 = np.linalg.norm(outs[-1]["pose"][:3, 3] - rr["pose"][:3, 3])
    assert d2 < 1e-3, d2
