"""Mapping modes (NONE / ADD_KPTS_TO_FIXED_MAP / UPDATE) and log storage."""

import dataclasses

import numpy as np
import pytest

from lidarslam_tpu import Slam
from lidarslam_tpu.config import (ExtractorConfig, Keypoint, LoggingStorage,
                                  MapConfig, MappingMode, SlamConfig)
from lidarslam_tpu.io import synthetic


def _cfg(**kw):
    return SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024, max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26), **kw)


def test_localization_only_on_frozen_map(tmp_path):
    """MappingMode.NONE: localize on a loaded map without ever touching it."""
    frames = synthetic.generate_sequence(n_frames=6, motion_distortion=False)
    builder = Slam(_cfg())
    for f in frames[:4]:
        builder.add_frame(f)
    prefix = str(tmp_path / "map_")
    builder.save_maps_to_pcd(prefix)

    loc = Slam(_cfg(mapping_mode=MappingMode.NONE))
    loc.load_maps_from_pcd(prefix)
    n0 = len(loc.get_map_points(Keypoint.PLANE)[0])
    loc.set_world_transform_from_guess(builder.get_world_transform())
    for f in frames[4:]:
        r = loc.add_frame({**f})
        assert not r["failure"]
        assert r["n_matches"] > 100
    # map untouched
    assert len(loc.get_map_points(Keypoint.PLANE)[0]) == n0


@pytest.mark.parametrize("mode", [LoggingStorage.HOST, LoggingStorage.COMPRESSED,
                                  LoggingStorage.DISK])
def test_logging_storage_backends(mode, tmp_path):
    from lidarslam_tpu.io import storage

    frames = synthetic.generate_sequence(n_frames=5, motion_distortion=False)
    slam = Slam(_cfg(logging_storage=mode, logging_dir=str(tmp_path / "log")))
    for f in frames:
        slam.add_frame(f)
    assert len(slam.log_keypoints) == 5
    kp = slam.log_keypoints[-1][Keypoint.PLANE]
    mem = slam.get_log_memory_usage()
    if mode == LoggingStorage.COMPRESSED:
        assert isinstance(kp, storage.CompressedCloud)
        assert kp.qxyz.dtype == np.int16
        # quantized restore stays within the 2 mm bound
        host = storage.restore(kp)
        raw = np.asarray(slam.current_keypoints[Keypoint.PLANE].xyz)[:len(host.xyz)]
        assert np.abs(host.xyz - raw).max() < storage.QUANT
        assert mem["ram"] > 0 and mem["disk"] == 0
    elif mode == LoggingStorage.DISK:
        assert isinstance(kp, storage.DiskCloud)
        import os
        assert os.path.exists(kp.path)
        assert mem["disk"] > 0
        # RAM held is just the path strings
        assert mem["ram"] < 10_000
    else:
        assert mem["ram"] > 0
    # PGO replay works from every backend
    from lidarslam_tpu.core import se3
    gt0 = frames[0]["gt_pose"]
    gps = np.stack([(se3.hmat_inverse(gt0) @ f["gt_pose"])[:3, 3] for f in frames])
    ok = slam.run_pose_graph_optimization(gps, [f["stamp"] for f in frames])
    assert ok
    assert len(slam.get_map_points(Keypoint.PLANE)[0]) > 100


def test_compressed_is_smaller_than_host():
    frames = synthetic.generate_sequence(n_frames=3, motion_distortion=False)
    sizes = {}
    for mode in (LoggingStorage.HOST, LoggingStorage.COMPRESSED):
        slam = Slam(_cfg(logging_storage=mode))
        for f in frames:
            slam.add_frame(f)
        sizes[mode] = slam.get_log_memory_usage()["ram"]
    assert sizes[LoggingStorage.COMPRESSED] < sizes[LoggingStorage.HOST] / 2.2


def test_checkpoint_roundtrip(tmp_path):
    """save_checkpoint/load_checkpoint resume mid-sequence with identical
    downstream results."""
    frames = synthetic.generate_sequence(n_frames=8, motion_distortion=False)
    a = Slam(_cfg())
    for f in frames[:5]:
        a.add_frame(f)
    ckpt = str(tmp_path / "state.npz")
    a.save_checkpoint(ckpt)
    for f in frames[5:]:
        ra = a.add_frame(f)

    b = Slam(_cfg())
    b.load_checkpoint(ckpt)
    assert b.n_frames == 5
    # overflow tracker re-baselined from the restored maps: the first
    # post-restore frame must not re-report pre-checkpoint drops
    for k in b.cfg.used_types:
        assert b.map_overflow[int(k)] == int(np.asarray(b.maps[k].overflow))
    np.testing.assert_allclose(b.get_world_transform(),
                               a.log_trajectory[4]["pose"], atol=1e-12)
    for f in frames[5:]:
        rb = b.add_frame(f)
    np.testing.assert_allclose(rb["pose"], ra["pose"], atol=5e-3)


def test_submap_cache_rebuild_discipline(tmp_path):
    """The cached submap selection goes stale exactly when the maps change:
    after keyframe updates (Slam.cxx:1008-1035 kd-tree validity parity) and
    after external map mutations (PCD load)."""
    frames = synthetic.generate_sequence(n_frames=8, motion_distortion=False)
    slam = Slam(_cfg())
    prev_kf = 0
    for f in frames:
        slam.add_frame(f)
        was_kf = slam.kf_counter > prev_kf
        prev_kf = slam.kf_counter
        assert bool(np.asarray(slam._cache_stale)) == bool(was_kf)
    prefix = str(tmp_path / "m_")
    slam.save_maps_to_pcd(prefix)
    slam.load_maps_from_pcd(prefix)
    assert bool(np.asarray(slam._cache_stale))
    # and the next frame still matches after the invalidation
    r = slam.add_frame({**frames[-1], "stamp": frames[-1]["stamp"] + 0.1})
    assert r["n_matches"] > 100
