"""Config plumbing regressions: 2d_mode end-to-end, streaming motion limits,
CLI ring-count override behavior (round-2 VERDICT items 3 / ADVICE items)."""

import dataclasses

import numpy as np
import pytest

from lidarslam_tpu import Slam
from lidarslam_tpu.config import (ConfidenceConfig, ExtractorConfig, MapConfig,
                                  SlamConfig)
from lidarslam_tpu.core import se3
from lidarslam_tpu.io import synthetic
from lidarslam_tpu.io.yaml_config import load_config


def _small(cfg: SlamConfig, **kw) -> SlamConfig:
    return dataclasses.replace(
        cfg,
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024,
                                  max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        **kw)


def test_yaml_2d_mode_reaches_solver():
    cfg = load_config(text="slam:\n  2d_mode: true\n")
    assert cfg.two_d_mode is True
    assert cfg.solver.two_d_mode is True


def test_slamconfig_2d_mode_forwarded_by_slam():
    slam = Slam(_small(SlamConfig(two_d_mode=True)))
    assert slam.cfg.solver.two_d_mode is True


def test_2d_mode_freezes_z_end_to_end():
    """A climbing trajectory: 2d_mode must hold z ~ 0 while the full 6-DoF
    solve tracks the climb (LocalOptimizer.cxx:89-90 semantics)."""
    def climb(t):
        return se3.pose_to_hmat([2.0 * t, 0.0, 1.8 + 0.4 * t, 0.0, 0.0, 0.0])

    frames = synthetic.generate_sequence(n_frames=6, trajectory=climb,
                                         motion_distortion=False)
    cfg2d = _small(load_config(text="slam:\n  2d_mode: true\n"))
    cfg3d = _small(SlamConfig())

    z2d, z3d = [], []
    for cfg, zs in ((cfg2d, z2d), (cfg3d, z3d)):
        slam = Slam(cfg)
        for f in frames:
            r = slam.add_frame(f)
            assert not r.get("failure", False)
            zs.append(r["pose"][2, 3])
    # ground-truth climb over 5 relative steps = 0.4 * 0.5 s = 0.2 m
    assert abs(z2d[-1]) < 0.02, f"2d run drifted in z: {z2d}"
    assert z3d[-1] > 0.1, f"6-DoF run failed to track the climb: {z3d}"


def test_streaming_flush_updates_motion_limits():
    """comply_motion_limits must be recomputed per flushed frame
    (Slam.cxx:1391-1484; round-1 bug: flush() skipped the checker)."""
    conf = ConfidenceConfig(time_window_duration=0.05,
                            velocity_limits=(0.5, 1e9),
                            acceleration_limits=(1e9, 1e9))
    frames = synthetic.generate_sequence(n_frames=6, motion_distortion=False)

    sync = Slam(_small(SlamConfig(confidence=conf)))
    sync_comply = [sync.add_frame(f)["comply_motion_limits"] for f in frames]

    stream = Slam(_small(SlamConfig(confidence=conf)))
    for f in frames:
        stream.add_frame_async(f)
    outs = stream.flush()
    stream_comply = [o["comply_motion_limits"] for o in outs]

    # the 2 m/s synthetic motion violates the 0.5 m/s limit once moving
    assert not all(stream_comply), stream_comply
    assert stream_comply == sync_comply


def test_cli_rings_respects_yaml(tmp_path):
    from lidarslam_tpu import cli

    cfgfile = tmp_path / "cfg.yaml"
    cfgfile.write_text("slam: {}\ntpu:\n  n_rings: 64\n  max_ring_points: 512\n")
    ap_args = cli.main.__wrapped__ if hasattr(cli.main, "__wrapped__") else None
    # drive _build_slam directly with a parsed namespace
    import argparse
    args = argparse.Namespace(config=str(cfgfile), rings=None,
                              max_ring_points=None, max_keypoints=None,
                              verbosity=0)
    slam = cli._build_slam(args)
    assert slam.cfg.extractor.n_rings == 64
    assert slam.cfg.extractor.max_ring_points == 512

    args.rings = 32
    slam = cli._build_slam(args)
    assert slam.cfg.extractor.n_rings == 32
    assert slam.cfg.extractor.max_ring_points == 512
