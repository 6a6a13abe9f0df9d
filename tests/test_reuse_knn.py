"""reuse_knn mode: k-NN queried once per frame, neighbors reused across
ICP rounds (MatchingConfig.reuse_knn — the TPU-first deviation from the
reference's per-round re-query, Slam.cxx:1086-1090). The pose moves
centimeters between rounds against a metres-wide neighbor gate, so the
trajectory must stay metrically equal to the exact-requery mode."""

import dataclasses

import numpy as np

from lidarslam_tpu import Slam, SlamConfig
from lidarslam_tpu.config import ExtractorConfig, MapConfig
from lidarslam_tpu.io import synthetic


def _cfg(reuse):
    cfg = SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024,
                                  max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 14),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 14),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 14))
    return dataclasses.replace(
        cfg, loc_matching=dataclasses.replace(cfg.loc_matching,
                                              reuse_knn=reuse))


def test_reuse_knn_matches_exact_requery():
    frames = synthetic.generate_sequence(n_frames=12, motion_distortion=False)
    runs = {}
    for reuse in (False, True):
        slam = Slam(_cfg(reuse))
        poses, matches = [], []
        for f in frames:
            r = slam.add_frame(f)
            assert not r["failure"]
            poses.append(r["pose"][:3, 3])
            matches.append(r["n_matches"])
        runs[reuse] = (np.stack(poses), np.asarray(matches))

    d = np.linalg.norm(runs[True][0] - runs[False][0], axis=1)
    # the neighbor sets differ only where the pose correction moved a query
    # across the k-NN boundary; the trajectory must agree to sub-cm
    assert d.max() < 0.01, d
    m_exact, m_reuse = runs[False][1], runs[True][1]
    assert np.all(np.abs(m_exact - m_reuse) <= 0.05 * m_exact + 5), \
        (m_exact, m_reuse)


def test_reuse_knn_streaming_path():
    frames = synthetic.generate_sequence(n_frames=10, motion_distortion=False)
    slam_a = Slam(_cfg(True))
    for f in frames:
        slam_a.add_frame_async(f)
    outs = slam_a.flush()
    assert len(outs) == len(frames)
    assert not any(o["failure"] for o in outs)

    slam_b = Slam(_cfg(False))
    for f in frames:
        slam_b.add_frame_async(f)
    outs_b = slam_b.flush()
    d = np.linalg.norm(outs[-1]["pose"][:3, 3] - outs_b[-1]["pose"][:3, 3])
    assert d < 0.01, d
