"""Aggregated-cloud + trajectory export (the vtkSlam output surface,
vtkSlam.cxx:47-60, 327-398, 631-665)."""

import json
import os

import numpy as np
import pytest

from lidarslam_tpu import Slam
from lidarslam_tpu.config import (ExtractorConfig, Keypoint, LoggingStorage,
                                  MapConfig, SlamConfig)
from lidarslam_tpu.core import se3
from lidarslam_tpu.io import export, pcd, synthetic


def _cfg(**kw):
    return SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024,
                                  max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        **kw)


@pytest.fixture(scope="module")
def run():
    frames = synthetic.generate_sequence(n_frames=6, motion_distortion=False)
    slam = Slam(_cfg())
    outs = [slam.add_frame(f) for f in frames]
    return slam, frames, outs


def test_aggregate_logged_frames(run):
    slam, frames, _ = run
    agg = export.aggregate_logged_frames(slam)
    n = len(agg["xyz"])
    assert n > 1000
    assert agg["label"].shape == (n,) and agg["frame_id"].shape == (n,)
    assert set(np.unique(agg["frame_id"])) == set(range(6))
    # world-frame sanity: keypoints of frame i must lie near the raw sweep
    # of frame i transformed by its gt pose (trajectory error < 0.2 m)
    gt0 = frames[0]["gt_pose"]
    last = agg["xyz"][agg["frame_id"] == 5]
    gt = se3.hmat_inverse(gt0) @ frames[5]["gt_pose"]
    world = frames[5]["xyz"] @ gt[:3, :3].T + gt[:3, 3]
    from scipy.spatial import cKDTree
    d, _ = cKDTree(world).query(last[:200], k=1)
    assert np.median(d) < 0.2, np.median(d)


def test_trajectory_csv_roundtrip(tmp_path, run):
    slam, _, outs = run
    path = tmp_path / "Trajectory.csv"
    n = export.write_trajectory_csv(path, slam, extras=outs)
    assert n == 6
    back = export.read_trajectory_csv(path)
    assert len(back) == 6
    for e, b in zip(slam.log_trajectory, back):
        assert abs(e["time"] - b["time"]) < 1e-9
        assert np.allclose(e["pose"], b["pose"], atol=1e-6)
        assert np.allclose(e["covariance"], b["covariance"], rtol=1e-6)
    # extras columns present
    with open(path) as f:
        header = f.readline()
    assert "overlap" in header and "n_matches" in header


def test_trajectory_ply(tmp_path, run):
    slam, _, _ = run
    path = tmp_path / "trajectory.ply"
    n = export.save_trajectory_ply(path, slam)
    text = path.read_text()
    assert text.startswith("ply")
    assert f"element vertex {n}" in text
    assert f"element edge {n - 1}" in text
    body = [l for l in text.splitlines()[text.splitlines().index("end_header") + 1:]]
    assert len(body) == n + (n - 1)


def test_disk_log_aggregate_matches_live(tmp_path, run):
    """Offline aggregate (DISK log + Trajectory.csv) == live aggregate."""
    slam_live, frames, _ = run
    log_dir = str(tmp_path / "kplog")
    slam = Slam(_cfg(logging_storage=LoggingStorage.DISK,
                     logging_dir=log_dir))
    for f in frames:
        slam.add_frame(f)
    export.write_trajectory_csv(tmp_path / "T.csv", slam)
    traj = export.read_trajectory_csv(tmp_path / "T.csv")
    off = export.aggregate_disk_log(log_dir, traj, undistort=False)
    live = export.aggregate_logged_frames(slam)
    assert len(off["xyz"]) == len(live["xyz"])
    # DISK stores f32 exactly; quaternion roundtrip costs < 1e-4 m
    assert np.allclose(
        np.sort(off["xyz"][off["frame_id"] == 3], axis=0),
        np.sort(live["xyz"][live["frame_id"] == 3], axis=0), atol=1e-3)


def test_cli_run_aggregate(tmp_path):
    from lidarslam_tpu import cli
    out = str(tmp_path / "res")
    rc = cli.main(["run", "--synthetic", "4", "--out", out, "--aggregate",
                   "--log-dir", str(tmp_path / "kplog")])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "Trajectory.csv"))
    assert os.path.exists(os.path.join(out, "trajectory.ply"))
    data = pcd.load_pcd(os.path.join(out, "aggregated.pcd"))
    assert len(data["xyz"]) > 500
    assert "label" in data and "time" in data

    rc = cli.main(["aggregate", "--log-dir", str(tmp_path / "kplog"),
                   "--trajectory", os.path.join(out, "Trajectory.csv"),
                   "--out", str(tmp_path / "agg2.pcd")])
    assert rc == 0
    d2 = pcd.load_pcd(str(tmp_path / "agg2.pcd"))
    assert len(d2["xyz"]) == len(data["xyz"])


def test_cli_extract(tmp_path):
    """Standalone extractor run (vtkSpinningSensorKeypointExtractor surface):
    per-type keypoint PCDs + per-point debug-score cloud (SSKE.cxx:640-680)."""
    from lidarslam_tpu import cli
    out = str(tmp_path / "ext")
    rc = cli.main(["extract", "--synthetic", "2", "--out", out, "--debug"])
    assert rc == 0
    edges = pcd.load_pcd(os.path.join(out, "frame_0001_edge.pcd"))
    planes = pcd.load_pcd(os.path.join(out, "frame_0001_plane.pcd"))
    assert 0 < len(edges["xyz"]) < len(planes["xyz"])
    assert "laser_id" in edges and "time" in edges
    assert not os.path.exists(os.path.join(out, "frame_0001_blob.pcd"))

    dbg = pcd.load_pcd(os.path.join(out, "frame_0001_debug.pcd"))
    for k in ("sin_angle", "saliency", "depth_gap", "intensity_gap",
              "keypoint_label", "point_validity"):
        assert k in dbg, k
    # labels: 0 none, 1 edge, 2 plane, 3 blob; planes must dominate edges
    lab = dbg["keypoint_label"]
    assert (lab == 2).sum() > (lab == 1).sum() > 0
    # every labeled keypoint passed the validity gates (SSKE.cxx:474-590)
    assert dbg["point_validity"][lab > 0].all()

    summary = json.load(open(os.path.join(out, "extraction.json")))
    assert len(summary) == 2 and summary[1]["edge"] == len(edges["xyz"])
