"""Live output stream API (vtkSlam output ports as a subscription —
vtkSlam.cxx:47-60, LidarSlamNode::PublishOutput 519-622)."""

import numpy as np

from lidarslam_tpu import Slam
from lidarslam_tpu.config import ExtractorConfig, Keypoint, MapConfig, SlamConfig
from lidarslam_tpu.io import synthetic


def _cfg():
    return SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024,
                                  max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26))


def test_subscribe_sync_path():
    frames = synthetic.generate_sequence(n_frames=5, motion_distortion=False)
    slam = Slam(_cfg())
    got = []
    unsub = slam.subscribe(got.append)
    for f in frames[:3]:
        slam.add_frame(f)
    assert [o.frame_index for o in got] == [0, 1, 2]
    assert got[0].is_keyframe            # first frame seeds the map
    o = got[-1]
    np.testing.assert_array_equal(o.pose, slam.get_world_transform())
    assert o.n_matches > 0
    assert o.confidence["nb_matches"] == o.n_matches
    assert len(o.trajectory()) == 3
    # unsubscribe stops delivery
    unsub()
    slam.add_frame(frames[3])
    assert len(got) == 3


def test_subscribe_streaming_no_extra_syncs():
    """A pose-only consumer over a 30-frame streaming run must not add
    device round-trips: callbacks fire at flush with host-side scalars."""
    frames = synthetic.generate_sequence(n_frames=30, motion_distortion=False)
    slam = Slam(_cfg())
    got = []
    slam.subscribe(got.append)
    for f in frames:
        slam.add_frame_async(f)
    outs = slam.flush()
    assert len(got) == len(outs) == 30
    # callback order matches frame order and poses match the returns
    for i, (o, r) in enumerate(zip(got, outs)):
        assert o.frame_index == i
        np.testing.assert_array_equal(o.pose, r["pose"])
    assert sum(o.is_keyframe for o in got) >= 1


def test_array_ports_lazy_pull():
    frames = synthetic.generate_sequence(n_frames=6, motion_distortion=False)
    slam = Slam(_cfg())
    got = []
    slam.subscribe(got.append)
    for f in frames:
        slam.add_frame_async(f)
    slam.flush()
    o = got[-1]
    kp = o.keypoints(Keypoint.PLANE, world=True)
    assert kp.ndim == 2 and kp.shape[1] == 3 and len(kp) > 50
    # world keypoints of a registered frame lie near the map
    mp = o.map_points(Keypoint.PLANE)
    assert len(mp) > 100
    from scipy.spatial import cKDTree
    d, _ = cKDTree(mp).query(kp[:200])
    assert np.median(d) < 0.5


def test_follow_cli(tmp_path):
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    out = tmp_path / "run"
    cmd = [sys.executable, "-m", "lidarslam_tpu.cli", "--cpu", "run",
           "--synthetic", "5", "--out", str(out), "--follow",
           "--max-ring-points", "1024", "--max-keypoints", "1024"]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo",
                       env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    follows = [l for l in lines if l.startswith("frame ")]
    assert len(follows) == 5
    assert "matches" in follows[2]
    info = json.loads(lines[-1])
    assert info["frames"] == 5
    assert (out / "Poses.csv").exists()
