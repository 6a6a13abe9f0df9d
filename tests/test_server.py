"""Socket transport driver (lidarslam_tpu/server.py) over localhost.

The engine served as a process (the LidarSlamNode role, LidarSlamNode.cxx:
62-155 — TCP instead of ROS topics) must reproduce the direct-API
trajectory, honor SlamCommand dispatch, and serve map downloads.
"""

import numpy as np
import pytest

from lidarslam_tpu import Slam
from lidarslam_tpu.io import synthetic
from lidarslam_tpu.server import SlamClient, SlamServer, decode_frame, frame_payload


def _frames(n=8):
    return synthetic.generate_sequence(
        n_frames=n, motion_distortion=False,
        sensor=synthetic.SensorModel(range_noise=0.005))


def _cfg():
    from tests.test_slam_e2e import small_config

    return small_config()


def test_frame_codec_roundtrip():
    f = _frames(1)[0]
    f["seq"] = 7
    header, payload = frame_payload(f)
    g = decode_frame(header, payload)
    np.testing.assert_array_equal(g["xyz"], np.asarray(f["xyz"], np.float32))
    np.testing.assert_array_equal(g["laser_id"],
                                  np.asarray(f["laser_id"], np.int32))
    assert g["stamp"] == f["stamp"] and g["seq"] == 7


def test_served_trajectory_matches_direct_api():
    frames = _frames()
    direct = Slam(_cfg())
    want = []
    for f in frames:
        direct.add_frame_async(f)
    want = [o["pose"] for o in direct.flush()]

    server = SlamServer(Slam(_cfg()), port=0)   # ephemeral port
    server.serve_background()
    try:
        client = SlamClient(port=server.server_address[1])
        for f in frames:
            client.send_frame(f)
        poses = client.flush()
        assert len(poses) == len(frames)
        for i, (msg, w) in enumerate(zip(poses, want)):
            got = np.asarray(msg["pose"]).reshape(4, 4)
            assert np.linalg.norm(got[:3, 3] - w[:3, 3]) < 1e-5, i
            assert not msg["failure"]
            assert len(msg["covariance"]) == 36
        # map download port
        xyz, inten = client.get_map(keypoint=1)
        assert len(xyz) > 100 and xyz.shape[1] == 3 and len(inten) == len(xyz)
        client.close()
    finally:
        server.shutdown()


def test_served_command_dispatch():
    frames = _frames(4)
    server = SlamServer(Slam(_cfg()), port=0)
    server.serve_background()
    try:
        client = SlamClient(port=server.server_address[1])
        # build a map, then freeze it (SlamCommand dispatch,
        # LidarSlamNode.cxx:244-349), then resume updating
        for f in frames[:2]:
            client.send_frame(f)
        client.flush()
        n0 = len(client.get_map(keypoint=1)[0])
        client.command(Slam.DISABLE_SLAM_MAP_UPDATE)
        client.send_frame(frames[2])
        client.flush()
        n_frozen = len(client.get_map(keypoint=1)[0])
        assert n_frozen == n0          # frozen map did not grow
        client.command(Slam.ENABLE_SLAM_MAP_UPDATE)
        client.send_frame(frames[3])
        client.flush()
        n_after = len(client.get_map(keypoint=1)[0])
        assert n_after > n_frozen      # updates resumed
        client.close()
    finally:
        server.shutdown()


def test_bad_request_gets_error_reply_and_session_survives():
    """A failing request must produce a protocol 'error' reply (not a dead
    socket), and the session must keep serving afterwards."""
    frames = _frames(2)
    server = SlamServer(Slam(_cfg()), port=0)
    server.serve_background()
    try:
        client = SlamClient(port=server.server_address[1])
        with pytest.raises(RuntimeError, match="command"):
            client.command(99999)             # unknown SlamCommand id
        with pytest.raises(RuntimeError):
            client.get_map(keypoint=2)        # blob map unused in small cfg
        # same connection still works end-to-end
        for f in frames:
            client.send_frame(f)
        poses = client.flush()
        assert len(poses) == len(frames)
        client.close()
    finally:
        server.shutdown()


def test_poses_are_routed_to_the_submitting_client_only():
    """A second connected client (e.g. a map viewer) must not receive pose
    messages for frames another client streamed."""
    frames = _frames(3)
    server = SlamServer(Slam(_cfg()), port=0)
    server.serve_background()
    try:
        viewer = SlamClient(port=server.server_address[1])
        producer = SlamClient(port=server.server_address[1])
        for f in frames:
            producer.send_frame(f)
        poses = producer.flush()
        assert len(poses) == len(frames)
        # the viewer triggers ops that drain outputs server-side; its own
        # pose log must stay empty
        viewer.get_map(keypoint=1)
        viewer.flush()
        assert viewer.poses == []
        producer.close()
        viewer.close()
    finally:
        server.shutdown()
