"""ROS1 binding (lidarslam_tpu/ros_node.py) through a recording facade.

The node must reproduce the direct-API trajectory through the real
PointCloud2 wire format, publish the reference's topic surface
(LidarSlamNode.cxx:96-127 publisher table, :519-622 PublishOutput), and
honor the set-pose and SlamCommand control paths (:229-349). rospy is not
installed here; the facade stands in for the transport, everything else
is the shipping node code.
"""

import numpy as np
import pytest

from lidarslam_tpu import Slam
from lidarslam_tpu.config import Keypoint
from lidarslam_tpu.core.se3 import quat_to_matrix
from lidarslam_tpu.io import synthetic
from lidarslam_tpu.ros_node import (LidarSlamNode, PointCloud2, PointField,
                                    cloud_to_frame, frame_to_cloud)


def _frames(n=6):
    return synthetic.generate_sequence(
        n_frames=n, motion_distortion=False,
        sensor=synthetic.SensorModel(range_noise=0.005))


def _cfg():
    from tests.test_slam_e2e import small_config

    return small_config()


class FakeRos:
    """Recording facade with the contract LidarSlamNode documents."""

    cloud_cls = PointCloud2
    field_cls = PointField

    def __init__(self, params=None):
        self.params = params or {}
        self.published = {}
        self.subscribed = {}
        self.tf = []
        self._t = 0.0

    def get_param(self, key, default=None):
        return self.params if key == "" else self.params.get(key, default)

    def now(self):
        self._t += 0.01
        return self._t

    def Publisher(self, topic, kind, latch=False):
        self.published.setdefault(topic, [])

        def send(dictmsg, payload_cloud=None):
            self.published[topic].append(
                payload_cloud if payload_cloud is not None else dictmsg)
        return send

    def Subscriber(self, topic, kind, cb):
        self.subscribed[topic] = cb

    def send_transform(self, msg):
        self.tf.append(msg)


def test_pointcloud2_roundtrip_bitwise():
    f = _frames(1)[0]
    cloud = frame_to_cloud(f["xyz"], intensity=f["intensity"],
                           time=f["time"], laser_id=f["laser_id"],
                           device_id=3, stamp=f["stamp"])
    # LidarPoint field layout (LidarPoint.h:31-64, minus the SSE pad)
    assert [pf.name for pf in cloud.fields] == [
        "x", "y", "z", "time", "intensity", "laser_id", "device_id", "label"]
    g = cloud_to_frame(cloud)
    np.testing.assert_array_equal(g["xyz"], np.asarray(f["xyz"], np.float32))
    np.testing.assert_array_equal(g["intensity"],
                                  np.asarray(f["intensity"], np.float32))
    np.testing.assert_array_equal(g["laser_id"],
                                  np.asarray(f["laser_id"], np.int32))
    np.testing.assert_allclose(g["time"], np.asarray(f["time"], np.float32),
                               atol=0)
    assert g["stamp"] == f["stamp"] and g["device_id"] == 3


def test_node_trajectory_matches_direct_api():
    frames = _frames()
    direct = Slam(_cfg())
    want = [np.asarray(direct.add_frame(f)["pose"]) for f in frames]

    ros = FakeRos()
    node = LidarSlamNode(ros, slam=Slam(_cfg()))
    # the reference's subscriber set (LidarSlamNode.cxx:130-153, no GPS)
    assert set(ros.subscribed) == {"lidar_points", "set_slam_pose",
                                   "slam_command"}
    for f in frames:
        cloud = frame_to_cloud(f["xyz"], intensity=f["intensity"],
                               time=f["time"], laser_id=f["laser_id"],
                               stamp=f["stamp"])
        ros.subscribed["lidar_points"](cloud)

    odoms = ros.published["slam_odom"]
    assert len(odoms) == len(frames)
    for msg, w in zip(odoms, want):
        p = msg["pose"]["pose"]["position"]
        got_t = np.asarray([p["x"], p["y"], p["z"]])
        assert np.linalg.norm(got_t - w[:3, 3]) < 1e-5
        o = msg["pose"]["pose"]["orientation"]
        R = quat_to_matrix(np.asarray([o["w"], o["x"], o["y"], o["z"]]))
        assert np.abs(R - w[:3, :3]).max() < 1e-6
        assert len(msg["pose"]["covariance"]) == 36
        assert msg["header"]["frame_id"] == "odom"
        assert msg["child_frame_id"] == "base_link"
    # TF mirrors the odometry poses (PublishOutput :541-548)
    assert len(ros.tf) == len(frames)
    t_last = ros.tf[-1]["transform"]["translation"]
    assert abs(t_last["x"] - want[-1][0, 3]) < 1e-5
    # Confidence msg fields (Confidence.msg:1-32)
    conf = ros.published["slam_confidence"][-1]
    assert set(conf) == {"header", "covariance", "overlap", "nb_matches",
                         "comply_motion_limits", "computation_time"}
    assert conf["nb_matches"] > 0 and conf["computation_time"] > 0
    # registered cloud + keypoints + maps go out as PointCloud2
    reg = ros.published["slam_registered_points"][-1]
    assert reg.width == len(frames[-1]["xyz"])
    assert ros.published["maps/edges"][-1].width > 0
    kp = ros.published["keypoints/planes"][-1]
    assert cloud_to_frame(kp)["xyz"].shape[1] == 3


def test_node_output_gates_and_commands():
    frames = _frames(4)
    params = {"output": {"pose": {"odom": True, "tf": False},
                         "confidence": False, "registered_points": False,
                         "maps": {"edges": False, "planes": False,
                                  "blobs": False}}}
    ros = FakeRos(params)
    node = LidarSlamNode(ros, slam=Slam(_cfg()))
    assert node.pub_confidence is None and node.pub_registered is None
    assert not node.pub_maps and not node.publish_tf

    cb = ros.subscribed["lidar_points"]
    for f in frames[:2]:
        cb(dict(f))          # dict fast path (non-ROS callers)
    assert len(ros.published["slam_odom"]) == 2 and not ros.tf

    # SlamCommand dispatch (LidarSlamNode.cxx:285-300): freeze the map
    from lidarslam_tpu.config import MappingMode
    ros.subscribed["slam_command"]({"command": 8})
    assert node.slam.get_map_update() == MappingMode.NONE
    ros.subscribed["slam_command"]({"command": 10})
    assert node.slam.get_map_update() == MappingMode.UPDATE

    # external pose reset (SetPoseCallback :229-241)
    ros.subscribed["set_slam_pose"](
        {"pose": {"pose": {"position": {"x": 5.0, "y": -2.0, "z": 0.5},
                           "orientation": {"x": 0.0, "y": 0.0, "z": 0.0,
                                           "w": 1.0}}}})
    h = np.asarray(node.slam.get_world_transform())
    np.testing.assert_allclose(h[:3, 3], [5.0, -2.0, 0.5], atol=1e-12)


def test_node_gps_log_and_pose_from_gps():
    ros = FakeRos({"gps": {"use_gps": True}})
    node = LidarSlamNode(ros, slam=Slam(_cfg()))
    assert "gps_odom" in ros.subscribed
    for i in range(3):
        ros.subscribed["gps_odom"](
            {"header": {"stamp": float(i)},
             "pose": {"pose": {"position": {"x": 1.0 * i, "y": 2.0 * i,
                                            "z": 0.0}},
                      "covariance": np.eye(6).ravel().tolist()}})
    assert len(node.gps_log) == 3
    ros.subscribed["slam_command"]({"command": 4})   # SET_SLAM_POSE_FROM_GPS
    h = np.asarray(node.slam.get_world_transform())
    np.testing.assert_allclose(h[:3, 3], [2.0, 4.0, 0.0], atol=1e-12)


def test_node_multi_lidar_aggregation():
    frames = _frames(4)
    ros = FakeRos({"input": ["lidar_points", "lidar_points_2"]})
    node = LidarSlamNode(ros, slam=Slam(_cfg()))
    assert "lidar_points_2" in ros.subscribed
    sec = dict(frames[1])
    sec["device_id"] = 1
    ros.subscribed["lidar_points_2"](sec)
    assert 1 in node._secondary
    r = ros.subscribed["lidar_points"](dict(frames[0]))
    assert not node._secondary          # consumed with the main frame
    assert not r.get("failure")
