"""ROS1 bridge wiring, exercised against a fake rospy (no ROS needed).

The bridges (env/ros_bridge.py) translate the reference's exact topic
surface (real_env.py:76-86, gazebo_env.py:70-78) into the injected
frontends.  A fake rospy records subscriptions/publications and lets the
test PUSH messages through the real callbacks, then the frontends'
observations are checked end-to-end.
"""

import math
import types

import numpy as np
import pytest

from img_env_tpu.config import EnvConfig
from img_env_tpu.env.ros_bridge import GazeboBridge, RealRobotBridge


class FakePub:
    def __init__(self, topic):
        self.topic = topic
        self.sent = []

    def publish(self, msg):
        self.sent.append(msg)


class FakeRospy:
    """Duck-typed rospy: records subs/pubs, exposes push()."""

    def __init__(self):
        self.subs = {}
        self.pubs = {}
        self.services = {}

    def Publisher(self, topic, _cls, queue_size=1):
        self.pubs[topic] = FakePub(topic)
        return self.pubs[topic]

    def Subscriber(self, topic, _cls, cb, queue_size=1):
        self.subs[topic] = cb

    def ServiceProxy(self, name, _cls):
        return self.services.setdefault(name, lambda *a, **k: None)

    def push(self, topic, msg):
        self.subs[topic](msg)


def _ns(**kw):
    return types.SimpleNamespace(**kw)


def _cfg():
    return EnvConfig.from_dict({
        "robot": {"total": 1},
        "ped_sim": {"total": 0},
        "global_map": {"resolution": 0.1, "map_file": "room_10.png"},
        "view_map": {"resolution": 0.05, "width": 3, "height": 3},
        "range_total": 64,
        "max_ped": 2,
    })


def test_real_robot_bridge_end_to_end():
    rospy = FakeRospy()
    bridge = RealRobotBridge(_cfg(), robot_name="robot0", rospy=rospy)
    # the reference topic surface is subscribed (real_env.py:76-86)
    for t in ("robot0/scan", "robot0/odom", "robot0/global_goal",
              "/spencer/perception/tracked_persons", "robot0/laser_image"):
        assert t in rospy.subs, t

    rospy.push("robot0/scan", _ns(
        ranges=np.full(64, 2.5), angle_min=-math.pi / 2,
        angle_increment=math.pi / 64))
    rospy.push("robot0/odom", _ns(pose=_ns(pose=_ns(
        position=_ns(x=1.0, y=2.0, z=0.0),
        orientation=_ns(x=0.0, y=0.0, z=math.sin(0.35), w=math.cos(0.35))))))
    rospy.push("robot0/global_goal", _ns(pose=_ns(
        position=_ns(x=4.0, y=2.0, z=0.0))))
    rospy.push("/spencer/perception/tracked_persons", _ns(tracks=[
        _ns(pose=_ns(pose=_ns(position=_ns(x=2.0, y=2.5, z=0.0))),
            twist=_ns(twist=_ns(linear=_ns(x=0.1, y=-0.2, z=0.0))))]))

    obs = bridge.env.observe()
    # goal (4,2) from pose (1,2,0.7): dist 3, bearing -0.7
    vec = obs["vector_states"][0]
    assert abs(math.hypot(vec[0], vec[1]) - 3.0) < 1e-9
    assert abs(math.atan2(vec[1], vec[0]) + 0.7) < 1e-9
    assert obs["ped_vector_states"][0][0] == 1
    assert np.any(obs["sensor_maps"][0] == 1.0)   # scan-synthesized map

    # fed laser_image overrides the synthesized map (image_last)
    h, w = bridge.env.cfg.image_size
    img = _ns(height=h, width=w,
              data=np.arange(h * w, dtype=np.uint8))
    rospy.push("robot0/laser_image", img)
    obs2 = bridge.env.observe()
    np.testing.assert_allclose(
        obs2["sensor_maps"][0],
        np.arange(h * w, dtype=np.uint8).reshape(h, w) / 255.0)

    bridge.env.send_cmd(0.4, -0.2)
    assert rospy.pubs["robot0/cmd_vel"].sent[-1] == (0.4, -0.2)


def test_gazebo_bridge_end_to_end():
    rospy = FakeRospy()
    pose = [0.0, 0.0, 0.0]

    def get_state(model, frame):
        return _ns(pose=_ns(
            position=_ns(x=pose[0], y=pose[1], z=0.0),
            orientation=_ns(x=0.0, y=0.0, z=math.sin(pose[2] / 2),
                            w=math.cos(pose[2] / 2))))

    def set_state(model, x, y, yaw):
        pose[:] = [x, y, yaw]

    rospy.services["/gazebo/get_model_state"] = get_state
    rospy.services["/gazebo/set_model_state"] = set_state

    cfg = _cfg().replace(start_global_pose=(0.5, 0.5, 0.0),
                         target_global_pose=(3.0, 0.5))
    bridge = GazeboBridge(cfg, model_name="tb3", rospy=rospy)
    rospy.push("/scan", _ns(ranges=np.full(64, 4.0),
                            angle_min=-math.pi / 2,
                            angle_increment=math.pi / 64))
    obs = bridge.env.reset()
    assert pose[:2] == [0.5, 0.5]                 # teleported to start
    vec = obs["vector_states"][0]
    assert abs(math.hypot(vec[0], vec[1]) - 2.5) < 1e-9
    assert np.any(obs["sensor_maps"][0] == 1.0)

    rospy.push("/collision", _ns(data=True))
    assert bridge.transport.get_contact() is True
    assert bridge.transport.get_contact() is False   # one-shot latch
