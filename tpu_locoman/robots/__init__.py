"""Robot definitions: Go2, B2, B2G(+Z1 arm).

TPU-native counterpart of /root/reference/utils/robot.py:10-118. Models load
from standalone JSON specs (numeric data extracted once from the Unitree
URDF/SRDF descriptions by tools/extract_robot_spec.py); a URDF path can also
be parsed directly for user-supplied robots.
"""

import dataclasses
import json
import os

import numpy as np

from ..model import (
    RobotModel,
    model_from_dict,
    parse_urdf,
    load_srdf_reference_configurations,
    build_reduced_model,
)
from ..gait import GaitSequence

SPEC_DIR = os.path.join(os.path.dirname(__file__), "specs")
# Fallback: parse assets straight from a URDF tree (e.g. the reference
# mount) when a prebuilt spec is absent.
ASSET_ROOTS = [
    os.environ.get("TPU_LOCOMAN_ASSETS", ""),
    "/root/reference/robots",
]


def _load_spec(spec_name):
    path = os.path.join(SPEC_DIR, spec_name + ".json")
    if os.path.exists(path):
        with open(path) as f:
            return model_from_dict(json.load(f))
    return None


def _build_from_urdf(urdf_rel, srdf_rel, lock_joints=None):
    for root in ASSET_ROOTS:
        urdf = os.path.join(root, urdf_rel)
        if root and os.path.exists(urdf):
            model = parse_urdf(urdf)
            if lock_joints:
                q_neutral = np.zeros(model.nq)
                q_neutral[6] = 1.0
                model = build_reduced_model(model, list(lock_joints), q_neutral)
            load_srdf_reference_configurations(model, os.path.join(root, srdf_rel))
            return model
    raise FileNotFoundError(f"no spec and no URDF found for {urdf_rel}")


def _quat_to_euler_zyx_np(q):
    """Host-side (x,y,z,w) quaternion -> ZYX euler angles."""
    x, y, z, w = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    ry = np.arcsin(-np.clip(R[2, 0], -1, 1))
    rz = np.arctan2(R[1, 0], R[0, 0])
    rx = np.arctan2(R[2, 1], R[2, 2])
    return np.array([rz, ry, rx])


def _to_euler_base(model):
    """Switch a free-flyer model to the Euler-ZYX composite base
    (reference use_quaternion=False, utils/robot.py:13-18)."""
    refs = {
        name: np.concatenate([q[:3], _quat_to_euler_zyx_np(q[3:7]), q[7:]])
        for name, q in model.reference_configurations.items()
    }
    return dataclasses.replace(
        model, base_type="euler_zyx", reference_configurations=refs
    )


class Robot:
    """Mirror of reference Robot (utils/robot.py:10-42): dims, reference
    pose, gait attachment, end-effector frames."""

    FOOT_FRAMES = ["FR_foot", "FL_foot", "RR_foot", "RL_foot"]

    def __init__(self, model, reference_pose, base_frame="base_link",
                 use_quaternion=True):
        if not use_quaternion:
            model = _to_euler_base(model)
        self.model = model
        self.base_frame = base_frame
        if reference_pose and reference_pose in model.reference_configurations:
            self.q0 = np.asarray(model.reference_configurations[reference_pose])
        else:
            base0 = [0, 0, 0, 0, 0, 0, 1] if use_quaternion else [0] * 6
            self.q0 = np.concatenate([base0, np.zeros(model.nj)])

        self.nq = model.nq
        self.nv = model.nv
        self.nj = model.nj
        self.nf = 12  # forces at the four feet

        self.ext_force_frame = None
        self.arm_ee_frame = None
        self.gait_sequence = None

    @property
    def mass(self):
        return self.model.total_mass

    def set_gait_sequence(self, gait_type, gait_period):
        self.gait_sequence = GaitSequence(gait_type, gait_period)
        self.foot_frames = list(self.gait_sequence.feet)

    @property
    def x_nom_q(self):
        return self.q0


class Go2(Robot):
    """12-DoF Unitree Go2 (reference utils/robot.py:45-55)."""

    def __init__(self, reference_pose="standing", use_quaternion=True):
        model = _load_spec("go2") or _build_from_urdf(
            "go2_description/urdf/go2.urdf", "go2_description/srdf/go2.srdf"
        )
        super().__init__(model, reference_pose, base_frame="base",
                         use_quaternion=use_quaternion)
        self.joint_pos_min = np.tile([-1.0472, -1.5708, -2.7227], 4)
        self.joint_pos_max = np.tile([1.0472, 3.4907, -0.83776], 4)
        self.joint_vel_max = np.tile([30.1, 30.1, 15.70], 4)
        self.joint_torque_max = np.tile([23.7, 23.7, 45.43], 4)


class B2(Robot):
    """12-DoF Unitree B2 with optional payload force frame
    (reference utils/robot.py:58-76)."""

    def __init__(self, reference_pose="standing", payload=None,
                 use_quaternion=True):
        model = _load_spec("b2") or _build_from_urdf(
            "b2_description/urdf/b2.urdf", "b2_description/srdf/b2.srdf"
        )
        super().__init__(model, reference_pose, use_quaternion=use_quaternion)
        self.joint_pos_min = np.tile([-0.87, -0.94, -2.82], 4)
        self.joint_pos_max = np.tile([0.87, 4.69, -0.43], 4)
        self.joint_vel_max = np.tile([23.0, 23.0, 14.0], 4)
        self.joint_torque_max = np.tile([200, 200, 320], 4)

        if payload == "front":
            self.ext_force_frame = "payload_joint_front"
            self.nf += 3
        elif payload == "rear":
            self.ext_force_frame = "payload_joint_rear"
            self.nf += 3


class B2G(Robot):
    """B2 + Z1 arm + gripper; the gripper joint (and optionally the whole
    arm) is locked (reference utils/robot.py:79-118)."""

    def __init__(self, reference_pose="standing_with_arm_up", ignore_arm=False,
                 use_quaternion=True):
        if ignore_arm:
            spec, lock = "b2g_arm_locked", range(14, 21)
        else:
            spec, lock = "b2g", [20]
        model = _load_spec(spec) or _build_from_urdf(
            "b2g_description/urdf/b2g.urdf",
            "b2g_description/srdf/b2g.srdf",
            lock_joints=lock,
        )
        super().__init__(model, reference_pose, use_quaternion=use_quaternion)
        self.joint_pos_min = np.tile([-0.87, -0.94, -2.82], 4)
        self.joint_pos_max = np.tile([0.87, 4.69, -0.43], 4)
        self.joint_vel_max = np.tile([23.0, 23.0, 14.0], 4)
        self.joint_torque_max = np.tile([200, 200, 320], 4)

        if not ignore_arm:
            self.ext_force_frame = "gripperStator"
            self.arm_ee_frame = "gripperStator"
            self.nf += 3
            self.joint_pos_min = np.concatenate(
                (self.joint_pos_min, [-2.62, 0.0, -2.88, -1.52, -1.34, -2.79])
            )
            self.joint_pos_max = np.concatenate(
                (self.joint_pos_max, [2.62, 2.97, 0.0, 1.52, 1.34, 2.79])
            )
            self.joint_vel_max = np.concatenate((self.joint_vel_max, [3.14] * 6))
            self.joint_torque_max = np.concatenate(
                (self.joint_torque_max, [30, 60, 30, 30, 30, 30])
            )
