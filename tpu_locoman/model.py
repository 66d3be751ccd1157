"""Robot model: a JAX pytree built from URDF/SRDF by a first-party parser.

TPU-native replacement for the Pinocchio model-building path the reference
uses (RobotWrapper.BuildFromURDF + buildReducedRobot + loadReferenceConfigurations,
/root/reference/utils/robot.py:10-30).  The model is a flat struct-of-arrays
over the *movable* joints (free-flyer base + revolute joints); fixed URDF
joints are merged into their parent (inertia composed), exactly as Pinocchio
does, and exposed as named frames.

Host-side construction uses numpy; the resulting arrays are jnp-convertible
and the topology (parent indices) is static Python data, so all rigid-body
kernels in rbda.py unroll over it at trace time.
"""

from dataclasses import dataclass, field
import xml.etree.ElementTree as ET

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Host-side SE(3) helpers (numpy).
# ---------------------------------------------------------------------------

def rpy_to_matrix(rpy):
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def _axis_angle_matrix(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def _compose(Ra, pa, Rb, pb):
    """T_a * T_b for transforms (R, p)."""
    return Ra @ Rb, Ra @ pb + pa


@dataclass
class SpatialInertiaHost:
    """Spatial inertia of one body expressed in its joint frame.

    mass m, CoM offset c (3,), rotational inertia I about the CoM (3,3).
    """

    mass: float
    com: np.ndarray
    inertia_com: np.ndarray

    @staticmethod
    def zero():
        return SpatialInertiaHost(0.0, np.zeros(3), np.zeros((3, 3)))

    def transformed(self, R, p):
        """Inertia of the same body re-expressed in a frame F where this
        inertia's frame B is placed at T_FB = (R, p)."""
        return SpatialInertiaHost(
            self.mass, R @ self.com + p, R @ self.inertia_com @ R.T
        )

    def __add__(self, other):
        m = self.mass + other.mass
        if m <= 0.0:
            return SpatialInertiaHost.zero()
        c = (self.mass * self.com + other.mass * other.com) / m

        def about(inert, new_c):
            d = inert.com - new_c
            # parallel axis: I_newc = I_com + m (|d|^2 I - d d^T)
            return inert.inertia_com + inert.mass * (
                np.dot(d, d) * np.eye(3) - np.outer(d, d)
            )

        I = about(self, c) + about(other, c)
        return SpatialInertiaHost(m, c, I)


@dataclass
class FrameHost:
    name: str
    parent_joint: int  # movable-joint index (0 = free-flyer base)
    R: np.ndarray  # placement in parent joint frame
    p: np.ndarray


@dataclass
class RobotModel:
    """Static robot description.

    Movable joint 0 is the base; joints 1..n_links-1 are revolute.
    All arrays are indexed by movable-joint index.

    base_type selects the floating-base parametrization (reference
    utils/robot.py:13-18): "freeflyer" (quaternion, q_base in R^7, SE(3)
    integrate) or "euler_zyx" (Translation + SphericalZYX composite,
    q_base in R^6, vector-space integrate).
    """

    name: str
    parent: tuple  # parent movable-joint index; parent[0] == -1
    joint_names: tuple
    # Joint placement in the parent joint frame (at q_joint = 0).
    R_tree: np.ndarray  # (n, 3, 3)
    p_tree: np.ndarray  # (n, 3)
    axis: np.ndarray  # (n, 3) revolute axis in joint frame (row 0 unused)
    mass: np.ndarray  # (n,)
    com: np.ndarray  # (n, 3) body CoM in joint frame
    inertia: np.ndarray  # (n, 3, 3) body rotational inertia about its CoM
    frames: dict = field(default_factory=dict)  # name -> FrameHost
    reference_configurations: dict = field(default_factory=dict)
    base_type: str = "freeflyer"

    @property
    def n_links(self):
        return len(self.parent)

    @property
    def nj(self):
        """Number of revolute joints."""
        return self.n_links - 1

    @property
    def base_nq(self):
        return 7 if self.base_type == "freeflyer" else 6

    @property
    def nq(self):
        return self.base_nq + self.nj

    @property
    def nv(self):
        return 6 + self.nj

    @property
    def total_mass(self):
        return float(np.sum(self.mass))

    def frame_id(self, name):
        return name  # frames are addressed by name

    def jnp_arrays(self):
        """Device-side copies of the numeric arrays (f32)."""
        return {
            "R_tree": jnp.asarray(self.R_tree, dtype=jnp.float32),
            "p_tree": jnp.asarray(self.p_tree, dtype=jnp.float32),
            "axis": jnp.asarray(self.axis, dtype=jnp.float32),
            "mass": jnp.asarray(self.mass, dtype=jnp.float32),
            "com": jnp.asarray(self.com, dtype=jnp.float32),
            "inertia": jnp.asarray(self.inertia, dtype=jnp.float32),
        }


# ---------------------------------------------------------------------------
# URDF parsing.
# ---------------------------------------------------------------------------

def _parse_origin(elem):
    R = np.eye(3)
    p = np.zeros(3)
    if elem is not None:
        origin = elem.find("origin")
        if origin is not None:
            xyz = origin.get("xyz")
            rpy = origin.get("rpy")
            if xyz:
                p = np.array([float(v) for v in xyz.split()])
            if rpy:
                R = rpy_to_matrix([float(v) for v in rpy.split()])
    return R, p


def _parse_inertial(link_elem):
    inertial = link_elem.find("inertial")
    if inertial is None:
        return SpatialInertiaHost.zero()
    mass = float(inertial.find("mass").get("value"))
    R, p = _parse_origin(inertial)
    ie = inertial.find("inertia")
    ixx = float(ie.get("ixx"))
    iyy = float(ie.get("iyy"))
    izz = float(ie.get("izz"))
    ixy = float(ie.get("ixy", 0.0))
    ixz = float(ie.get("ixz", 0.0))
    iyz = float(ie.get("iyz", 0.0))
    I_local = np.array([
        [ixx, ixy, ixz],
        [ixy, iyy, iyz],
        [ixz, iyz, izz],
    ])
    # URDF: inertia is about the CoM, expressed in the inertial-origin frame.
    return SpatialInertiaHost(mass, p, R @ I_local @ R.T)


def parse_urdf(urdf_path, root_link=None):
    """Parse a URDF into a RobotModel with a free-flyer root joint.

    Matches Pinocchio BuildFromURDF(..., JointModelFreeFlyer()) semantics
    (reference usage: /root/reference/utils/robot.py:20):
    - joints are added depth-first in document order;
    - fixed joints are collapsed: child-body inertia is merged into the
      parent movable joint's body, and the fixed joint becomes a frame;
    - continuous/revolute joints become 1-DoF revolute joints.
    """
    tree = ET.parse(urdf_path)
    robot = tree.getroot()
    name = robot.get("name", "robot")

    links = {l.get("name"): l for l in robot.findall("link")}
    joints = robot.findall("joint")

    children = {}  # link name -> [joint elem] in document order
    child_of = {}
    for j in joints:
        parent = j.find("parent").get("link")
        child = j.find("child").get("link")
        children.setdefault(parent, []).append(j)
        child_of[child] = j
    if root_link is None:
        roots = [ln for ln in links if ln not in child_of]
        assert len(roots) == 1, f"expected unique root link, got {roots}"
        root_link = roots[0]

    parent_idx = [-1]
    joint_names = ["root_joint"]
    R_tree = [np.eye(3)]
    p_tree = [np.zeros(3)]
    axes = [np.zeros(3)]
    inertias = [_parse_inertial(links[root_link])]
    frames = {root_link: FrameHost(root_link, 0, np.eye(3), np.zeros(3))}

    def add_subtree(link_name, movable_idx, R_acc, p_acc):
        """Walk children of link_name; (R_acc, p_acc) places link_name's
        frame in the frame of movable joint movable_idx."""
        for j in children.get(link_name, []):
            jtype = j.get("type")
            jname = j.get("name")
            child_link = j.find("child").get("link")
            Rj, pj = _parse_origin(j)
            R_cj, p_cj = _compose(R_acc, p_acc, Rj, pj)
            if jtype == "fixed":
                inertias[movable_idx] += _parse_inertial(
                    links[child_link]
                ).transformed(R_cj, p_cj)
                frames[jname] = FrameHost(jname, movable_idx, R_cj, p_cj)
                frames[child_link] = FrameHost(child_link, movable_idx, R_cj, p_cj)
                add_subtree(child_link, movable_idx, R_cj, p_cj)
            elif jtype in ("revolute", "continuous"):
                axis_elem = j.find("axis")
                axis = (
                    np.array([float(v) for v in axis_elem.get("xyz").split()])
                    if axis_elem is not None
                    else np.array([1.0, 0.0, 0.0])
                )
                idx = len(parent_idx)
                parent_idx.append(movable_idx)
                joint_names.append(jname)
                R_tree.append(R_cj)
                p_tree.append(p_cj)
                axes.append(axis)
                inertias.append(_parse_inertial(links[child_link]))
                frames[child_link] = FrameHost(child_link, idx, np.eye(3), np.zeros(3))
                add_subtree(child_link, idx, np.eye(3), np.zeros(3))
            else:
                raise NotImplementedError(f"joint type {jtype} ({jname})")

    add_subtree(root_link, 0, np.eye(3), np.zeros(3))

    return RobotModel(
        name=name,
        parent=tuple(parent_idx),
        joint_names=tuple(joint_names),
        R_tree=np.stack(R_tree),
        p_tree=np.stack(p_tree),
        axis=np.stack(axes),
        mass=np.array([s.mass for s in inertias]),
        com=np.stack([s.com for s in inertias]),
        inertia=np.stack([s.inertia_com for s in inertias]),
        frames=frames,
    )


def load_srdf_reference_configurations(model, srdf_path):
    """Populate model.reference_configurations from SRDF group_state tags.

    Mirrors pin.loadReferenceConfigurations (reference usage:
    /root/reference/utils/robot.py:27-28).
    """
    tree = ET.parse(srdf_path)
    for gs in tree.getroot().findall(".//group_state"):
        q = np.zeros(model.nq)
        q[6] = 1.0  # identity quaternion (x,y,z,w) with w at index 6
        for js in gs.findall("joint"):
            jn = js.get("name")
            vals = np.array([float(v) for v in js.get("value").split()])
            if jn == "root_joint":
                q[:7] = vals
            elif jn in model.joint_names:
                q[7 + model.joint_names.index(jn) - 1] = vals[0]
            # joints absent from the (possibly reduced) model are skipped
        model.reference_configurations[gs.get("name")] = q
    return model


# ---------------------------------------------------------------------------
# Model reduction (lock joints), mirroring pin.buildReducedRobot
# (reference usage: /root/reference/utils/robot.py:21-22).
# ---------------------------------------------------------------------------

def build_reduced_model(model, lock_joint_ids, q_ref):
    """Lock the given movable-joint indices at their q_ref values.

    lock_joint_ids follow the Pinocchio convention used by the reference
    (utils/robot.py:84-87): index 1 is the free-flyer, 2.. are the revolute
    joints in order; i.e. pinocchio_id = movable_index + 1.

    Locked bodies are merged into their (possibly transitively locked)
    parent; frames and child joints are re-parented with composed placements.
    """
    lock_movable = sorted(i - 1 for i in lock_joint_ids)
    assert all(1 <= i < model.n_links for i in lock_movable)
    locked = set(lock_movable)

    # New index for kept joints.
    new_index = {}
    n_new = 0
    for i in range(model.n_links):
        if i not in locked:
            new_index[i] = n_new
            n_new += 1

    # Placement of each old joint frame in its nearest kept ancestor's frame.
    # Walk in topological order (parents come before children).
    anchor = {}  # old idx -> (kept old idx, R, p)
    inertias = [
        SpatialInertiaHost(model.mass[i], model.com[i].copy(), model.inertia[i].copy())
        for i in range(model.n_links)
    ]
    kept_inertia = {i: inertias[i] for i in range(model.n_links) if i not in locked}

    R_tree = [None] * model.n_links
    p_tree = [None] * model.n_links
    for i in range(model.n_links):
        if i == 0:
            anchor[0] = (0, np.eye(3), np.zeros(3))
            R_tree[0], p_tree[0] = np.eye(3), np.zeros(3)
            continue
        par = model.parent[i]
        a_par, Rp, pp = anchor[par]
        # joint i's zero-config placement in parent joint frame, composed
        # with the parent's locked rotation if the parent is locked.
        Rj, pj = model.R_tree[i], model.p_tree[i]
        R_anchor_joint, p_anchor_joint = _compose(Rp, pp, Rj, pj)
        if i in locked:
            qi = q_ref[7 + i - 1]
            R_lock = _axis_angle_matrix(model.axis[i], qi)
            R_cfg, p_cfg = _compose(R_anchor_joint, p_anchor_joint, R_lock, np.zeros(3))
            anchor[i] = (a_par, R_cfg, p_cfg)
            kept_inertia[a_par] += inertias[i].transformed(R_cfg, p_cfg)
        else:
            anchor[i] = (i, np.eye(3), np.zeros(3))
            R_tree[i], p_tree[i] = R_anchor_joint, p_anchor_joint

    new_frames = {}
    for fname, fr in model.frames.items():
        a, Ra, pa = anchor[fr.parent_joint]
        Rf, pf = _compose(Ra, pa, fr.R, fr.p)
        new_frames[fname] = FrameHost(fname, new_index[a], Rf, pf)

    kept = [i for i in range(model.n_links) if i not in locked]
    reduced = RobotModel(
        name=model.name,
        parent=tuple(
            -1 if i == 0 else new_index[anchor[model.parent[i]][0]] for i in kept
        ),
        joint_names=tuple(model.joint_names[i] for i in kept),
        R_tree=np.stack([R_tree[i] for i in kept]),
        p_tree=np.stack([p_tree[i] for i in kept]),
        axis=np.stack([model.axis[i] for i in kept]),
        mass=np.array([kept_inertia[i].mass for i in kept]),
        com=np.stack([kept_inertia[i].com for i in kept]),
        inertia=np.stack([kept_inertia[i].inertia_com for i in kept]),
        frames=new_frames,
    )
    # Reduce reference configurations by dropping locked joint entries.
    keep_q = list(range(7)) + [7 + i - 1 for i in kept[1:]]
    for rname, q in model.reference_configurations.items():
        reduced.reference_configurations[rname] = q[keep_q]
    return reduced


# ---------------------------------------------------------------------------
# Serialization: standalone JSON robot specs (the framework's shippable
# asset format — numeric data extracted from URDF/SRDF, no XML at runtime).
# ---------------------------------------------------------------------------

def model_to_dict(model):
    return {
        "name": model.name,
        "parent": list(model.parent),
        "joint_names": list(model.joint_names),
        "R_tree": model.R_tree.tolist(),
        "p_tree": model.p_tree.tolist(),
        "axis": model.axis.tolist(),
        "mass": model.mass.tolist(),
        "com": model.com.tolist(),
        "inertia": model.inertia.tolist(),
        "frames": {
            name: {
                "parent_joint": fr.parent_joint,
                "R": fr.R.tolist(),
                "p": fr.p.tolist(),
            }
            for name, fr in model.frames.items()
        },
        "reference_configurations": {
            k: v.tolist() for k, v in model.reference_configurations.items()
        },
    }


def model_from_dict(d):
    return RobotModel(
        name=d["name"],
        parent=tuple(d["parent"]),
        joint_names=tuple(d["joint_names"]),
        R_tree=np.asarray(d["R_tree"]),
        p_tree=np.asarray(d["p_tree"]),
        axis=np.asarray(d["axis"]),
        mass=np.asarray(d["mass"]),
        com=np.asarray(d["com"]),
        inertia=np.asarray(d["inertia"]),
        frames={
            name: FrameHost(name, f["parent_joint"], np.asarray(f["R"]), np.asarray(f["p"]))
            for name, f in d["frames"].items()
        },
        reference_configurations={
            k: np.asarray(v) for k, v in d["reference_configurations"].items()
        },
    )
