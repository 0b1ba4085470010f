#!/usr/bin/env python
"""Extract a robot model spec (JSON) from a URDF file.

One-shot data-extraction tool: reads the reference robot description
(Unitree Aliengo + Kinova j2n6s300, /root/reference/qm_description/urdf/
qudraputed_manipulator/robot.urdf) and emits the numeric kinematic/inertial
parameters as JSON. The JSON (committed at
qm_control_tpu/models/aliengo_j2n6s300.json) is the single source of truth for
the TPU-native model; the framework never reads URDF at runtime.

Fixed joints are folded into their parent link (inertia composition), keeping
the movable-joint tree plus named operational frames (base, feet, EE).

Usage: python tools/extract_urdf.py <robot.urdf> <out.json>
"""
import json
import sys
import xml.etree.ElementTree as ET

import numpy as np


def rpy_to_R(r, p, y):
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def parse_origin(el):
    xyz = np.zeros(3)
    rpy = np.zeros(3)
    if el is not None:
        o = el.find("origin")
        if o is not None:
            if o.get("xyz"):
                xyz = np.array([float(v) for v in o.get("xyz").split()])
            if o.get("rpy"):
                rpy = np.array([float(v) for v in o.get("rpy").split()])
    return xyz, rpy_to_R(*rpy)


def parse_inertial(link_el):
    inertial = link_el.find("inertial")
    if inertial is None:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    mass = float(inertial.find("mass").get("value"))
    com, R = parse_origin(inertial)
    ie = inertial.find("inertia")
    ixx, ixy, ixz = (float(ie.get(k, "0")) for k in ("ixx", "ixy", "ixz"))
    iyy, iyz, izz = (float(ie.get(k, "0")) for k in ("iyy", "iyz", "izz"))
    I = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
    # rotate inertia (about COM) into link frame
    I = R @ I @ R.T
    return mass, com, I


def skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def compose_inertia(m1, c1, I1, m2, c2, I2):
    """Combine two (mass, com, inertia-about-own-com... NO: inertia about com at c)
    Represent each as inertia about its own COM; combine into one body."""
    m = m1 + m2
    if m == 0:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    c = (m1 * c1 + m2 * c2) / m
    d1, d2 = c1 - c, c2 - c
    I = (I1 + m1 * (d1 @ d1 * np.eye(3) - np.outer(d1, d1))
         + I2 + m2 * (d2 @ d2 * np.eye(3) - np.outer(d2, d2)))
    return m, c, I


def main(urdf_path, out_path):
    tree = ET.parse(urdf_path)
    robot = tree.getroot()

    links = {}
    for link in robot.findall("link"):
        m, c, I = parse_inertial(link)
        links[link.get("name")] = dict(mass=m, com=c, inertia=I)

    joints = []
    child_of = {}
    for j in robot.findall("joint"):
        name = j.get("name")
        jtype = j.get("type")
        parent = j.find("parent").get("link")
        child = j.find("child").get("link")
        xyz, R = parse_origin(j)
        axis_el = j.find("axis")
        axis = np.array([1.0, 0, 0])
        if axis_el is not None and axis_el.get("xyz"):
            axis = np.array([float(v) for v in axis_el.get("xyz").split()])
        lim = j.find("limit")
        limit = None
        if lim is not None:
            limit = dict(
                lower=float(lim.get("lower", "-1e30")),
                upper=float(lim.get("upper", "1e30")),
                effort=float(lim.get("effort", "1e30")),
                velocity=float(lim.get("velocity", "1e30")),
            )
        joints.append(dict(name=name, type=jtype, parent=parent, child=child,
                           xyz=xyz, R=R, axis=axis, limit=limit))
        child_of[child] = joints[-1]

    # find root link
    children = set(child_of.keys())
    roots = [l for l in links if l not in children]
    assert len(roots) == 1, roots
    root = roots[0]

    # canonical movable joint order (pinocchio-style: legs LF,LH,RF,RH then arm)
    JOINT_ORDER = [
        "LF_HAA", "LF_HFE", "LF_KFE",
        "LH_HAA", "LH_HFE", "LH_KFE",
        "RF_HAA", "RF_HFE", "RF_KFE",
        "RH_HAA", "RH_HFE", "RH_KFE",
        "j2n6s300_joint_1", "j2n6s300_joint_2", "j2n6s300_joint_3",
        "j2n6s300_joint_4", "j2n6s300_joint_5", "j2n6s300_joint_6",
    ]
    FRAMES = ["base", "LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT",
              "j2n6s300_end_effector"]

    movable = {j["name"]: j for j in joints if j["type"] in ("revolute", "prismatic", "continuous")}
    missing = [n for n in JOINT_ORDER if n not in movable]
    assert not missing, missing

    # Build "super-link" bodies: each movable joint's child link plus all
    # fixed-joint descendants folded in. Also record operational frames.
    fixed_children = {}
    for j in joints:
        if j["type"] == "fixed":
            fixed_children.setdefault(j["parent"], []).append(j)

    def fold(link_name, X_base=np.eye(3), p_base=np.zeros(3), frames=None):
        """Fold fixed subtree rooted at link_name into one body.
        X_base/p_base: transform of link frame in the super-link (body) frame."""
        L = links[link_name]
        m, c, I = L["mass"], X_base @ L["com"] + p_base, X_base @ L["inertia"] @ X_base.T
        body = (m, c, I)
        if frames is not None and link_name in FRAMES:
            frames[link_name] = dict(p=p_base.tolist(), R=X_base.tolist())
        for fj in fixed_children.get(link_name, []):
            # stop at movable joints (they start new bodies)
            p_child = p_base + X_base @ fj["xyz"]
            X_child = X_base @ fj["R"]
            sub = fold(fj["child"], X_child, p_child, frames)
            body = compose_inertia(*body, *sub)
        return body

    # map: which super-link does each movable joint attach to, with what transform
    # walk from root; for each movable joint find its parent super-link and the
    # fixed-chain transform from that super-link's frame to the joint frame.
    superlink_of = {}  # link_name -> (movable_joint_name or "__root__", p, R)

    def assign(link_name, owner, p, R):
        superlink_of[link_name] = (owner, p.copy(), R.copy())
        for fj in fixed_children.get(link_name, []):
            assign(fj["child"], owner, p + R @ fj["xyz"], R @ fj["R"])

    assign(root, "__root__", np.zeros(3), np.eye(3))
    # iterate movable joints in tree order repeatedly until all assigned
    remaining = dict(movable)
    while remaining:
        progressed = False
        for name, j in list(remaining.items()):
            if j["parent"] in superlink_of:
                owner, p, R = superlink_of[j["parent"]]
                jp = p + R @ j["xyz"]
                jR = R @ j["R"]
                j["_parent_owner"] = owner
                j["_p_in_parent"] = jp
                j["_R_in_parent"] = jR
                assign(j["child"], name, np.zeros(3), np.eye(3))
                del remaining[name]
                progressed = True
        assert progressed

    out_joints = []
    frames_out = {}
    root_frames = {}
    root_body = fold(root, frames=root_frames)
    for fname, fr in root_frames.items():
        frames_out[fname] = dict(parent="__root__", **fr)

    for name in JOINT_ORDER:
        j = movable[name]
        body_frames = {}
        m, c, I = fold(j["child"], frames=body_frames)
        for fname, fr in body_frames.items():
            frames_out[fname] = dict(parent=name, **fr)
        out_joints.append(dict(
            name=name,
            type=j["type"] if j["type"] != "continuous" else "revolute",
            parent=j["_parent_owner"],
            p=j["_p_in_parent"].tolist(),
            R=j["_R_in_parent"].tolist(),
            axis=(j["axis"] / np.linalg.norm(j["axis"])).tolist(),
            limit=j["limit"],
            mass=m, com=c.tolist(), inertia=I.tolist(),
        ))

    spec = dict(
        name="aliengo_j2n6s300",
        source=urdf_path,
        root=dict(mass=root_body[0], com=root_body[1].tolist(),
                  inertia=root_body[2].tolist(), link=root),
        joints=out_joints,
        frames=frames_out,
        contact_frames=["LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT"],
        ee_frame="j2n6s300_end_effector",
        base_frame="base",
    )
    total = root_body[0] + sum(j["mass"] for j in out_joints)
    spec["total_mass"] = total
    with open(out_path, "w") as f:
        json.dump(spec, f, indent=1)
    print(f"root link: {root}, total mass {total:.4f} kg, "
          f"{len(out_joints)} joints, frames: {sorted(frames_out)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
