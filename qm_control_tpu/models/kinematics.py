"""Forward kinematics and geometric Jacobians in pure JAX.

Replaces the reference's Pinocchio FK / frame-Jacobian calls
(qm_wbc/src/WbcBase.cpp:134-191, qm_interface/src/QMPreComputation.cpp:77-87,
OCS2 PinocchioEndEffectorKinematics; see SURVEY.md §2.2).

All returns use the LOCAL_WORLD_ALIGNED convention the reference uses:
Jacobian rows = [linear(3); angular(3)], both expressed in world axes, taken
at the frame origin. Velocity coordinates are plain q-dot (translation +
ZYX-Euler rates + joint rates), so dJ/dt = jvp(J, q, v) exactly.

Functions take the static RobotModel (trace-time constant) and a (24,) q.
Batch via jax.vmap.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .rotations import axis_angle_to_R, skew
from .smallmat import mm3, mv3
from .spec import PRISMATIC, RobotModel


def fk(model: RobotModel, q):
    """Forward kinematics for every body via pointer doubling.

    Returns dict with:
      R:  (n,3,3) body orientations (world)
      p:  (n,3)   body frame origins (world)
      a:  (n,3)   joint axes (world)
      o:  (n,3)   joint origins (world)  == body origins for revolute chains

    TPU-first formulation: instead of a 24-step serial scan down the tree
    (each step a handful of tiny ops — pure latency), compose transforms
    by parallel prefix over ancestors:  T_i <- T_{anc(i)} o T_i doubles
    the covered chain length per round, so ceil(log2(max_depth)) rounds
    of LANE-PARALLEL batched (n,3,3) products reach every body. For this
    robot (depth 12) that is 4 rounds — the whole FK is ~10 fused VPU
    kernels, and every AD transform of it stays equally parallel.
    """
    n = model.n_bodies
    dtype = q.dtype
    XR = jnp.asarray(model.X_tree_R, dtype=dtype)          # (n,3,3)
    Xp = jnp.asarray(model.X_tree_p, dtype=dtype)          # (n,3)
    ax = jnp.asarray(model.axis, dtype=dtype)              # (n,3)
    rev = jnp.asarray(model.joint_type == 1, dtype=dtype)  # (n,)

    # local transforms: revolute  (XR @ Rot(ax, q), Xp)
    #                   prismatic (XR,              Xp + XR @ ax * q)
    Rj = axis_angle_to_R(ax, q * rev)                      # (n,3,3)
    L_R = mm3(XR, Rj)
    a_local = mv3(XR, ax)                                  # axis in parent-of-joint frame
    L_p = Xp + (1.0 - rev)[:, None] * a_local * q[:, None]

    # parallel prefix: anc starts at parent; identity beyond the root
    depth = int(np.max(_tree_depths(model)))
    rounds = max(1, int(np.ceil(np.log2(max(depth, 2)))))
    anc = np.asarray(model.parent, dtype=np.int64)
    R_w, p_w = L_R, L_p
    for _ in range(rounds):
        valid = (anc >= 0)
        j = np.maximum(anc, 0)
        vm = jnp.asarray(valid, dtype=dtype)
        Rg, pg = R_w[j], p_w[j]
        R_new = mm3(Rg, R_w)
        p_new = pg + mv3(Rg, p_w)
        R_w = jnp.where(vm[:, None, None].astype(bool), R_new, R_w)
        p_w = jnp.where(vm[:, None].astype(bool), p_new, p_w)
        anc = np.where(valid, anc[j], -1)

    # joint frames: parent world pose composed with the constant offset
    par = np.asarray(model.parent)
    valid = par >= 0
    jp = np.maximum(par, 0)
    vm3 = jnp.asarray(valid, dtype=bool)
    Rp = jnp.where(vm3[:, None, None], R_w[jp],
                   jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3)))
    pp = jnp.where(vm3[:, None], p_w[jp], jnp.zeros((n, 3), dtype=dtype))
    o = pp + mv3(Rp, Xp)
    a = mv3(mm3(Rp, XR), ax)
    return dict(R=R_w, p=p_w, a=a, o=o)


def _tree_depths(model: RobotModel):
    d = np.zeros(model.n_bodies, dtype=np.int64)
    for i in range(model.n_bodies):
        p = int(model.parent[i])
        d[i] = 1 if p < 0 else d[p] + 1
    return d


def fk_unrolled(model: RobotModel, q):
    """Python-unrolled FK (flat graph, no scan) — kept for latency
    experiments on TPU; semantics identical to fk()."""
    n = model.n_bodies
    Rs, ps, aw, ow = [], [], [], []
    eye3 = np.eye(3)
    for i in range(n):
        par = int(model.parent[i])
        if par < 0:
            Rp = jnp.eye(3, dtype=q.dtype)
            pp = jnp.zeros(3, dtype=q.dtype)
        else:
            Rp, pp = Rs[par], ps[par]
        # constant joint-origin transforms: skip identity composes (common)
        XR = model.X_tree_R[i]
        if np.allclose(XR, eye3):
            Ro = Rp
        else:
            Ro = mm3(Rp, jnp.asarray(XR, dtype=q.dtype))
        Xp = model.X_tree_p[i]
        if np.allclose(Xp, 0.0):
            po = pp
        else:
            po = pp + mv3(Rp, jnp.asarray(Xp, dtype=q.dtype))
        ax = jnp.asarray(model.axis[i], dtype=q.dtype)
        a_world = mv3(Ro, ax)
        if model.joint_type[i] == PRISMATIC:
            Ri = Ro
            pi = po + a_world * q[i]
        else:
            Ri = mm3(Ro, axis_angle_to_R(ax, q[i]))
            pi = po
        Rs.append(Ri)
        ps.append(pi)
        aw.append(a_world)
        ow.append(po)
    return dict(R=jnp.stack(Rs), p=jnp.stack(ps),
                a=jnp.stack(aw), o=jnp.stack(ow))


def frame_pose(model: RobotModel, cache, name):
    """(p, R) of a named frame in world."""
    fr = model.frame(name)
    Rb, pb = cache["R"][fr.body], cache["p"][fr.body]
    p = pb if np.allclose(fr.p, 0.0) else \
        pb + mv3(Rb, jnp.asarray(fr.p, dtype=pb.dtype))
    R = Rb if np.allclose(fr.R, np.eye(3)) else \
        mm3(Rb, jnp.asarray(fr.R, dtype=pb.dtype))
    return p, R


def point_jacobian(model: RobotModel, cache, point, body):
    """6 x nq geometric Jacobian of a world `point` on `body` (lin; ang)."""
    a, o = cache["a"], cache["o"]                       # (n,3)
    mask = jnp.asarray(model.ancestor[:, body], dtype=point.dtype)  # (n,)
    rev = jnp.asarray(model.joint_type == 1, dtype=point.dtype)     # (n,)
    lin = rev[:, None] * jnp.cross(a, point[None, :] - o) + (1 - rev[:, None]) * a
    ang = rev[:, None] * a
    J = jnp.concatenate([lin * mask[:, None], ang * mask[:, None]], axis=1)
    return J.T                                           # (6, n)


def frame_jacobian(model: RobotModel, q, name):
    """6 x nq Jacobian (LOCAL_WORLD_ALIGNED) of a named frame."""
    cache = fk(model, q)
    fr = model.frame(name)
    p, _ = frame_pose(model, cache, name)
    return point_jacobian(model, cache, p, fr.body)


def frame_jacobian_dot(model: RobotModel, q, v, name):
    """Time derivative of the frame Jacobian: dJ/dt = dJ/dq * qdot."""
    _, jdot = jax.jvp(partial(frame_jacobian, model, name=name), (q,), (v,))
    return jdot


def frame_velocity(model: RobotModel, q, v, name):
    """(6,) world-aligned [linear; angular] velocity of a frame."""
    return frame_jacobian(model, q, name) @ v


def all_body_jacobians(model: RobotModel, cache):
    """(n, 6, nq) Jacobians of every body-frame origin (vectorized)."""
    a, o, p = cache["a"], cache["o"], cache["p"]         # (n,3)
    rev = jnp.asarray(model.joint_type == 1, dtype=p.dtype)[None, :, None]   # (1,n,1)
    mask = jnp.asarray(model.ancestor.T, dtype=p.dtype)[:, :, None]          # (b,k,1)
    # lin[b,k,:] = a_k x (p_b - o_k) for revolute, a_k for prismatic
    r = p[:, None, :] - o[None, :, :]                    # (b,k,3)
    lin = rev * jnp.cross(jnp.broadcast_to(a[None], r.shape), r, axis=-1) + (1 - rev) * a[None]
    ang = rev * jnp.broadcast_to(a[None], r.shape)
    J = jnp.concatenate([lin * mask, ang * mask], axis=-1)  # (b,k,6)
    return jnp.swapaxes(J, 1, 2)                          # (b,6,k)


def frame_kinematics(model: RobotModel, q, cache=None):
    """One FK pass -> every frame quantity the WBC needs:

      (Jc (12,nq), base_J (6,nq), ee_J (6,nq), feet_p (4,3),
       ee_p (3,), ee_R (3,3))

    Used with a single jax.jvp to get all the J-dot terms at once instead
    of re-deriving FK per frame (reference equivalent: one Pinocchio
    forwardKinematics + per-frame getFrameJacobian, WbcBase.cpp:134-191).
    Pass a precomputed fk() cache to share the FK with other consumers.
    """
    from .spec import CONTACT_FRAMES, EE_FRAME
    if cache is None:
        cache = fk(model, q)
    feet, jc_rows = [], []
    for f in CONTACT_FRAMES:
        fr = model.frame(f)
        p, _ = frame_pose(model, cache, f)
        feet.append(p)
        jc_rows.append(point_jacobian(model, cache, p, fr.body)[:3])
    base_fr = model.frame("base")
    base_p, _ = frame_pose(model, cache, "base")
    base_J = point_jacobian(model, cache, base_p, base_fr.body)
    ee_fr = model.frame(EE_FRAME)
    ee_p, ee_R = frame_pose(model, cache, EE_FRAME)
    ee_J = point_jacobian(model, cache, ee_p, ee_fr.body)
    return (jnp.concatenate(jc_rows, axis=0), base_J, ee_J,
            jnp.stack(feet), ee_p, ee_R)


class _LegStatic:
    """Per-leg chain constants in CONTACT_FRAMES order (LF, RF, LH, RH):
    the 4 leg chains are structurally identical (HAA, HFE, KFE revolute
    joints hanging off the base), so FK vectorizes over the leg axis —
    one lane-parallel chain of depth 3 instead of 12 scalar bodies.
    This is simultaneously the TPU-fast layout (VPU lanes over legs ×
    batch) and the trace-fast layout (~1/4 the primitives)."""

    def __init__(self, model: RobotModel):
        from .spec import (CONTACT_FRAMES, CONTACT_LEG_JOINTS, NUM_BASE,
                           REVOLUTE)
        XR = np.zeros((4, 3, 3, 3))
        Xp = np.zeros((4, 3, 3))
        ax = np.zeros((4, 3, 3))
        qidx = np.zeros((4, 3), dtype=np.int32)
        foot_p = np.zeros((4, 3))
        for f, fname in enumerate(CONTACT_FRAMES):
            joints = CONTACT_LEG_JOINTS[f]
            for d, j in enumerate(joints):
                b = NUM_BASE + j
                assert model.joint_type[b] == REVOLUTE
                expect_parent = NUM_BASE - 1 if d == 0 else NUM_BASE + joints[d - 1]
                assert int(model.parent[b]) == expect_parent, (fname, d)
                XR[f, d] = model.X_tree_R[b]
                Xp[f, d] = model.X_tree_p[b]
                ax[f, d] = model.axis[b]
                qidx[f, d] = b
            fr = model.frame(fname)
            assert fr.body == NUM_BASE + joints[2]
            assert np.allclose(fr.R, np.eye(3))
            foot_p[f] = fr.p
        self.XR, self.Xp, self.ax = XR, Xp, ax
        self.qidx, self.foot_p = qidx, foot_p


_LEG_STATIC = {}


def _leg_static(model: RobotModel) -> _LegStatic:
    if id(model) not in _LEG_STATIC:
        _LEG_STATIC[id(model)] = _LegStatic(model)
    return _LEG_STATIC[id(model)]


def leg_chain_fk(model: RobotModel, q):
    """Vectorized FK of the 4 leg chains.

    Returns (p_feet (4,3), a_w (4,3,3) world joint axes [leg, depth, xyz],
    o_w (4,3,3) world joint origins, R_base, p_base)."""
    from .rotations import euler_zyx_to_R
    st = _leg_static(model)
    dtype = q.dtype
    Rb = euler_zyx_to_R(q[3:6])
    pb = q[0:3]
    qleg = q[jnp.asarray(st.qidx.reshape(-1))].reshape(4, 3)
    R = jnp.broadcast_to(Rb, (4, 3, 3))
    p = jnp.broadcast_to(pb, (4, 3))
    a_ws, o_ws = [], []
    for d in range(3):
        XRd = jnp.asarray(st.XR[:, d], dtype=dtype)       # (4,3,3)
        Xpd = jnp.asarray(st.Xp[:, d], dtype=dtype)       # (4,3)
        axd = jnp.asarray(st.ax[:, d], dtype=dtype)       # (4,3)
        Ro = mm3(R, XRd)
        po = p + mv3(R, Xpd)
        a_ws.append(mv3(Ro, axd))
        o_ws.append(po)
        R = mm3(Ro, axis_angle_to_R(axd, qleg[:, d]))
        p = po
    p_feet = p + mv3(R, jnp.asarray(st.foot_p, dtype=dtype))
    return p_feet, jnp.stack(a_ws, axis=1), jnp.stack(o_ws, axis=1), Rb, pb


def foot_kinematics(model: RobotModel, q):
    """(p_feet (4,3), Jb (4,3,6), Jl (4,3,3)) in one vectorized pass:
    foot positions plus each foot's linear Jacobian split into base
    columns and own-leg columns (the only Jacobian blocks that are
    nonzero). Closed-form columns a_k x (p - o_k) — no autodiff, no
    full-tree FK."""
    p_feet, a_w, o_w, Rb, pb = leg_chain_fk(model, q)
    # own-leg columns (depth d): a_d x (p_foot - o_d)
    Jl = jnp.stack([jnp.cross(a_w[:, d], p_feet - o_w[:, d])
                    for d in range(3)], axis=-1)           # (4,3,3)
    # base columns: 3 prismatic world-aligned (identity), then revolute
    # z, y, x at the base origin with axes z, Rz y, Rz Ry x
    dtype = q.dtype
    cz, sz = jnp.cos(q[3]), jnp.sin(q[3])
    cy, sy = jnp.cos(q[4]), jnp.sin(q[4])
    zero = jnp.zeros_like(cz)
    az = jnp.stack([zero, zero, jnp.ones_like(cz)])
    ay = jnp.stack([-sz, cz, zero])
    ax_ = jnp.stack([cz * cy, sz * cy, -sy])
    r = p_feet - pb                                        # (4,3)
    rot_cols = jnp.stack([jnp.cross(az, r), jnp.cross(ay, r),
                          jnp.cross(ax_, r)], axis=-1)     # (4,3,3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (4, 3, 3))
    Jb = jnp.concatenate([eye, rot_cols], axis=-1)         # (4,3,6)
    return p_feet, Jb, Jl


class _ArmStatic:
    """Arm chain constants: base -> 6 arm joints -> EE frame."""

    def __init__(self, model: RobotModel):
        from .spec import (EE_FRAME, NUM_BASE, NUM_LEG_JOINTS, REVOLUTE)
        first = NUM_BASE + NUM_LEG_JOINTS
        bodies = list(range(first, first + 6))
        assert int(model.parent[first]) == NUM_BASE - 1
        for b in bodies[1:]:
            assert int(model.parent[b]) == b - 1
        assert all(model.joint_type[b] == REVOLUTE for b in bodies)
        self.XR = model.X_tree_R[bodies]
        self.Xp = model.X_tree_p[bodies]
        self.ax = model.axis[bodies]
        self.qidx = np.asarray(bodies, dtype=np.int32)
        fr = model.frame(EE_FRAME)
        assert fr.body == bodies[-1]
        self.ee_p, self.ee_R = fr.p, fr.R


_ARM_STATIC = {}


def _arm_static(model: RobotModel) -> _ArmStatic:
    if id(model) not in _ARM_STATIC:
        _ARM_STATIC[id(model)] = _ArmStatic(model)
    return _ARM_STATIC[id(model)]


def ee_chain_pose(model: RobotModel, q):
    """(p_ee, R_ee) via the base->arm chain only (flat unrolled depth-6
    chain; feet don't affect the EE). The fast path for the MPC's EE
    cost/residual (reference: OCS2 PinocchioEndEffectorKinematicsCppAd,
    QMInterface.cpp:363-379)."""
    from .rotations import euler_zyx_to_R
    st = _arm_static(model)
    dtype = q.dtype
    R = euler_zyx_to_R(q[3:6])
    p = q[0:3]
    qa = q[jnp.asarray(st.qidx)]
    for d in range(6):
        Ro = mm3(R, jnp.asarray(st.XR[d], dtype=dtype))
        p = p + mv3(R, jnp.asarray(st.Xp[d], dtype=dtype))
        axd = jnp.asarray(st.ax[d], dtype=dtype)
        R = mm3(Ro, axis_angle_to_R(axd, qa[d]))
    p_ee = p if np.allclose(st.ee_p, 0.0) else \
        p + mv3(R, jnp.asarray(st.ee_p, dtype=dtype))
    R_ee = R if np.allclose(st.ee_R, np.eye(3)) else \
        mm3(R, jnp.asarray(st.ee_R, dtype=dtype))
    return p_ee, R_ee


def contact_positions(model: RobotModel, q):
    """(4,3) world positions of the contact frames (LF, RF, LH, RH).

    Uses the scalar-structured specialized leg chains (models/chainfk.py)
    when the model matches the aliengo leg structure; falls back to the
    generic lane-parallel chain otherwise."""
    from . import chainfk
    try:
        chainfk.leg_chain(model)
    except AssertionError:
        return leg_chain_fk(model, q)[0]
    return chainfk.contact_positions(model, q)


def stacked_contact_jacobian(model: RobotModel, q):
    """(12, nq) stacked 3-DoF contact Jacobians (linear rows only).

    Reference equivalent: WbcBase.cpp:159-175 (j_ stacking).
    """
    cache = fk(model, q)
    from .spec import CONTACT_FRAMES
    rows = []
    for f in CONTACT_FRAMES:
        fr = model.frame(f)
        p, _ = frame_pose(model, cache, f)
        rows.append(point_jacobian(model, cache, p, fr.body)[:3])
    return jnp.concatenate(rows, axis=0)


def stacked_contact_jacobian_dot(model: RobotModel, q, v):
    _, jdot = jax.jvp(partial(stacked_contact_jacobian, model), (q,), (v,))
    return jdot
