"""Scalar-structured chain kinematics for the MPC hot path.

The generic FK (kinematics.fk) materializes (n,3,3) arrays and pays
~100 traced primitives per 3x3 product in slice/stack overhead; under the
solver's nested transforms (jit -> vmap -> scan -> vmap -> linearize) every
primitive bind costs ~0.5 ms of trace time and real XLA compile time.

This module represents rotations as 9 named scalars (R9) and exploits the
robot's structure, verified at model load:

  * leg chains (reference qm_description aliengo xacro): all joint-origin
    rotations are identity; axes are (HAA = x, HFE = y, KFE = y). The two
    consecutive y-rotations collapse (Ry(a)Ry(b) = Ry(a+b)), and all four
    legs evaluate lane-parallel as (4,)-vectorized scalars.
  * arm chain (kinova j2n6s300 xacro): constant origin rotations, all
    joint axes z.

Constant-folding: multiplications with zero entries of constant matrices /
vectors are skipped at trace time, so one leg-chain FK with Jacobians is
~200 primitives for all four legs (vs ~1700 for the generic vectorized
form), and the whole MPC stage fits in a few thousand primitives.

Replaces (for the solver only) the Pinocchio FK + CppAD-codegen kinematics
of the reference (QMPreComputation.cpp:50-89, QMInterface.cpp:363-379);
the generic tree FK in kinematics.py remains the source of truth and the
WBC/estimator path, and tests assert exact agreement.
"""
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .spec import (CONTACT_FRAMES, CONTACT_LEG_JOINTS, EE_FRAME, NUM_BASE,
                   NUM_LEG_JOINTS, REVOLUTE, RobotModel)


class R9(NamedTuple):
    """Rotation matrix as 9 scalars (each may carry leading batch dims)."""
    r00: object; r01: object; r02: object
    r10: object; r11: object; r12: object
    r20: object; r21: object; r22: object

    def col(self, j):
        r = self
        return ((r.r00, r.r10, r.r20), (r.r01, r.r11, r.r21),
                (r.r02, r.r12, r.r22))[j]

    def to_mat(self):
        r = self
        row = lambda a, b, c: jnp.stack(
            jnp.broadcast_arrays(a, b, c), axis=-1)
        return jnp.stack([row(r.r00, r.r01, r.r02),
                          row(r.r10, r.r11, r.r12),
                          row(r.r20, r.r21, r.r22)], axis=-2)


def from_euler_zyx(zyx):
    """R = Rz(yaw) Ry(pitch) Rx(roll) as R9 (matches rotations.euler_zyx_to_R)."""
    cz, sz = jnp.cos(zyx[..., 0]), jnp.sin(zyx[..., 0])
    cy, sy = jnp.cos(zyx[..., 1]), jnp.sin(zyx[..., 1])
    cx, sx = jnp.cos(zyx[..., 2]), jnp.sin(zyx[..., 2])
    return R9(cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx,
              sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx,
              -sy, cy * sx, cy * cx)


def _dot_const(row, v, skip_eps=0.0):
    """sum_i row[i] * v[i] for constant numpy v, skipping zeros."""
    acc = None
    for ri, vi in zip(row, v):
        vi_arr = np.asarray(vi)
        if np.all(vi_arr == 0.0):
            continue
        vi_c = float(vi) if vi_arr.ndim == 0 else jnp.asarray(vi)
        term = ri * vi_c
        acc = term if acc is None else acc + term
    if acc is None:
        return jnp.zeros(())
    return acc


def rotv_const(R: R9, v):
    """R @ v for constant numpy v (3,) or (B,3) — zeros skipped."""
    v = np.asarray(v)
    if v.ndim == 2:
        cols = (v[:, 0], v[:, 1], v[:, 2])
    else:
        cols = (v[0], v[1], v[2])
    return (_dot_const((R.r00, R.r01, R.r02), cols),
            _dot_const((R.r10, R.r11, R.r12), cols),
            _dot_const((R.r20, R.r21, R.r22), cols))


def rotv(R: R9, v):
    """R @ v for a 3-tuple of scalars v."""
    vx, vy, vz = v
    return (R.r00 * vx + R.r01 * vy + R.r02 * vz,
            R.r10 * vx + R.r11 * vy + R.r12 * vz,
            R.r20 * vx + R.r21 * vy + R.r22 * vz)


def rott_v(R: R9, v):
    """R^T @ v."""
    vx, vy, vz = v
    return (R.r00 * vx + R.r10 * vy + R.r20 * vz,
            R.r01 * vx + R.r11 * vy + R.r21 * vz,
            R.r02 * vx + R.r12 * vy + R.r22 * vz)


def mul_const(R: R9, M):
    """R @ M for a constant numpy 3x3 M (zeros skipped)."""
    M = np.asarray(M)
    rows = ((R.r00, R.r01, R.r02), (R.r10, R.r11, R.r12),
            (R.r20, R.r21, R.r22))
    out = [_dot_const(rows[i], (M[0, j], M[1, j], M[2, j]))
           for i in range(3) for j in range(3)]
    return R9(*out)


def mul_rx(R: R9, ang):
    """R @ Rx(ang): mixes columns 1, 2."""
    c, s = jnp.cos(ang), jnp.sin(ang)
    return R9(R.r00, R.r01 * c + R.r02 * s, -R.r01 * s + R.r02 * c,
              R.r10, R.r11 * c + R.r12 * s, -R.r11 * s + R.r12 * c,
              R.r20, R.r21 * c + R.r22 * s, -R.r21 * s + R.r22 * c)


def mul_ry(R: R9, ang):
    """R @ Ry(ang): mixes columns 0, 2."""
    c, s = jnp.cos(ang), jnp.sin(ang)
    return R9(R.r00 * c - R.r02 * s, R.r01, R.r00 * s + R.r02 * c,
              R.r10 * c - R.r12 * s, R.r11, R.r10 * s + R.r12 * c,
              R.r20 * c - R.r22 * s, R.r21, R.r20 * s + R.r22 * c)


def mul_rz(R: R9, ang):
    """R @ Rz(ang): mixes columns 0, 1."""
    c, s = jnp.cos(ang), jnp.sin(ang)
    return R9(R.r00 * c + R.r01 * s, -R.r00 * s + R.r01 * c, R.r02,
              R.r10 * c + R.r11 * s, -R.r10 * s + R.r11 * c, R.r12,
              R.r20 * c + R.r21 * s, -R.r20 * s + R.r21 * c, R.r22)


_AXIS_MUL = {(1, 0, 0): mul_rx, (0, 1, 0): mul_ry, (0, 0, 1): mul_rz}


def _axis_key(a):
    a = np.asarray(a)
    key = tuple(int(x) for x in np.round(a))
    if np.allclose(a, key) and key in _AXIS_MUL:
        return key
    return None


def cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def stack3(v, axis=-1):
    return jnp.stack(jnp.broadcast_arrays(*v), axis=axis)


# ---------------------------------------------------------------------------
# static chain data (verified structure), cached per model
# ---------------------------------------------------------------------------

class _LegChain(NamedTuple):
    hip_Xp: np.ndarray     # (4,3) hip joint origin in base frame
    thigh_Xp: np.ndarray   # (4,3)
    calf_Xp: np.ndarray    # (4,3)
    foot_p: np.ndarray     # (4,3) foot frame offset in calf frame
    qidx: np.ndarray       # (4,3) generalized-coordinate indices


class _ArmChain(NamedTuple):
    XR: np.ndarray         # (6,3,3)
    Xp: np.ndarray         # (6,3)
    qidx: np.ndarray       # (6,)
    ee_p: np.ndarray       # (3,)
    ee_R: np.ndarray       # (3,3)


_CACHE = {}


def leg_chain(model: RobotModel) -> _LegChain:
    key = (id(model), "legs")
    if key not in _CACHE:
        hip_Xp = np.zeros((4, 3)); thigh_Xp = np.zeros((4, 3))
        calf_Xp = np.zeros((4, 3)); foot_p = np.zeros((4, 3))
        qidx = np.zeros((4, 3), dtype=np.int32)
        for f, fname in enumerate(CONTACT_FRAMES):
            joints = CONTACT_LEG_JOINTS[f]
            bodies = [NUM_BASE + j for j in joints]
            # structural requirements for the specialized chain
            assert int(model.parent[bodies[0]]) == NUM_BASE - 1
            assert int(model.parent[bodies[1]]) == bodies[0]
            assert int(model.parent[bodies[2]]) == bodies[1]
            for b in bodies:
                assert model.joint_type[b] == REVOLUTE
                assert np.allclose(model.X_tree_R[b], np.eye(3))
            assert _axis_key(model.axis[bodies[0]]) == (1, 0, 0)
            assert _axis_key(model.axis[bodies[1]]) == (0, 1, 0)
            assert _axis_key(model.axis[bodies[2]]) == (0, 1, 0)
            hip_Xp[f] = model.X_tree_p[bodies[0]]
            thigh_Xp[f] = model.X_tree_p[bodies[1]]
            calf_Xp[f] = model.X_tree_p[bodies[2]]
            fr = model.frame(fname)
            assert fr.body == bodies[2] and np.allclose(fr.R, np.eye(3))
            foot_p[f] = fr.p
            qidx[f] = bodies
        _CACHE[key] = _LegChain(hip_Xp, thigh_Xp, calf_Xp, foot_p, qidx)
    return _CACHE[key]


def arm_chain(model: RobotModel) -> _ArmChain:
    key = (id(model), "arm")
    if key not in _CACHE:
        first = NUM_BASE + NUM_LEG_JOINTS
        bodies = list(range(first, first + 6))
        assert int(model.parent[first]) == NUM_BASE - 1
        for b in bodies[1:]:
            assert int(model.parent[b]) == b - 1
        for b in bodies:
            assert model.joint_type[b] == REVOLUTE
            assert _axis_key(model.axis[b]) == (0, 0, 1)
        fr = model.frame(EE_FRAME)
        assert fr.body == bodies[-1]
        _CACHE[key] = _ArmChain(model.X_tree_R[bodies],
                                model.X_tree_p[bodies],
                                np.asarray(bodies, dtype=np.int32),
                                fr.p, fr.R)
    return _CACHE[key]


# ---------------------------------------------------------------------------
# kinematics
# ---------------------------------------------------------------------------

def foot_kinematics(model: RobotModel, q):
    """(p_feet (4,3), Jb (4,3,6), Jl (4,3,3)): foot positions plus linear
    Jacobian blocks (base columns, own-leg columns), lane-parallel over
    the 4 legs. ~200 traced primitives total."""
    st = leg_chain(model)
    Rb = from_euler_zyx(q[3:6])
    pb = (q[0], q[1], q[2])
    q_legs = q[jnp.asarray(st.qidx.reshape(-1))].reshape(4, 3)
    q0, q1, q2 = q_legs[:, 0], q_legs[:, 1], q_legs[:, 2]

    p_hip = add(pb, rotv_const(Rb, st.hip_Xp))          # (4,) comps
    R1 = mul_rx(Rb, q0)                                 # batched comps
    p_thigh = add(p_hip, rotv_const(R1, st.thigh_Xp))
    R2 = mul_ry(R1, q1)
    p_calf = add(p_thigh, rotv_const(R2, st.calf_Xp))
    R3 = mul_ry(R1, q1 + q2)                            # Ry(a)Ry(b)=Ry(a+b)
    p_foot = add(p_calf, rotv_const(R3, st.foot_p))

    # joint axes in world: HAA = col x of Rb; HFE/KFE = col y of R1
    # (y-rotations keep their own axis)
    a0 = Rb.col(0)
    a1 = (R1.r01, R1.r11, R1.r21)
    jl0 = cross(a0, sub(p_foot, p_hip))
    jl1 = cross(a1, sub(p_foot, p_thigh))
    jl2 = cross(a1, sub(p_foot, p_calf))
    Jl = jnp.stack([stack3(jl0), stack3(jl1), stack3(jl2)], axis=-1)

    # base columns: prismatic x,y,z identity; revolute z, y, x at base
    # origin with world axes z, Rz y, Rz Ry x
    cz, sz = jnp.cos(q[3]), jnp.sin(q[3])
    cy, sy = jnp.cos(q[4]), jnp.sin(q[4])
    az = (0.0, 0.0, 1.0)
    ay = (-sz, cz, 0.0)
    ax_ = (cz * cy, sz * cy, -sy)
    r = sub(p_foot, pb)
    rot_cols = jnp.stack([stack3(cross(az, r)), stack3(cross(ay, r)),
                          stack3(cross(ax_, r))], axis=-1)  # (4,3,3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), (4, 3, 3))
    Jb = jnp.concatenate([eye, rot_cols], axis=-1)          # (4,3,6)
    p_feet = stack3(p_foot)                                 # (4,3)
    return p_feet, Jb, Jl


def contact_positions(model: RobotModel, q):
    """(4,3) foot positions via the specialized leg chains."""
    st = leg_chain(model)
    Rb = from_euler_zyx(q[3:6])
    pb = (q[0], q[1], q[2])
    q_legs = q[jnp.asarray(st.qidx.reshape(-1))].reshape(4, 3)
    p_hip = add(pb, rotv_const(Rb, st.hip_Xp))
    R1 = mul_rx(Rb, q_legs[:, 0])
    p_thigh = add(p_hip, rotv_const(R1, st.thigh_Xp))
    R2 = mul_ry(R1, q_legs[:, 1])
    p_calf = add(p_thigh, rotv_const(R2, st.calf_Xp))
    R3 = mul_ry(R1, q_legs[:, 1] + q_legs[:, 2])
    return stack3(add(p_calf, rotv_const(R3, st.foot_p)))


def mul_transpose(A: R9, B: R9) -> R9:
    """A @ B^T on scalar-structured rotations/matrices."""
    out = []
    Ar = ((A.r00, A.r01, A.r02), (A.r10, A.r11, A.r12),
          (A.r20, A.r21, A.r22))
    Br = ((B.r00, B.r01, B.r02), (B.r10, B.r11, B.r12),
          (B.r20, B.r21, B.r22))
    for i in range(3):
        for j in range(3):
            a, b = Ar[i], Br[j]
            out.append(a[0] * b[0] + a[1] * b[1] + a[2] * b[2])
    return R9(*out)


def solve3_scalar(M: R9, b, damp=0.0):
    """Cramer solve M x = b with M as 9 scalars, b a 3-tuple."""
    m00, m01, m02 = M.r00 + damp, M.r01, M.r02
    m10, m11, m12 = M.r10, M.r11 + damp, M.r12
    m20, m21, m22 = M.r20, M.r21, M.r22 + damp
    c00 = m11 * m22 - m12 * m21
    c01 = m12 * m20 - m10 * m22
    c02 = m10 * m21 - m11 * m20
    det = m00 * c00 + m01 * c01 + m02 * c02
    inv_det = 1.0 / det
    bx, by, bz = b
    x = (c00 * bx + (m02 * m21 - m01 * m22) * by
         + (m01 * m12 - m02 * m11) * bz) * inv_det
    y = (c01 * bx + (m00 * m22 - m02 * m20) * by
         + (m02 * m10 - m00 * m12) * bz) * inv_det
    z = (c02 * bx + (m01 * m20 - m00 * m21) * by
         + (m00 * m11 - m01 * m10) * bz) * inv_det
    return (x, y, z)


def base_velocity_from_momentum(info, x):
    """[pdot_base(3); zyx_rates(3)] from normalized momentum — the
    scalar-structured form of centroidal.base_velocity_from_momentum
    (SRBD Ab^{-1}; ~200 traced primitives vs ~850 for the array form).
    Called 3x per dynamics evaluation, so this dominates the solver's
    traced-graph size."""
    zyx = x[9:12]
    R = from_euler_zyx(zyx)
    # I_w = R Ic R^T
    RIc = mul_const(R, np.asarray(info.I_com_base))
    I_w = mul_transpose(RIc, R)
    L = (x[3] * info.mass, x[4] * info.mass, x[5] * info.mass)
    omega = solve3_scalar(I_w, L)
    r_w = rotv_const(R, np.asarray(info.r_com_base))
    v_com = (x[0], x[1], x[2])
    p_base_dot = sub(v_com, cross(omega, r_w))
    # E(zyx) zyx_dot = omega with E columns (z, Rz y, Rz Ry x):
    #   a2 = -sa ox + ca oy ; a3 = (ca ox + sa oy)/cb ; a1 = oz + sb a3
    ca, sa = jnp.cos(zyx[0]), jnp.sin(zyx[0])
    cb, sb = jnp.cos(zyx[1]), jnp.sin(zyx[1])
    ox, oy, oz = omega
    a2 = -sa * ox + ca * oy
    a3 = (ca * ox + sa * oy) / cb
    a1 = oz + sb * a3
    return jnp.stack([p_base_dot[0], p_base_dot[1], p_base_dot[2],
                      a1, a2, a3])


def ee_pose(model: RobotModel, q):
    """(p_ee (3,), R_ee (3,3)) via the base->arm chain (all-z axes)."""
    st = arm_chain(model)
    R = from_euler_zyx(q[3:6])
    p = (q[0], q[1], q[2])
    qa = q[jnp.asarray(st.qidx)]
    eye = np.eye(3)
    for d in range(6):
        if not np.allclose(st.Xp[d], 0.0):
            p = add(p, rotv_const(R, st.Xp[d]))
        if not np.allclose(st.XR[d], eye):
            R = mul_const(R, st.XR[d])
        R = mul_rz(R, qa[d])
    if not np.allclose(st.ee_p, 0.0):
        p = add(p, rotv_const(R, st.ee_p))
    if not np.allclose(st.ee_R, eye):
        R = mul_const(R, st.ee_R)
    return stack3(p), R.to_mat()
