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
    """Forward kinematics for every body.

    Returns dict with:
      R:  (n,3,3) body orientations (world)
      p:  (n,3)   body frame origins (world)
      a:  (n,3)   joint axes (world)
      o:  (n,3)   joint origins (world)  == body origins for revolute chains
    """
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


def contact_positions(model: RobotModel, q):
    """(4,3) world positions of the contact frames (LF, RF, LH, RH)."""
    cache = fk(model, q)
    from .spec import CONTACT_FRAMES
    return jnp.stack([frame_pose(model, cache, f)[0] for f in CONTACT_FRAMES])


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
