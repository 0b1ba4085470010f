"""Rotation utilities (ZYX Euler, quaternions, SO(3) maps) in pure JAX.

Conventions (matching the reference stack, see SURVEY.md):
  - Base orientation state is ZYX Euler angles ordered (yaw z, pitch y, roll x)
    = reference state entries (theta_base_z, theta_base_y, theta_base_x)
    (reference: qm_controllers/config/task.info:164-166).
  - Quaternions are (w, x, y, z) internally.
  - `euler_zyx_rate_to_omega_world` maps Euler-rate velocity coordinates to
    world angular velocity — the velocity parameterization used throughout
    (reference uses the same via OCS2's CentroidalModelPinocchioMapping).
All functions are jit/vmap-safe (no data-dependent Python control flow).
"""
import jax
import jax.numpy as jnp


def skew(v):
    """3-vector -> skew-symmetric matrix S(v) with S(v) @ u = v x u."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ], axis=-2)


def unskew(S):
    return jnp.stack([S[..., 2, 1], S[..., 0, 2], S[..., 1, 0]], axis=-1)


def rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([o, z, z], -1),
        jnp.stack([z, c, -s], -1),
        jnp.stack([z, s, c], -1)], -2)


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([c, z, s], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([-s, z, c], -1)], -2)


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1)], -2)


def axis_angle_to_R(axis, angle):
    """Rodrigues formula; axis must be unit. Fully unrolled (K^2 = aa^T - I
    for unit axes) — batched 3x3 dot_generals are slow on TPU."""
    ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
    s = jnp.sin(angle)
    c = jnp.cos(angle)
    C = 1.0 - c
    return jnp.stack([
        jnp.stack([c + C * ax * ax, C * ax * ay - s * az,
                   C * ax * az + s * ay], -1),
        jnp.stack([C * ay * ax + s * az, c + C * ay * ay,
                   C * ay * az - s * ax], -1),
        jnp.stack([C * az * ax - s * ay, C * az * ay + s * ax,
                   c + C * az * az], -1)], -2)


def euler_zyx_to_R(zyx):
    """zyx = (yaw, pitch, roll) -> R = Rz(yaw) Ry(pitch) Rx(roll).
    Closed form (no 3x3 matmul chain)."""
    cz, sz = jnp.cos(zyx[..., 0]), jnp.sin(zyx[..., 0])
    cy, sy = jnp.cos(zyx[..., 1]), jnp.sin(zyx[..., 1])
    cx, sx = jnp.cos(zyx[..., 2]), jnp.sin(zyx[..., 2])
    return jnp.stack([
        jnp.stack([cz * cy, cz * sy * sx - sz * cx,
                   cz * sy * cx + sz * sx], -1),
        jnp.stack([sz * cy, sz * sy * sx + cz * cx,
                   sz * sy * cx - cz * sx], -1),
        jnp.stack([-sy, cy * sx, cy * cx], -1)], -2)


def R_to_euler_zyx(R):
    """Inverse of euler_zyx_to_R (pitch in (-pi/2, pi/2))."""
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arctan2(-R[..., 2, 0],
                        jnp.sqrt(R[..., 2, 1] ** 2 + R[..., 2, 2] ** 2))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([yaw, pitch, roll], axis=-1)


def euler_zyx_rate_to_omega_world_matrix(zyx):
    """E(zyx) with omega_world = E @ zyx_dot (zyx_dot ordered yaw,pitch,roll)."""
    a, b = zyx[..., 0], zyx[..., 1]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    z = jnp.zeros_like(a)
    o = jnp.ones_like(a)
    # columns: z-hat, Rz(a) y-hat, Rz(a)Ry(b) x-hat
    return jnp.stack([
        jnp.stack([z, -sa, ca * cb], -1),
        jnp.stack([z, ca, sa * cb], -1),
        jnp.stack([o, z, -sb], -1)], -2)


def omega_world_to_euler_zyx_rate_matrix(zyx):
    from .smallmat import inv3
    return inv3(euler_zyx_rate_to_omega_world_matrix(zyx))


def quat_to_R(q):
    """(w,x,y,z) quaternion -> rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / n
    return jnp.stack([
        jnp.stack([1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)], -1),
        jnp.stack([s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)], -1),
        jnp.stack([s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y)], -1),
    ], -2)


def R_to_quat(R):
    """Rotation matrix -> (w,x,y,z) quaternion; branch-free (jit-safe)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick numerically best via where-chains
    qw0 = jnp.sqrt(jnp.maximum(1 + tr, 1e-12)) / 2
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], -1)
    qx1 = jnp.sqrt(jnp.maximum(1 + m00 - m11 - m22, 1e-12)) / 2
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], -1)
    qy2 = jnp.sqrt(jnp.maximum(1 - m00 + m11 - m22, 1e-12)) / 2
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], -1)
    qz3 = jnp.sqrt(jnp.maximum(1 - m00 - m11 + m22, 1e-12)) / 2
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], -1)
    cond0 = tr > 0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(cond0[..., None], q0,
                  jnp.where(cond1[..., None], q1,
                            jnp.where(cond2[..., None], q2, q3)))
    # canonical sign: w >= 0
    return q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))


def quat_mul(a, b):
    w1, x1, y1, z1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    w2, x2, y2, z2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2], -1)


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_slerp(q0, q1, t):
    """Spherical interpolation, shortest path, branch-free.

    Matches Eigen's Quaternion::slerp used by the reference EE constraint
    (qm_interface/src/constraint/EndEffectorConstraint.cpp:102).
    """
    d = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(d[..., None] < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    q = w0[..., None] * q0 + w1[..., None] * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_distance(q, q_ref):
    """OCS2 quaternionDistance: vector part of the error quaternion.

    err = q.w * q_ref.vec - q_ref.w * q.vec - q.vec x q_ref.vec  (R^3),
    zero iff q == +-q_ref. Matches ocs2::quaternionDistance used by
    EndEffectorConstraint (reference EndEffectorConstraint.cpp:55-77).
    """
    w, v = q[..., 0], q[..., 1:]
    wr, vr = q_ref[..., 0], q_ref[..., 1:]
    return w[..., None] * vr - wr[..., None] * v - jnp.cross(v, vr)


def so3_log(R):
    """Matrix log of a rotation -> axis-angle vector (rotation error)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = unskew(R - jnp.swapaxes(R, -1, -2)) / 2.0  # = sin(theta) * axis
    sin_theta = jnp.sin(theta)
    scale = jnp.where(sin_theta < 1e-7, 1.0, theta / jnp.where(sin_theta < 1e-7, 1.0, sin_theta))
    return scale[..., None] * w


def rotation_error_world(R_des, R_meas):
    """World-frame rotation error e with R_des ~ exp(S(e)) R_meas.

    The reference WBC uses rotationErrorInWorld (WbcBase.cpp:283, :516).
    """
    return so3_log(R_des @ jnp.swapaxes(R_meas, -1, -2))


def yaw_unwrap(yaw, last_yaw):
    """Shift yaw by multiples of 2*pi to stay near last_yaw.

    Reference: QMController.cpp:239-242 (ocs2 moduloAngleWithReference).
    """
    return yaw + 2.0 * jnp.pi * jnp.round((last_yaw - yaw) / (2.0 * jnp.pi))
