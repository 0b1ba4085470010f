"""Physics plant: full rigid-body dynamics + compliant ground contact +
hybrid-joint actuation with a command delay line.

The Gazebo-equivalent "fake backend" (SURVEY.md §4 item 1): the reference
validates in Gazebo with the QMHWSim plugin (qm_gazebo/src/QMHWSim.cpp:
10-227) — hybrid PD+feedforward torques computed inside the sim write
(:112-113) and an actuation-delay fault-injection deque replaying commands
`delay` seconds old (:98-116; 9 ms configured in qm_gazebo/config/
default.yaml:2). Here the plant is the framework's own pure-JAX rigid-body
model, so closed-loop tests and batched scenario rollouts run entirely
on-device.

Ground contact: per-foot compliant (spring-damper) normal force with
regularized Coulomb friction — branch-free, vmap-safe, differentiable.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import dynamics as D
from ..models import kinematics as K
from ..models.spec import EE_FRAME, NQ, NUM_JOINTS, RobotModel

MAX_DELAY_STEPS = 32


class PlantConfig(NamedTuple):
    sim_dt: float = 0.001            # 1 kHz physics (position_control.yaml:4)
    contact_kp: float = 40000.0      # ground stiffness [N/m]
    contact_kd: float = 2000.0       # ground damping [N s/m]
    friction_mu: float = 0.7         # ground friction (Gazebo default)
    tangential_kp: float = 20000.0   # sticking (anchor spring) stiffness
    tangential_kd: float = 400.0     # tangential damping [N s/m]
    # Actuation delay in COMMAND PUSHES, not sim substeps: the ring
    # advances once per push_command(), which the control loop issues per
    # control tick (500 Hz), while physics substeps at 1 kHz. So at the
    # default rates one step = 2 ms: the reference's 9 ms Gazebo fault
    # (default.yaml:2) is delay_steps ~= 4-5, or use delay_steps_for().
    # Default 0 = ideal actuation. (With the compliant penalty ground
    # here, large delays destabilize the 500 Hz WBC loop earlier than in
    # Gazebo's constraint-based contact.)
    delay_steps: int = 0
    joint_damping: float = 0.1       # viscous joint friction


class HybridCommand(NamedTuple):
    """The 5-tuple hybrid joint command (reference HybridJointInterface.h:
    55-61): tau = kp (pos_des - q) + kd (vel_des - v) + ff."""
    pos_des: jnp.ndarray   # (18,)
    vel_des: jnp.ndarray   # (18,)
    kp: jnp.ndarray        # (18,)
    kd: jnp.ndarray        # (18,)
    ff: jnp.ndarray        # (18,)


def zero_command(dtype=jnp.float32) -> HybridCommand:
    z = jnp.zeros(NUM_JOINTS, dtype=dtype)
    return HybridCommand(z, z, z, z, z)


class PlantState(NamedTuple):
    q: jnp.ndarray           # (24,)
    v: jnp.ndarray           # (24,)
    t: jnp.ndarray           # scalar
    cmd_buf: HybridCommand   # (MAX_DELAY_STEPS, 18) each — delay line
    buf_head: jnp.ndarray    # int32 write index
    anchors: jnp.ndarray     # (4,2) tangential friction anchor points
    ee_wrench: jnp.ndarray   # (6,) external world wrench applied at the
    #                          arm EE (disturbance injection; zeros = off)


def init_plant_state(q0, v0=None, dtype=jnp.float32,
                     model: RobotModel = None) -> PlantState:
    q0 = jnp.asarray(q0, dtype=dtype)
    v0 = jnp.zeros(NQ, dtype=dtype) if v0 is None else jnp.asarray(v0, dtype=dtype)
    buf = HybridCommand(*[jnp.zeros((MAX_DELAY_STEPS, NUM_JOINTS),
                                    dtype=dtype) for _ in range(5)])
    # friction anchors start at the feet (they re-latch on ground contact
    # anyway, but a correct start avoids a transient if feet spawn
    # penetrating the ground)
    anchors = (K.contact_positions(model, q0)[:, :2] if model is not None
               else jnp.zeros((4, 2), dtype=dtype))
    return PlantState(q=q0, v=v0, t=jnp.asarray(0.0, dtype=dtype),
                      cmd_buf=buf, buf_head=jnp.asarray(0, dtype=jnp.int32),
                      anchors=jnp.asarray(anchors, dtype=dtype),
                      ee_wrench=jnp.zeros(6, dtype=dtype))


def delay_steps_for(delay_s: float, push_freq: float = 500.0) -> int:
    """Convert an actuation delay in seconds to delay line steps at the
    rate commands are pushed (one push per control tick)."""
    return int(round(delay_s * push_freq))


def hybrid_torque(cmd: HybridCommand, q_joints, v_joints):
    """tau = kp (pos_des - q) + kd (vel_des - v) + ff
    (reference QMHWSim.cpp:112-113)."""
    return (cmd.kp * (cmd.pos_des - q_joints)
            + cmd.kd * (cmd.vel_des - v_joints) + cmd.ff)


def push_command(state: PlantState, cmd: HybridCommand) -> PlantState:
    """Write a new command into the delay line (reference QMHWSim.cpp:
    98-116 timestamped deque)."""
    head = state.buf_head
    buf = HybridCommand(*[b.at[head].set(c)
                          for b, c in zip(state.cmd_buf, cmd)])
    return state._replace(cmd_buf=buf,
                          buf_head=(head + 1) % MAX_DELAY_STEPS)


def delayed_command(state: PlantState, delay_steps) -> HybridCommand:
    """Read the command `delay_steps` sim steps old."""
    idx = (state.buf_head - 1 - delay_steps) % MAX_DELAY_STEPS
    return HybridCommand(*[b[idx] for b in state.cmd_buf])


def contact_forces(model: RobotModel, cfg: PlantConfig, q, v, anchors):
    """(fc(4,3), damping_diag(12), Jc, new_anchors): ground reaction
    forces with STICKING friction.

    Normal: compliant spring-damper. Tangential: anchor-spring Coulomb —
    each foot in contact pulls toward a remembered anchor point
    (f_t = -kt (p - a) - ct v_t), saturated at mu*fn with the anchor
    dragged along when sliding. Unlike velocity-regularized Coulomb, this
    holds STATIC tangential load at zero velocity — without it a standing
    robot creeps sideways indefinitely and the WBC's lowest-priority base
    xy task cannot stop it (observed closed-loop divergence).

    Damping slopes are returned separately for IMPLICIT integration —
    explicit integration of these stiff terms diverges at the light feet.
    """
    cache = K.fk(model, q)
    Jc = K.stacked_contact_jacobian(model, q)         # (12,24)
    p = jnp.stack([K.frame_pose(model, cache, f)[0]
                   for f in ("LF_FOOT", "RF_FOOT", "LH_FOOT", "RH_FOOT")])
    vel = (Jc @ v).reshape(4, 3)
    depth = jnp.maximum(-p[:, 2], 0.0)                        # penetration
    in_contact = (depth > 0).astype(q.dtype)
    fn = jnp.maximum(cfg.contact_kp * depth
                     - cfg.contact_kd * vel[:, 2] * in_contact, 0.0)
    # sticking tangential force toward the anchor
    p_xy = p[:, :2]
    f_t = -cfg.tangential_kp * (p_xy - anchors) \
        - cfg.tangential_kd * vel[:, :2]
    f_mag = jnp.linalg.norm(f_t, axis=1) + 1e-9
    f_max = cfg.friction_mu * fn
    scale = jnp.minimum(1.0, f_max / f_mag)
    f_t = f_t * scale[:, None]
    # slide the anchor so the spring force equals the saturated force
    new_anchors = jnp.where(in_contact[:, None] > 0,
                            p_xy + (f_t + cfg.tangential_kd * vel[:, :2])
                            / cfg.tangential_kp,
                            p_xy)
    fc = jnp.concatenate([f_t, fn[:, None]], axis=1) * in_contact[:, None]
    d_diag = jnp.stack([cfg.tangential_kd * in_contact,
                        cfg.tangential_kd * in_contact,
                        cfg.contact_kd * in_contact], axis=1)   # (4,3)
    return fc, d_diag.reshape(-1), Jc, new_anchors


def make_plant_step(model: RobotModel, cfg: PlantConfig):
    """Returns step(state) -> (state', contact_forces(4,3)): one sim_dt of
    semi-implicit Euler with the delayed hybrid-joint actuation.

    Contact damping is handled implicitly:
        (M + dt J' D J + dt diag(b_joint)) vdot = tau - h + J' f_c(v)
    which keeps arbitrary-stiffness ground damping stable at 1 kHz."""
    dt = cfg.sim_dt

    def step(state: PlantState):
        q, v = state.q, state.v
        cmd = delayed_command(state, cfg.delay_steps)
        tau_j = hybrid_torque(cmd, q[6:], v[6:])
        tau = jnp.concatenate([jnp.zeros(6, dtype=q.dtype), tau_j])
        fc, d_diag, Jc, anchors = contact_forces(model, cfg, q, v,
                                                 state.anchors)
        M = D.mass_matrix(model, q)
        h = D.nonlinear_effects(model, q, v)
        # external EE wrench (disturbance injection, BASELINE config #4):
        # generalized force J_ee^T w
        J_ee = K.frame_jacobian(model, q, EE_FRAME)
        rhs = (tau - h + Jc.T @ fc.reshape(-1)
               + J_ee.T @ state.ee_wrench.astype(q.dtype))
        # Implicit damping diagonal: viscous joint friction + the hybrid
        # command's own PD stiffness/damping (kd + dt*kp) — distal arm
        # joints have tiny inertias, so explicit PD torque integration
        # diverges at any useful gain. tau(v+, q+) linearized about (v, q):
        #   rhs gets the explicit tau(v, q) minus the extra first-order
        #   terms; the slopes move onto the LHS diagonal.
        zeros6 = jnp.zeros(6, dtype=q.dtype)
        b_lhs = jnp.concatenate([zeros6,
                                 cfg.joint_damping + cmd.kd + dt * cmd.kp])
        rhs_extra = jnp.concatenate([zeros6,
                                     (cfg.joint_damping + dt * cmd.kp)
                                     * v[6:]])
        rhs = rhs - rhs_extra
        M_imp = (M + dt * (Jc.T * d_diag[None, :]) @ Jc
                 + dt * jnp.diag(b_lhs))
        vdot = jnp.linalg.solve(M_imp, rhs)
        v_new = v + dt * vdot
        q_new = q + dt * v_new                     # semi-implicit Euler
        return state._replace(q=q_new, v=v_new, t=state.t + dt,
                              anchors=anchors), fc

    return step
