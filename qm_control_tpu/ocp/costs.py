"""OCP cost stack: tracking cost, EE soft constraint, relaxed barriers.

Replicates the reference's cost/constraint assembly
(qm_interface/src/QMInterface.cpp:96-131) in pure JAX:

  baseTrackingCost   0.5 dx'Q dx + 0.5 du'R du, du vs. the gravity-
                     compensating input (LeggedRobotQuadraticTrackingCost.h:
                     22-68); the leg-joint-velocity block of R weights FOOT
                     VELOCITY RELATIVE TO BASE mapped through the stance
                     Jacobian at the nominal configuration
                     (QMInterface::initializeInputCostWeight, :274-299)
  endEffector        quadratic penalty on [p_ee - p_ref; quatDistance]
                     (EndEffectorConstraint.cpp:14-113, mu 2000/1000)
  armJointLimits     relaxed-barrier box on arm joint positions (state) and
                     velocities (input) (QMInterface.cpp:177-259)
  frictionCone       relaxed barrier on mu*Fz - sqrt(Fx^2+Fy^2+reg), per
                     stance foot (OCS2 FrictionConeConstraint, reg = 25)

All functions are per-(t, x, u) and vmap/jit-safe. Mode-dependent activity
uses multiplicative masks, never branches.
"""
import jax.numpy as jnp
import numpy as np

from ..config import CostConfig, FrictionConfig, JointLimitsConfig, QmConfig
from ..models import centroidal as C
from ..models import kinematics as K
from ..models.rotations import quat_distance
from ..models.spec import (CONTACT_LEG_JOINTS, NUM_BASE, RobotModel,
                           default_q)
from .reference import TargetTrajectory, interpolate_ee_pose, interpolate_state

FRICTION_CONE_REGULARIZATION = 25.0   # OCS2 FrictionConeConstraint default


# ---------------------------------------------------------------------------
# penalty functions (OCS2 penalty library equivalents)
# ---------------------------------------------------------------------------

def quadratic_penalty(h, mu):
    """OCS2 QuadraticPenalty: 0.5 * mu * h^2."""
    return 0.5 * mu * h * h


def relaxed_barrier_penalty(h, mu, delta):
    """OCS2 RelaxedBarrierPenalty: -mu ln(h) for h > delta, quadratic
    extension below (C2 at h = delta)."""
    safe_h = jnp.maximum(h, delta)
    log_branch = -mu * jnp.log(safe_h)
    quad_branch = mu * (-np.log(delta) + 0.5 * ((h - 2.0 * delta) / delta) ** 2
                        - 0.5)
    return jnp.where(h > delta, log_branch, quad_branch)


# ---------------------------------------------------------------------------
# input cost weight: leg-velocity block mapped through the nominal Jacobian
# ---------------------------------------------------------------------------

def input_cost_weight(model: RobotModel, cost_cfg: CostConfig,
                      q_nominal=None) -> np.ndarray:
    """(30,30) R matrix with the leg-joint-velocity block base2feetJac' *
    R_taskspace * base2feetJac (reference QMInterface.cpp:274-299).

    base2feetJac rows: foot order (LF, RF, LH, RH); columns: the 12 leg
    joints in joint order (LF, LH, RF, RH).
    """
    if q_nominal is None:
        q_nominal = default_q(base_pos=(0, 0, 0.4))
    q = jnp.asarray(q_nominal, dtype=jnp.float32)
    # NOTE: runs at construction time (outside any solver jit); wrapped in
    # its own jit because eager dispatch of the FK graph is very slow.
    import jax
    J = np.asarray(jax.jit(
        lambda qq: K.stacked_contact_jacobian(model, qq))(q))  # (12, 24)
    base2feet = J[:, NUM_BASE:NUM_BASE + 12]                 # (12, 12)
    R = np.diag(np.asarray(cost_cfg.r_diag)) * cost_cfg.r_scaling
    R_fv = R[12:24, 12:24]
    R = R.copy()
    R[12:24, 12:24] = base2feet.T @ R_fv @ base2feet
    return R


# ---------------------------------------------------------------------------
# stage cost terms
# ---------------------------------------------------------------------------

def tracking_cost(x, u, x_ref30, u_ref, Q_diag, R_full):
    """0.5 dx'Q dx + 0.5 du'R du (EE tail of the target is handled by
    ee_cost; the tracking deviation ignores it — reference
    LeggedRobotQuadraticTrackingCost.h:37, :62)."""
    dx = x - x_ref30
    du = u - u_ref
    return 0.5 * jnp.sum(Q_diag * dx * dx) + 0.5 * du @ (R_full @ du)


def ee_pose(model: RobotModel, q):
    """(p_ee, R_ee) via the base->arm chain only (feet don't affect the
    EE) — scalar-structured chain (models/chainfk.py) with a generic
    fallback."""
    from ..models import chainfk
    try:
        chainfk.arm_chain(model)
    except AssertionError:
        return K.ee_chain_pose(model, q)
    return chainfk.ee_pose(model, q)


def ee_cost(model: RobotModel, x, p_ref, q_ref_wxyz, mu_pos, mu_ori):
    """Quadratic penalty on the 6-dim EE pose error (reference
    EndEffectorConstraint + QuadraticPenalty)."""
    q = C.state_to_q(x)
    p_ee, R_ee = ee_pose(model, q)
    from ..models.rotations import R_to_quat
    q_ee = R_to_quat(R_ee)
    e_pos = p_ee - p_ref
    e_ori = quat_distance(q_ee, q_ref_wxyz)
    return (jnp.sum(quadratic_penalty(e_pos, mu_pos))
            + jnp.sum(quadratic_penalty(e_ori, mu_ori)))


def friction_cone_cost(u, contact_flags, fcfg: FrictionConfig):
    """Relaxed-barrier friction cone, masked by contact (swing feet pay
    nothing — the reference constraint isActive only in contact)."""
    forces = u[:12].reshape(4, 3)
    fx, fy, fz = forces[:, 0], forces[:, 1], forces[:, 2]
    h = (fcfg.friction_coefficient * fz
         - jnp.sqrt(fx * fx + fy * fy + FRICTION_CONE_REGULARIZATION))
    pen = relaxed_barrier_penalty(h, fcfg.barrier_mu, fcfg.barrier_delta)
    return jnp.sum(jnp.asarray(contact_flags, dtype=u.dtype) * pen)


def arm_limit_cost(model: RobotModel, x, u, jcfg: JointLimitsConfig):
    """Relaxed-barrier box on arm joint positions (x[24:30]) and arm joint
    velocities (u[24:30]) (reference getJointLimitSoftConstraint)."""
    q_arm = x[24:30]
    v_arm = u[24:30]
    q_lo = jnp.asarray(model.joint_lower[12:], dtype=x.dtype)
    q_hi = jnp.asarray(model.joint_upper[12:], dtype=x.dtype)
    v_lo = jnp.asarray(jcfg.arm_velocity_lower, dtype=x.dtype)
    v_hi = jnp.asarray(jcfg.arm_velocity_upper, dtype=x.dtype)
    # unbounded URDF joints (continuous) get +-1e19 limits; mask those out
    q_mask = (jnp.abs(q_lo) < 1e6) & (jnp.abs(q_hi) < 1e6)
    p = (relaxed_barrier_penalty(q_arm - q_lo, jcfg.position_mu,
                                 jcfg.position_delta)
         + relaxed_barrier_penalty(q_hi - q_arm, jcfg.position_mu,
                                   jcfg.position_delta)) * q_mask
    v = (relaxed_barrier_penalty(v_arm - v_lo, jcfg.velocity_mu,
                                 jcfg.velocity_delta)
         + relaxed_barrier_penalty(v_hi - v_arm, jcfg.velocity_mu,
                                   jcfg.velocity_delta))
    return jnp.sum(p) + jnp.sum(v)


# ---------------------------------------------------------------------------
# assembled stage / final cost
# ---------------------------------------------------------------------------

def ee_residual(model: RobotModel, x, p_ref, q_ref_wxyz):
    """(6,) EE pose error residual [e_pos; e_ori] (EndEffectorConstraint
    getValue, reference :34-53)."""
    from ..models.rotations import R_to_quat
    q = C.state_to_q(x)
    p_ee, R_ee = ee_pose(model, q)
    q_ee = R_to_quat(R_ee)
    return jnp.concatenate([p_ee - p_ref,
                            quat_distance(q_ee, q_ref_wxyz)])


def make_stage_quadratizer_parts(model: RobotModel, info: C.CentroidalInfo,
                                 cfg: QmConfig):
    """quad_xu(t, x, u, target, flags, e, Je) -> (L, Lx, Lu, Lxx, Luu, Lux)
    where (e, Je) are the precomputed EE residual and its x-Jacobian.

    Splitting the EE kinematics out lets the solver obtain (e, Je) from
    the SAME jax.linearize pass that produces the dynamics A, B — no
    second FK trace/evaluation (see ocp.problem.stage_linearize). All
    remaining terms are analytic or tiny-graph autodiff with no FK.
    """
    import jax
    Q_diag_np = np.asarray(cfg.cost.q_diag) * cfg.cost.q_scaling
    R_full_np = input_cost_weight(model, cfg.cost)
    mu_pos, mu_ori = cfg.cost.ee_mu_position, cfg.cost.ee_mu_orientation
    fcfg, jcfg = cfg.friction, cfg.joint_limits

    def quad_xu(t, x, u, target: TargetTrajectory, flags, e, Je):
        dtype = x.dtype
        Q = jnp.asarray(Q_diag_np, dtype=dtype)
        R = jnp.asarray(R_full_np, dtype=dtype)
        x_ref = interpolate_state(target, t)
        u_ref = C.weight_compensating_input(info, flags).astype(dtype)

        dx = x - x_ref[:30]
        du = u - u_ref
        L = 0.5 * jnp.sum(Q * dx * dx) + 0.5 * du @ (R @ du)
        Lx = Q * dx
        Lu = R @ du
        Lxx = jnp.diag(Q)
        Luu = R
        Lux = jnp.zeros((30, 30), dtype=dtype)

        # EE soft constraint: Gauss-Newton on the precomputed residual.
        # Contraction-unrolled products (see ocp/linearize.py assembly
        # note): a vmapped (30,6)@(6,30) dot_general takes XLA's
        # convolution lowering with layout copies on TPU.
        from ..models.smallmat import mtm_unrolled, mtv_unrolled
        mu = jnp.asarray([mu_pos] * 3 + [mu_ori] * 3, dtype=dtype)
        L = L + 0.5 * jnp.sum(mu * e * e)
        Lx = Lx + mtv_unrolled(Je, mu * e)
        Lxx = Lxx + mtm_unrolled(Je, mu[:, None] * Je)

        # friction cone barrier: exact derivatives in u (tiny analytic graph)
        fc = lambda uu: friction_cone_cost(uu, flags, fcfg)
        L = L + fc(u)
        Lu = Lu + jax.grad(fc)(u)
        Luu = Luu + jax.jacfwd(jax.grad(fc))(u)

        # arm box limits: exact (residuals are linear; diagonal Hessians)
        al_x = lambda xx: arm_limit_cost(model, xx, u, jcfg)
        al_u = lambda uu: arm_limit_cost(model, x, uu, jcfg)
        L = L + al_x(x)
        Lx = Lx + jax.grad(al_x)(x)
        Lxx = Lxx + jax.jacfwd(jax.grad(al_x))(x)
        Lu = Lu + jax.grad(al_u)(u)
        Luu = Luu + jax.jacfwd(jax.grad(al_u))(u)
        return L, Lx, Lu, Lxx, Luu, Lux

    return quad_xu


def make_stage_quadratizer(model: RobotModel, info: C.CentroidalInfo,
                           cfg: QmConfig):
    """Gauss-Newton quadratic approximation of the stage cost in (x, u).

    Returns quad(t, x, u, target, flags) ->
        (L, Lx(30), Lu(30), Lxx(30,30), Luu(30,30), Lux(30,30)).

    Mirrors OCS2's term-wise getQuadraticApproximation: the tracking cost
    is exactly quadratic; soft constraints contribute J' p'' J (+ exact
    diagonal terms where the residual is linear). EE second derivatives of
    the kinematics are dropped (the reference's EndEffectorConstraint is
    declared ConstraintOrder::Linear, so OCS2 does the same).
    """
    import jax
    quad_xu = make_stage_quadratizer_parts(model, info, cfg)

    def quad(t, x, u, target: TargetTrajectory, flags):
        p_ref, q_ref = interpolate_ee_pose(target, t)
        e = ee_residual(model, x, p_ref, q_ref)
        Je = jax.jacfwd(lambda xx: ee_residual(model, xx, p_ref, q_ref))(x)
        return quad_xu(t, x, u, target, flags, e, Je)

    def final_quad(t, x, target: TargetTrajectory):
        import jax
        dtype = x.dtype
        p_ref, q_ref = interpolate_ee_pose(target, t)
        e = ee_residual(model, x, p_ref, q_ref)
        Je = jax.jacfwd(lambda xx: ee_residual(model, xx, p_ref, q_ref))(x)
        mu = jnp.asarray([cfg.cost.final_ee_mu_position] * 3
                         + [cfg.cost.final_ee_mu_orientation] * 3,
                         dtype=dtype)
        L = 0.5 * jnp.sum(mu * e * e)
        Lx = Je.T @ (mu * e)
        Lxx = Je.T @ (mu[:, None] * Je)
        return L, Lx, Lxx

    return quad, final_quad


def make_stage_cost(model: RobotModel, info: C.CentroidalInfo,
                    cfg: QmConfig):
    """Returns stage_cost(t, x, u, target, contact_flags) -> scalar.

    Everything data-dependent (target, contacts) comes in as arrays so one
    compilation serves all scenarios.
    """
    Q_diag_np = np.asarray(cfg.cost.q_diag) * cfg.cost.q_scaling
    R_full_np = input_cost_weight(model, cfg.cost)

    def stage_cost(t, x, u, target: TargetTrajectory, contact_flags):
        Q_diag = jnp.asarray(Q_diag_np, dtype=x.dtype)
        R_full = jnp.asarray(R_full_np, dtype=x.dtype)
        x_ref = interpolate_state(target, t)
        u_ref = C.weight_compensating_input(info, contact_flags).astype(x.dtype)
        p_ref, q_ref = interpolate_ee_pose(target, t)
        c = tracking_cost(x, u, x_ref[:30], u_ref, Q_diag, R_full)
        c += ee_cost(model, x, p_ref, q_ref,
                     cfg.cost.ee_mu_position, cfg.cost.ee_mu_orientation)
        c += friction_cone_cost(u, contact_flags, cfg.friction)
        c += arm_limit_cost(model, x, u, cfg.joint_limits)
        return c

    def final_cost(t, x, target: TargetTrajectory):
        p_ref, q_ref = interpolate_ee_pose(target, t)
        return ee_cost(model, x, p_ref, q_ref,
                       cfg.cost.final_ee_mu_position,
                       cfg.cost.final_ee_mu_orientation)

    return stage_cost, final_cost
