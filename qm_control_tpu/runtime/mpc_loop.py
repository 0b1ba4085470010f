"""QMMpcController-variant closed loop: MPC-only WBC for the legs, arm
under position control fed integrated MPC joint velocities.

Replicates the reference's second controller (QMController.cpp:368-445,
class QMMpcController):
  - legs: hybrid joint commands (posDes, velDes, kp=0, kd=3, tau_ff) with
    torques from HierarchicalMpcWbc (no arm/EE tasks; :405-409);
  - arm: gazebo effort_controllers/JointPositionController PIDs
    (position_control.yaml: p=5000/d=8 joints 1-3, p=500/d=0.2 joints
    4-6) tracking a command integrated from the MPC solution at 100 Hz:
      cmd_j = state(24+j) + velDes(12+j) / 100        (:438-443)
  - arm state read from /joint_states (hardware side), legs from the
    hybrid handles (:411-427) — here both come from the same plant, the
    in-process equivalent.

Same one-fused-cycle-per-MPC-period structure as runtime.loop.make_cycle.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import QmConfig, WbcGains
from ..gaits.gait import ModeSchedule, contact_flags_from_mode
from ..models import centroidal as C
from ..models.spec import RobotModel
from ..mpc.mpc import evaluate_policy, mpc_step
from ..ocp.problem import make_ocp
from ..ocp.reference import TargetTrajectory
from ..solver.sqp import SqpSettings
from ..wbc.wbc import hierarchical_mpc_wbc_update
from .estimator import observation_from_rbd, rbd_state_from_plant, rbd_to_qv
from .loop import CycleCarry, CycleMetrics, LoopConfig
from .plant import HybridCommand, push_command, make_plant_step
from .safety import safety_check

# gazebo position-controller PIDs (qm_gazebo/config/position_control.yaml)
ARM_POS_KP = jnp.asarray([5000., 5000., 5000., 500., 500., 500.],
                         dtype=jnp.float32)
ARM_POS_KD = jnp.asarray([8., 8., 8., 0.2, 0.2, 0.2], dtype=jnp.float32)
ARM_CMD_PERIOD = 1.0 / 100.0     # arm_control_loop_hz_ (:436)


class MpcCycleCarry(NamedTuple):
    base: CycleCarry
    arm_cmd: jnp.ndarray        # (6,) integrated arm position command


def make_mpc_cycle(model: RobotModel, info: C.CentroidalInfo, cfg: QmConfig,
                   loop_cfg: LoopConfig, settings: SqpSettings = None,
                   fused_wbc: bool = False):
    """Build the QMMpcController cycle: one MPC period on-device."""
    settings = settings or SqpSettings(num_iterations=cfg.mpc.num_iterations)
    ocp = make_ocp(model, info, cfg)
    plant_step = make_plant_step(model, loop_cfg.plant)
    ticks = loop_cfg.ticks_per_cycle
    substeps = loop_cfg.substeps_per_tick
    tick_dt = 1.0 / loop_cfg.control_freq
    tau_max = jnp.asarray(model.joint_effort, dtype=jnp.float32)

    def cycle(carry: MpcCycleCarry, target: TargetTrajectory,
              ms: ModeSchedule, gains: WbcGains):
        cb = carry.base
        rbd = rbd_state_from_plant(model, cb.plant.q, cb.plant.v)
        x_obs = observation_from_rbd(model, info, rbd, cb.last_yaw)
        policy = mpc_step(ocp, model, info, cfg, settings, cb.t, x_obs,
                          target, ms, cb.W_warm, cb.X_warm,
                          jnp.asarray(1.0 / loop_cfg.mpc_freq,
                                      dtype=jnp.float32),
                          jnp.asarray(False))
        new_yaw = x_obs[9]

        # arm command update @ the MPC rate (reference :436-443):
        # integrated MPC joint velocity on top of the CURRENT MPC state
        x_now, u_now, _ = evaluate_policy(policy, cb.t)
        arm_cmd = x_now[24:30] + u_now[24:30] * ARM_CMD_PERIOD

        def tick(tc, _):
            plant, input_last, t, safe = tc
            rbd_t = rbd_state_from_plant(model, plant.q, plant.v)
            x_t = observation_from_rbd(model, info, rbd_t, new_yaw)
            x_des, u_des, mode = evaluate_policy(policy, t)
            q_meas, v_meas = rbd_to_qv(rbd_t)
            flags = contact_flags_from_mode(mode).astype(jnp.float32)
            wbc = hierarchical_mpc_wbc_update(
                model, info, gains, tau_max, x_des, u_des, input_last,
                q_meas, v_meas, flags, jnp.asarray(tick_dt, jnp.float32),
                ee_wrench=plant.ee_wrench, fused_cascade=fused_wbc)
            # legs: hybrid (posDes, velDes, 0, 3, tau) (:429-431);
            # arm: position-PID toward the integrated command (:438-443)
            pos_des = jnp.concatenate([x_des[12:24], arm_cmd])
            vel_des = jnp.concatenate([u_des[12:24],
                                       jnp.zeros(6, dtype=jnp.float32)])
            kp = jnp.concatenate([jnp.zeros(12, dtype=jnp.float32),
                                  ARM_POS_KP])
            kd = jnp.concatenate([
                loop_cfg.leg_kd * jnp.ones(12, dtype=jnp.float32),
                ARM_POS_KD])
            ff = jnp.concatenate([wbc.torques[:12],
                                  jnp.zeros(6, dtype=jnp.float32)])
            plant = push_command(plant, HybridCommand(
                pos_des=pos_des, vel_des=vel_des, kp=kp, kd=kd, ff=ff))

            def sub(p, _):
                p, _fc = plant_step(p)
                return p, None
            plant, _ = jax.lax.scan(sub, plant, None, length=substeps)
            safe = safe & safety_check(x_t, policy.cost)
            return ((plant, u_des, t + tick_dt, safe),
                    (wbc.torques, wbc.forces, x_des))

        (plant, input_last, t, safe), (taus, forces, x_des_ticks) = \
            jax.lax.scan(tick, (cb.plant, cb.input_last, cb.t, cb.safe),
                         None, length=ticks)

        rbd_end = rbd_state_from_plant(model, plant.q, plant.v)
        from ..models import kinematics as K
        from ..models.rotations import quat_distance
        from ..ocp.reference import interpolate_ee_pose
        p_ref, q_ref = interpolate_ee_pose(target, t)
        ee_pos = rbd_end[48:51]
        ee_q_xyzw = rbd_end[51:55]
        ee_q = jnp.concatenate([ee_q_xyzw[3:4], ee_q_xyzw[:3]])
        metrics = CycleMetrics(
            ee_pos_err=jnp.linalg.norm(ee_pos - p_ref),
            ee_ori_err=jnp.linalg.norm(quat_distance(ee_q, q_ref)),
            base_height=plant.q[2],
            mpc_cost=policy.cost,
            safe=safe,
            base_pose=plant.q[:6],
            ee_pos=ee_pos,
            ee_ref=p_ref,
            feet_pos=K.contact_positions(model, plant.q),
            forces=forces[-1],
            torques=taus[-1],
            x_des=x_des_ticks[-1],
            mpc_alpha=policy.alpha,
            mpc_defect=policy.defect)
        new_base = CycleCarry(plant=plant, W_warm=policy.W, X_warm=policy.X,
                              input_last=input_last, last_yaw=new_yaw,
                              t=t, safe=safe)
        return MpcCycleCarry(base=new_base, arm_cmd=arm_cmd), metrics

    return cycle


class MpcControlLoop:
    """Host-side driver for the QMMpcController variant (mirrors
    runtime.loop.ControlLoop)."""

    def __init__(self, model: RobotModel, info: C.CentroidalInfo,
                 cfg: QmConfig, loop_cfg: LoopConfig = LoopConfig(),
                 gains: WbcGains = None, settings: SqpSettings = None):
        from .loop import ControlLoop
        self.model = model
        self.info = info
        self.cfg = cfg
        self.loop_cfg = loop_cfg
        self.gains = gains or cfg.wbc
        self._inner = ControlLoop(model, info, cfg, loop_cfg, gains,
                                  settings)
        self._cycle = jax.jit(make_mpc_cycle(model, info, cfg, loop_cfg,
                                             settings))

    def init_carry(self, q0, v0=None) -> MpcCycleCarry:
        base = self._inner.init_carry(q0, v0)
        return MpcCycleCarry(base=base, arm_cmd=base.plant.q[18:24])

    def warmup(self, carry: MpcCycleCarry, target, ms,
               num_solves: int = 20) -> MpcCycleCarry:
        return carry._replace(base=self._inner.warmup(carry.base, target,
                                                      ms, num_solves))

    def run(self, carry: MpcCycleCarry, target, ms, num_cycles: int,
            log=None):
        import numpy as np
        out = []
        for _ in range(num_cycles):
            carry, m = self._cycle(carry, target, ms, self.gains)
            out.append(m)
        metrics = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *out)
        if log is not None:
            for i, m in enumerate(out):
                log.append(float(carry.base.t)
                           - (num_cycles - 1 - i) / self.loop_cfg.mpc_freq,
                           **{k: np.asarray(v)
                              for k, v in m._asdict().items()})
        return carry, metrics
