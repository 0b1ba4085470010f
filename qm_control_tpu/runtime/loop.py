"""Closed-loop control harness: sim @1 kHz <- WBC @500 Hz <- policy eval <-
MPC @100 Hz, as one fused jitted cycle per MPC period.

The TPU-native equivalent of the reference's controller_manager +
QMController::update real-time loop + MRT policy handoff (reference
QMController.cpp:128-190, :309-334; SURVEY.md §3.3). Key structural
difference, by design (SURVEY.md §2.3): instead of an async MPC worker
thread crossing into a real-time thread through a mutex-guarded policy
buffer, the whole MPC period — one MPC solve followed by `ticks` control
ticks each integrating `substeps` physics steps — is ONE pure function.
Deterministic, jit-compiled, vmappable over scenario batches; the
single-scenario wall-clock budget maps to the reference's deadlines
(MPC 10 ms, WBC 2 ms; BASELINE.md).

The hybrid-joint control law matches QMController::updateControlLaw
(:177-190): legs (posDes, velDes, kp=0, kd=3, tau_ff) gated by the
arm-settling staging time; arm (posDes, 0, kp_arm_wbc, kd_arm_wbc,
tau_ff).
"""
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QmConfig, WbcGains
from ..gaits.gait import ModeSchedule, contact_flags_from_mode
from ..models import centroidal as C
from ..models.spec import RobotModel
from ..mpc.mpc import MpcPolicy, evaluate_policy, mpc_step
from ..ocp.problem import make_ocp
from ..ocp.reference import TargetTrajectory, interpolate_ee_pose
from ..solver.sqp import SqpSettings
from ..wbc.wbc import hierarchical_wbc_update
from .estimator import observation_from_rbd, rbd_state_from_plant, rbd_to_qv
from .plant import (HybridCommand, PlantConfig, PlantState, init_plant_state,
                    make_plant_step, push_command)
from .safety import safety_check


class LoopConfig(NamedTuple):
    control_freq: float = 500.0        # WBC ticks per second
    mpc_freq: float = 100.0            # MPC solves per second
    leg_kd: float = 3.0                # QMController.cpp:182
    leg_command_start_time: float = 0.0   # reference uses 10.0 (staging);
    # our plant starts standing so legs are driven from t=0 by default
    plant: PlantConfig = PlantConfig()
    fused_wbc: Optional[bool] = None   # None = auto: the fused Pallas
    # cascade (kernels.hoqp_fused) on TPU backends — the only WBC path
    # that meets the 2 ms deadline (1.3 ms vs 19-23 ms for the XLA
    # op-per-op cascade on TPU v5e) — and the XLA cascade on CPU
    mpc_wrench_feedthrough: bool = False  # feed the plant's measured EE
    # wrench into the MPC dynamics (disturbance-aware planning — beyond
    # the reference, whose MPC never sees the wrench). Off by default:
    # it costs one extra EE FK per flow evaluation on the hot path.
    mrt_policy_lag: int = 1   # ticks consume a policy this many MPC
    # periods old — the reference's async MRT semantics
    # (QMController.cpp:309-334: advanceMpc runs in a worker thread; the
    # real-time loop always evaluates a policy one solve-latency old).
    # Accepts bool for back-compat (True -> 1).
    #
    # ROUND-4 MECHANISM (tools/diag_stall_*.py, diag_lbfgs referee):
    # the OCP's OPTIMAL plan from any quasi-static state "eases in" —
    # its first ~100 ms hold near-zero base velocity before ramping to
    # the commanded speed (verified as the true optimum by an
    # independent f64 L-BFGS solve of the same single-shooting problem:
    # cost 4.686 vs the SQP fixed point's 4.656, same eased shape; NOT
    # a solver artifact — every cost-term ablation, gait phase, and
    # iteration-count variant shows it). A loop that executes only the
    # first 10-20 ms of each re-anchored plan therefore samples the
    # eased region forever and locomotion stalls at ~one command lead,
    # regardless of weights or hold pose. The reference escapes by
    # construction: its policy is evaluated at wall-clock time, which
    # sits one solve LATENCY plus pickup staleness (~20-50 ms on its
    # CPU) into the plan's acceleration profile. lag = k executes the
    # window [k*T, (k+1)*T] of each plan (T = MPC period) — the
    # deep-execution semantics, consistent across cycles because
    # warm-started consecutive plans agree along the shared trajectory.
    delay_compensation_s: float = 0.0   # evaluate the executed policy at
    # t + this lead. With an actuation delay line (plant.delay_steps) the
    # command computed from the policy at t is APPLIED at t+delay; the
    # reference's MRT absorbs this because evaluatePolicy runs at
    # wall-clock time (QMController.cpp:141) which already includes the
    # pipeline's real latencies. Round-4 measured the uncompensated
    # interaction: policy-lag depth compounds the 9 ms delay
    # (trot delay9 regressed 3.17 -> 4.78 mm). Set this to the known
    # actuation delay so pos/vel/tau_ff setpoints correspond to their
    # application time.

    @property
    def ticks_per_cycle(self) -> int:
        return int(round(self.control_freq / self.mpc_freq))

    @property
    def substeps_per_tick(self) -> int:
        return int(round(1.0 / (self.plant.sim_dt * self.control_freq)))


class CycleCarry(NamedTuple):
    plant: PlantState
    W_warm: jnp.ndarray        # (N, 30) MPC input warm start
    X_warm: jnp.ndarray        # (N+1, 30) MPC state warm start
    input_last: jnp.ndarray    # (30,) for WBC joint-accel finite difference
    last_yaw: jnp.ndarray      # scalar, yaw unwrap memory
    t: jnp.ndarray             # controller time
    safe: jnp.ndarray          # bool, sticky safety flag
    policy: "MpcPolicy" = None  # the MRT policy buffer: a history stack
    # of the last `mrt_policy_lag` solutions (leading axis = lag depth,
    # index 0 = oldest); the ticks consume the oldest (see LoopConfig)


class CycleMetrics(NamedTuple):
    """Per-cycle observability record (the QmVisualizer content of
    reference qm_visualization.cpp:90-189, as arrays instead of RViz
    markers — consumed by utils.viz.TrajectoryLog)."""
    ee_pos_err: jnp.ndarray    # scalar: ||p_ee - p_ref|| at cycle end
    ee_ori_err: jnp.ndarray    # scalar: |quat distance| at cycle end
    base_height: jnp.ndarray
    mpc_cost: jnp.ndarray
    safe: jnp.ndarray
    base_pose: jnp.ndarray     # (6,) base position + zyx at cycle end
    ee_pos: jnp.ndarray        # (3,) measured EE position
    ee_ref: jnp.ndarray        # (3,) desired EE position
    feet_pos: jnp.ndarray      # (4,3) foot positions (footholds)
    forces: jnp.ndarray        # (12,) WBC contact forces, last tick
    torques: jnp.ndarray       # (18,) WBC torques, last tick
    x_des: jnp.ndarray         # (30,) optimized state at cycle end (MPC)
    mpc_alpha: jnp.ndarray     # accepted SQP line-search step
    mpc_defect: jnp.ndarray    # max |shooting defect| of the solution


def make_cycle(model: RobotModel, info: C.CentroidalInfo, cfg: QmConfig,
               loop_cfg: LoopConfig,
               settings: Optional[SqpSettings] = None):
    """Build cycle(carry, target, ms, gains) -> (carry', CycleMetrics):
    one MPC period, fully on-device."""
    settings = settings or SqpSettings(num_iterations=cfg.mpc.num_iterations)
    ocp = make_ocp(model, info, cfg)
    plant_step = make_plant_step(model, loop_cfg.plant)
    ticks = loop_cfg.ticks_per_cycle
    substeps = loop_cfg.substeps_per_tick
    tick_dt = 1.0 / loop_cfg.control_freq
    tau_max = jnp.asarray(model.joint_effort, dtype=jnp.float32)
    fused_wbc = (jax.default_backend() in ("tpu", "axon")
                 if loop_cfg.fused_wbc is None else loop_cfg.fused_wbc)

    def _check_policy_depth(carry):
        """A carry built under a different mrt_policy_lag would silently
        roll/execute the wrong depth — fail loudly instead (shapes are
        static under jit, so this is a trace-time check)."""
        if carry.policy is not None:
            depth = jax.tree_util.tree_leaves(carry.policy)[0].shape[0]
            expected = max(1, int(loop_cfg.mrt_policy_lag))
            if depth != expected:
                raise ValueError(
                    f"carry.policy stack depth {depth} != "
                    f"max(1, mrt_policy_lag)={expected}; rebuild the carry "
                    f"for this LoopConfig (init_carry/warmup)")

    def cycle(carry: CycleCarry, target: TargetTrajectory, ms: ModeSchedule,
              gains: WbcGains):
        _check_policy_depth(carry)
        # --- estimator + MPC solve (the async thread's work, §3.4) ---
        rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
        x_obs = observation_from_rbd(model, info, rbd, carry.last_yaw)
        mpc_wrench = (carry.plant.ee_wrench
                      if loop_cfg.mpc_wrench_feedthrough else None)
        policy = mpc_step(ocp, model, info, cfg, settings, carry.t, x_obs,
                          target, ms, carry.W_warm, carry.X_warm,
                          jnp.asarray(1.0 / loop_cfg.mpc_freq,
                                      dtype=jnp.float32),
                          jnp.asarray(False), ee_wrench=mpc_wrench)
        # MRT buffer semantics: consume a `lag`-period-old policy (its
        # absolute t_nodes make the ticks evaluate lag*T deep into the
        # plan, past the ease-in — see LoopConfig.mrt_policy_lag).
        lag = int(loop_cfg.mrt_policy_lag)
        if lag >= 1 and carry.policy is not None:
            exec_policy = jax.tree_util.tree_map(lambda a: a[0],
                                                 carry.policy)
            new_stack = jax.tree_util.tree_map(
                lambda s, n: jnp.concatenate([s[1:], n[None]], axis=0),
                carry.policy, policy)
        else:
            exec_policy = policy
            new_stack = carry.policy
        new_yaw = x_obs[9]

        # --- control ticks (the real-time loop's work, §3.3) ---
        def tick(tc, _):
            plant, input_last, t, safe = tc
            rbd_t = rbd_state_from_plant(model, plant.q, plant.v)
            x_t = observation_from_rbd(model, info, rbd_t, new_yaw)
            x_des, u_des, mode = evaluate_policy(
                exec_policy, t + loop_cfg.delay_compensation_s)
            q_meas, v_meas = rbd_to_qv(rbd_t)
            flags = contact_flags_from_mode(mode).astype(jnp.float32)
            wbc = hierarchical_wbc_update(
                model, info, gains, tau_max, x_des, u_des, input_last,
                q_meas, v_meas, flags, jnp.asarray(tick_dt, jnp.float32), t,
                ee_wrench=plant.ee_wrench,  # measured-wrench feedthrough
                fused_cascade=fused_wbc)
            # hybrid commands (QMController::updateControlLaw :177-190)
            pos_des = x_des[12:30]
            vel_des = u_des[12:30]
            leg_on = (t >= loop_cfg.leg_command_start_time).astype(jnp.float32)
            kp = jnp.concatenate([jnp.zeros(12),
                                  jnp.asarray(gains.kp_arm_wbc)
                                  * jnp.ones(6)]).astype(jnp.float32)
            kd = jnp.concatenate([
                loop_cfg.leg_kd * leg_on * jnp.ones(12),
                jnp.asarray(gains.kd_arm_wbc) * jnp.ones(6)]).astype(
                    jnp.float32)
            ff = jnp.concatenate([wbc.torques[:12] * leg_on,
                                  wbc.torques[12:]])
            cmd = HybridCommand(
                pos_des=pos_des,
                vel_des=jnp.concatenate([vel_des[:12] * leg_on,
                                         jnp.zeros(6, dtype=jnp.float32)]),
                kp=kp, kd=kd, ff=ff)
            plant = push_command(plant, cmd)

            def sub(p, _):
                p, _fc = plant_step(p)
                return p, None
            plant, _ = jax.lax.scan(sub, plant, None, length=substeps)
            safe = safe & safety_check(x_t, policy.cost)
            return ((plant, u_des, t + tick_dt, safe),
                    (wbc.torques, wbc.forces, x_des))

        (plant, input_last, t, safe), (taus, forces, x_des_ticks) = \
            jax.lax.scan(
                tick, (carry.plant, carry.input_last, carry.t, carry.safe),
                None, length=ticks)

        # --- metrics ---
        rbd_end = rbd_state_from_plant(model, plant.q, plant.v)
        p_ref, q_ref = interpolate_ee_pose(target, t)
        ee_pos = rbd_end[48:51]
        ee_q_xyzw = rbd_end[51:55]
        ee_q = jnp.concatenate([ee_q_xyzw[3:4], ee_q_xyzw[:3]])
        from ..models.rotations import quat_distance
        ori_err = jnp.linalg.norm(quat_distance(ee_q, q_ref))
        from ..models import kinematics as K
        metrics = CycleMetrics(
            ee_pos_err=jnp.linalg.norm(ee_pos - p_ref),
            ee_ori_err=ori_err,
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
        new_carry = CycleCarry(plant=plant, W_warm=policy.W,
                               X_warm=policy.X,
                               input_last=input_last, last_yaw=new_yaw,
                               t=t, safe=safe, policy=new_stack)
        return new_carry, metrics

    def warmup(carry: CycleCarry, target: TargetTrajectory, ms: ModeSchedule):
        """One MPC solve WITHOUT advancing the plant — the reference's
        starting() handshake (QMController.cpp:98-126 blocks running
        advanceMpc until the first converged policy before the real-time
        loop starts). Call repeatedly to converge the warm start."""
        rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
        x_obs = observation_from_rbd(model, info, rbd, carry.last_yaw)
        policy = mpc_step(ocp, model, info, cfg, settings, carry.t, x_obs,
                          target, ms, carry.W_warm, carry.X_warm,
                          jnp.asarray(0.0, dtype=jnp.float32),
                          jnp.asarray(False))
        lag = max(1, int(loop_cfg.mrt_policy_lag))
        stack = jax.tree_util.tree_map(
            lambda a: jnp.tile(a[None], (lag,) + (1,) * jnp.ndim(a)),
            policy)
        return carry._replace(W_warm=policy.W, X_warm=policy.X,
                              policy=stack)

    return cycle, warmup


class ControlLoop:
    """Host-side driver: runs jitted MPC cycles, refreshes targets/gaits
    between cycles (the command-topic equivalent), collects metrics."""

    def __init__(self, model: RobotModel, info: C.CentroidalInfo,
                 cfg: QmConfig, loop_cfg: LoopConfig = LoopConfig(),
                 gains: WbcGains = None,
                 settings: Optional[SqpSettings] = None):
        self.model = model
        self.info = info
        self.cfg = cfg
        self.loop_cfg = loop_cfg
        self.gains = gains or cfg.wbc
        cycle, warm = make_cycle(model, info, cfg, loop_cfg, settings)
        self._cycle = jax.jit(cycle)
        self._warmup = jax.jit(warm)
        from ..utils.timers import RepeatedTimer
        self.cycle_timer = RepeatedTimer("control_cycle")

    def init_carry(self, q0, v0=None) -> CycleCarry:
        N = self.cfg.mpc.num_nodes
        # QMInitializer-equivalent warm start: weight-compensating stance
        # forces (the cold path of MpcSolver is host-gated; here the cycle
        # is fully on-device so we seed the carry instead)
        w0 = C.weight_compensating_input(
            self.info, jnp.ones(4)).astype(jnp.float32)
        rbd0 = rbd_state_from_plant(self.model,
                                    jnp.asarray(q0, dtype=jnp.float32),
                                    jnp.zeros(24, dtype=jnp.float32))
        x0 = observation_from_rbd(self.model, self.info, rbd0)
        X0 = jnp.tile(x0[None].astype(jnp.float32), (N + 1, 1))
        W0 = jnp.tile(w0[None], (N, 1))
        # seed MRT buffer: a "hold current state" policy (STANCE), so
        # the first lagged cycle has a structurally-complete policy even
        # without a warmup() handshake
        from ..gaits.gait import STANCE
        hold_policy = MpcPolicy(
            t_nodes=self.cfg.mpc.dt * jnp.arange(N + 1, dtype=jnp.float32),
            X=X0, U=jnp.tile(w0[None], (N + 1, 1)),
            modes=jnp.full(N + 1, STANCE, dtype=jnp.int32),
            cost=jnp.asarray(0.0, dtype=jnp.float32), W=W0,
            alpha=jnp.asarray(1.0, dtype=jnp.float32),
            defect=jnp.asarray(0.0, dtype=jnp.float32))
        lag = max(1, int(self.loop_cfg.mrt_policy_lag))
        hold_policy = jax.tree_util.tree_map(
            lambda a: jnp.tile(a[None], (lag,) + (1,) * jnp.ndim(a)),
            hold_policy)
        return CycleCarry(
            plant=init_plant_state(q0, v0, model=self.model),
            W_warm=W0,
            X_warm=X0,
            input_last=jnp.zeros(30, dtype=jnp.float32),
            last_yaw=jnp.asarray(float(np.asarray(q0)[3]), dtype=jnp.float32),
            t=jnp.asarray(0.0, dtype=jnp.float32),
            safe=jnp.asarray(True),
            policy=hold_policy)

    def _build_escape(self):
        model, info, cfg = self.model, self.info, self.cfg
        ocp = make_ocp(model, info, cfg)
        deep = SqpSettings(num_iterations=12)
        N = cfg.mpc.num_nodes

        def probe(carry, target, ms):
            rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
            x_obs = observation_from_rbd(model, info, rbd, carry.last_yaw)
            w0 = C.weight_compensating_input(
                info, jnp.ones(4)).astype(jnp.float32)
            W0 = jnp.tile(w0[None], (N, 1))
            X0 = jnp.tile(x_obs[None].astype(jnp.float32), (N + 1, 1))
            z = jnp.asarray(0.0, dtype=jnp.float32)
            cold = mpc_step(ocp, model, info, cfg, deep, carry.t, x_obs,
                            target, ms, W0, X0, z, jnp.asarray(True))
            warm = mpc_step(ocp, model, info, cfg, deep, carry.t, x_obs,
                            target, ms, carry.W_warm, carry.X_warm, z,
                            jnp.asarray(False))
            return cold, warm

        return jax.jit(probe)

    def escape(self, carry: CycleCarry, target: TargetTrajectory,
               ms: ModeSchedule, margin: float = 0.02):
        """Basin-escape re-initialization (round-5 traverse-stall fix).

        The warm-started real-time iteration can be captured in a
        locally-optimal "stay" basin whose cost is strictly above the
        walking optimum: from a quasi-static EE-held state, accelerating
        requires a non-monotonic wind-up (the converged walk plan first
        moves the base TOWARD the hold before accelerating away), so a
        1-iteration solve warm-started from a stay plan never finds it
        (measured: tools/diag_plan_horizon.py — converged cold solves
        from the stalled state walk at 91 % of command inside one
        horizon while the closed loop holds alpha=1 at the stay
        fixpoint). Remedy, run at the target-refresh cadence (the
        reference re-publishes targets and can cold-start its MPC the
        same way, MPC_BASE coldStart_): solve BOTH deep-from-cold and
        deep-from-warm on identical data; adopt the cold solution when
        it beats warm by `margin`, else keep (the deepened) warm.

        Returns (carry, escaped: bool).
        """
        if not hasattr(self, "_escape"):
            self._escape = self._build_escape()
        cold, warm = self._escape(carry, target, ms)
        escaped = bool(float(cold.cost) < float(warm.cost) * (1.0 - margin))
        best = cold if escaped else warm
        return carry._replace(W_warm=best.W, X_warm=best.X), escaped

    def warmup(self, carry: CycleCarry, target: TargetTrajectory,
               ms: ModeSchedule, num_solves: int = 20) -> CycleCarry:
        """Converge the MPC warm start before releasing the control loop
        (the reference's starting() initial-policy handshake)."""
        for _ in range(num_solves):
            carry = self._warmup(carry, target, ms)
        return carry

    def run(self, carry: CycleCarry, target: TargetTrajectory,
            ms: ModeSchedule, num_cycles: int, log=None):
        """Run num_cycles MPC periods; returns (carry, stacked metrics).

        If a utils.viz.TrajectoryLog is passed, every cycle's metrics are
        appended to it (the QmVisualizer-publish equivalent, reference
        qm_visualization.cpp:72-88), and the cycle wall time is recorded
        in self.cycle_timer."""
        out = []
        for _ in range(num_cycles):
            with self.cycle_timer:
                carry, m = self._cycle(carry, target, ms, self.gains)
            out.append(m)
        metrics = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *out)
        if log is not None:
            for i, m in enumerate(out):
                # NOTE: the timestamp must come from carry.t alone — any
                # arithmetic with metric values would propagate a NaN
                # metric into the time axis and silently corrupt the log
                log.append(float(carry.t)
                           - (num_cycles - 1 - i) / self.loop_cfg.mpc_freq,
                           **{k: np.asarray(v)
                              for k, v in m._asdict().items()})
        return carry, metrics
