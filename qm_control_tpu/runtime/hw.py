"""Hardware abstraction seam — the pluggable boundary a real robot
plugs into (reference: hardware_interface::RobotHW + HybridJointInterface
+ ContactSensorInterface + ImuSensorInterface, consumed by
QMController::init, QMController.cpp:60-126).

The fused on-device loop (runtime.loop) is the simulation/training
fast path: plant and controller form one jitted program. A REAL robot
cannot live inside jit — sensors and actuators are host I/O — so this
module defines the host-side seam and a paced controller loop against
it, mirroring the reference's controller_manager update flow:

    HardwareInterface (protocol)
      read()  -> HWReading   (joint encoders, IMU, contact flags)
      write(HybridCommand)   (per-joint 5-tuple: pos, vel, kp, kd, tau)

    SimHardware     — the in-repo plant behind the seam (used in tests;
                      also the reference's QMHWSim role)
    HardwareLoop    — MRT-style host loop: IMU estimator -> MPC (async
                      warm-started) -> WBC -> hybrid commands, paced by
                      the caller's real-time clock

A physical robot integrates by implementing HardwareInterface over its
driver stack (EtherCAT/CAN/ROS); everything above the seam is unchanged.
"""
from typing import NamedTuple, Protocol

import jax.numpy as jnp
import numpy as np

from ..config import QmConfig
from ..gaits.gait import contact_flags_from_mode
from ..models import centroidal as C
from ..models.spec import RobotModel
from .estimator import (ImuEstimatorState, imu_estimator_update,
                        imu_from_plant, init_imu_estimator,
                        observation_from_rbd)
from .plant import (HybridCommand, PlantConfig, PlantState,
                    init_plant_state, make_plant_step, push_command)


class HWReading(NamedTuple):
    """One sensor sweep (reference: the hardware_interface handles read
    in QMController::update)."""
    joint_pos: jnp.ndarray      # (18,) encoder positions
    joint_vel: jnp.ndarray      # (18,)
    imu_quat_wxyz: jnp.ndarray  # (4,) orientation
    imu_gyro: jnp.ndarray       # (3,) base-frame angular rate
    imu_acc: jnp.ndarray        # (3,) base-frame linear acceleration
    contact_flags: jnp.ndarray  # (4,) boolean/float foot contacts
    stamp: float                # seconds


class HardwareInterface(Protocol):
    """What a robot (or sim) must provide."""

    def read(self) -> HWReading: ...

    def write(self, cmd: HybridCommand) -> None: ...


class SimHardware:
    """The in-repo plant behind the hardware seam.

    Steps `substeps` physics ticks per write (the plant integrates at
    1 kHz while the controller writes at 500 Hz, like Gazebo vs
    ros_control). Contact flags come from the plant's measured normal
    forces (the ContactSensorInterface role), IMU from the plant state
    (optionally noisy)."""

    def __init__(self, model: RobotModel, q0, cfg: PlantConfig =
                 PlantConfig(), substeps: int = 2, imu_noise=None):
        import jax
        self.model = model
        self.state: PlantState = init_plant_state(q0, model=model)
        self._step = jax.jit(make_plant_step(model, cfg))
        self.substeps = substeps
        self.imu_noise = imu_noise
        self._t = 0.0
        self._dt = cfg.sim_dt

    def read(self) -> HWReading:
        q, v = self.state.q, self.state.v
        quat, gyro = imu_from_plant(self.model, q, v,
                                    rng_noise=self.imu_noise)
        acc = jnp.zeros(3, dtype=q.dtype)   # not used by the estimator
        # measured contacts: normal force threshold (ContactSensor role)
        fz = self._contact_normal_forces()
        flags = (fz > 0.25 * 9.81 * self.model.total_mass / 4).astype(
            jnp.float32)
        return HWReading(joint_pos=q[6:24], joint_vel=v[6:24],
                         imu_quat_wxyz=quat, imu_gyro=gyro, imu_acc=acc,
                         contact_flags=flags, stamp=self._t)

    def _contact_normal_forces(self):
        from ..models import kinematics as K
        p = K.contact_positions(self.model, self.state.q)
        depth = jnp.maximum(-p[:, 2], 0.0)
        return 40000.0 * depth     # PlantConfig.contact_kp default

    def write(self, cmd: HybridCommand) -> None:
        self.state = push_command(self.state, cmd)
        for _ in range(self.substeps):
            self.state, _ = self._step(self.state)
        self._t += self.substeps * self._dt


class HardwareLoop:
    """Host-paced controller against a HardwareInterface: the
    QMController::update flow for real hardware. The caller owns the
    clock (call `tick()` at control_freq, or use `run_paced()` for a
    wall-clock-paced loop with overrun accounting).

    MPC placement (reference QMController.cpp:309-334 setupMrt thread
    boundary): with `async_mpc=True` (default) solves run on the
    runtime.mrt worker thread paced to mpc_freq, exchanging the policy
    through the native seqlock buffer — a >=1.6 ms solve never stalls
    the 2 ms control tick. `async_mpc=False` keeps the round-2 inline
    behavior (solve on every ticks_per_mpc-th tick) for deterministic
    single-thread tests."""

    def __init__(self, model: RobotModel, info, cfg: QmConfig, hw,
                 control_freq: float = 500.0, mpc_freq: float = 100.0,
                 async_mpc: bool = True):
        import jax as _jax
        from ..mpc.mpc import MpcSolver, evaluate_policy
        from ..wbc.wbc import HierarchicalWbc
        self.model, self.info, self.cfg, self.hw = model, info, cfg, hw
        self.solver = MpcSolver(model, info, cfg)
        self.wbc = HierarchicalWbc(model, info, cfg.wbc)
        self._eval = evaluate_policy
        self.est: ImuEstimatorState = init_imu_estimator()
        self.ticks_per_mpc = int(round(control_freq / mpc_freq))
        self.control_freq = control_freq
        self.tick_dt = 1.0 / control_freq
        self.policy = None
        self.t = 0.0
        self._k = 0
        self.async_mpc = async_mpc
        self.mrt = None
        if async_mpc:
            from .mrt import MpcMrtInterface
            self.mrt = MpcMrtInterface(self.solver, mpc_frequency=mpc_freq)

        # jitted tick stages: the real-time path must be a couple of
        # compiled dispatches, not hundreds of eager ops (measured
        # ~360 ms/tick eager on CPU vs ~ms compiled)
        def _estimate(est, quat, gyro, jpos, jvel, bpos, bvel, cflags):
            rbd, mode, new_est = imu_estimator_update(
                self.model, est, quat, gyro, jpos, jvel, bpos, bvel,
                cflags)
            x_obs = observation_from_rbd(self.model, self.info, rbd)
            return rbd, x_obs, new_est

        self._estimate = _jax.jit(_estimate)

    def start(self, target, mode_schedule, base_pos_hint, base_vel_hint,
              timeout: float = 300.0):
        """The reference's starting() handshake (QMController.cpp:98-126):
        publish the first observation and block until the async worker
        delivers the initial policy. No-op in inline mode."""
        if not self.async_mpc:
            return
        import time as _time
        r = self.hw.read()
        rbd, x_obs, self.est = self._estimate(
            self.est, r.imu_quat_wxyz, r.imu_gyro, r.joint_pos,
            r.joint_vel, jnp.asarray(base_pos_hint),
            jnp.asarray(base_vel_hint), r.contact_flags)
        self.mrt.set_current_observation(self.t, x_obs, target,
                                         mode_schedule)
        self.mrt.start()
        deadline = _time.perf_counter() + timeout
        while not self.mrt.initial_policy_received():
            if _time.perf_counter() > deadline:
                raise TimeoutError("no initial MPC policy within "
                                   f"{timeout}s")
            _time.sleep(0.002)

    def stop(self):
        if self.mrt is not None:
            self.mrt.stop()

    def run_paced(self, num_ticks, target, mode_schedule, base_pos_fn,
                  base_vel_fn):
        """Drive tick() against the wall clock at control_freq using the
        native RatePacer (absolute deadlines); returns the overrun count
        — the real-time health metric the reference reads off its
        RepeatedTimer maxima (QMController.cpp:342-355).

        base_pos_fn/base_vel_fn: callables () -> (3,) hints (odometry
        source)."""
        from .. import native as _native
        pacer = (_native.RatePacer(self.control_freq)
                 if _native.AVAILABLE else None)
        for _ in range(num_ticks):
            self.tick(target, mode_schedule, base_pos_fn(), base_vel_fn())
            if pacer is not None:
                pacer.sleep()
        return pacer.overruns if pacer is not None else -1

    def tick(self, target, mode_schedule, base_pos_hint, base_vel_hint):
        """One control tick: read -> estimate -> (MPC) -> WBC -> write.
        base_pos/vel hints stand in for the leg-odometry fusion a full
        estimator would provide (reference uses cheater/TF estimates)."""
        r = self.hw.read()
        rbd, x_obs, self.est = self._estimate(
            self.est, r.imu_quat_wxyz, r.imu_gyro, r.joint_pos,
            r.joint_vel, jnp.asarray(base_pos_hint),
            jnp.asarray(base_vel_hint), r.contact_flags)
        if self.async_mpc:
            # publish observation; read the newest policy (never blocks
            # on the worker: seqlock buffer)
            self.mrt.set_current_observation(self.t, x_obs, target,
                                             mode_schedule)
            x_des_np, u_des_np, mode = self.mrt.evaluate(self.t, x_obs)
            x_des = jnp.asarray(x_des_np)
            u_des = jnp.asarray(u_des_np)
            mode = jnp.asarray(mode)
        else:
            if self.policy is None or self._k % self.ticks_per_mpc == 0:
                self.policy = self.solver.solve(self.t, x_obs, target,
                                                mode_schedule)
            x_des, u_des, mode = self._eval(self.policy,
                                            jnp.asarray(self.t))
        flags = contact_flags_from_mode(mode).astype(jnp.float32)
        from .estimator import rbd_to_qv
        q_meas, v_meas = rbd_to_qv(rbd)
        res = self.wbc.update(x_des, u_des, q_meas, v_meas, flags,
                              self.tick_dt, self.t)
        gains = self.cfg.wbc
        kp = jnp.concatenate([jnp.zeros(12),
                              jnp.full(6, gains.kp_arm_wbc)]).astype(
                                  jnp.float32)
        kd = jnp.concatenate([jnp.full(12, 3.0),
                              jnp.full(6, gains.kd_arm_wbc)]).astype(
                                  jnp.float32)
        cmd = HybridCommand(
            pos_des=x_des[12:30].astype(jnp.float32),
            vel_des=jnp.concatenate([u_des[12:24], jnp.zeros(6)]).astype(
                jnp.float32),
            kp=kp, kd=kd, ff=res.torques.astype(jnp.float32))
        self.hw.write(cmd)
        self.t += self.tick_dt
        self._k += 1
        return res, x_obs

