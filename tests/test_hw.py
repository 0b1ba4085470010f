"""Hardware abstraction seam (runtime.hw): SimHardware behind the
HardwareInterface protocol + the host-paced HardwareLoop."""
import numpy as np
import jax.numpy as jnp
import pytest

from qm_control_tpu.config import MpcConfig, QmConfig
from qm_control_tpu.experiments import _default_cfg, _standing_setup
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.ocp.reference import target_from_knots
from qm_control_tpu.runtime.hw import HardwareLoop, HWReading, SimHardware


@pytest.mark.heavy
def test_sim_hardware_read_write():
    cfg = _default_cfg(horizon=0.4, dt=0.04)
    model, info, q0, s = _standing_setup(cfg)
    hw = SimHardware(model, q0)
    r = hw.read()
    assert isinstance(r, HWReading)
    assert r.joint_pos.shape == (18,) and r.contact_flags.shape == (4,)
    # standing: all four feet load-bearing after a settle
    from qm_control_tpu.runtime.plant import HybridCommand
    hold = HybridCommand(pos_des=r.joint_pos,
                         vel_des=jnp.zeros(18, jnp.float32),
                         kp=jnp.full(18, 80.0, jnp.float32),
                         kd=jnp.full(18, 3.0, jnp.float32),
                         ff=jnp.zeros(18, jnp.float32))
    for _ in range(100):
        hw.write(hold)
    flags = np.asarray(hw.read().contact_flags)
    assert flags.sum() >= 3, flags


@pytest.mark.slow
def test_hardware_loop_standing():
    """The host-paced QMController flow against the sim hardware: the
    robot stays up and the WBC produces in-limit torques while the
    estimator runs from (IMU, encoders, contacts)."""
    cfg = _default_cfg(horizon=0.4, dt=0.04)
    model, info, q0, s = _standing_setup(cfg)
    hw = SimHardware(model, q0)
    loop = HardwareLoop(model, info, cfg, hw)
    target = target_from_knots([0.0, 3.0], [s, s])
    ms = GaitSchedule(GAIT_LIBRARY["stance"]).mode_schedule(0.0, 3.0)
    tau_lim = np.asarray(model.joint_effort)
    for k in range(50):
        base_pos = hw.state.q[:3]
        base_vel = hw.state.v[:3]
        res, x_obs = loop.tick(target, ms, base_pos, base_vel)
        tau = np.asarray(res.torques)
        assert np.isfinite(tau).all()
        assert (np.abs(tau) <= tau_lim + 1e-3).all()
    # base still standing near its start height
    assert abs(float(hw.state.q[2]) - 0.38) < 0.06
