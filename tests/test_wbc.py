"""Whole-body controller: physical consistency of the hierarchical solve."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_control_tpu.config import WbcGains
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.wbc.tasks import compute_measured, recover_torques
from qm_control_tpu.wbc.wbc import hierarchical_wbc_update


@pytest.fixture(scope="module")
def info(model):
    return C.make_centroidal_info(model)


@pytest.fixture(scope="module")
def standing(model, info):
    from qm_control_tpu.models import kinematics as K
    q = jnp.asarray(default_q(base_pos=(0, 0, 0.4)), dtype=jnp.float32)
    v = jnp.zeros(24, dtype=jnp.float32)
    x_des = jnp.concatenate([jnp.zeros(6, dtype=jnp.float32), q])
    flags = jnp.ones(4, dtype=jnp.float32)
    # torque-balanced standing forces: sum fz = m g, zero moment about the
    # COM (the arm offsets the COM, so equal mg/4 forces would pitch)
    feet = np.asarray(jax.jit(lambda qq: K.contact_positions(model, qq))(q),
                      dtype=np.float64)
    com = np.asarray(C.com_position_srbd(info, x_des), dtype=np.float64)
    r = feet - com                                 # (4,3)
    A = np.zeros((3, 4))
    A[0] = 1.0                                     # sum fz
    A[1] = r[:, 1]                                 # moment x: y * fz
    A[2] = -r[:, 0]                                # moment y: -x * fz
    b = np.array([model.total_mass * 9.81, 0.0, 0.0])
    fz = np.linalg.lstsq(A, b, rcond=None)[0]
    forces = np.zeros((4, 3))
    forces[:, 2] = fz
    u_des = jnp.asarray(np.concatenate([forces.reshape(-1), np.zeros(18)]),
                        dtype=jnp.float32)
    return q, v, x_des, u_des, flags


@pytest.fixture(scope="module")
def wbc_result(model, info, standing):
    q, v, x_des, u_des, flags = standing
    gains = WbcGains()
    tau_max = jnp.asarray(model.joint_effort, dtype=jnp.float32)
    fn = jax.jit(lambda: hierarchical_wbc_update(
        model, info, gains, tau_max, x_des, u_des, u_des, q, v, flags,
        jnp.asarray(0.002), jnp.asarray(20.0)))
    return fn()


def test_standing_eom_satisfied(model, info, standing, wbc_result):
    """T0 floating-base EoM: Mb vdot - Jb' F + hb = 0."""
    q, v, _, _, flags = standing
    m = compute_measured(model, q, v, flags)
    res = np.asarray(m.M[:6] @ wbc_result.vdot
                     - m.Jc.T[:6] @ wbc_result.forces + m.h[:6])
    assert np.abs(res).max() < 2.0      # N / N*m scale (total weight ~500 N)


def test_standing_forces_near_weight(model, wbc_result):
    F = np.asarray(wbc_result.forces).reshape(4, 3)
    np.testing.assert_allclose(F[:, 2].sum(), model.total_mass * 9.81,
                               rtol=0.1)
    assert (F[:, 2] > 0).all()


def test_friction_cone_and_torque_limits(model, wbc_result):
    F = np.asarray(wbc_result.forces).reshape(4, 3)
    mu = 0.3
    assert (np.abs(F[:, 0]) <= mu * F[:, 2] + 1.0).all()
    assert (np.abs(F[:, 1]) <= mu * F[:, 2] + 1.0).all()
    tau = np.asarray(wbc_result.torques)
    assert (np.abs(tau) <= np.asarray(model.joint_effort) + 1e-3).all()


def test_standing_accelerations_small(wbc_result):
    """Standing at the desired state: commanded accelerations ~ 0."""
    vdot = np.asarray(wbc_result.vdot)
    assert np.abs(vdot[:6]).max() < 1.5       # base
    assert np.abs(vdot).max() < 8.0           # joints


def test_torque_recovery_consistency(model, info, standing, wbc_result):
    q, v, _, _, flags = standing
    m = compute_measured(model, q, v, flags)
    tau = recover_torques(m, wbc_result.x_opt)
    np.testing.assert_allclose(np.asarray(tau),
                               np.asarray(wbc_result.torques), atol=1e-5)


@pytest.mark.heavy
def test_arm_settling_phase_tracks_joints(model, info, standing):
    """t < 10 s: T1 is arm-joint nominal tracking; perturbed arm joints
    produce accelerations pulling back toward the nominal."""
    q, v, x_des, u_des, flags = standing
    q_pert = q.at[18].add(0.2)     # perturb arm joint 1
    gains = WbcGains()
    tau_max = jnp.asarray(model.joint_effort, dtype=jnp.float32)
    res = hierarchical_wbc_update(
        model, info, gains, tau_max, x_des, u_des, u_des, q_pert, v, flags,
        jnp.asarray(0.002), jnp.asarray(1.0))
    # arm joint 1 acceleration should be strongly negative (pull back)
    assert float(res.vdot[18]) < -10.0


@pytest.mark.heavy
def test_ee_wrench_enters_eom(model, info, standing):
    """With a measured EE wrench, the solved EoM balances
    Mb vdot - Jb' F + hb = (J_ee' w)[:6]  (reference WbcBase.cpp:338-383
    task structure, BASELINE config #4)."""
    q, v, x_des, u_des, flags = standing
    gains = WbcGains()
    tau_max = jnp.asarray(model.joint_effort, dtype=jnp.float32)
    wrench = jnp.asarray([0.0, -25.0, 0.0, 0.0, 0.0, 0.0],
                         dtype=jnp.float32)
    res = jax.jit(lambda: hierarchical_wbc_update(
        model, info, gains, tau_max, x_des, u_des, u_des, q, v, flags,
        jnp.asarray(0.002), jnp.asarray(20.0), ee_wrench=wrench))()
    m = compute_measured(model, q, v, flags)
    Q = np.asarray(m.ee_J.T @ wrench)
    lhs = np.asarray(m.M[:6] @ res.vdot - m.Jc.T[:6] @ res.forces
                     + m.h[:6])
    # atol: the EoM task is priority 0 but solved by a fixed-iteration
    # f32 IP; 0.1 N residual on a 25 N wrench (0.4%) is the solver's
    # converged noise floor, not a modeling error
    np.testing.assert_allclose(lhs, Q[:6], atol=1e-1)
    # torque recovery uses the wrench too
    tau = recover_torques(m, res.x_opt, ee_wrench=wrench)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(res.torques),
                               atol=1e-5)
    # wrench-aware torques differ from wrench-blind ones (the arm must
    # actively resist the load)
    tau_blind = recover_torques(m, res.x_opt)
    assert np.abs(np.asarray(tau_blind) - np.asarray(tau)).max() > 0.5
