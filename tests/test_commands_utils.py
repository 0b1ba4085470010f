"""Command layer, MRT interface, timers, viz utilities."""
import time

import numpy as np
import jax.numpy as jnp
import pytest

from qm_control_tpu.gaits.gait import mode_at_time
from qm_control_tpu.runtime.commands import (CommandQueue, GaitCommander,
                                             TargetCommander)
from qm_control_tpu.utils.timers import RepeatedTimer
from qm_control_tpu.utils.viz import (TrajectoryLog, center_of_pressure,
                                      export_trajectory, support_polygon)


def test_gait_commander_switch_and_joy():
    gc = GaitCommander()
    ms = gc.mode_schedule(0.0, 2.0)
    assert int(mode_at_time(ms, 0.5)) == 15     # stance default
    assert gc.joy({"LB": True, "A": True}, 1.0) == "trot"
    ms = gc.mode_schedule(0.0, 3.0)
    # after the transition stance, trot modes appear
    modes = {int(mode_at_time(ms, t)) for t in np.arange(1.2, 2.5, 0.05)}
    assert 9 in modes and 6 in modes            # LF_RH / RF_LH
    assert gc.joy({"LB": True}, 2.0) is None    # incomplete combo
    with pytest.raises(KeyError):
        gc.switch("moonwalk", 0.0)


def test_target_commander_conversions():
    tc = TargetCommander()
    obs = np.zeros(30)
    obs[6:12] = [0, 0, 0.4, 0, 0, 0]
    ee = np.array([0.52, 0.09, 0.78, 0.5, -0.5, 0.5, -0.5])
    t1 = tc.cmd_vel([0.1, 0, 0, 0], 0.0, obs, ee)
    assert np.asarray(t1.states).shape[1] == 37
    t2 = tc.goal_pose([0.8, 0.2, 0.7], [1, 0, 0, 0], 0.0, obs, ee)
    s1 = np.asarray(t2.states[1])
    np.testing.assert_allclose(s1[30:33], [0.8, 0.2, 0.7], atol=1e-6)
    t3 = tc.ee_cmd_vel([0.05, 0, 0, 0], 0.0, obs, ee)
    assert np.isfinite(np.asarray(t3.states)).all()


def test_command_queue_drops_oldest():
    q = CommandQueue(maxsize=2)
    for i in range(5):
        q.publish(i)
    msgs = q.drain()
    assert msgs == [3, 4]
    assert q.drain() == []


def test_repeated_timer_percentiles():
    t = RepeatedTimer("x")
    for _ in range(20):
        with t:
            time.sleep(0.001)
    st = t.stats()
    assert st["count"] == 20
    assert 0.5 < st["avg_ms"] < 50
    assert st["p99_ms"] >= st["p50_ms"]
    assert "avg" in t.summary()


def test_trajectory_log_export(tmp_path):
    log = TrajectoryLog()
    for i in range(5):
        log.append(i * 0.01, q=np.arange(3) + i, cost=float(i))
    assert len(log) == 5
    p = tmp_path / "traj.npz"
    export_trajectory(log, str(p))
    data = np.load(p)
    assert data["q"].shape == (5, 3)
    pj = tmp_path / "traj.json"
    export_trajectory(log, str(pj))
    assert pj.exists()


def test_support_polygon_and_cop():
    feet = np.array([[0.3, 0.2, 0], [0.3, -0.2, 0],
                     [-0.3, 0.2, 0], [-0.3, -0.2, 0]])
    hull = support_polygon(feet, [1, 1, 1, 1])
    assert hull.shape == (4, 2)
    cop = center_of_pressure(feet, np.tile([0, 0, 100.0], (4, 1)))
    np.testing.assert_allclose(cop, [0, 0], atol=1e-9)
    # uneven loading shifts the CoP toward the loaded feet
    f = np.tile([0, 0, 50.0], (4, 1))
    f[0, 2] = 150.0
    cop2 = center_of_pressure(feet, f)
    assert cop2[0] > 0 and cop2[1] > 0
    # swing feet excluded from the polygon
    hull3 = support_polygon(feet, [1, 0, 0, 1])
    assert hull3.shape[0] == 2


@pytest.mark.heavy
def test_mrt_async_interface(model):
    """Async MPC thread: observation in -> policy out, no control-thread
    blocking (tiny horizon for CPU speed)."""
    import dataclasses
    import jax
    from qm_control_tpu.config import MpcConfig, QmConfig
    from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
    from qm_control_tpu.models import centroidal as C
    from qm_control_tpu.models.spec import default_q
    from qm_control_tpu.mpc.mpc import MpcSolver
    from qm_control_tpu.ocp.reference import target_from_knots
    from qm_control_tpu.runtime.mrt import MpcMrtInterface

    cfg = QmConfig().with_(mpc=MpcConfig(time_horizon=0.12, dt=0.04,
                                         num_iterations=1))
    info = C.make_centroidal_info(model)
    solver = MpcSolver(model, info, cfg)
    mrt = MpcMrtInterface(solver, mpc_frequency=50.0)
    q0 = default_q(base_pos=(0, 0, 0.38))
    s = np.zeros(37)
    s[6:30] = q0
    s[8] = 0.4
    s[30:33] = [0.52, 0.09, 0.78]
    s[33:37] = [0.5, -0.5, 0.5, -0.5]
    target = target_from_knots([0.0, 5.0], [s, s])
    ms = GaitSchedule(GAIT_LIBRARY["stance"]).mode_schedule(0.0, 5.0)
    x0 = jnp.asarray(s[:30], dtype=jnp.float32).at[8].set(0.38)

    # pre-warm the jit (first CPU compile takes minutes; the test verifies
    # the ASYNC interface, not compile speed)
    solver.solve(0.0, x0, target, ms)
    solver.reset()

    mrt.set_current_observation(0.0, x0, target, ms)
    mrt.start()
    try:
        deadline = time.time() + 120
        while not mrt.initial_policy_received() and time.time() < deadline:
            time.sleep(0.1)
        assert mrt.initial_policy_received(), "no policy within deadline"
        x_des, u_des, mode = mrt.evaluate(0.02, x0)
        assert x_des.shape == (30,) and int(mode) == 15
        n0 = mrt.solve_count
        mrt.set_current_observation(0.05, x0, target, ms)
        time.sleep(1.0)
        assert mrt.solve_count > n0      # keeps re-solving at the pace
    finally:
        mrt.stop()


def test_profiling_chained_latency():
    """chained_latency measures a trivial step (sanity: positive, tiny)
    and stage_latencies maps names through."""
    import jax.numpy as jnp
    from qm_control_tpu.utils.profiling import (chained_latency,
                                                stage_latencies)

    def step(c):
        return c * 1.0000001 + 1e-9

    dt = chained_latency(step, k1=5, k2=55, reps=2)
    assert 0.0 <= dt < 0.05
    out = stage_latencies({"nop": step}, k1=5, k2=55, reps=2)
    assert set(out) == {"nop"} and out["nop"] < 0.05


def test_profiling_device_trace(tmp_path):
    import jax.numpy as jnp
    from qm_control_tpu.utils.profiling import device_trace
    with device_trace(str(tmp_path)):
        x = jnp.ones(64) * 2.0
        x.block_until_ready()
    import os
    assert any(os.scandir(str(tmp_path)))   # trace files written
