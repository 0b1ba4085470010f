"""Pin the MRT policy-lag + delay-compensation semantics (round-4/5
load-bearing mechanism; reference QMController.cpp:309-334 async MRT).

Every closed-loop accuracy number depends on the cycle executing the
[kT,(k+1)T] window of a k-period-old plan and, with an actuation delay
line, evaluating that plan at the command's APPLICATION time. These
tests make a solver change that silently re-opens the locomotion stall
(or the delay9 regression) fail loudly.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_control_tpu.config import MpcConfig, QmConfig
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.mpc.mpc import evaluate_policy
from qm_control_tpu.ocp.reference import target_from_knots
from qm_control_tpu.runtime.loop import ControlLoop, LoopConfig


def _tiny_cfg():
    cfg = QmConfig().with_(mpc=MpcConfig(time_horizon=0.4, dt=0.04,
                                         num_iterations=1))
    return cfg.with_(wbc=dataclasses.replace(cfg.wbc, arm_settling_time=0.0))


def _setup(lag, delay_comp=0.0):
    from qm_control_tpu.experiments import _standing_setup
    cfg = _tiny_cfg()
    model, info, q0, s = _standing_setup(cfg)
    loop = ControlLoop(model, info, cfg,
                       LoopConfig(mrt_policy_lag=lag,
                                  delay_compensation_s=delay_comp))
    target = target_from_knots([0.0, 9.0], [s, s])
    ms = GaitSchedule(GAIT_LIBRARY["stance"]).mode_schedule(0.0, 9.0)
    carry = loop.init_carry(q0)
    return loop, carry, target, ms


def _mark_stack(policy_stack, slopes):
    """Make each stacked policy's x_des[24] (arm joint 1 desired) a
    distinct linear function of time: X[i][:, 24] = slopes[i] * t_nodes.
    Joint 24's desired only feeds the WBC arm-tracking task — harmless
    for one cycle — and uniquely identifies (which policy, what eval
    time) the ticks consumed."""
    X = policy_stack.X  # (lag, N+1, 30)
    tn = policy_stack.t_nodes  # (lag, N+1)
    slopes = jnp.asarray(slopes, dtype=jnp.float32)
    Xm = X.at[:, :, 24].set(slopes[:, None] * tn)
    return policy_stack._replace(X=Xm)


@pytest.mark.slow
def test_lagged_cycle_executes_oldest_policy_at_application_time():
    lag, comp = 3, 0.018
    loop, carry, target, ms = _setup(lag, delay_comp=comp)
    slopes = [0.31, 0.57, 0.83]
    carry = carry._replace(policy=_mark_stack(carry.policy, slopes))
    oldest = jax.tree_util.tree_map(lambda a: a[0], carry.policy)
    t0 = float(carry.t)
    carry2, m = loop._cycle(carry, target, ms, loop.gains)

    # the last tick ran at t_last = t0 + (ticks-1)*tick_dt and must have
    # evaluated the OLDEST stacked policy at t_last + delay_compensation
    ticks = loop.loop_cfg.ticks_per_cycle
    tick_dt = 1.0 / loop.loop_cfg.control_freq
    t_last = t0 + (ticks - 1) * tick_dt
    x_exp, _, _ = evaluate_policy(oldest, jnp.asarray(t_last + comp,
                                                      jnp.float32))
    got = float(np.asarray(m.x_des)[24])
    assert got == pytest.approx(float(x_exp[24]), abs=1e-6)
    # and NOT any other (policy, time) combination
    for wrong_slope in slopes[1:]:
        assert abs(got - wrong_slope * (t_last + comp)) > 1e-3
    assert abs(got - slopes[0] * t_last) > 1e-4   # uncompensated time

    # the stack rolled: new oldest is the previous index-1 policy, and
    # the newest slot holds the fresh solve (its x_des[24] is no longer
    # the marked ramp)
    rolled = np.asarray(carry2.policy.X)[:, :, 24]
    tn = np.asarray(carry2.policy.t_nodes)
    np.testing.assert_allclose(rolled[0], slopes[1] * tn[0], atol=1e-6)
    np.testing.assert_allclose(rolled[1], slopes[2] * tn[1], atol=1e-6)
    assert not np.allclose(rolled[2], slopes[0] * tn[2], atol=1e-3)


def test_policy_depth_mismatch_fails_loudly():
    """ADVICE r4: a carry built under a different mrt_policy_lag must not
    silently execute the wrong depth."""
    loop, carry, target, ms = _setup(lag=2)
    bad = carry._replace(policy=jax.tree_util.tree_map(
        lambda a: jnp.concatenate([a, a], axis=0), carry.policy))
    with pytest.raises(ValueError, match="stack depth"):
        loop._cycle(bad, target, ms, loop.gains)


def test_warmup_rebuilds_stack_at_configured_depth():
    loop, carry, target, ms = _setup(lag=2)
    carry = loop.warmup(carry, target, ms, num_solves=1)
    assert jax.tree_util.tree_leaves(carry.policy)[0].shape[0] == 2
