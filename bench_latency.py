"""Single-scenario latency on the current device: MPC solve + WBC solve
vs the reference's real-time deadlines (10 ms / 2 ms)."""
import time
import numpy as np
import jax, jax.numpy as jnp
import qm_control_tpu
from qm_control_tpu.config import QmConfig, WbcGains
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.mpc.mpc import MpcSolver, evaluate_policy
from qm_control_tpu.wbc.wbc import hierarchical_wbc_update
from qm_control_tpu.utils.timers import RepeatedTimer
from __graft_entry__ import _setup
import dataclasses

cfg, model, info, x0, target, ms = _setup(QmConfig())
dev = jax.devices()[0]
print("device:", dev.device_kind)
mpc = MpcSolver(model, info, cfg)
pol = mpc.solve(0.0, x0, target, ms)      # compile + cold
t_mpc = RepeatedTimer("mpc_solve")
for i in range(50):
    with t_mpc:
        pol = mpc.solve(i * 0.01, x0, target, ms)
        jax.block_until_ready(pol.cost)
print(t_mpc.summary(), "| deadline 10 ms")

gains = dataclasses.replace(WbcGains(), arm_settling_time=0.0)
tau_max = jnp.asarray(model.joint_effort, dtype=jnp.float32)
x_des, u_des, mode = evaluate_policy(pol, 0.01)
q = x0[6:30]; v = jnp.zeros(24)
wbc_fn = jax.jit(lambda xd, ud, il, qq, vv: hierarchical_wbc_update(
    model, info, gains, tau_max, xd, ud, il, qq, vv,
    jnp.ones(4, dtype=jnp.float32), jnp.asarray(0.002, jnp.float32),
    jnp.asarray(20.0, jnp.float32)))
res = wbc_fn(x_des, u_des, u_des, q, v)
jax.block_until_ready(res.torques)
t_wbc = RepeatedTimer("wbc_solve")
for _ in range(100):
    with t_wbc:
        res = wbc_fn(x_des, u_des, u_des, q, v)
        jax.block_until_ready(res.torques)
print(t_wbc.summary(), "| deadline 2 ms")
