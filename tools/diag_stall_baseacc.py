"""One-tick instrumentation at the stall: plan base accel (policy FD)
vs updateDesired's Ab^-1 formula vs WBC solved vdot[0]."""
import os, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from qm_control_tpu.experiments import _default_cfg, _standing_setup
from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
from qm_control_tpu.mpc.mpc import mpc_step, evaluate_policy
from qm_control_tpu.ocp.problem import make_ocp
from qm_control_tpu.ocp.reference import cmd_vel_to_target
from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                              rbd_state_from_plant, rbd_to_qv)
from qm_control_tpu.solver.sqp import SqpSettings
from qm_control_tpu.wbc import tasks as T
from qm_control_tpu.models import centroidal as C
from diag_tick_probe import load_carry

cfg = _default_cfg()
model, info, q0, s = _standing_setup(cfg)
carry, ee_hold, x_start = load_carry()
gs = GaitSchedule(GAIT_LIBRARY["stance"]); gs.insert_template(GAIT_LIBRARY["trot"], 0.5)
ms = gs.mode_schedule(max(0.0, float(carry.t) - 0.5), float(carry.t) + 3.0)  # receding window (MAX_EVENTS raise)
ocp = make_ocp(model, info, cfg)
rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
x_obs = observation_from_rbd(model, info, rbd, carry.last_yaw)
ee_state = np.asarray(rbd[48:55])
target, _ = cmd_vel_to_target([-0.1, 0, 0, 0], ee_hold.copy(),
                              float(carry.t), np.asarray(x_obs), ee_state,
                              cfg.reference)
N = cfg.mpc.num_nodes
st = SqpSettings(num_iterations=10)
pol = mpc_step(ocp, model, info, cfg, st, carry.t, x_obs, target, ms,
               carry.W_warm, carry.X_warm, jnp.float32(0.01), jnp.asarray(False))

# plan's own base velocity profile near t: FD of X[:,0] (vcom_x) per node
vx_nodes = np.asarray(pol.X[:6, 0])
acc_plan = (vx_nodes[1:] - vx_nodes[:-1]) / cfg.mpc.dt
print("plan vx nodes:", np.round(vx_nodes, 4), " accel per node:",
      np.round(acc_plan, 3))

# updateDesired formula at several policy times
for dt_eval in (0.0, 0.002, 0.01, 0.02, 0.05):
    t = carry.t + dt_eval
    x_des, u_des, mode = evaluate_policy(pol, t)
    # input_last: policy 1 tick earlier (as the loop's FD would see)
    x_prev, u_prev, _ = evaluate_policy(pol, t - 0.002)
    d = T.compute_desired(model, info, x_des, u_des, u_prev,
                          jnp.float32(0.002))
    print(f"t+{dt_eval:5.3f}: plan vx={float(x_des[0]):+.4f} "
          f"base_acc_formula[0]={float(d.base_acc[0]):+.3f}")
