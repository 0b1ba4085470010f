"""At the stalled state: minimize EE pose error over ARM JOINTS ONLY
(base and legs frozen) with/without the arm joint-limit barrier.
If the optimal residual is ~0, arm geometry is NOT the leash; if mm-scale,
the arm/barrier is the binding constraint."""
import os, sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from qm_control_tpu.experiments import _default_cfg, _standing_setup
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.ocp.costs import arm_limit_cost, ee_residual
from qm_control_tpu.runtime.estimator import rbd_state_from_plant
from diag_tick_probe import load_carry

cfg = _default_cfg()
model, info, q0, s = _standing_setup(cfg)
carry, ee_hold, x_start = load_carry()
rbd = rbd_state_from_plant(model, carry.plant.q, carry.plant.v)
from qm_control_tpu.runtime.estimator import observation_from_rbd
x_obs = observation_from_rbd(model, info, rbd, carry.last_yaw)
p_ref = jnp.asarray(ee_hold[:3], jnp.float32)
q_ref = jnp.asarray([ee_hold[6], ee_hold[3], ee_hold[4], ee_hold[5]], jnp.float32)

mu = jnp.asarray([2000.]*3 + [1000.]*3, jnp.float32)
x0 = jnp.asarray(x_obs)

def probe(use_barrier, use_ori):
    def cost(qa):
        x = x0.at[24:30].set(qa)
        e = ee_residual(model, x, p_ref, q_ref)
        w = mu if use_ori else mu.at[3:].set(0.0)
        c = 0.5 * jnp.sum(w * e * e)
        if use_barrier:
            c = c + arm_limit_cost(model, x, jnp.zeros(30), cfg.joint_limits)
        return c
    qa = x0[24:30]
    g = jax.jit(jax.grad(cost)); H = jax.jit(jax.hessian(cost))
    for _ in range(60):
        gr = g(qa); Hs = H(qa) + 1e-6*jnp.eye(6)
        qa = qa - jnp.linalg.solve(Hs, gr)
    x = x0.at[24:30].set(qa)
    e = np.asarray(ee_residual(model, x, p_ref, q_ref))
    print(f"barrier={int(use_barrier)} ori={int(use_ori)}: pos_err="
          f"{np.linalg.norm(e[:3])*1e3:7.3f} mm  ori_err="
          f"{np.degrees(np.linalg.norm(e[3:])):6.3f} deg  dq_arm="
          f"{np.round(np.asarray(qa - x0[24:30]), 3)}")

e0 = np.asarray(ee_residual(model, x0, p_ref, q_ref))
print(f"current: pos_err={np.linalg.norm(e0[:3])*1e3:.3f} mm ori_err="
      f"{np.degrees(np.linalg.norm(e0[3:])):.3f} deg")
print("arm joints now:", np.round(np.asarray(x0[24:30]), 3))
probe(False, True)
probe(True, True)
probe(False, False)
probe(True, False)
# joint limit margins
from qm_control_tpu.models.spec import RobotModel
lo = np.asarray(model.joint_lower[12:]); hi = np.asarray(model.joint_upper[12:])
qa = np.asarray(x0[24:30])
print("arm limit margins lo:", np.round(qa - lo, 3), " hi:", np.round(hi - qa, 3))
