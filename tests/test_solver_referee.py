"""Framework-independent NONLINEAR solver referee (VERDICT r2 #8).

The solver's linear core already has an analytic referee
(test_sqp.py::test_lqr_exact_from_infeasible_start solves LQR against a
hand-rolled f64 Riccati recursion). This file closes the NONLINEAR gap:
a reduced optimal-control problem — nonlinear pendulum-on-cart dynamics,
quadratic costs, RK2 discretization, both defined INSIDE this test — is
solved by

  (a) scipy.optimize (f64 single-shooting BFGS over the control
      sequence; no qm_control_tpu numerics anywhere in the referee), and
  (b) solver.sqp.sqp_solve (the framework's multiple-shooting SQP,
      converged),

and the optimal costs and control sequences must agree. Together with
tests/test_analytic_fixtures.py (model layer vs the raw URDF) this
pins both halves of the MPC stack to implementation-independent ground
truth — the role OCS2's independent implementation plays for the
reference (SURVEY.md §4).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from qm_control_tpu.solver.sqp import SqpSettings, sqp_solve

DT = 0.05
N = 25
NX, NU = 4, 2
Q = np.array([1.0, 5.0, 0.1, 0.1])
R = np.array([0.05, 0.05])
QF = np.array([10.0, 50.0, 1.0, 1.0])
X0 = np.array([0.5, 0.6, 0.0, 0.0])


def _f_np(x, u):
    """Continuous dynamics, pure numpy f64 (the referee's copy)."""
    p, th, pd, thd = x
    pdd = u[0] + 0.2 * np.sin(th) - 0.1 * pd
    thdd = u[1] - 9.81 * np.sin(th) - 0.05 * thd + 0.1 * u[0] * np.cos(th)
    return np.array([pd, thd, pdd, thdd])


def _step_np(x, u):
    k1 = _f_np(x, u)
    k2 = _f_np(x + DT * k1, u)
    return x + 0.5 * DT * (k1 + k2)


def _cost_np(U):
    U = U.reshape(N, NU)
    x = X0.copy()
    c = 0.0
    for k in range(N):
        c += 0.5 * DT * (Q @ (x * x) + R @ (U[k] * U[k]))
        x = _step_np(x, U[k])
    return c + 0.5 * (QF @ (x * x))


def _f_jnp(x, u):
    """The same dynamics for the framework solver (jnp; f32 path)."""
    p, th, pd, thd = x[0], x[1], x[2], x[3]
    pdd = u[0] + 0.2 * jnp.sin(th) - 0.1 * pd
    thdd = (u[1] - 9.81 * jnp.sin(th) - 0.05 * thd
            + 0.1 * u[0] * jnp.cos(th))
    return jnp.stack([pd, thd, pdd, thdd])


@pytest.mark.heavy
def test_sqp_matches_scipy_on_nonlinear_ocp():
    from scipy.optimize import minimize

    # (a) referee: f64 single shooting over U, gradient-free objective
    res = minimize(_cost_np, np.zeros(N * NU), method="L-BFGS-B",
                   options={"maxiter": 500, "ftol": 1e-14,
                            "gtol": 1e-10})
    assert res.success or res.fun < _cost_np(np.zeros(N * NU))
    U_ref = res.x.reshape(N, NU)
    c_ref = float(res.fun)

    # (b) the framework solver, converged
    def dyn(kd, x, w):
        k1 = _f_jnp(x, w)
        k2 = _f_jnp(x + DT * k1, w)
        return x + 0.5 * DT * (k1 + k2)

    Qj = jnp.asarray(Q, jnp.float32)
    Rj = jnp.asarray(R, jnp.float32)
    QFj = jnp.asarray(QF, jnp.float32)

    def cost(kd, x, w):
        return 0.5 * DT * (jnp.sum(Qj * x * x) + jnp.sum(Rj * w * w))

    def final(fd, x):
        return 0.5 * jnp.sum(QFj * x * x)

    nd = jnp.zeros(N)
    x0 = jnp.asarray(X0, jnp.float32)
    sol = sqp_solve(dyn, cost, final, nd, 0.0, x0,
                    jnp.tile(x0[None], (N + 1, 1)),
                    jnp.zeros((N, NU), jnp.float32),
                    SqpSettings(num_iterations=25, reg=1e-7,
                                unrolled_ops=False))
    assert float(sol.defect) < 1e-4

    # recompute our solution's cost with the REFEREE's f64 evaluator so
    # the comparison shares no framework code
    c_ours = _cost_np(np.asarray(sol.W, np.float64).reshape(-1))
    assert abs(c_ours - c_ref) < 1e-3 * (1.0 + abs(c_ref)), (c_ours, c_ref)

    # control sequences agree where the problem is sensitive (early
    # horizon; the tail controls are weakly determined)
    W = np.asarray(sol.W, np.float64)
    err = np.abs(W[: N // 2] - U_ref[: N // 2]).max()
    scale = np.abs(U_ref[: N // 2]).max() + 1.0
    assert err < 0.02 * scale, (err, scale)
