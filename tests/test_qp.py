"""QP solver and hierarchical cascade: KKT residuals + known solutions.

(SURVEY.md §4: 'QP KKT residuals on random SPD problems; nullspace cascade
vs. a dense reference solve'.)
"""
import jax.numpy as jnp
import numpy as np

from qm_control_tpu.wbc.hoqp import hoqp_solve
from qm_control_tpu.wbc.qp import solve_qp
from qm_control_tpu.wbc.tasks import NUM_DECISION_VARS, Task, eq_task, \
    ineq_task


def _random_qp(rng, n=20, m=30):
    A = rng.standard_normal((n, n))
    H = A @ A.T + 0.1 * np.eye(n)
    c = rng.standard_normal(n)
    G = rng.standard_normal((m, n))
    # make strictly feasible: h = G x0 + positive margin
    x0 = rng.standard_normal(n)
    h = G @ x0 + rng.uniform(0.1, 1.0, m)
    return (jnp.asarray(H, dtype=jnp.float32), jnp.asarray(c, dtype=jnp.float32),
            jnp.asarray(G, dtype=jnp.float32), jnp.asarray(h, dtype=jnp.float32))


def test_qp_kkt_residuals(rng):
    for _ in range(5):
        H, c, G, h = _random_qp(rng)
        sol = solve_qp(H, c, G, h, num_iters=30)
        x, lam, s = np.asarray(sol.x), np.asarray(sol.lam), np.asarray(sol.s)
        scale = max(1.0, float(np.linalg.norm(c)))
        # stationarity (float32 arithmetic: ~1e-2 relative is the floor)
        r_d = np.asarray(H) @ x + np.asarray(c) + np.asarray(G).T @ lam
        assert np.linalg.norm(r_d) / scale < 2e-2
        # primal feasibility
        viol = np.asarray(G) @ x - np.asarray(h)
        assert viol.max() < 1e-4 * scale
        # complementarity
        assert float(sol.gap) < 1e-3
        assert (lam >= -1e-6).all()


def test_qp_matches_unconstrained_when_inactive(rng):
    H, c, G, h = _random_qp(rng, n=10, m=5)
    # push constraints far away
    h = h + 100.0
    sol = solve_qp(H, c, G, h, num_iters=30)
    x_ref = np.linalg.solve(np.asarray(H, dtype=np.float64),
                            -np.asarray(c, dtype=np.float64))
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-3)


def test_qp_active_bound():
    """min 0.5 x'x - 10 x0  s.t. x0 <= 2  ->  x0 = 2."""
    n = 4
    H = jnp.eye(n)
    c = jnp.zeros(n).at[0].set(-10.0)
    G = jnp.zeros((1, n)).at[0, 0].set(1.0)
    h = jnp.asarray([2.0])
    sol = solve_qp(H, c, G, h, num_iters=30)
    np.testing.assert_allclose(np.asarray(sol.x),
                               [2.0, 0, 0, 0], atol=1e-3)


def _task(A=None, b=None, D=None, f=None):
    n = NUM_DECISION_VARS
    z = jnp.zeros((0, n), dtype=jnp.float32)
    v0 = jnp.zeros((0,), dtype=jnp.float32)
    mk = lambda M: jnp.asarray(np.atleast_2d(M), dtype=jnp.float32)
    vk = lambda x: jnp.asarray(np.atleast_1d(x), dtype=jnp.float32)
    return Task(mk(A) if A is not None else z, vk(b) if b is not None else v0,
                mk(D) if D is not None else z, vk(f) if f is not None else v0)


def test_hoqp_lexicographic_toy():
    """T0: x0 + x1 = 1;  T1: x0 -> 10   =>   x = (10, -9, 0, ...)."""
    n = NUM_DECISION_VARS
    A0 = np.zeros((1, n)); A0[0, 0] = 1; A0[0, 1] = 1
    A1 = np.zeros((1, n)); A1[0, 0] = 1
    # pin the remaining coordinates at T0 to keep the toy well-posed
    A_pin = np.zeros((n - 2, n))
    A_pin[:, 2:] = np.eye(n - 2)
    t0 = _task(A=np.vstack([A0, A_pin]), b=np.concatenate([[1.0],
                                                           np.zeros(n - 2)]))
    t1 = _task(A=A1, b=[10.0])
    x = np.asarray(hoqp_solve([t0, t1]))
    np.testing.assert_allclose(x[0], 10.0, atol=1e-2)
    np.testing.assert_allclose(x[1], -9.0, atol=1e-2)
    np.testing.assert_allclose(x[2:], 0.0, atol=1e-3)


def test_hoqp_respects_higher_priority_inequality():
    """Same toy but T0 adds x0 <= 2  =>  x = (2, -1, 0, ...)."""
    n = NUM_DECISION_VARS
    A0 = np.zeros((1, n)); A0[0, 0] = 1; A0[0, 1] = 1
    A_pin = np.zeros((n - 2, n)); A_pin[:, 2:] = np.eye(n - 2)
    D0 = np.zeros((1, n)); D0[0, 0] = 1
    t0 = _task(A=np.vstack([A0, A_pin]),
               b=np.concatenate([[1.0], np.zeros(n - 2)]),
               D=D0, f=[2.0])
    A1 = np.zeros((1, n)); A1[0, 0] = 1
    t1 = _task(A=A1, b=[10.0])
    x = np.asarray(hoqp_solve([t0, t1]))
    np.testing.assert_allclose(x[0], 2.0, atol=2e-2)
    np.testing.assert_allclose(x[1], -1.0, atol=2e-2)


def test_hoqp_slack_only_when_infeasible():
    """T1 conflicting with T0 equality: T0 wins exactly."""
    n = NUM_DECISION_VARS
    A0 = np.zeros((1, n)); A0[0, 0] = 1
    A_pin = np.zeros((n - 1, n)); A_pin[:, 1:] = np.eye(n - 1)
    t0 = _task(A=np.vstack([A0, A_pin]),
               b=np.concatenate([[3.0], np.zeros(n - 1)]))
    A1 = np.zeros((1, n)); A1[0, 0] = 1
    t1 = _task(A=A1, b=[-5.0])     # conflicts with x0 = 3
    x = np.asarray(hoqp_solve([t0, t1]))
    np.testing.assert_allclose(x[0], 3.0, atol=1e-3)
