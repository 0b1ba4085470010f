"""Multiple-shooting SQP solver: LQR exactness, defect closure,
convergence where single shooting stalls."""
import jax.numpy as jnp
import numpy as np

from qm_control_tpu.solver.sqp import SqpSettings, sqp_solve


def _double_integrator(N=30, dt=0.1):
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    B = jnp.array([[0.5 * dt * dt], [dt]])
    Q = jnp.diag(jnp.array([1.0, 0.1]))
    R = jnp.array([[0.01]])
    dyn = lambda kd, x, w: A @ x + B @ w
    cost = lambda kd, x, w: 0.5 * x @ Q @ x + 0.5 * w @ R @ w
    final = lambda fd, x: 5.0 * (x @ x)
    return dyn, cost, final, jnp.zeros(N), A, B, Q, R


def _lqr_reference(A, B, Q, R, Pf, N):
    A, B, Q, R, P = (np.asarray(m, dtype=np.float64)
                     for m in (A, B, Q, R, Pf))
    Ks = []
    for _ in range(N):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ (A - B @ K)
        Ks.append(K)
    return Ks[::-1], P


def test_lqr_exact_from_infeasible_start():
    """Starting from X = tile(x0) (defects != 0), one full-step SQP
    iteration solves an LQR problem exactly."""
    N = 30
    dyn, cost, final, nd, A, B, Q, R = _double_integrator(N)
    x0 = jnp.array([1.0, 0.0])
    X0 = jnp.tile(x0[None], (N + 1, 1))
    W0 = jnp.zeros((N, 1))
    sol = sqp_solve(dyn, cost, final, nd, 0.0, x0, X0, W0,
                    SqpSettings(num_iterations=2, reg=1e-9, alphas=(1.0,)))
    Ks, _ = _lqr_reference(A, B, Q, R, 10.0 * np.eye(2), N)
    x = np.array([1.0, 0.0])
    X_ref, W_ref = [x], []
    for k in range(N):
        u = -Ks[k] @ x
        W_ref.append(u)
        x = np.asarray(A) @ x + np.asarray(B) @ u
        X_ref.append(x)
    np.testing.assert_allclose(np.asarray(sol.W), np.array(W_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(sol.X), np.array(X_ref), atol=1e-3)
    assert float(sol.defect) < 1e-4


def test_defects_close_with_alpha():
    """With a partial step, defects shrink by (1 - alpha) per iteration."""
    N = 10
    dyn, cost, final, nd, *_ = _double_integrator(N)
    x0 = jnp.array([2.0, -1.0])
    X0 = jnp.tile(x0[None], (N + 1, 1))
    W0 = jnp.zeros((N, 1))
    s1 = sqp_solve(dyn, cost, final, nd, 0.0, x0, X0, W0,
                   SqpSettings(num_iterations=1, alphas=(0.5,)))
    s4 = sqp_solve(dyn, cost, final, nd, 0.0, x0, X0, W0,
                   SqpSettings(num_iterations=6, alphas=(0.5,)))
    assert float(s4.defect) < float(s1.defect) * 0.2
    assert float(s4.defect) < 1e-2


def test_unstable_system_long_horizon():
    """An exponentially unstable system over a long horizon — the case
    where single-shooting rollouts overflow — solves cleanly."""
    N, dt = 80, 0.05
    # x' = x + dt*(2x + u): open-loop growth 2.7e3 over the horizon
    dyn = lambda kd, x, w: x + dt * (2.0 * x + w)
    cost = lambda kd, x, w: 0.5 * dt * (x @ x + 0.1 * w @ w)
    final = lambda fd, x: 10.0 * (x @ x)
    x0 = jnp.array([1.0])
    X0 = jnp.tile(x0[None], (N + 1, 1))
    W0 = jnp.zeros((N, 1))
    sol = sqp_solve(dyn, cost, final, jnp.zeros(N), 0.0, x0, X0, W0,
                    SqpSettings(num_iterations=8))
    assert np.isfinite(float(sol.cost))
    assert float(sol.defect) < 1e-3
    # solution must stabilize the state (end well below open-loop growth)
    assert abs(float(sol.X[-1, 0])) < 0.5


def test_pendulum_monotone_merit():
    N, dt = 40, 0.05
    dyn = lambda kd, x, w: jnp.stack([x[0] + dt * x[1],
                                      x[1] + dt * (-9.81 * jnp.sin(x[0])
                                                   + w[0])])
    cost = lambda kd, x, w: 0.5 * (x @ x) + 0.01 * (w @ w)
    final = lambda fd, x: 10.0 * (x @ x)
    x0 = jnp.array([2.5, 0.0])
    X0 = jnp.tile(x0[None], (N + 1, 1))
    W0 = jnp.zeros((N, 1))
    prev = None
    for iters in (2, 5, 10):
        sol = sqp_solve(dyn, cost, final, jnp.zeros(N), 0.0, x0, X0, W0,
                        SqpSettings(num_iterations=iters))
        total = float(sol.cost) + 1e4 * float(sol.defect)
        if prev is not None:
            assert total <= prev + 1e-3
        prev = total
    assert float(sol.defect) < 1e-2
