"""iLQR solver: exactness on LQR problems, improvement on nonlinear ones."""
import jax
import jax.numpy as jnp
import numpy as np

from qm_control_tpu.solver.ilqr import IlqrSettings, ilqr_solve


def _double_integrator(N=30, dt=0.1):
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    B = jnp.array([[0.5 * dt * dt], [dt]])
    Q = jnp.diag(jnp.array([1.0, 0.1]))
    R = jnp.array([[0.01]])
    dyn = lambda kd, x, w: A @ x + B @ w
    cost = lambda kd, x, w: 0.5 * x @ Q @ x + 0.5 * w @ R @ w
    final = lambda fd, x: 5.0 * (x @ x)
    node_data = jnp.zeros(N)       # unused
    return dyn, cost, final, node_data, A, B, Q, R


def _lqr_reference(A, B, Q, R, Pf, N):
    """Discrete Riccati recursion (numpy, float64) for ground truth."""
    A, B, Q, R, P = (np.asarray(m, dtype=np.float64)
                     for m in (A, B, Q, R, Pf))
    Ks = []
    for _ in range(N):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ (A - B @ K)
        Ks.append(K)
    return Ks[::-1], P


def test_lqr_exact_in_one_iteration():
    N = 30
    dyn, cost, final, node_data, A, B, Q, R = _double_integrator(N)
    x0 = jnp.array([1.0, 0.0])
    W0 = jnp.zeros((N, 1))
    sol = ilqr_solve(dyn, cost, final, node_data, 0.0, x0, W0,
                     IlqrSettings(num_iterations=1, reg=1e-9, alphas=(1.0,)))
    # ground truth: simulate optimal LQR feedback
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


def test_nonlinear_improvement_and_monotonicity():
    """Pendulum swing-damping: cost decreases monotonically with iterations."""
    N, dt = 40, 0.05

    def dyn(kd, x, w):
        th, om = x[0], x[1]
        return jnp.stack([th + dt * om,
                          om + dt * (-9.81 * jnp.sin(th) + w[0])])

    cost = lambda kd, x, w: 0.5 * (x @ x) + 0.01 * (w @ w)
    final = lambda fd, x: 10.0 * (x @ x)
    x0 = jnp.array([2.5, 0.0])
    W0 = jnp.zeros((N, 1))
    costs = []
    for iters in (0, 1, 3, 8):
        if iters == 0:
            # plain rollout cost
            x = x0
            c = 0.0
            for k in range(N):
                c += float(cost(None, x, W0[k]))
                x = dyn(None, x, W0[k])
            c += float(final(None, x))
            costs.append(c)
        else:
            sol = ilqr_solve(dyn, cost, final, jnp.zeros(N), 0.0, x0, W0,
                             IlqrSettings(num_iterations=iters))
            costs.append(float(sol.cost))
    assert costs[1] < costs[0] * 0.9
    assert costs[2] <= costs[1] + 1e-6
    assert costs[3] <= costs[2] + 1e-6


def test_line_search_rejects_divergent_step():
    """A pathological initialization must not make the cost worse."""
    N, dt = 20, 0.1
    dyn = lambda kd, x, w: x + dt * jnp.stack([x[1], w[0] - x[0] ** 3])
    cost = lambda kd, x, w: 0.5 * (x @ x) + 0.5 * (w @ w)
    final = lambda fd, x: x @ x
    x0 = jnp.array([3.0, -1.0])
    W0 = 50.0 * jnp.ones((N, 1))

    def rollout_cost(W):
        x, c = x0, 0.0
        for k in range(N):
            c += float(cost(None, x, W[k]))
            x = dyn(None, x, W[k])
        return c + float(final(None, x))

    sol = ilqr_solve(dyn, cost, final, jnp.zeros(N), 0.0, x0, W0,
                     IlqrSettings(num_iterations=2))
    assert float(sol.cost) <= rollout_cost(np.asarray(W0)) + 1e-3
    assert np.isfinite(float(sol.cost))
