"""Generic iLQR / SLQ solver: scan rollout, vmapped linearization, Riccati
backward sweep, parallel line search.

TPU-native replacement for OCS2's SqpMpc / SLQ (multiple-shooting SQP with
an HPIPM LQ backend; reference QMController.cpp:286-334, task.info:75-92).
Design choices vs. the reference, driven by XLA/TPU semantics
(SURVEY.md §7 hard parts #1, #4):

  - fixed iteration count (sqpIteration, task.info:79 = 1) — no
    data-dependent convergence loop under jit;
  - linearization + quadratization via vmap(jacfwd/hessian) over the
    horizon — replaces CppAD codegen;
  - Riccati backward pass as lax.scan with DIAGONAL_SHIFT regularization
    (the reference's hessianCorrectionStrategy, task.info:66-67);
  - PARALLEL line search: all step lengths rolled out at once via vmap and
    the best taken — replaces the serial backtracking line search
    (task.info:62-68) with a TPU-friendly fixed-shape variant.

The solver is problem-agnostic: it sees dynamics/cost closures over
(k_data, x, w) where k_data is one node's slice of a per-node data pytree.
Batch over scenarios by vmapping `ilqr_solve` itself.
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class IlqrSettings(NamedTuple):
    num_iterations: int = 1          # task.info sqp.sqpIteration
    reg: float = 1e-5                # hessianCorrectionMultiple (DIAGONAL_SHIFT)
    # parallel line-search step lengths (maxStepLength 1.0, minStepLength 1e-2)
    alphas: tuple = (1.0, 0.6, 0.35, 0.2, 0.1, 0.05, 0.01)


class IlqrSolution(NamedTuple):
    X: jnp.ndarray          # (N+1, nx) optimized state trajectory
    W: jnp.ndarray          # (N, nw) optimized (reduced) inputs
    cost: jnp.ndarray       # scalar, final total cost
    K: jnp.ndarray          # (N, nw, nx) feedback gains of the last sweep
    alpha: jnp.ndarray      # accepted step length of the last iteration


def _tree_index(tree, k):
    return jax.tree_util.tree_map(lambda a: a[k], tree)


def ilqr_solve(dynamics, stage_cost, final_cost, node_data, final_data,
               x0, W_init, settings: IlqrSettings = IlqrSettings(),
               stage_quad=None, final_quad=None):
    """Minimize sum_k stage_cost(node_k, x_k, w_k) + final_cost(final, x_N).

    dynamics(k_data, x, w) -> x_next
    stage_cost(k_data, x, w) -> scalar
    final_cost(final_data, x) -> scalar
    node_data: pytree, leaves with leading dim N (per-interval data)
    x0: (nx,); W_init: (N, nw)

    stage_quad(k_data, x, w) -> (l, lx, lw, lxx, lww, lwx) and
    final_quad(final_data, x) -> (l, lx, lxx) optionally supply the cost
    quadratization (e.g. Gauss-Newton; much cheaper to compile than the
    default full autodiff Hessian).
    """
    N, nw = W_init.shape
    nx = x0.shape[0]
    reg = settings.reg

    if stage_quad is None:
        def stage_quad(kd, x, w):
            z = jnp.concatenate([x, w])
            lfun = lambda zz: stage_cost(kd, zz[:nx], zz[nx:])
            l = lfun(z)
            lz = jax.grad(lfun)(z)
            lzz = jax.jacfwd(jax.grad(lfun))(z)
            return (l, lz[:nx], lz[nx:], lzz[:nx, :nx], lzz[nx:, nx:],
                    lzz[nx:, :nx])

    if final_quad is None:
        def final_quad(fd, x):
            lfun = lambda xx: final_cost(fd, xx)
            return lfun(x), jax.grad(lfun)(x), jax.jacfwd(jax.grad(lfun))(x)

    def rollout(W):
        def step(x, kw):
            kd, w = kw
            x_next = dynamics(kd, x, w)
            c = stage_cost(kd, x, w)
            return x_next, (x, c)
        xN, (X, costs) = jax.lax.scan(step, x0, (node_data, W))
        X = jnp.concatenate([X, xN[None]], axis=0)
        total = jnp.sum(costs) + final_cost(final_data, xN)
        return X, total

    def linearize(X, W):
        def node(kd, x, w):
            A = jax.jacfwd(lambda xx: dynamics(kd, xx, w))(x)
            B = jax.jacfwd(lambda ww: dynamics(kd, x, ww))(w)
            _, lx, lw, lxx, lww, lwx = stage_quad(kd, x, w)
            return A, B, lx, lw, lxx, lww, lwx
        return jax.vmap(node)(node_data, X[:-1], W)

    def backward(A, B, lx, lu, lxx, luu, lux, Vx, Vxx):
        def bstep(carry, inp):
            Vx, Vxx = carry
            A, B, lx, lu, lxx, luu, lux = inp
            Qx = lx + A.T @ Vx
            Qu = lu + B.T @ Vx
            VA = Vxx @ A
            Qxx = lxx + A.T @ VA
            Quu = luu + B.T @ (Vxx @ B)
            Qux = lux + B.T @ VA
            Quu_reg = 0.5 * (Quu + Quu.T) + reg * jnp.eye(nw, dtype=Quu.dtype)
            kK = jnp.linalg.solve(Quu_reg,
                                  jnp.concatenate([Qu[:, None], Qux], axis=1))
            kff, Kfb = -kK[:, 0], -kK[:, 1:]
            Vx_new = Qx + Kfb.T @ (Quu @ kff) + Kfb.T @ Qu + Qux.T @ kff
            Vxx_new = Qxx + Kfb.T @ Quu @ Kfb + Kfb.T @ Qux + Qux.T @ Kfb
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            return (Vx_new, Vxx_new), (kff, Kfb)
        (_, _), (kffs, Kfbs) = jax.lax.scan(
            bstep, (Vx, Vxx), (A, B, lx, lu, lxx, luu, lux), reverse=True)
        return kffs, Kfbs

    def closed_loop(X_ref, W_ref, kffs, Kfbs, alpha):
        def step(x, inp):
            kd, x_ref, w_ref, kff, Kfb = inp
            w = w_ref + alpha * kff + Kfb @ (x - x_ref)
            x_next = dynamics(kd, x, w)
            c = stage_cost(kd, x, w)
            return x_next, (x, w, c)
        xN, (X, W, costs) = jax.lax.scan(
            step, x0, (node_data, X_ref[:-1], W_ref, kffs, Kfbs))
        X = jnp.concatenate([X, xN[None]], axis=0)
        total = jnp.sum(costs) + final_cost(final_data, xN)
        return X, W, total

    def iteration(carry, _):
        X, W, cost = carry
        A, B, lx, lu, lxx, luu, lux = linearize(X, W)
        # terminal value from the final cost quadratization
        _, VxN, VxxN = final_quad(final_data, X[-1])
        VxxN = 0.5 * (VxxN + VxxN.T)
        kffs, Kfbs = backward(A, B, lx, lu, lxx, luu, lux, VxN, VxxN)
        alphas = jnp.asarray(settings.alphas, dtype=X.dtype)
        Xc, Wc, costs = jax.vmap(
            partial(closed_loop, X, W, kffs, Kfbs))(alphas)
        # NaN-guard (solver divergence detection, SURVEY.md §5 failure
        # detection): a candidate with non-finite cost never wins.
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
        best = jnp.argmin(costs)
        improved = costs[best] < cost
        X_new = jnp.where(improved, Xc[best], X)
        W_new = jnp.where(improved, Wc[best], W)
        cost_new = jnp.minimum(costs[best], cost)
        alpha_used = jnp.where(improved, alphas[best], 0.0)
        return (X_new, W_new, cost_new), (kffs, Kfbs, alpha_used)

    X0_traj, cost0 = rollout(W_init)
    (X, W, cost), (kffs, Kfbs, alpha) = jax.lax.scan(
        iteration, (X0_traj, W_init, cost0), None,
        length=settings.num_iterations)
    return IlqrSolution(X=X, W=W, cost=cost,
                        K=jax.tree_util.tree_map(lambda a: a[-1], Kfbs),
                        alpha=alpha[-1])
