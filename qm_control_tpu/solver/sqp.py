"""Multiple-shooting SQP (Gauss-Newton) with a Riccati LQ backend.

The TPU-native equivalent of OCS2's SqpMpc (multiple-shooting SQP with the
HPIPM structured-LQ backend; reference task.info:75-92, instantiated at
QMController.cpp:287). Unlike single-shooting iLQR (solver/ilqr.py), the
state trajectory is a DECISION VARIABLE: dynamics enter as defect
constraints

    d_k = f(x_k, w_k) - x_{k+1}            (driven to 0 by the SQP)

so an unstable system over a long horizon never produces a diverging
rollout — the exact reason the reference chose multiple shooting for the
1.0 s centroidal horizon, and the reason iLQR stalls on it (verified:
open-loop tails blow up within the horizon).

One SQP iteration (sqpIteration=1 in the reference, run at 100 Hz with
warm starts):
  1. linearize dynamics + quadratize cost at (X, W) — vmapped over nodes;
  2. Riccati backward sweep WITH defect (affine) terms — lax.scan;
  3. parallel line search: for each step length alpha, the linear forward
     pass  dw = alpha k + K dx,  dx' = A dx + B dw + alpha d  closes
     defects by (1-alpha); candidates scored by an L1 merit
     cost + nu |d|_1 and the best taken (all candidates evaluated at once
     via vmap — no serial backtracking).

Same closure contract as ilqr_solve: dynamics(kd, x, w), stage_cost,
final_cost, optional stage_quad/final_quad (Gauss-Newton quadratizers).
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SqpSettings(NamedTuple):
    num_iterations: int = 1          # task.info sqp.sqpIteration
    reg: float = 1e-5                # Levenberg shift on Quu
    merit_nu: float = 1e4            # L1 defect penalty (best-iterate
    # tie-break only; step ACCEPTANCE is the filter below — see g_max)
    # Filter line search (the acceptance rule OCS2's own SQP uses; its
    # parameters are the reference's task.info:82-83 g_max/g_min).
    # Round-3 finding: a fixed L1-merit acceptance with nu=1e4 FROZE
    # every warm-started re-solve whose target had moved — from a
    # defect-free warm point, any step's O(alpha^2) linearization
    # defects cost more under nu than the tracking improvement gains,
    # so all candidates were rejected, the MPC returned its warm start
    # verbatim, and the closed loop could never track a moving command
    # (measured: commanded 0.3 m/s, achieved 0.0 from warm vs 0.2
    # planned from cold). The filter accepts cost progress while
    # defects stay within g_max, and drives defects first when they
    # exceed it.
    g_max: float = 1e-2              # task.info sqp.g_max
    g_min: float = 1e-6              # task.info sqp.g_min
    # 4 parallel step-length candidates (each costs one full merit
    # evaluation; 4 covers warm-started MPC well — maxStepLength 1.0,
    # minStepLength 1e-2 per the reference line-search bounds)
    alphas: tuple = (1.0, 0.5, 0.15, 0.03)
    # True: contraction-unrolled matmuls + masked Cholesky in the Riccati
    # sweep — lane-parallel over a scenario BATCH (7.7x throughput at
    # B=256). False: plain dot_general/linalg — fewer, bigger sequential
    # ops, better for single-scenario latency (B=1 real-time mode).
    unrolled_ops: bool = True
    # True: associative-scan Riccati + prefix-scan rollout
    # (solver.pariccati) — ceil(log2 N) rounds instead of N dependent
    # steps; the sequence-axis parallelism of the horizon (SURVEY §5).
    # MEASURED on a v5e at B=1 (round 3): 3.93 ms/solve vs 1.54 ms for
    # the serial sweep — the log-depth win is swamped by each round's
    # large 30x30 element compositions at N=67, so OFF is the measured
    # default for both the B=1 and batched paths. The variant stays for
    # longer horizons where log-depth eventually wins. Round-5
    # re-measure at B=256: 238 vs 3690 solves/s full-step — the batched
    # combine's (B,N,30,30) linalg.solve rounds swamp the log-depth win
    # at batch too; OFF remains the measured default everywhere.
    parallel_riccati: bool = False
    # lax.scan unroll factor for the backward sweep and forward
    # rollouts: the backward step's serial 30-step unrolled Cholesky
    # lowers to many tiny kernels (measured 258 us/node at B=256, 17
    # GB/s, 0.6 MFLOP — pure launch/serialization overhead); unrolling
    # the horizon scan lets XLA fuse across steps.
    scan_unroll: int = 1


class SqpSolution(NamedTuple):
    X: jnp.ndarray          # (N+1, nx)
    W: jnp.ndarray          # (N, nw)
    cost: jnp.ndarray       # scalar: cost at the returned iterate
    defect: jnp.ndarray     # scalar: max |defect| at the returned iterate
    K: jnp.ndarray          # (N, nw, nx) feedback gains of the last sweep
    alpha: jnp.ndarray      # accepted step length of the last iteration


def sqp_solve(dynamics, stage_cost, final_cost, node_data, final_data,
              x0, X_init, W_init, settings: SqpSettings = SqpSettings(),
              stage_quad=None, final_quad=None,
              cost_and_dynamics=None, stage_linearize=None) -> SqpSolution:
    """Minimize sum_k l_k(x_k, w_k) + lf(x_N)  s.t.  x_{k+1} = f_k(x_k, w_k),
    x_0 = x0, starting from the (possibly infeasible) iterate (X_init, W_init).

    A good cold-start X_init is simply tile(x0) — bounded by construction
    (the OCS2 initializer does exactly this, QMInitializer.cpp:35-40).
    """
    N, nw = W_init.shape
    nx = x0.shape[0]
    reg = settings.reg
    nu = settings.merit_nu

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

    if cost_and_dynamics is None:
        def cost_and_dynamics(kd, x, w):
            return stage_cost(kd, x, w), dynamics(kd, x, w)

    def merit(X, W):
        # fused: one pass computes stage costs AND next states (shares
        # the FK-heavy input reparameterization); returns the raw cost
        # too so the final iterate needs no extra evaluation pass
        costs, f = jax.vmap(cost_and_dynamics)(node_data, X[:-1], W)
        d = f - X[1:]
        total = jnp.sum(costs) + final_cost(final_data, X[-1])
        return total + nu * jnp.sum(jnp.abs(d)), total, d

    if stage_linearize is not None:
        # fused per-node linearization: ONE jacfwd through the combined
        # (dynamics, input-map) yields A, B and the cost quadratization
        # together (the FK-heavy input reparameterization is traced once)
        def linearize(X, W):
            def node(kd, x, w):
                A, B, _, lx, lw, lxx, lww, lwx = stage_linearize(kd, x, w)
                return A, B, lx, lw, lxx, lww, lwx
            return jax.vmap(node)(node_data, X[:-1], W)
    else:
        def linearize(X, W):
            def node(kd, x, w):
                # one jacfwd over the concatenated (x, w) gives A and B in
                # a single traced jvp body (halves the dynamics-trace cost)
                AB = jax.jacfwd(
                    lambda z: dynamics(kd, z[:nx], z[nx:]))(
                        jnp.concatenate([x, w]))
                A, B = AB[:, :nx], AB[:, nx:]
                _, lx, lw, lxx, lww, lwx = stage_quad(kd, x, w)
                return A, B, lx, lw, lxx, lww, lwx
            return jax.vmap(node)(node_data, X[:-1], W)

    def backward(A, B, lx, lu, lxx, luu, lux, d, VxN, VxxN):
        if settings.parallel_riccati:
            from .pariccati import parallel_backward
            return parallel_backward(A, B, lx, lu, lxx, luu, lux, d,
                                     VxN, VxxN, reg)
        # contraction-unrolled matmuls + unrolled Cholesky: batched 30x30
        # dot_generals/LU pad to 128 on the MXU (~1% efficiency); the
        # unrolled forms run as fused elementwise VPU work (models/smallmat)
        if settings.unrolled_ops:
            from ..models.smallmat import (mm_unrolled, mtm_unrolled,
                                           mtv_unrolled, mv_unrolled,
                                           spd_solve_unrolled)
        else:
            mm_unrolled = lambda X, Y: X @ Y
            mtm_unrolled = lambda X, Y: jnp.swapaxes(X, -1, -2) @ Y
            mv_unrolled = lambda X, v: (X @ v[..., None])[..., 0]
            mtv_unrolled = lambda X, v: (jnp.swapaxes(X, -1, -2)
                                         @ v[..., None])[..., 0]
            spd_solve_unrolled = jnp.linalg.solve

        def bstep(carry, inp):
            Vx, Vxx = carry
            A, B, lx, lu, lxx, luu, lux, d = inp
            # affine (defect) term: value gradient evaluated at x' + d
            Vxd = Vx + mv_unrolled(Vxx, d)
            Qx = lx + mtv_unrolled(A, Vxd)
            Qu = lu + mtv_unrolled(B, Vxd)
            VA = mm_unrolled(Vxx, A)
            Qxx = lxx + mtm_unrolled(A, VA)
            Quu = luu + mtm_unrolled(B, mm_unrolled(Vxx, B))
            Qux = lux + mtm_unrolled(B, VA)
            Quu_reg = 0.5 * (Quu + jnp.swapaxes(Quu, -1, -2)) \
                + reg * jnp.eye(nw, dtype=Quu.dtype)
            kK = spd_solve_unrolled(
                Quu_reg, jnp.concatenate([Qu[..., None], Qux], axis=-1))
            kff, Kfb = -kK[..., 0], -kK[..., 1:]
            Quu_k = mv_unrolled(Quu, kff)
            Vx_new = Qx + mtv_unrolled(Kfb, Quu_k) + mtv_unrolled(Kfb, Qu) \
                + mtv_unrolled(Qux, kff)
            KQux = mtm_unrolled(Kfb, Qux)
            Vxx_new = Qxx + mtm_unrolled(Kfb, mm_unrolled(Quu, Kfb)) \
                + KQux + jnp.swapaxes(KQux, -1, -2)
            Vxx_new = 0.5 * (Vxx_new + jnp.swapaxes(Vxx_new, -1, -2))
            return (Vx_new, Vxx_new), (kff, Kfb)
        (_, _), (kffs, Kfbs) = jax.lax.scan(
            bstep, (VxN, VxxN), (A, B, lx, lu, lxx, luu, lux, d),
            reverse=True, unroll=settings.scan_unroll)
        return kffs, Kfbs

    def linear_forward(X, W, A, B, d, kffs, Kfbs, alpha):
        """dx' = A dx + B dw + alpha d;  dw = alpha k + K dx."""
        if settings.parallel_riccati:
            from .pariccati import parallel_linear_forward
            return parallel_linear_forward(X, W, A, B, d, kffs, Kfbs,
                                           alpha)
        if settings.unrolled_ops:
            from ..models.smallmat import mv_unrolled
        else:
            mv_unrolled = lambda M, v: (M @ v[..., None])[..., 0]

        def step(dx, inp):
            A, B, dk, kff, Kfb = inp
            dw = alpha * kff + mv_unrolled(Kfb, dx)
            dx_next = mv_unrolled(A, dx) + mv_unrolled(B, dw) + alpha * dk
            return dx_next, (dx, dw)
        dxN, (dX, dW) = jax.lax.scan(
            step, jnp.zeros(nx, dtype=x0.dtype), (A, B, d, kffs, Kfbs),
            unroll=settings.scan_unroll)
        dX = jnp.concatenate([dX, dxN[None]], axis=0)
        return X + dX, W + dW

    g_max = settings.g_max
    g_min = settings.g_min

    def iteration(carry, _):
        X, W, cost_cur, vio_cur, d = carry
        A, B, lx, lu, lxx, luu, lux = linearize(X, W)
        _, VxN, VxxN = final_quad(final_data, X[-1])
        VxxN = 0.5 * (VxxN + VxxN.T)
        kffs, Kfbs = backward(A, B, lx, lu, lxx, luu, lux, d, VxN, VxxN)
        alphas = jnp.asarray(settings.alphas, dtype=X.dtype)

        def candidate(alpha):
            Xc, Wc = linear_forward(X, W, A, B, d, kffs, Kfbs, alpha)
            _, cc, dc = merit(Xc, Wc)
            return Xc, Wc, cc, jnp.sum(jnp.abs(dc)), dc
        Xc, Wc, cc, vc, dc = jax.vmap(candidate)(alphas)
        finite = jnp.isfinite(cc) & jnp.isfinite(vc)
        cc = jnp.where(finite, cc, jnp.inf)
        vc = jnp.where(finite, vc, jnp.inf)
        # Filter acceptance (OCS2 SQP semantics; task.info g_max/g_min):
        #  - infeasible phase (violation > g_max): a step must cut the
        #    violation; cost is secondary;
        #  - feasible phase: a step must cut the cost while keeping the
        #    violation within the g_max corridor (linearization defects
        #    of an accepted step are re-contracted by later iterations).
        feasible = vio_cur <= g_max
        acc_inf = vc < (1.0 - 1e-4) * vio_cur
        acc_fea = (cc < cost_cur) & (vc <= jnp.maximum(
            g_max, vio_cur + g_min))
        accept = jnp.where(feasible, acc_fea, acc_inf) & finite
        score = jnp.where(accept, jnp.where(feasible, cc, vc), jnp.inf)
        best = jnp.argmin(score)
        improved = accept[best]
        X_new = jnp.where(improved, Xc[best], X)
        W_new = jnp.where(improved, Wc[best], W)
        d_new = jnp.where(improved, dc[best], d)
        c_new = jnp.where(improved, cc[best], cost_cur)
        v_new = jnp.where(improved, vc[best], vio_cur)
        alpha_used = jnp.where(improved, alphas[best], 0.0)
        return (X_new, W_new, c_new, v_new, d_new), (Kfbs, alpha_used)

    X0 = X_init.at[0].set(x0)
    _, c0, d0 = merit(X0, W_init)
    (X, W, cost, _, d_final), (Kfbs, alpha) = jax.lax.scan(
        iteration, (X0, W_init, c0, jnp.sum(jnp.abs(d0)), d0), None,
        length=settings.num_iterations)
    return SqpSolution(X=X, W=W, cost=cost,
                       defect=jnp.max(jnp.abs(d_final)),
                       K=jax.tree_util.tree_map(lambda a: a[-1], Kfbs),
                       alpha=alpha[-1])
