"""Hierarchical (lexicographic) null-space QP cascade.

Replicates the reference's HoQp (qm_wbc/src/HoQp.cpp:12-158) with static
shapes:

  level p:  min_z,v  0.5|A_p(x + Z z) - b_p|^2 + 0.5|v|^2
            s.t.     D_p(x + Z z) <= f_p + v,   v >= 0,
                     D_q(x + Z z) <= f_q + v_q*   for all q < p

  then x <- x + Z z*,  Z <- Z P  with P the (damped) projector onto
  ker(A_p Z).

Differences from the reference, driven by jit/vmap (SURVEY.md §7 hard
part #1): the null-space basis is a square projector-composed matrix
(rank encoded numerically) instead of a shape-changing kernel basis from
a full-pivot LU (HoQp.cpp:126-133), and each level is solved by the
fixed-iteration interior-point solver in qp.py instead of qpOASES.
"""
from typing import List, Sequence

import jax.numpy as jnp

from .qp import solve_qp
from .tasks import NUM_DECISION_VARS, Task

_EPS_H = 1e-6       # ridge on the level Hessian (HoQp.cpp:70 uses 1e-12)
_EPS_NULL = 1e-7    # damping of the null-space projector
CLAMP_CARRIED = False  # trace-time switch: clamp carried inequality
# slacks h_q = f_q - D_q x + v_q* to >= 0. Exact arithmetic guarantees
# h_q >= 0 at z = 0 (the previous level certified feasibility with its
# optimal violation v_q*); any negative value is pure f32 drift, and
# presenting the IP with an infeasible-at-origin carried row is what
# destabilized the exact-basis cascade in closed loop (see USE_QR_BASIS).
USE_QR_BASIS = False  # trace-time switch: exact-zero QR kernel basis vs
# the damped projector. Default OFF after a round-2 closed-loop study:
# the exact basis leaves later levels with only the true kernel
# dimensions, and f32 drift in carried inequalities (h = f - Dx + v*)
# then presents them with numerically-violated constraints they cannot
# reach — the fixed-iteration IP pushes its few free dimensions to
# |z| ~ 1e4 and the loop diverges within ~10 ms of gait. The damped
# projector's ~1e-7 leakage keeps every constraint direction slightly
# reachable, diffusing that pressure — an accidental but load-bearing
# regularization. The QR basis remains available for open-loop use and
# is exercised by tests/test_kernels.py.


def _kernel_projector(Az):
    """P ~ I - Az^+ Az with damped pseudo-inverse (static shapes; masked
    zero rows simply do not reduce the kernel)."""
    m, n = Az.shape
    gram = Az @ Az.T
    lam = _EPS_NULL * (jnp.trace(gram) / m + 1.0)
    inv = jnp.linalg.solve(gram + lam * jnp.eye(m, dtype=Az.dtype), Az)
    return jnp.eye(n, dtype=Az.dtype) - Az.T @ inv


def _kernel_basis(Az, rel_tol=1e-5):
    """Orthonormal basis of ker(Az) as an (nx, nx) matrix whose non-kernel
    columns are EXACT zeros (static shapes, dynamic rank mask).

    Why not the damped projector: composing square damped projectors
    leaves the pruned directions present at the ~1e-7 damping scale, so
    every later level's Hessian mixes them in numerically and the ridge
    (_EPS_H) is all that pins them — f32 solves then amplify rounding
    noise by 1/eps into torque-scale junk (measured ~30 Nm vs an f64
    ground truth on live walking stacks, tests/helpers_f64.py). With an
    orthonormal basis whose masked columns are exact zeros, the inert
    coordinates stay EXACTLY zero through the whole interior-point
    iteration (their gradient, constraint and Hessian couplings are exact
    zeros), independent of eps.

    Implementation: the same column-pivoted Householder QR the fused
    Pallas kernel runs (kernels.hoqp_fused._kernel_basis_qr) — a
    fori_loop of rank-1 reflector updates rather than jnp.linalg.qr,
    whose LAPACK-style lowering is pathologically slow to compile and
    run on TPU. Column pivoting by norm makes it rank-revealing (the
    contact-masked task rows are exact zeros and sort themselves out);
    pivot norms <= rel_tol * (largest pivot norm) mark kernel columns.
    Mirrors the role of the reference's full-pivot LU kernel basis
    (qm_wbc/src/HoQp.cpp:126-133) with jit-static shapes."""
    from ..kernels.hoqp_fused import LANES, _eye, _kernel_basis_qr
    m, n = Az.shape
    Azp = jnp.zeros((LANES, LANES), jnp.float32).at[:m, :n].set(Az)
    K = _kernel_basis_qr(Azp, m, _eye(), n, rel_tol=rel_tol)
    return K[:n, :n].astype(Az.dtype)


def hoqp_solve(tasks: Sequence[Task], qp_iters: int = 15):
    """Solve the lexicographic cascade; tasks ordered highest priority
    first. Returns the optimal decision vector x (36,).

    qp_iters: fixed Mehrotra-IP iteration count per level. On the
    realistic WBC stacks (incl. flying/two-contact modes) the solver's
    convergence gate freezes the iterate by iteration ~11 (measured:
    torques identical to a 25-iteration solve); 15 keeps margin while
    holding the 2 ms real-time budget (each iteration is a sequential
    ~90-dim factorization — the WBC's latency driver)."""
    nx = NUM_DECISION_VARS
    dtype = tasks[0].A.dtype
    x = jnp.zeros(nx, dtype=dtype)
    Z = jnp.eye(nx, dtype=dtype)
    prev: List = []    # [(D, f, v_opt)] accumulated inequality levels

    for task in tasks:
        ma, nv = task.A.shape[0], task.D.shape[0]
        Az = task.A @ Z                                   # (ma, nx)
        H_z = Az.T @ Az + _EPS_H * jnp.eye(nx, dtype=dtype)
        c_z = Az.T @ (task.A @ x - task.b)

        G_rows, h_rows = [], []
        if nv > 0:
            # -v <= 0
            G_rows.append(jnp.concatenate(
                [jnp.zeros((nv, nx), dtype=dtype),
                 -jnp.eye(nv, dtype=dtype)], axis=1))
            h_rows.append(jnp.zeros(nv, dtype=dtype))
        for (Dq, fq, vq) in prev:
            G_rows.append(jnp.concatenate(
                [Dq @ Z, jnp.zeros((Dq.shape[0], nv), dtype=dtype)], axis=1))
            hq = fq - Dq @ x + vq
            h_rows.append(jnp.maximum(hq, 0.0) if CLAMP_CARRIED else hq)
        if nv > 0:
            G_rows.append(jnp.concatenate(
                [task.D @ Z, -jnp.eye(nv, dtype=dtype)], axis=1))
            h_rows.append(task.f - task.D @ x)

        H = jnp.zeros((nx + nv, nx + nv), dtype=dtype)
        H = H.at[:nx, :nx].set(H_z)
        if nv > 0:
            H = H.at[nx:, nx:].set(jnp.eye(nv, dtype=dtype))
        c = jnp.concatenate([c_z, jnp.zeros(nv, dtype=dtype)])

        if G_rows:
            G = jnp.concatenate(G_rows, axis=0)
            h = jnp.concatenate(h_rows)
            sol = solve_qp(H, c, G, h, num_iters=qp_iters)
            zv = sol.x
        else:
            zv = jnp.linalg.solve(H, -c)
        z, v = zv[:nx], zv[nx:]

        x = x + Z @ z
        if nv > 0:
            prev.append((task.D, task.f, v))
        if ma > 0:
            Z = Z @ (_kernel_basis(Az) if USE_QR_BASIS
                     else _kernel_projector(Az))
    return x
