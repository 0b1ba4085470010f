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

_EPS_H = 3e-6       # RELATIVE ridge on the level Hessian, scaled by the
# Gram's max diagonal. The reference uses an absolute 1e-12 in f64 where
# Gram rounding is ~u*|H| ~ 1e-13; the f32 analog must track |H|: the f32
# Gram A'A carries rounding that can flip weak eigenvalues NEGATIVE
# (measured min eig -7e-6 on a 3-contact walking stack whose maxdiag is
# 1321 — an ABSOLUTE 1e-6 ridge is below that, and the IP rides the
# negative curvature to |z| ~ 1e15). The measured indefiniteness is
# ~5e-9 RELATIVE to maxdiag; 3e-6*maxdiag dominates it ~600x. The value
# is the measured bias/noise sweet spot vs the f64 referee (bias grows
# with the ridge, factorization noise with its inverse): 3e-6 gives
# 0.6/0.9/1.1 Nm max on stance/trot/3-contact stacks vs 1.7-2.7 Nm at
# 1e-5 or 1e-6 (tools/diag_wbc_numerics.py).
_EPS_NULL = 1e-7    # damping of the null-space projector. Unlike _EPS_H
# this does NOT need to dominate the Gram's f32 rounding: the damped
# pseudo-inverse goes through a pivoted LU solve (nonsingularity, not
# positive-definiteness, is what matters), and raising the damping was
# measured to ADD torque bias (leakage ~ damping into pruned directions:
# 1e-5 cost ~2-8 Nm vs the f64 referee; 1e-7 matches it).
CLAMP_CARRIED = True   # trace-time switch: clamp carried inequality
# slacks h_q = f_q - D_q x + v_q* to >= 0. Exact arithmetic guarantees
# h_q >= 0 at z = 0 (the previous level certified feasibility with its
# optimal violation v_q*); any negative value is pure f32 drift, and
# presenting the IP with an infeasible-at-origin carried row is what
# destabilized the exact-basis cascade in closed loop (see USE_QR_BASIS).
USE_QR_BASIS = False  # trace-time switch: exact-zero QR kernel basis vs
# the damped projector. Default OFF: with the round-3 numerics (act-mask
# IP + relative ridge) the damped projector measures 0.6-1.6 Nm from the
# f64 referee across stance/trot/transient stacks while the QR basis
# measures 5-8 Nm (tools/diag_wbc_numerics.py) — the projector is now
# simply the more accurate cascade, not an accidental regularizer.


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


DEFAULT_QP_ITERS = 10   # module-level so closed-loop A/B sweeps can
# patch it without threading a parameter through every call site


def hoqp_solve(tasks: Sequence[Task], qp_iters: int = None):
    """Solve the lexicographic cascade; tasks ordered highest priority
    first. Returns the optimal decision vector x (36,).

    qp_iters: fixed Mehrotra-IP iteration count per level. Round-3
    numerics needed 15-20 ("the last ~0.7 Nm arrives between iterations
    15 and 20"); with the round-4/5 solver (dual-residual convergence
    gate, refined Schur solves) a live-stack sweep measured per-level
    objectives CONVERGED at k=6 on 25 consecutive mid-trot closed-loop
    stacks (tools/diag_wbc_iters_live.py: worst dobj ~3e-4 of a ~20
    objective scale at k=6, flat through k=40). Default 10 keeps a 1.7x
    margin and nearly halves both the B=1 kernel latency and the
    batched-fleet cost."""
    nx = NUM_DECISION_VARS
    dtype = tasks[0].A.dtype
    if qp_iters is None:
        qp_iters = DEFAULT_QP_ITERS
    x = jnp.zeros(nx, dtype=dtype)
    Z = jnp.eye(nx, dtype=dtype)
    prev: List = []    # [(D, f, v_opt)] accumulated inequality levels

    for task in tasks:
        ma, nv = task.A.shape[0], task.D.shape[0]
        Az = task.A @ Z                                   # (ma, nx)
        gram = Az.T @ Az
        ridge = _EPS_H * (jnp.max(jnp.diagonal(gram)) + 1e-3)
        H_z = gram + ridge * jnp.eye(nx, dtype=dtype)
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

        def H_mv(zv, Az=Az, ridge=ridge, nv=nv):
            """Factor-form H matvec: Az'(Az z) + ridge z (+ slack I block)
            — refinement against this converges past the materialized
            Gram's f32 perturbation (see qp._pd_solve)."""
            z = zv[:nx]
            out_z = Az.T @ (Az @ z) + ridge * z
            return out_z if nv == 0 else jnp.concatenate([out_z, zv[nx:]])

        if G_rows:
            G = jnp.concatenate(G_rows, axis=0)
            h = jnp.concatenate(h_rows)
            sol = solve_qp(H, c, G, h, num_iters=qp_iters, H_mv=H_mv)
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
