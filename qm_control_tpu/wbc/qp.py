"""Dense inequality-constrained QP via fixed-iteration Mehrotra
predictor-corrector interior point — the TPU-native replacement for qpOASES.

The reference solves each hierarchical-WBC level with qpOASES' dense
active-set method, nWSR=100 (qm_wbc/src/HoQp.cpp:135-150). Active-set
pivoting is data-dependent control flow — hostile to jit/vmap (SURVEY.md
§7 hard part #1) — so we run a FIXED number of interior-point iterations:
every scenario in a batch executes the same instruction stream.

    minimize    0.5 x'Hx + c'x
    subject to  G x <= h

Robustness devices (all branch-free, validated on random SPD QPs in
tests/test_qp.py):
  - Mehrotra predictor-corrector with separate primal/dual step lengths;
  - a convergence GATE: once (mu, primal residual) are below tolerance the
    step length is multiplied by 0 — iterations past convergence become
    no-ops instead of destabilizing (fixed-count loops otherwise re-excite
    the iterate through the s->0 floors);
  - best-iterate tracking by KKT merit: the returned solution is the best
    seen, not the last.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

EQUILIBRATE = True   # Jacobi equilibration (trace-time switch)


def _pd_inverse(M):
    """Inverse of a nominally-PD matrix by Gauss-Jordan with diagonal
    pivoting and a pivot floor — the no-NaN replacement for cho_factor.

    Why not Cholesky: the IP Newton matrix M = H + G' diag(d) G mixes
    d ~ 1e8 active-constraint curvature with eps ~ 1e-6 ridge dims;
    f32 Gram cancellation (~|M| * 1e-7) can push a weak leading-minor
    pivot negative, and cho_factor then emits sqrt(<0) = NaN that
    poisons the whole control cycle (observed in closed loop the moment
    a constraint became strongly active). Diagonal pivoting eliminates
    the large pivots first, and the floor turns a numerically-broken
    pivot into a bounded (merit-gated, best-iterate-protected) step
    instead of NaN. Same algorithm as the fused Pallas kernel's
    _gj_inverse — the two paths share failure semantics."""
    n = M.shape[0]
    dtype = M.dtype
    eye_n = jnp.eye(n, dtype=dtype)
    aug0 = jnp.concatenate([M, eye_n], axis=1)
    floor = 1e-10 * (jnp.sum(jnp.abs(jnp.diagonal(M))) / n + 1.0)
    neg = jnp.asarray(-3e38, dtype=dtype)

    def step(_, carry):
        aug, elim = carry
        diag = jnp.diagonal(aug[:, :n])
        j = jnp.argmax(jnp.where(elim, neg, diag))
        col = aug[:, j]
        row = aug[j]
        piv = row[j]
        piv = jnp.where(jnp.abs(piv) < floor,
                        jnp.where(piv < 0, -floor, floor), piv)
        r = row / piv
        aug = aug - col[:, None] * r[None, :]
        aug = aug.at[j].set(r)
        elim = elim.at[j].set(True)
        return aug, elim

    aug, _ = jax.lax.fori_loop(
        0, n, step, (aug0, jnp.zeros(n, dtype=bool)))
    return aug[:, n:]


def _pd_solve(Minv, M_mv, rhs):
    """Minv rhs with two iterative-refinement steps against the matvec
    M_mv. When M_mv is factor-form (A'(Ax) + ... instead of the
    materialized Gram), refinement converges to the EXACT operator's
    solution — the materialized Gram's fixed f32 perturbation
    (~36u * maxdiag, large enough to flip weak eigenvalues) only degrades
    the preconditioner, not the answer."""
    x = Minv @ rhs
    x = x + Minv @ (rhs - M_mv(x))
    return x + Minv @ (rhs - M_mv(x))


class QpSolution(NamedTuple):
    x: jnp.ndarray          # (n,) primal solution
    lam: jnp.ndarray        # (m,) inequality multipliers
    s: jnp.ndarray          # (m,) slacks  (G x + s = h)
    gap: jnp.ndarray        # scalar final duality measure


def solve_qp(H, c, G, h, num_iters: int = 25, tau: float = 0.995,
             gate_tol: float = 1e-6, inactive_h: float = 5e5,
             H_mv=None) -> QpSolution:
    """Solve the inequality QP with `num_iters` fixed IP iterations.

    All shapes static: H (n,n), c (n,), G (m,n), h (m,). Structurally
    inactive rows — zero G rows, or bounds pushed to +BIG (>= inactive_h)
    by the contact-masking convention (tasks.MASK_BIG) — are EXCLUDED
    from the interior-point statistics: their slacks otherwise dominate
    the duality measure mu (s_i ~ 1e6 vs real slacks ~1), and Mehrotra's
    centering then targets sigma*mu ~ 1e4 complementarity products on
    the REAL rows, which blows the iterate up (measured: |z| ~ 1e15 on
    3-contact WBC stacks before this mask). Exact semantics: an excluded
    row is never tight, so dropping it does not change the solution.
    """
    n = c.shape[0]
    m = h.shape[0]
    dtype = c.dtype
    eye_n = jnp.eye(n, dtype=dtype)

    # structurally-inactive row mask (exact; see docstring)
    act = ((jnp.sum(jnp.abs(G), axis=1) > 1e-12)
           & (h < inactive_h)).astype(dtype)
    m_act = jnp.maximum(jnp.sum(act), 1.0)
    G = G * act[:, None]
    h = jnp.where(act > 0, h, 1.0)   # inert rows: 0 x <= 1, s = 1, lam = 0

    # Jacobi equilibration: x = S x'', S = diag(1/sqrt(H_kk)). A pure
    # reparameterization (exact solution unchanged), but it flattens the
    # 1e10 spread between heavily-weighted task rows (swing x100 -> 1e4
    # in H) and ridge-only dims (H_kk = 1e-6) to a unit diagonal — the
    # spread otherwise turns f32 factorizations into torque-scale noise
    # (measured vs the f64 referee in tests/helpers_f64.py).
    if EQUILIBRATE:
        s_eq = jax.lax.rsqrt(jnp.clip(jnp.diagonal(H), 1e-12, None))
        H = H * s_eq[:, None] * s_eq[None, :]
        c = c * s_eq
        G = G * s_eq[None, :]
    else:
        s_eq = jnp.ones(n, dtype=dtype)
    # factor-form H matvec mapped into the equilibrated coordinates
    # (x = s_eq * x'' => H'' x'' = s_eq * H_mv(s_eq * x''))
    H_mv_eq = ((lambda x: s_eq * H_mv(s_eq * x)) if H_mv is not None
               else (lambda x: H @ x))

    x0 = jnp.linalg.solve(H + 1e-8 * eye_n, -c)
    s0 = jnp.maximum(h - G @ x0, 1.0) * act + (1.0 - act)
    lam0 = act
    scale = jnp.maximum(1.0, jnp.linalg.norm(c))

    def merit(x, s, lam):
        r_d = H_mv_eq(x) + c + G.T @ lam
        viol = jnp.maximum(G @ x - h, 0.0) * act
        return (jnp.sum(r_d * r_d) + 100.0 * jnp.sum(viol * viol)
                + jnp.sum(jnp.abs(s * lam) * act))

    big = jnp.asarray(1e30, dtype=dtype)

    def maxstep(v, dv):
        """max alpha in [0,1] with v + alpha dv >= 0 on active rows."""
        return jnp.minimum(1.0, jnp.min(jnp.where((dv < 0) & (act > 0),
                                                  -v / dv, big)))

    def body(carry, _):
        x, s, lam, bx, bs, blam, bm = carry
        s = jnp.maximum(s, 1e-9)
        lam = jnp.maximum(lam, 1e-12) * act
        r_d = H_mv_eq(x) + c + G.T @ lam
        r_p = (G @ x + s - h) * act
        mu = jnp.dot(s * act, lam) / m_act
        # gate on the dual residual too (see kernels.hoqp_fused._ip_solve:
        # gating on (mu, r_p) alone freezes warm-started iterates at the
        # previous problem's optimum)
        gate = jnp.where((mu < gate_tol * scale)
                         & (jnp.max(jnp.abs(r_p)) < gate_tol * scale)
                         & (jnp.max(jnp.abs(r_d)) < 1e-4 * scale),
                         0.0, 1.0).astype(dtype)
        d = jnp.clip(lam / s, 1e-12, 1e8) * act
        M = H + G.T @ (d[:, None] * G)
        Minv = _pd_inverse(M)
        # Newton solves refine against the MATERIALIZED M: with d up to
        # 1e8, a factor-form residual G'(d*(Gx)) amplifies f32 matvec
        # noise by d and diverges (measured: 3x worse torques); the
        # materialized form keeps |I - Minv M| small regardless of scale.
        solveM = lambda rhs: _pd_solve(Minv, lambda x: M @ x, rhs)
        # predictor (affine direction)
        rc_aff = (-s * lam + lam * r_p) / s
        dx_a = solveM(-(r_d + G.T @ rc_aff))
        ds_a = -r_p - G @ dx_a
        dl_a = (-s * lam - lam * ds_a) / s
        ap_a = maxstep(s, ds_a)
        ad_a = maxstep(lam, dl_a)
        mu_aff = jnp.dot((s + ap_a * ds_a) * act,
                         lam + ad_a * dl_a) / m_act
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-12)) ** 3, 1e-4, 1.0)
        # corrector
        rc = (sigma * mu - s * lam - ds_a * dl_a + lam * r_p) / s * act
        dx = solveM(-(r_d + G.T @ rc))
        ds = -r_p - G @ dx
        dlam = (sigma * mu - s * lam - ds_a * dl_a - lam * ds) / s * act
        ap = gate * tau * maxstep(s, ds)
        ad = gate * tau * maxstep(lam, dlam)
        x = x + ap * dx
        s = s + ap * ds
        lam = lam + ad * dlam
        mm = merit(x, s, lam)
        take = mm < bm
        bx = jnp.where(take, x, bx)
        bs = jnp.where(take, s, bs)
        blam = jnp.where(take, lam, blam)
        bm = jnp.minimum(mm, bm)
        return (x, s, lam, bx, bs, blam, bm), None

    init = (x0, s0, lam0, x0, s0, lam0, merit(x0, s0, lam0))
    (x, s, lam, bx, bs, blam, _), _ = jax.lax.scan(body, init, None,
                                                   length=num_iters)
    return QpSolution(x=bx * s_eq, lam=blam, s=bs,
                      gap=jnp.dot(bs * act, blam) / m_act)


def solve_eq_qp(H, c):
    """Equality/unconstrained helper: x = -H^{-1} c (H PSD + ridge)."""
    n = c.shape[0]
    return jnp.linalg.solve(H + 1e-8 * jnp.eye(n, dtype=c.dtype), -c)
