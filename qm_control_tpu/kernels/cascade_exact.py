"""Exact-size hierarchical-WBC cascade for the BATCHED path.

The Mosaic kernel (kernels.hoqp_fused) computes on (128,128)-padded
buffers — the right layout for a single-scenario pallas_call, but pure
waste under vmap: a batched solve spends its time in ~36-row problems
embedded in 128-lane matmuls and (B,128,128) Gauss-Jordan rank-1
updates, >70 % of every pass masked zeros (round-4 VERDICT: the batched
fleet is WBC-bound at 1595 solves/s with the cost spread over ~360
padded 128x128 HIGHEST matmuls per solve).

This module is the SAME no-pivot cascade math (identical IP:
kernels.hoqp_fused._ip_solve is shape-agnostic and shared; identical
diagonal-pivot Gauss-Jordan, expressed on exact (36,36)/(56,36) arrays
with one-hot pivot selection instead of argmax+gather — the pattern
that made the padded XLA math 2.8x faster than wbc.qp's pivoted solver
under vmap). XLA pads to hardware tiles internally, but the sublane
extents and the GJ work now track the true problem size.

Reference counterpart: qpOASES solving each HoQp level
(qm_wbc/src/HoQp.cpp:135-150) — warm-started across ticks via nWSR on
the prior active set; here via the warm primal/dual carry (see
hoqp_fused._ip_solve's warm contract).
"""
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..wbc.tasks import NUM_DECISION_VARS, Task
from .hoqp_fused import _EPS_H, _EPS_NULL, _ip_solve


def _gj_inverse_exact(M, floor_rel=1e-10):
    """Diagonal-pivot Gauss-Jordan inverse of an SPD (n,n) matrix with a
    pivot floor — hoqp_fused._gj_inverse on exact shapes. Pivot rows are
    selected with one-hot max vectors (vmap-friendly: no argmax gather,
    every lane does identical work)."""
    n = M.shape[0]
    dtype = M.dtype
    ids = jnp.arange(n)
    neg = jnp.asarray(-3e38, dtype=dtype)
    floor = floor_rel * (jnp.trace(M) / n + 1.0)

    def step(_, carry):
        L, R, elim = carry
        diag = jnp.diagonal(L)
        cand = jnp.where(elim > 0, neg, diag)
        m = jnp.max(cand)
        ismax = (cand >= m).astype(dtype)
        score = ismax * (n - ids).astype(dtype)
        onehot = (score >= jnp.max(score)).astype(dtype) * ismax
        colL = L @ onehot
        rowL = onehot @ L
        rowR = onehot @ R
        piv = jnp.dot(colL, onehot)
        piv = jnp.where(jnp.abs(piv) < floor,
                        jnp.where(piv < 0, -floor, floor), piv)
        rL = rowL / piv
        rR = rowR / piv
        oc = onehot[:, None]
        L = jnp.where(oc > 0, rL[None, :], L - colL[:, None] * rL[None, :])
        R = jnp.where(oc > 0, rR[None, :], R - colL[:, None] * rR[None, :])
        return (L, R, elim + onehot)

    L, R, _ = jax.lax.fori_loop(
        0, n, step, (M, jnp.eye(n, dtype=dtype), jnp.zeros(n, dtype=dtype)))
    return R


def _refined(Minv, M, rhs):
    x = Minv @ rhs
    return x + Minv @ (rhs - M @ x)


class ExactWarm(NamedTuple):
    """Tick-to-tick warm carry (see hoqp_fused._ip_solve warm contract).
    valid=0 reproduces the cold path bit-exactly."""
    valid: jnp.ndarray      # scalar: 1 after the first solve
    z0: jnp.ndarray         # (36,)
    v0: jnp.ndarray         # (nv,)
    lam_a: jnp.ndarray      # (nv,)
    lam_b: jnp.ndarray      # (nv,)
    z1: jnp.ndarray         # (36,)
    lam1: jnp.ndarray       # (nv,)
    z2: jnp.ndarray         # (36,)
    lam2: jnp.ndarray       # (nv,)


def zero_warm(nv: int = 56) -> ExactWarm:
    z = jnp.zeros(NUM_DECISION_VARS, jnp.float32)
    v = jnp.zeros(nv, jnp.float32)
    return ExactWarm(jnp.asarray(0.0, jnp.float32), z, v, v, v, z, v, z, v)


def cascade_exact(t0: Task, t1: Task, t2: Task, qp_iters: int = 10,
                  warm: Optional[ExactWarm] = None,
                  return_warm: bool = False):
    """Solve the 3-level cascade (inequalities at level 0 only) on exact
    shapes; returns the (36,) decision vector, or (x, ExactWarm)."""
    assert t1.D.shape[0] == 0 and t2.D.shape[0] == 0
    nx = NUM_DECISION_VARS
    dtype = t0.A.dtype
    A0, b0, D, f = t0.A, t0.b, t0.D, t0.f
    nv = D.shape[0]
    eye = jnp.eye(nx, dtype=dtype)
    dmask = (f < 5e5).astype(dtype)
    n_act = jnp.maximum(jnp.sum(dmask), 1.0)
    n_v = jnp.asarray(float(nv), dtype)

    def projector(Az):
        ma = Az.shape[0]
        gram = Az @ Az.T
        lam_r = _EPS_NULL * (jnp.trace(gram) / ma + 1.0)
        inv = _gj_inverse_exact(gram + lam_r * jnp.eye(ma, dtype=dtype))
        return eye - Az.T @ (inv @ Az)

    def level_data(A, b, Z, x):
        Az = A @ Z
        gram = Az.T @ Az
        ridge = _EPS_H * (jnp.max(jnp.diagonal(gram)) + 1e-3)
        Hz = gram + ridge * eye
        cz = Az.T @ (A @ x - b)

        def hz_mv(z):
            return Az.T @ (Az @ z) + ridge * z

        return Az, Hz, cz, hz_mv

    def init_solve(Hz, cz, hz_mv):
        inv0 = _gj_inverse_exact(Hz)
        x = inv0 @ (-cz)
        for _ in range(2):
            x = x + inv0 @ (-cz - hz_mv(x))
        return x

    def eq_level_solve(Hz, cz, hz_mv, B, h, wz, wlam):
        def Hmv(z):
            return hz_mv(z)

        def Gmv(z):
            return (B @ z) * dmask

        def GTmv(y):
            return B.T @ y

        def solveM(d, rhs):
            S = Hz + B.T @ (d[:, None] * B)
            return _refined(_gj_inverse_exact(S), S, rhs)

        scale = jnp.maximum(1.0, jnp.linalg.norm(cz))
        x0 = init_solve(Hz, cz, hz_mv)
        lvl_warm = None if warm is None else (warm.valid, wz, wlam * dmask)
        bx, _, blam = _ip_solve(x0, cz, h, dmask, n_act, Hmv, Gmv, GTmv,
                                solveM, scale, qp_iters, warm=lvl_warm)
        return bx, blam

    # ---------------- level 0: (z, v) with slack v ----------------
    x = jnp.zeros(nx, dtype=dtype)
    Z = eye
    Az0, Hz0, cz0, hz0_mv = level_data(A0, b0, Z, x)

    def Hmv0(xz):
        z, v = xz
        return (hz0_mv(z), v)

    def Gmv0(xz):
        z, v = xz
        return (-v, (D @ z - v) * dmask)

    def GTmv0(y):
        y1, y2 = y
        return (D.T @ (y2 * dmask), -y1 - y2)

    def solveM0(d, rhs):
        d1, d2 = d
        rz, rv = rhs
        mvv = 1.0 + d1 + d2
        w = d2 * (1.0 + d1) / mvv
        S = Hz0 + D.T @ (w[:, None] * D)
        rz_s = rz + D.T @ (d2 * rv / mvv)
        dz = _refined(_gj_inverse_exact(S), S, rz_s)
        dv = (rv + d2 * (D @ dz)) / mvv
        return (dz, dv)

    zeros_v = jnp.zeros(nv, dtype=dtype)
    c0 = (cz0, zeros_v)
    h0 = (zeros_v, jnp.where(dmask > 0, f, 1.0))
    vmask = jnp.ones(nv, dtype=dtype)
    smask0 = (vmask, dmask)
    scale0 = jnp.maximum(1.0, jnp.linalg.norm(cz0))
    x0_init = (init_solve(Hz0, cz0, hz0_mv), zeros_v)
    warm0 = (None if warm is None
             else (warm.valid, (warm.z0, warm.v0),
                   (warm.lam_a, warm.lam_b * dmask)))
    (z0s, v0s), _, (lam_as, lam_bs) = _ip_solve(
        x0_init, c0, h0, smask0, n_v + n_act, Hmv0, Gmv0, GTmv0, solveM0,
        scale0, qp_iters, warm=warm0)
    x = x + Z @ z0s
    Z = Z @ projector(Az0)

    def carried_h(x):
        hq = f - D @ x + v0s
        return jnp.where(dmask > 0, jnp.maximum(hq, 0.0), 1.0)

    # ---------------- levels 1, 2 ----------------
    Az1, Hz1, cz1, hz1_mv = level_data(t1.A, t1.b, Z, x)
    z1s, lam1s = eq_level_solve(Hz1, cz1, hz1_mv, D @ Z, carried_h(x),
                                None if warm is None else warm.z1,
                                None if warm is None else warm.lam1)
    x = x + Z @ z1s
    Z = Z @ projector(Az1)

    Az2, Hz2, cz2, hz2_mv = level_data(t2.A, t2.b, Z, x)
    z2s, lam2s = eq_level_solve(Hz2, cz2, hz2_mv, D @ Z, carried_h(x),
                                None if warm is None else warm.z2,
                                None if warm is None else warm.lam2)
    x = x + Z @ z2s
    if not return_warm:
        return x
    warm_out = ExactWarm(jnp.asarray(1.0, dtype), z0s, v0s, lam_as,
                         lam_bs, z1s, lam1s, z2s, lam2s)
    return x, warm_out
