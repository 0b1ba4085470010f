"""Parallel-scan (associative) Riccati sweeps — the sequence-axis
parallelism of the MPC horizon (SURVEY.md §5/§7).

The serial LQR backward recursion is a chain of N dependent ~30x30
factorizations — pure latency at B=1 (the MXU sits idle between tiny
steps). Temporal parallelization (Sarkka & Garcia-Fernandez, "Temporal
Parallelization of Dynamic Programming and Linear Quadratic Control",
2021) rewrites the value recursion as an ASSOCIATIVE combination of
conditional-value elements, so `jax.lax.associative_scan` evaluates the
whole horizon in ceil(log2 N) rounds of batched matrix algebra (7 rounds
for N=67 instead of 67 dependent steps); the per-node feedback gains
then come from one vmapped (embarrassingly parallel) pass. The affine
forward rollout is likewise a prefix composition of (M, v) affine maps.

Semantics match solver.sqp's serial `backward`/`linear_forward` exactly
(including multiple-shooting defects d as affine dynamics offsets and
the Quu ridge); tests/test_pariccati.py checks gains and rollouts
against the serial implementation to f32 round-off on random LQ data.

Element representation, covering a stage interval [i, j):
    psi(x_i, x_j) = 0.5 x_i'J x_i - eta'x_i  [+ boundary coupling
    x_j = A x_i + b with quadratic relaxation C]
Combination (e1 earlier, e2 later; S = I + C1 J2):
    A  = A2 S^-1 A1
    b  = A2 S^-1 (b1 + C1 eta2) + b2
    C  = A2 S^-1 C1 A2' + C2
    eta = A1' (I + J2 C1)^-1 (eta2 - J2 b1) + eta1
    J  = A1' (I + J2 C1)^-1 J2 A1 + J1
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp


class _Elem(NamedTuple):
    A: jnp.ndarray     # (N, nx, nx)
    b: jnp.ndarray     # (N, nx)
    C: jnp.ndarray     # (N, nx, nx)
    eta: jnp.ndarray   # (N, nx)
    J: jnp.ndarray     # (N, nx, nx)


def _combine(e1: _Elem, e2: _Elem) -> _Elem:
    """e1 covers the EARLIER interval, e2 the later one."""
    nx = e1.A.shape[-1]
    eye = jnp.eye(nx, dtype=e1.A.dtype)
    S = eye + e1.C @ e2.J                            # (.., nx, nx)
    # solve S X = Y for several Y: use one LU via jnp.linalg.solve
    Sinv_A1 = jnp.linalg.solve(S, e1.A)
    Sinv_bCe = jnp.linalg.solve(
        S, (e1.b + (e1.C @ e2.eta[..., None])[..., 0])[..., None])[..., 0]
    Sinv_C1 = jnp.linalg.solve(S, e1.C)
    # (I + J2 C1)^-1 acting from the left on J2/vectors: note
    # (I + J2 C1) = S' with S = I + C1 J2 only when C, J symmetric —
    # they are (value Hessians / control-penalty Grams), so reuse S'.
    St = jnp.swapaxes(S, -1, -2)
    T = jnp.linalg.solve(St, (e2.eta - (e2.J @ e1.b[..., None])[..., 0]
                              )[..., None])[..., 0]
    JA = jnp.linalg.solve(St, e2.J @ e1.A)
    A = e2.A @ Sinv_A1
    b = (e2.A @ Sinv_bCe[..., None])[..., 0] + e2.b
    C = e2.A @ Sinv_C1 @ jnp.swapaxes(e2.A, -1, -2) + e2.C
    eta = (jnp.swapaxes(e1.A, -1, -2) @ T[..., None])[..., 0] + e1.eta
    J = jnp.swapaxes(e1.A, -1, -2) @ JA + e1.J
    # symmetrize accumulated quadratics (f32 drift)
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return _Elem(A, b, C, eta, J)


def parallel_backward(A, B, lx, lu, lxx, luu, lux, d, VxN, VxxN, reg):
    """Gains (kffs, Kfbs) equivalent to the serial defect-aware Riccati
    sweep (solver.sqp.backward). All arrays stacked over N stages."""
    N, nx = A.shape[0], A.shape[-1]
    nw = B.shape[-1]
    dtype = A.dtype
    eye_w = jnp.eye(nw, dtype=dtype)

    luu_reg = 0.5 * (luu + jnp.swapaxes(luu, -1, -2)) + reg * eye_w
    kK0 = jnp.linalg.solve(luu_reg,
                           jnp.concatenate([lu[..., None], lux], axis=-1))
    k0, K0 = kK0[..., 0], kK0[..., 1:]

    elems = _Elem(
        A=A - B @ K0,
        b=d - (B @ k0[..., None])[..., 0],
        C=B @ jnp.linalg.solve(luu_reg, jnp.swapaxes(B, -1, -2)),
        eta=-(lx - (jnp.swapaxes(lux, -1, -2) @ k0[..., None])[..., 0]),
        J=lxx - jnp.swapaxes(lux, -1, -2) @ K0,
    )
    term = _Elem(
        A=jnp.zeros((1, nx, nx), dtype),
        b=jnp.zeros((1, nx), dtype),
        C=jnp.zeros((1, nx, nx), dtype),
        eta=-VxN[None],
        J=VxxN[None],
    )
    full = jax.tree_util.tree_map(
        lambda a, t: jnp.concatenate([a, t], axis=0), elems, term)

    # suffix compositions: suffix_k = e_k (x) ... (x) e_T  ->  V_k.
    # reverse=True flips the sequence internally, so the combine fn's
    # first operand is the LATER-in-time element — swap into _combine's
    # (earlier, later) convention.
    suf = jax.lax.associative_scan(lambda a, b: _combine(b, a), full,
                                   reverse=True, axis=0)
    # V_{k+1} for stage k = suffix_{k+1} (suffix_N = terminal alone)
    Vx_next = -suf.eta[1:]
    Vxx_next = suf.J[1:]

    def gains(A_k, B_k, lu_k, luu_k, lux_k, d_k, Vx1, Vxx1):
        Vxd = Vx1 + Vxx1 @ d_k
        Qu = lu_k + B_k.T @ Vxd
        Quu = luu_k + B_k.T @ (Vxx1 @ B_k)
        Qux = lux_k + B_k.T @ (Vxx1 @ A_k)
        Quu_reg = 0.5 * (Quu + Quu.T) + reg * eye_w
        kK = jnp.linalg.solve(Quu_reg,
                              jnp.concatenate([Qu[:, None], Qux], axis=-1))
        return -kK[:, 0], -kK[:, 1:]

    return jax.vmap(gains)(A, B, lu, luu, lux, d, Vx_next, Vxx_next)


def parallel_linear_forward(X, W, A, B, d, kffs, Kfbs, alpha):
    """dx' = A dx + B dw + alpha d;  dw = alpha k + K dx — as a prefix
    composition of affine maps (M, v): (M2,v2) o (M1,v1) =
    (M2 M1, M2 v1 + v2). Matches solver.sqp.linear_forward."""
    M = A + B @ Kfbs
    v = alpha * ((B @ kffs[..., None])[..., 0] + d)

    def comp(p1, p2):
        M1, v1 = p1
        M2, v2 = p2
        return (M2 @ M1, (M2 @ v1[..., None])[..., 0] + v2)

    Mp, vp = jax.lax.associative_scan(comp, (M, v), axis=0)
    # dx_0 = 0 -> dx_{k+1} = vp_k; dx at node k (k=0..N) with leading 0
    nx = A.shape[-1]
    dX = jnp.concatenate([jnp.zeros((1, nx), dtype=A.dtype), vp], axis=0)
    dW = alpha * kffs + (Kfbs @ dX[:-1][..., None])[..., 0]
    return X + dX, W + dW
