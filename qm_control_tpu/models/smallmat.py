"""Hand-unrolled small-matrix algebra (3x3) for TPU efficiency.

XLA-TPU lowers batched tiny matmuls / LU solves (dot_general or
jnp.linalg.solve on (..., 3, 3)) very poorly — effectively iterating the
batch — which made the batched MPC's model algebra run at ~0.01% of peak
(measured: 8 us per 30-dim dynamics evaluation at batch 17k). Unrolling
the 3x3 products and Cramer inverses into elementwise arithmetic lets XLA
fuse them into a few lane-parallel vector kernels instead.

All functions broadcast over arbitrary leading batch dims.
"""
import jax.numpy as jnp


def mm3(A, B):
    """(...,3,3) @ (...,3,3) without dot_general."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(A[..., i, 0] * B[..., 0, j]
                        + A[..., i, 1] * B[..., 1, j]
                        + A[..., i, 2] * B[..., 2, j])
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def mv3(A, v):
    """(...,3,3) @ (...,3) without dot_general."""
    return jnp.stack([
        A[..., 0, 0] * v[..., 0] + A[..., 0, 1] * v[..., 1]
        + A[..., 0, 2] * v[..., 2],
        A[..., 1, 0] * v[..., 0] + A[..., 1, 1] * v[..., 1]
        + A[..., 1, 2] * v[..., 2],
        A[..., 2, 0] * v[..., 0] + A[..., 2, 1] * v[..., 1]
        + A[..., 2, 2] * v[..., 2]], axis=-1)


def mtv3(A, v):
    """A^T @ v for (...,3,3), (...,3)."""
    return jnp.stack([
        A[..., 0, 0] * v[..., 0] + A[..., 1, 0] * v[..., 1]
        + A[..., 2, 0] * v[..., 2],
        A[..., 0, 1] * v[..., 0] + A[..., 1, 1] * v[..., 1]
        + A[..., 2, 1] * v[..., 2],
        A[..., 0, 2] * v[..., 0] + A[..., 1, 2] * v[..., 1]
        + A[..., 2, 2] * v[..., 2]], axis=-1)


def det3(A):
    return (A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2]
                            - A[..., 1, 2] * A[..., 2, 1])
            - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2]
                              - A[..., 1, 2] * A[..., 2, 0])
            + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1]
                              - A[..., 1, 1] * A[..., 2, 0]))


def inv3(A, eps=0.0):
    """Cramer inverse of (...,3,3); eps regularizes the determinant
    (|det| floored, sign preserved)."""
    c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
    c01 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
    c02 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
    c10 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
    c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
    c12 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
    c20 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
    c21 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
    c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    det = A[..., 0, 0] * c00 + A[..., 0, 1] * c01 + A[..., 0, 2] * c02
    if eps:
        det = jnp.sign(jnp.where(det == 0, 1.0, det)) * \
            jnp.maximum(jnp.abs(det), eps)
    inv_det = 1.0 / det
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1)], axis=-2)
    return adj * inv_det[..., None, None]


def solve3(A, b, eps=0.0):
    """A^{-1} b for (...,3,3), (...,3) via Cramer."""
    return mv3(inv3(A, eps=eps), b)


def solve3_spd_damped(A, b, damp):
    """(A + damp I)^{-1} b — used where the caller previously ridged."""
    Ad = A + damp * jnp.eye(3, dtype=A.dtype)
    return solve3(Ad, b)


# ---------------------------------------------------------------------------
# Medium-small matrices (n ~ 30): contraction-unrolled matmuls and an
# unrolled Cholesky solve. Rationale: under vmap, X @ Y on (B, n, n)
# lowers to per-batch MXU matmuls padded from n to 128 (~1% efficiency);
# unrolling the contraction turns them into n fused elementwise
# multiply-adds on (B, n, n) arrays, which the VPU executes at far higher
# utilization. Used by the Riccati backward sweeps (solver/sqp.py).
# ---------------------------------------------------------------------------


def mm_unrolled(A, B):
    """A @ B for (..., n, k) x (..., k, m) via an unrolled k-loop
    (sum of outer products) — batched-matmul-free."""
    k = A.shape[-1]
    acc = A[..., :, 0:1] * B[..., 0:1, :]
    for i in range(1, k):
        acc = acc + A[..., :, i:i + 1] * B[..., i:i + 1, :]
    return acc


def mv_unrolled(A, v):
    """A @ v for (..., n, k) x (..., k) via the same unrolling."""
    return jnp.sum(A * v[..., None, :], axis=-1)


def mtv_unrolled(A, v):
    """A^T @ v for (..., n, k), (..., n) -> (..., k)."""
    return jnp.sum(A * v[..., :, None], axis=-2)


def mtm_unrolled(A, B):
    """A^T @ B for (..., k, n) x (..., k, m) via unrolled k-loop."""
    k = A.shape[-2]
    acc = A[..., 0:1, :].swapaxes(-1, -2) * B[..., 0:1, :]
    for i in range(1, k):
        acc = acc + A[..., i:i + 1, :].swapaxes(-1, -2) * B[..., i:i + 1, :]
    return acc


def cholesky_unrolled(A):
    """Lower Cholesky factor of SPD (..., n, n) via a fori_loop over the
    n pivots with FULL-WIDTH masked updates: the not-yet-computed entries
    of L are zero, so full-row sums equal the triangular partial sums.
    One traced loop body (compile-friendly); every step is elementwise
    over the batch (no batched small LU on the MXU)."""
    import jax

    n = A.shape[-1]
    row_idx = jnp.arange(n)

    def pivot(j, L):
        # row j of L and column j of A via one-hot contractions (cheap,
        # elementwise, vmap-friendly — no gathers with traced indices)
        onehot = (row_idx == j).astype(A.dtype)          # (n,)
        Lrow_j = jnp.sum(L * onehot[:, None], axis=-2)   # (..., n)
        Acol_j = jnp.sum(A * onehot[None, :], axis=-1)   # (..., n)
        Ajj = jnp.sum(Acol_j * onehot, axis=-1)          # (...,)
        diag = Ajj - jnp.sum(Lrow_j ** 2, axis=-1)
        ljj = jnp.sqrt(jnp.maximum(diag, 1e-12))
        s = jnp.sum(L * Lrow_j[..., None, :], axis=-1)   # (..., n)
        col = (Acol_j - s) / ljj[..., None]
        col = jnp.where(row_idx > j, col, 0.0)
        col = col + ljj[..., None] * onehot              # set diagonal
        # write column j
        return L * (1.0 - onehot)[None, :] + col[..., :, None] * onehot

    L = jax.lax.fori_loop(0, n, pivot, jnp.zeros_like(A))
    return L


def cho_solve_unrolled(L, B):
    """Solve A X = B given A = L L^T, for B (..., n, m); fori_loop
    substitutions with full-width masked updates."""
    import jax

    n = L.shape[-1]
    row_idx = jnp.arange(n)

    def fwd(i, Y):
        onehot = (row_idx == i).astype(L.dtype)          # (n,)
        Li = jnp.sum(L * onehot[:, None], axis=-2)       # (..., n) row i
        lii = jnp.sum(Li * onehot, axis=-1)              # (...,)
        Bi = jnp.sum(B * onehot[:, None], axis=-2)       # (..., m)
        Yi = jnp.sum(Y * onehot[:, None], axis=-2)
        s = Bi - jnp.sum(Li[..., None] * Y, axis=-2) + lii[..., None] * Yi
        val = s / lii[..., None]                         # (..., m)
        return Y * (1.0 - onehot)[:, None] + val[..., None, :] \
            * onehot[:, None]

    Y = jax.lax.fori_loop(0, n, fwd, jnp.zeros_like(B))

    def bwd(k, X):
        i = n - 1 - k
        onehot = (row_idx == i).astype(L.dtype)
        Lci = jnp.sum(L * onehot[None, :], axis=-1)      # (..., n) col i
        lii = jnp.sum(Lci * onehot, axis=-1)
        Yi = jnp.sum(Y * onehot[:, None], axis=-2)
        Xi = jnp.sum(X * onehot[:, None], axis=-2)
        s = Yi - jnp.sum(Lci[..., None] * X, axis=-2) + lii[..., None] * Xi
        val = s / lii[..., None]
        return X * (1.0 - onehot)[:, None] + val[..., None, :] \
            * onehot[:, None]

    X = jax.lax.fori_loop(0, n, bwd, jnp.zeros_like(B))
    return X


def spd_solve_unrolled(A, B):
    """A^{-1} B for SPD A (..., n, n), B (..., n, m).

    Round-4 alternatives, measured at B=256 n=30 m=31 on v5e and
    REJECTED: (a) jax.scipy cho_factor/cho_solve looked 1.4x faster in
    a chained micro-benchmark but 2.5x SLOWER inside the real Riccati
    sweep (166 vs 66 ms/solve-step) — the micro held A constant across
    the chain, so XLA hoisted the factorization out of the scan; with a
    per-step Quu the blocked cholesky lowering loses badly. (b) a
    trace-time static-unrolled column Cholesky: 0.258 vs 0.211 ms —
    the fori body's buffers already live in VMEM, so the expected
    HBM-traffic win never materializes."""
    return cho_solve_unrolled(cholesky_unrolled(A), B)
