"""Fused hierarchical-WBC QP cascade — one Pallas TPU kernel.

Replaces `wbc.hoqp.hoqp_solve` on the real-time path. The XLA version of
the 3-level cascade lowers to ~50 host-visible small factorizations
(3 levels x 15 interior-point iterations of cho_factor/cho_solve, plus
projector solves); each is a sequentially-dependent tiny op, so the
cascade is dispatch-latency-bound, not FLOP-bound. This kernel runs the
ENTIRE cascade — every IP iteration, every linear solve, both null-space
projector updates — inside a single `pallas_call` with all matrices
resident in VMEM (reference counterpart: the qpOASES active-set solves
in qm_wbc/src/HoQp.cpp:135-150 called per level).

Two TPU-first linear-algebra redesigns make this possible:

1. **Schur elimination of the slack block.** Level 0's IP Newton matrix
   is M = [[Hz + D'd2D, -D'd2], [-d2D, I + d1 + d2]] — the slack-slack
   block is DIAGONAL, so the 92-dim KKT system reduces exactly to a
   36-dim solve: S = Hz + D' diag(d2(1+d1)/(1+d1+d2)) D. Every linear
   solve in the cascade is then 36-dimensional.

2. **Gauss-Jordan inversion with row ops + MXU rank-1 updates.** No
   sqrt, no triangular solves (which serialize on the VPU): each of the
   36 elimination steps is one one-hot column extraction (MXU matvec),
   one pivot-row normalization, and one rank-1 outer-product update of
   the [M | I] augmented buffer. GJ without pivoting is stable here
   because every matrix inverted is SPD (+ ridge).

The interior-point math replicates `wbc.qp.solve_qp` term by term
(Mehrotra predictor-corrector, convergence gate, best-iterate tracking)
so the kernel is a numerical drop-in; `tests/test_kernels.py` checks the
returned decision vector against the XLA cascade on realistic stacks.

Layout conventions (TPU f32 tiling is (8,128)-sublane x lane):
  - every matrix is a (128,128) f32 buffer, row = sublane, col = lane;
  - every vector is a (1,128) f32 row vector;
  - active extents (task rows, 36 decision vars, 56 inequality rows) are
    static Python ints taken from the unpadded task shapes at trace
    time; masked lanes are provably inert (zero rows/cols).

The math core `_cascade_math` is pure jnp: the Pallas kernel is only the
fusion boundary. On CPU (tests, debugging) call the core directly — the
same code lowers to ordinary XLA.
"""
import functools
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..wbc.tasks import NUM_DECISION_VARS, Task

LANES = 128
_EPS_H = 3e-6       # hoqp.py RELATIVE ridge on the level Hessian
_EPS_NULL = 1e-7    # hoqp.py null-space projector damping
_TAU = 0.995
_GATE_TOL = 1e-6


class FusedCascadeSpec(NamedTuple):
    """Static shape info for one cascade instantiation (all exact,
    unpadded row counts — they select the GJ step counts and masks)."""
    ma0: int
    nv0: int
    ma1: int
    ma2: int
    qp_iters: int = 10


# ---------------------------------------------------------------------------
# small dense algebra on (128,128)/(1,128) buffers
# ---------------------------------------------------------------------------

def _dg(a, b, dims):
    # HIGHEST: true-f32 accumulation. The TPU MXU default decomposes f32
    # matmuls into bf16 passes whose rounding (~1e-3 relative) would
    # swamp the cascade's conditioning work; these are 128x128 ops, the
    # extra passes are noise next to the kernel's serial latency.
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _matvec(M, x):
    """(M x) as a (1,128) row vector; x (1,128), M (128,128)."""
    return _dg(x, M, ((1,), (1,)))


def _vecmat(x, M):
    """(M' x) as a (1,128) row vector (x through M transposed)."""
    return _dg(x, M, ((1,), (0,)))


def _mm(A, B):
    return _dg(A, B, ((1,), (0,)))


def _mmT(A, B):
    """A' B, contracting the row (sublane) dims."""
    return _dg(A, B, ((0,), (0,)))


def _lane_mask(n):
    return (jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            < n).astype(jnp.float32)


def _eye():
    return (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            ).astype(jnp.float32)


def _onehot_max(cand, sub_ids):
    """One-hot (128,1) selector of the max entry of cand (128,1), ties
    broken toward the smallest index — no argmax / dynamic indexing
    (Mosaic lowers neither on values)."""
    m = jnp.max(cand)
    ismax = (cand >= m).astype(jnp.float32)
    score = ismax * (LANES - sub_ids).astype(jnp.float32)
    m2 = jnp.max(score)
    return (score >= m2).astype(jnp.float32) * ismax


def _gj_inverse(M, n_steps, eye):
    """Invert the leading (n_steps, n_steps) SPD block of M via
    Gauss-Jordan with diagonal (complete, for SPD) pivoting — recovers
    Cholesky-with-pivoting-level stability on the near-rank-deficient
    projected Hessians the cascade produces.

    Mosaic-safe formulation: the augmented buffer is kept as two
    (128,128) halves (no concatenate), and the pivot row/column are
    selected through a one-hot (128,1) vector that doubles as a sublane
    mask (row write) and a lane contractor (column extraction) — no
    argmax, no dynamic_slice. Rows/cols >= n_steps must be zero (never
    pivoted; the identity right half keeps their inverse rows at e_j,
    which downstream masked matvecs ignore)."""
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)
    active = (sub_ids < n_steps).astype(jnp.float32)
    neg = jnp.float32(-3e38)
    L = M
    R = eye
    elim = jnp.zeros((LANES, 1), jnp.float32)
    # pivot magnitude floor: f32 cancellation can drive a near-singular
    # Schur-complement diagonal to ~0; flooring avoids inf/NaN at the
    # cost of a (harmless, refined-away) large inverse entry
    floor = 1e-10 * (jnp.sum(jnp.abs(M * eye)) / n_steps + 1.0)

    def step(_, carry):
        L, R, elim = carry
        diag = jnp.sum(L * eye, axis=1, keepdims=True)          # (128,1)
        cand = jnp.where((elim > 0) | (active == 0), neg, diag)
        onehot = _onehot_max(cand, sub_ids)                     # (128,1)
        colL = _dg(L, onehot, ((1,), (0,)))                     # (128,1)
        rowL = _dg(onehot, L, ((0,), (0,)))                     # (1,128)
        rowR = _dg(onehot, R, ((0,), (0,)))
        piv = jnp.sum(colL * onehot)
        piv = jnp.where(jnp.abs(piv) < floor,
                        jnp.where(piv < 0, -floor, floor), piv)
        rL = rowL / piv
        rR = rowR / piv
        L = jnp.where(onehot > 0, rL, L - colL * rL)
        R = jnp.where(onehot > 0, rR, R - colL * rR)
        elim = elim + onehot
        return (L, R, elim)

    L, R, elim = jax.lax.fori_loop(0, n_steps, step, (L, R, elim))
    return R


def _refined_solve(Minv, M, rhs, mask):
    """x = Minv rhs with one step of iterative refinement (recovers the
    accuracy a backward-stable factorization would give when Minv
    carries f32 elimination error)."""
    x = _matvec(Minv, rhs) * mask
    r = rhs - _matvec(M, x) * mask
    return x + _matvec(Minv, r) * mask


def _refined_solve_op(Minv, Mmv, rhs, mask, steps=2):
    """x = M^{-1} rhs by refinement against a FACTOR-FORM matvec Mmv.

    Minv inverts the MATERIALIZED Gram-based matrix, which carries a
    fixed f32 perturbation E (|E| ~ 36u * maxdiag — the same rounding
    that forced the relative ridge). Using Mmv(x) = A'(Ax) + ... for the
    residual makes the iteration converge to the solution of the EXACT
    (implicitly PSD) operator: Minv only preconditions, contraction
    |M^{-1}E| ~ 1e-2, two steps reach the f32 matvec-noise floor."""
    x = _matvec(Minv, rhs) * mask
    for _ in range(steps):
        r = rhs - Mmv(x) * mask
        x = x + _matvec(Minv, r) * mask
    return x


def _kernel_basis_qr(Az, n_steps, eye, nx, rel_tol=1e-5):
    """Orthonormal basis of ker(Az) with exact-zero non-kernel columns —
    the in-kernel counterpart of wbc.hoqp._kernel_basis.

    Column-pivoted Householder QR of B = Az' (z-space rows x task-row
    columns): each of the `n_steps` static steps picks the remaining
    column of largest norm (rank-revealing, handles the exact-zero
    masked task rows in any order), reflects it onto e_step, and
    accumulates Q by rank-1 updates. Numerical rank = #steps whose pivot
    column norm exceeds rel_tol * (largest norm); the kernel basis is
    Q's trailing (nx - rank) columns, zeroed elsewhere.
    """
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0)
    B = _mmT(Az, eye)                     # Az' (z rows, task-row lanes)
    Q = eye * _lane_mask(nx)
    unproc = _lane_mask(n_steps)          # candidate task-row columns
    rank = jnp.zeros((), jnp.float32)
    # tolerance anchor: largest initial column norm (~ max |R_ii|,
    # matching wbc.hoqp._kernel_basis's diagonal-relative threshold)
    norm0 = jnp.sqrt(jnp.max(jnp.sum(B * B, axis=0) * unproc[0]) + 1e-30)

    def step(k, carry):
        B, Q, unproc, rank = carry
        rowmask = (sub_ids >= k).astype(jnp.float32)       # rows k..
        sq = B * B * rowmask
        norms = jnp.sum(sq, axis=0, keepdims=True)         # (1,128)
        cand = jnp.where(unproc > 0, norms, -1.0)
        # one-hot lane selector of the max column (no argmax in Mosaic)
        mx = jnp.max(cand)
        ismax = (cand >= mx).astype(jnp.float32)
        score = ismax * (LANES - lane_ids).astype(jnp.float32)
        onehot_l = (score >= jnp.max(score)).astype(jnp.float32) * ismax
        col_norm2 = jnp.sum(norms * onehot_l)
        is_rank = (jnp.sqrt(col_norm2)
                   > rel_tol * norm0).astype(jnp.float32)
        onehot_c = _dg(eye, onehot_l, ((1,), (1,)))        # (128,1)
        v0 = _dg(B, onehot_c, ((1,), (0,)))                # (128,1)
        v = v0 * rowmask
        alpha = jnp.sqrt(col_norm2 + 1e-30)
        head = jnp.sum(v * (sub_ids == k).astype(jnp.float32))
        sgn = jnp.where(head >= 0, 1.0, -1.0)
        v = v + sgn * alpha * (sub_ids == k).astype(jnp.float32)
        vtv = jnp.sum(v * v)
        beta = jnp.where(vtv > 1e-30, 2.0 / vtv, 0.0) * is_rank
        vtB = _dg(v, B, ((0,), (0,)))                      # (1,128)
        B = B - v * (beta * vtB)
        Qv = _dg(Q, v, ((1,), (0,)))                       # (128,1)
        vrow = _dg(v, eye, ((0,), (0,)))                   # (1,128)
        Q = Q - Qv * (beta * vrow)
        unproc = unproc * (1.0 - onehot_l)
        rank = rank + is_rank
        return (B, Q, unproc, rank)

    B, Q, unproc, rank = jax.lax.fori_loop(0, n_steps, step,
                                           (B, Q, unproc, rank))
    colmask = ((lane_ids.astype(jnp.float32) >= rank)
               & (lane_ids < nx)).astype(jnp.float32)
    return Q * colmask


# ---------------------------------------------------------------------------
# generic masked interior-point solve (pytree state spaces)
# ---------------------------------------------------------------------------

def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def _tsum(tree):
    return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(tree))


def _ip_solve(x0, c, h, smask, m_count, Hmv, Gmv, GTmv, solveM, scale,
              qp_iters, warm=None):
    """Mehrotra predictor-corrector IP, replicating wbc.qp.solve_qp on
    pytree-structured primal (x) and slack (s) spaces with lane masks.

    Hmv/Gmv/GTmv: linear operators (x->x, x->s, s->x). solveM(d, rhs):
    solve (H + G' diag(d) G) dx = rhs given the per-row weights d.
    Returns (best_x, best_s_slack_tree, best_lam) by KKT merit.

    warm: optional (valid, wx, wlam) — previous-solve primal/dual used as
    the starting iterate, blended by the runtime scalar `valid` (0 -> the
    cold init, bit-exact with the warm path compiled in). Consecutive WBC
    ticks differ by ~2 ms of state, so the warm iterate starts at the
    prior optimum: slacks are recomputed from the warm primal (s = h-Gx,
    floored low instead of at the cold 1.0 — active rows sit near the
    boundary), duals carry over. This is the TPU analog of the
    reference's implicit qpOASES warm start (HoQp.cpp:135-150: nWSR from
    the prior active set).
    """
    big = jnp.float32(1e30)
    if warm is not None:
        valid, wx, wlam = warm
        x0 = _tmap(lambda cold, w: valid * w + (1.0 - valid) * cold, x0, wx)
        s_floor = valid * 1e-3 + (1.0 - valid) * 1.0
    else:
        valid = jnp.float32(0.0)
        wlam = None
        s_floor = jnp.float32(1.0)

    def msk(s_tree):
        return _tmap(lambda a, m: a * m, s_tree, smask)

    def merit(x, s, lam):
        r_d = _tmap(lambda a, b, cc: a + b + cc, Hmv(x), c, GTmv(lam))
        viol = msk(_tmap(lambda g, hh: jnp.maximum(g - hh, 0.0), Gmv(x), h))
        return (_tsum(_tmap(lambda a: a * a, r_d))
                + 100.0 * _tsum(_tmap(lambda a: a * a, viol))
                + _tsum(msk(_tmap(lambda a, b: jnp.abs(a * b), s, lam))))

    def maxstep(v_tree, dv_tree):
        ratios = _tmap(lambda v, dv: jnp.where(dv < 0, -v / jnp.where(
            dv < 0, dv, -1.0), big), v_tree, dv_tree)
        worst = functools.reduce(jnp.minimum,
                                 (jnp.min(r) for r in
                                  jax.tree_util.tree_leaves(ratios)))
        return jnp.minimum(1.0, worst)

    s0 = _tmap(lambda hh, gx, m: (jnp.maximum(hh - gx, s_floor)) * m
               + (1 - m), h, Gmv(x0), smask)
    lam0 = (smask if wlam is None else
            _tmap(lambda m, w: (valid * jnp.maximum(w, 1e-6)
                                + (1.0 - valid)) * m, smask, wlam))

    def body(_i, carry):
        # fori_loop (not lax.scan): Mosaic's scan lowering requires a
        # pattern-matchable loop-index carry and rejects this pytree
        # carry ("not a fori_loop index"); fori_loop lowers directly.
        x, s, lam, bx, bs, blam, bm = carry
        s = _tmap(lambda a: jnp.maximum(a, 1e-9), s)
        lam = _tmap(lambda a: jnp.maximum(a, 1e-12), lam)
        r_d = _tmap(lambda a, b, cc: a + b + cc, Hmv(x), c, GTmv(lam))
        r_p = msk(_tmap(lambda g, ss, hh: g + ss - hh, Gmv(x), s, h))
        mu = _tsum(msk(_tmap(lambda a, b: a * b, s, lam))) / m_count
        rp_max = functools.reduce(jnp.maximum,
                                  (jnp.max(jnp.abs(r)) for r in
                                   jax.tree_util.tree_leaves(r_p)))
        # the gate must also check the DUAL residual: a warm-started
        # iterate near the PREVIOUS problem's optimum has tiny mu and
        # (by construction of s0) tiny r_p, but carries the full
        # objective change in r_d — gating on (mu, r_p) alone froze warm
        # solves at the stale optimum (measured: warm cascade returned
        # the previous tick's torques verbatim, 2.8 Nm off)
        rd_max = functools.reduce(jnp.maximum,
                                  (jnp.max(jnp.abs(r)) for r in
                                   jax.tree_util.tree_leaves(r_d)))
        gate = jnp.where((mu < _GATE_TOL * scale)
                         & (rp_max < _GATE_TOL * scale)
                         & (rd_max < 1e-4 * scale), 0.0, 1.0)
        d = _tmap(lambda l, ss: jnp.minimum(jnp.maximum(l / ss, 1e-12), 1e8), lam, s)
        # predictor (affine direction)
        rc_aff = msk(_tmap(lambda ss, l, rp: (-ss * l + l * rp) / ss,
                           s, lam, r_p))
        rhs_a = _tmap(lambda a, b: -(a + b), r_d, GTmv(rc_aff))
        dx_a = solveM(d, rhs_a)
        ds_a = msk(_tmap(lambda rp, g: -rp - g, r_p, Gmv(dx_a)))
        dl_a = msk(_tmap(lambda ss, l, dsa: (-ss * l - l * dsa) / ss,
                         s, lam, ds_a))
        ap_a = maxstep(s, ds_a)
        ad_a = maxstep(lam, dl_a)
        mu_aff = _tsum(msk(_tmap(
            lambda ss, dsa, l, dla: (ss + ap_a * dsa) * (l + ad_a * dla),
            s, ds_a, lam, dl_a))) / m_count
        sigma = jnp.minimum(jnp.maximum((mu_aff / jnp.maximum(mu, 1e-12)) ** 3, 1e-4), 1.0)
        # corrector
        rc = msk(_tmap(
            lambda ss, l, rp, dsa, dla:
            (sigma * mu - ss * l - dsa * dla + l * rp) / ss,
            s, lam, r_p, ds_a, dl_a))
        rhs = _tmap(lambda a, b: -(a + b), r_d, GTmv(rc))
        dx = solveM(d, rhs)
        ds = msk(_tmap(lambda rp, g: -rp - g, r_p, Gmv(dx)))
        dlam = msk(_tmap(
            lambda ss, l, dsa, dla, dss:
            (sigma * mu - ss * l - dsa * dla - l * dss) / ss,
            s, lam, ds_a, dl_a, ds))
        ap = gate * _TAU * maxstep(s, ds)
        ad = gate * _TAU * maxstep(lam, dlam)
        x = _tmap(lambda a, b: a + ap * b, x, dx)
        s = _tmap(lambda a, b: a + ap * b, s, ds)
        lam = _tmap(lambda a, b: a + ad * b, lam, dlam)
        mm_ = merit(x, s, lam)
        take = mm_ < bm
        bx = _tmap(lambda n, o: jnp.where(take, n, o), x, bx)
        bs = _tmap(lambda n, o: jnp.where(take, n, o), s, bs)
        blam = _tmap(lambda n, o: jnp.where(take, n, o), lam, blam)
        bm = jnp.minimum(mm_, bm)
        return (x, s, lam, bx, bs, blam, bm)

    init = (x0, s0, lam0, x0, s0, lam0, merit(x0, s0, lam0))
    (x, s, lam, bx, bs, blam, _) = jax.lax.fori_loop(0, qp_iters, body,
                                                     init)
    return bx, bs, blam


# ---------------------------------------------------------------------------
# the cascade (pure jnp; Pallas wraps this)
# ---------------------------------------------------------------------------

def _norm_masked(v, mask):
    return jnp.sqrt(jnp.sum(v * v * mask))


def _cascade_math(A0, b0, D, f, A1, b1, A2, b2, spec: FusedCascadeSpec,
                  warm=None):
    """Lexicographic 3-level cascade on padded (128,128)/(1,128) buffers.
    Semantics of wbc.hoqp.hoqp_solve for the WBC stack family
    (level 0 carries the inequalities; levels 1-2 are equality tasks).
    Returns (x, warm_out): x as a (1,128) row vector (36 active lanes),
    warm_out a (9,128) buffer of per-level primal/dual iterates for the
    NEXT solve's warm start (row 0: validity broadcast; rows 1-8:
    z0, v0, lam_a, lam_b, z1, lam1, z2, lam2). Pass the previous solve's
    warm_out back in as `warm` (same layout; row 0 nonzero => use it)."""
    eye = _eye()
    nx = NUM_DECISION_VARS
    zmask = _lane_mask(nx)
    vmask = _lane_mask(spec.nv0)
    eye_z = eye * zmask
    # structurally-inactive inequality rows (contact-masked: zero D row,
    # bound pushed to MASK_BIG) are EXCLUDED from the IP statistics —
    # their ~1e6 slacks otherwise dominate mu and Mehrotra's centering
    # then targets huge complementarity products on the real rows
    # (mirrors wbc.qp.solve_qp's `act` mask; exact semantics).
    dmask = vmask * (f < 5e5).astype(jnp.float32)
    n_act = jnp.maximum(jnp.sum(dmask), 1.0)
    n_v = jnp.maximum(jnp.sum(vmask), 1.0)

    def projector(Az, ma):
        """Damped null-space projector, matching wbc.hoqp's deployed
        semantics (see USE_QR_BASIS there for why the exact QR kernel
        basis is NOT used on the closed-loop path)."""
        gram = _dg(Az, Az, ((1,), (1,)))                 # (128,128)
        tr = jnp.sum(gram * eye)
        lam_r = _EPS_NULL * (tr / ma + 1.0)
        graminv = _gj_inverse(gram + lam_r * (eye * _lane_mask(ma)),
                              ma, eye)
        U = _mm(graminv, Az)
        return eye_z - _mmT(Az, U) * zmask

    def level_data(A, b, Z, x):
        """Az, level Hessian, level gradient.

        The relative ridge (wbc.hoqp._EPS_H rationale: f32 Gram rounding
        ~ 4e-6 * maxdiag makes the Gram indefinite under an absolute
        ridge) both restores convexity and pins the damped projector's
        inert kernel directions. NOTE: round 2 additionally added a
        kappa (I-Z)'(I-Z) penalty here; with the relative ridge in place
        it is pure bias (measured +5.7 Nm vs the f64 referee on trot
        stacks) and is gone."""
        Az = _mm(A, Z)
        gram = _mmT(Az, Az)
        ridge = _EPS_H * (jnp.max(gram * eye) + 1e-3)
        Hz = gram + ridge * eye_z
        r = _matvec(A, x) - b
        cz = _vecmat(r, Az) * zmask

        def hz_mv(z):
            """Factor-form Hz z (exact PSD operator; no materialized
            Gram perturbation) for refinement residuals."""
            return (_vecmat(_matvec(Az, z), Az) + ridge * z) * zmask

        return Az, Hz, cz, hz_mv

    def init_solve(Hz, cz, hz_mv):
        inv0 = _gj_inverse(Hz, nx, eye)
        return _refined_solve_op(inv0, hz_mv, -cz, zmask)

    if warm is not None:
        w_valid = jnp.minimum(jnp.max(warm[0:1]), 1.0)
        wz0, wv0 = warm[1:2], warm[2:3]
        wlam_a, wlam_b = warm[3:4], warm[4:5]
        wz1, wlam1 = warm[5:6], warm[6:7]
        wz2, wlam2 = warm[7:8], warm[8:9]
    else:
        w_valid = None

    def eq_level_solve(Hz, cz, hz_mv, B, h, smask1, m_count, wz, wlam):
        """Level with no new slack: decision z (36), inequalities B z <= h
        (the level-0 rows carried down through Z)."""
        def Hmv(z):
            return hz_mv(z)

        def Gmv(z):
            return _dg(z, B, ((1,), (1,))) * smask1

        def GTmv(y):
            return _vecmat(y, B) * zmask

        def solveM(d, rhs):
            # materialized-M refinement: factor-form residuals amplify
            # f32 noise by the d ~ 1e8 active-constraint weights (see
            # wbc.qp.solve_qp's solveM note)
            dgm = eye * d                                # diag(d)
            S = Hz + _mmT(B, _mm(dgm, B)) * zmask
            Sinv = _gj_inverse(S, nx, eye)
            return _refined_solve(Sinv, S, rhs, zmask)

        scale = jnp.maximum(1.0, _norm_masked(cz, zmask))
        x0 = init_solve(Hz, cz, hz_mv)
        lvl_warm = (None if w_valid is None
                    else (w_valid, wz * zmask, wlam * smask1))
        bx, _, blam = _ip_solve(x0, cz, h, smask1, m_count, Hmv, Gmv, GTmv,
                                solveM, scale, spec.qp_iters, warm=lvl_warm)
        return bx, blam

    # ---------------- level 0: (z, v) with slack v ----------------
    x = jnp.zeros((1, LANES), jnp.float32)
    Z = eye_z
    Az0, Hz0, cz0, hz0_mv = level_data(A0, b0, Z, x)

    def Hmv0(xz):
        z, v = xz
        return (hz0_mv(z), v * vmask)

    def Gmv0(xz):
        z, v = xz
        Dz = _dg(z, D, ((1,), (1,)))
        return (-v * vmask, (Dz - v) * vmask)

    def GTmv0(y):
        y1, y2 = y
        return (_vecmat(y2, D) * zmask, (-y1 - y2) * vmask)

    def solveM0(d, rhs):
        d1, d2 = d
        rz, rv = rhs
        mvv = 1.0 + d1 + d2
        w = d2 * (1.0 + d1) / mvv
        dgm = eye * w
        S = Hz0 + _mmT(D, _mm(dgm, D)) * zmask
        Sinv = _gj_inverse(S, nx, eye)
        rz_s = rz + _vecmat(d2 * rv / mvv, D) * zmask
        dz = _refined_solve(Sinv, S, rz_s, zmask)
        Ddz = _dg(dz, D, ((1,), (1,)))
        dv = (rv + d2 * Ddz) / mvv * vmask
        return (dz, dv)

    zeros = jnp.zeros((1, LANES), jnp.float32)
    c0 = (cz0, zeros)
    h0 = (zeros, jnp.where(dmask > 0, f, 1.0))
    smask0 = (vmask, dmask)
    scale0 = jnp.maximum(1.0, _norm_masked(cz0, zmask))
    x0_init = (init_solve(Hz0, cz0, hz0_mv), zeros)
    warm0 = (None if w_valid is None
             else (w_valid, (wz0 * zmask, wv0 * vmask),
                   (wlam_a * vmask, wlam_b * dmask)))
    (z0s, v0s), _, (lam_as, lam_bs) = _ip_solve(
        x0_init, c0, h0, smask0, n_v + n_act, Hmv0, Gmv0, GTmv0, solveM0,
        scale0, spec.qp_iters, warm=warm0)
    x = x + _dg(z0s, Z, ((1,), (1,)))
    Z = _mm(Z, projector(Az0, spec.ma0))

    def carried_h(x):
        """Carried level-0 bounds f - Dx + v0*; clamped at 0: exact
        arithmetic guarantees feasibility at the origin (level 0
        certified it with its optimal violation), so any negative value
        is pure f32 drift that would present the IP with an unreachable
        constraint (wbc.hoqp CLAMP_CARRIED rationale)."""
        hq = (f - _dg(x, D, ((1,), (1,))) + v0s)
        return jnp.where(dmask > 0, jnp.maximum(hq, 0.0), 1.0)

    # ---------------- level 1 ----------------
    Az1, Hz1, cz1, hz1_mv = level_data(A1, b1, Z, x)
    B1 = _mm(D, Z)
    z1s, lam1s = eq_level_solve(Hz1, cz1, hz1_mv, B1, carried_h(x), dmask,
                                n_act, wz1 if w_valid is not None else None,
                                wlam1 if w_valid is not None else None)
    x = x + _dg(z1s, Z, ((1,), (1,)))
    Z = _mm(Z, projector(Az1, spec.ma1))

    # ---------------- level 2 ----------------
    Az2, Hz2, cz2, hz2_mv = level_data(A2, b2, Z, x)
    B2 = _mm(D, Z)
    z2s, lam2s = eq_level_solve(Hz2, cz2, hz2_mv, B2, carried_h(x), dmask,
                                n_act, wz2 if w_valid is not None else None,
                                wlam2 if w_valid is not None else None)
    x = x + _dg(z2s, Z, ((1,), (1,)))
    warm_out = jnp.concatenate(
        [jnp.ones((1, LANES), jnp.float32), z0s, v0s, lam_as, lam_bs,
         z1s, lam1s, z2s, lam2s], axis=0)
    return x, warm_out


# ---------------------------------------------------------------------------
# padding + entry points
# ---------------------------------------------------------------------------

def _pad_mat(M):
    r, c = M.shape
    return jnp.zeros((LANES, LANES), jnp.float32).at[:r, :c].set(M)


def _pad_vec(v):
    return jnp.zeros((1, LANES), jnp.float32).at[0, :v.shape[0]].set(v)


def _padded_operands(t0: Task, t1: Task, t2: Task):
    spec = FusedCascadeSpec(ma0=t0.A.shape[0], nv0=t0.D.shape[0],
                            ma1=t1.A.shape[0], ma2=t2.A.shape[0])
    ops = (_pad_mat(t0.A), _pad_vec(t0.b), _pad_mat(t0.D), _pad_vec(t0.f),
           _pad_mat(t1.A), _pad_vec(t1.b), _pad_mat(t2.A), _pad_vec(t2.b))
    return ops, spec


def fused_hoqp_reference(t0: Task, t1: Task, t2: Task,
                         qp_iters: int = 10, warm=None,
                         return_warm: bool = False):
    """The kernel math as plain XLA (CPU closed loop, batch path, tests).
    Returns the (36,) decision vector, or (x, warm_out (9,128)) with
    return_warm=True; pass the previous solve's warm_out as `warm`."""
    ops, spec = _padded_operands(t0, t1, t2)
    spec = spec._replace(qp_iters=qp_iters)
    x, warm_out = _cascade_math(*ops, spec, warm=warm)
    x = x[0, :NUM_DECISION_VARS]
    return (x, warm_out) if return_warm else x


INTERPRET = False   # pallas interpreter mode (CPU validation of the
                    # pallas_call packaging; Mosaic lowering needs TPU)


def _fused_call(A0, b0, D, f, A1, b1, A2, b2, spec, warm=None):
    # NOTE: deliberately NOT jax.jit-wrapped — a nested jit becomes a
    # closed_call primitive that trips XLA's cached-lowering path when
    # the caller embeds this inside lax.scan; callers are jitted anyway.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = (jax.ShapeDtypeStruct((1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((9, LANES), jnp.float32))

    if warm is None:
        def kernel(A0r, b0r, Dr, fr, A1r, b1r, A2r, b2r, out_ref, wout_ref):
            x, w = _cascade_math(A0r[:], b0r[:], Dr[:], fr[:], A1r[:],
                                 b1r[:], A2r[:], b2r[:], spec)
            out_ref[:] = x
            wout_ref[:] = w

        return pl.pallas_call(
            kernel, out_shape=outs, in_specs=[vspec] * 8,
            out_specs=(vspec, vspec), interpret=INTERPRET,
        )(A0, b0, D, f, A1, b1, A2, b2)

    def kernel_w(A0r, b0r, Dr, fr, A1r, b1r, A2r, b2r, wr,
                 out_ref, wout_ref):
        x, w = _cascade_math(A0r[:], b0r[:], Dr[:], fr[:], A1r[:],
                             b1r[:], A2r[:], b2r[:], spec, warm=wr[:])
        out_ref[:] = x
        wout_ref[:] = w

    return pl.pallas_call(
        kernel_w, out_shape=outs, in_specs=[vspec] * 9,
        out_specs=(vspec, vspec), interpret=INTERPRET,
    )(A0, b0, D, f, A1, b1, A2, b2, warm)


def fused_hoqp_batched(t0: Task, t1: Task, t2: Task,
                       qp_iters: int = 10) -> jnp.ndarray:
    """Batched cascade: tasks carry a leading batch dim B; returns
    (B, 36) decision vectors.

    Round-4 findings on the batch path (measured on v5e, B=256):
      * jax.vmap over the single-scenario pallas_call gives ZERO batch
        speedup (550 solves/s vs the 575 implied by the 1.74 ms B=1
        latency) — a vmapped grid-less pallas_call becomes a grid over
        the batch, and grid steps run SEQUENTIALLY on the single v5e
        TensorCore;
      * a blocked pallas variant (K scenarios per grid step, cascade
        math vmapped inside the kernel over (K,128,128) buffers) fails
        to lower through Mosaic (remote-compile subprocess crash), even
        though minimal batched dot_general / fori / iota kernels all
        lower fine — the cascade's mixed-rank intermediates under vmap
        are the suspect; revisit when Mosaic's vmap coverage grows;
      * the SAME no-pivot cascade math as plain vmapped XLA hits 1866
        solves/s — 2.8x the pivoted hoqp_solve cascade (662), because
        the pivoted GJ's argmax+gather per elimination step serializes
        horribly under batching while the one-hot extraction here
        vectorizes.
    So the deployed batch path became the vmapped XLA math — and in
    round 5 the EXACT-SHAPE rewrite of the same math
    (kernels.cascade_exact: 6748 vs 1588 solves/s at B=256/20 iters —
    the padded (128,128) buffers, not the iterations, were the dominant
    batched cost). The B=1 real-time path stays the Mosaic kernel
    (fused_hoqp)."""
    from .cascade_exact import cascade_exact
    return jax.vmap(lambda a, b, c: cascade_exact(
        a, b, c, qp_iters))(t0, t1, t2)


def fused_hoqp(t0: Task, t1: Task, t2: Task,
               qp_iters: int = 10, warm=None, return_warm: bool = False):
    """Solve the 3-level cascade in one Pallas kernel; returns the (36,)
    decision vector (drop-in for wbc.hoqp.hoqp_solve on this stack
    family: level 0 owns all inequalities, levels 1-2 are equality
    tasks). On non-TPU backends (CPU tests) the same math runs as plain
    XLA — identical results, no Mosaic.

    warm/return_warm: tick-to-tick warm start (see _cascade_math) — pass
    the previous tick's warm_out; with a warm iterate the cascade holds
    referee-level torque accuracy at roughly half the IP iterations."""
    assert t1.D.shape[0] == 0 and t2.D.shape[0] == 0, (
        "fused cascade supports inequalities at level 0 only")
    if jax.default_backend() not in ("tpu", "axon"):
        return fused_hoqp_reference(t0, t1, t2, qp_iters, warm=warm,
                                    return_warm=return_warm)
    ops, spec = _padded_operands(t0, t1, t2)
    spec = spec._replace(qp_iters=qp_iters)
    x, warm_out = _fused_call(*ops, spec, warm=warm)
    x = x[0, :NUM_DECISION_VARS]
    return (x, warm_out) if return_warm else x
