"""Structured (analytic) stage linearization — the bytes/solve fix.

Round-3 roofline (tools/profile_mpc_stages.py): the fused autodiff
stage_linearize is 59 % of the batched solve's time and 173 of 186
MB/solve, running at ~78 % of HBM peak — a 60-tangent jax.linearize
pushed through every FK/flow/input-map intermediate. This module computes
the SAME outputs with the tangent pushes restricted to where they are
irreducible:

  * flow_map is LINEAR in u given the state:  f(x, u) = c(x) + D(x) u,
    so its Jacobians need only foot positions + Jacobians (ONE
    scalar-structured chainfk.foot_kinematics primal per RK2 stage — no
    tangents through FK), the SRBD COM rotation derivative (closed form),
    and the 6-dim base-velocity map's Jacobian (9 packed tangents through
    a ~200-primitive graph).
  * RK2 derivatives are composed by exact chain rule from the two stage
    Jacobians:  F = x + dt f(x + dt/2 f(x,u), u).
  * of the input reparameterization u = u0(x) + N(x) w, ONLY the 12
    leg-velocity components depend on x (forces have a constant mask
    block, the arm block is identity), so the one remaining jacfwd is
    12 outputs x 21 inputs through the leg chains — and the (30,30)
    matrices are assembled by block concatenation, never by scatters
    (a scattered `.at[].set` inside the differentiated graph replays a
    900-float buffer copy per tangent per node; measured 360 ms at
    B=256 vs ~25 ms for this layout).
  * the EE residual Jacobian needs 12 tangents (base pose 6 + arm 6)
    through the arm chain only.

Reference parity: replaces the CppAD-codegen analytic Jacobians of
QMDynamicsAD::linearApproximation (qm_interface/src/dynamics/
QMDynamicsAD.cpp:12-33) — the reference also hand-assembles (via codegen)
rather than re-differentiating per query. Exactness is enforced by
tests/test_linearize.py against the autodiff path (same math, so
agreement is at f32 roundoff).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..config import QmConfig
from ..models import centroidal as C
from ..models import chainfk
from ..models.rotations import euler_zyx_to_R
from ..models.smallmat import mm_unrolled, mtm_unrolled, mtv_unrolled
from ..models.spec import CONTACT_LEG_JOINTS, RobotModel
from .constraints import _DAMP, _damped_solve, input_parameterization
from .costs import ee_residual, make_stage_quadratizer_parts
from .reference import TargetTrajectory, interpolate_ee_pose


def _skew(v):
    z = jnp.zeros((), dtype=v.dtype)
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z])])


def _euler_rate_axes(zyx):
    """World-frame axes (3,3) [az | ay | ax] such that the position
    derivative of a base-fixed point w.r.t. the ZYX euler angles is
    [a_k x r] per column (matches chainfk.foot_kinematics rot_cols)."""
    cz, sz = jnp.cos(zyx[0]), jnp.sin(zyx[0])
    cy, sy = jnp.cos(zyx[1]), jnp.sin(zyx[1])
    zero = jnp.zeros_like(cz)
    az = jnp.stack([zero, zero, jnp.ones_like(cz)])
    ay = jnp.stack([-sz, cz, zero])
    ax = jnp.stack([cz * cy, sz * cy, -sy])
    return jnp.stack([az, ay, ax], axis=1)        # (3,3) columns


def make_structured_linearize(model: RobotModel, info: C.CentroidalInfo,
                              cfg: QmConfig):
    """Returns stage_linearize(t, flags, zdot, x, w, target, ee_wrench)
    -> (A, B, dt*L, dt*lx, dt*lw, dt*lxx, dt*lww, dt*lwx), matching
    ocp.problem.make_ocp's autodiff stage_linearize at f32 roundoff."""
    stage_q_xu = make_stage_quadratizer_parts(model, info, cfg)
    dt = cfg.mpc.dt
    mass = info.mass
    r_com = np.asarray(info.r_com_base)
    # feet (LF, RF, LH, RH) -> joint-order leg blocks (LF, LH, RF, RH):
    # foot_for_joint_block[b] = foot whose 3 joints sit at block b
    offs = [CONTACT_LEG_JOINTS[f][0] for f in range(4)]
    foot_for_block = np.argsort(offs)              # e.g. [0, 2, 1, 3]

    def com_and_jac(x):
        """SRBD COM position and its Jacobian w.r.t. x[6:12]."""
        R = euler_zyx_to_R(x[9:12])
        r_w = R @ jnp.asarray(r_com, dtype=x.dtype)
        p_com = x[6:9] + r_w
        ax = _euler_rate_axes(x[9:12])
        J_rot = jnp.stack([jnp.cross(ax[:, k], r_w)
                           for k in range(3)], axis=1)       # (3,3)
        J = jnp.concatenate([jnp.eye(3, dtype=x.dtype), J_rot], axis=1)
        return p_com, J                                      # (3,), (3,6)

    def base_dot_and_jac(x):
        """base_velocity_from_momentum and its (6,9) Jacobian w.r.t. its
        9 inputs (momentum 0:6, euler 9:12)."""
        def f(p9):
            xx = jnp.concatenate([p9[:6], x[6:9], p9[6:9], x[12:30]])
            return C.base_velocity_from_momentum(info, xx)
        p9 = jnp.concatenate([x[:6], x[9:12]])
        bd, jvp = jax.linearize(f, p9)
        J9 = jax.vmap(jvp)(jnp.eye(9, dtype=x.dtype))        # (9,6)
        return bd, J9.T                                      # (6,), (6,9)

    z = lambda r, c, dtype: jnp.zeros((r, c), dtype=dtype)

    def flow_and_jacs(x, u, ee_wrench, ee_pJ=None):
        """f(x,u) with the Jacobians in COMPACT row-block form:
        R (9,30) = rows 3:12 of Jx (its only nonzero rows: momentum
        torque + base-velocity map), S (6,30) = rows 0:6 of Ju (rows
        6:12 are zero, rows 12:30 are the constant [0 I18]).
        ee_pJ: (p_ee, J_ee(3,30)) at this state when ee_wrench is set."""
        dtype = x.dtype
        q = C.state_to_q(x)
        p_feet, Jb, Jl = chainfk.foot_kinematics(model, q)
        forces = u[:12].reshape(4, 3)
        p_com, J_com6 = com_and_jac(x)
        bd, J_bd9 = base_dot_and_jac(x)

        f_total = forces.sum(0)
        r = p_feet - p_com[None, :]                          # (4,3)
        tau_com = jnp.cross(r, forces).sum(0)

        # rows 3:6 of Jx: d(sum_i r_i x f_i)/dx / m
        Sf = jax.vmap(_skew)(forces)                         # (4,3,3)
        Jang_base = (-jnp.einsum("fij,fjk->ik", Sf, Jb)
                     + _skew(f_total) @ J_com6)              # (3,6)
        Jang_leg = -jnp.einsum("fij,fjk->fik", Sf, Jl)       # (4,3,3)
        Jang_legs12 = jnp.concatenate(
            [Jang_leg[f] for f in foot_for_block], axis=1)   # (3,12)
        row36 = jnp.concatenate(
            [z(3, 6, dtype), Jang_base, Jang_legs12, z(3, 6, dtype)],
            axis=1) / mass

        if ee_wrench is not None:
            wr = jnp.asarray(ee_wrench, dtype=dtype)
            p_ee, J_ee = ee_pJ
            f_total = f_total + wr[:3]
            tau_com = (tau_com + jnp.cross(p_ee - p_com, wr[:3]) + wr[3:])
            Jcom30 = jnp.concatenate(
                [z(3, 6, dtype), J_com6, z(3, 18, dtype)], axis=1)
            row36 = row36 - _skew(wr[:3]) @ (J_ee - Jcom30) / mass

        # rows 6:12: base velocity map
        row612 = jnp.concatenate(
            [J_bd9[:, :6], z(6, 3, dtype), J_bd9[:, 6:9], z(6, 18, dtype)],
            axis=1)
        R = jnp.concatenate([row36, row612], axis=0)         # (9,30)

        # Ju rows: 0:3 forces/m; 3:6 skew(r_i)/m; (12:30 identity const)
        urow03 = jnp.concatenate(
            [jnp.tile(jnp.eye(3, dtype=dtype) / mass, (1, 4)),
             z(3, 18, dtype)], axis=1)
        Sr12 = jnp.concatenate(
            [_skew(r[f]) for f in range(4)], axis=1) / mass  # (3,12)
        urow36 = jnp.concatenate([Sr12, z(3, 18, dtype)], axis=1)
        S = jnp.concatenate([urow03, urow36], axis=0)        # (6,30)

        g = jnp.array([0.0, 0.0, -C.GRAVITY], dtype=dtype)
        f_val = jnp.concatenate([f_total / mass + g, tau_com / mass, bd,
                                 u[12:30]])
        return f_val, R, S

    def legvel_rows(x, w, flags, zdot):
        """The 12 leg-velocity components of u = u0(x) + N(x) w, in
        JOINT order — the only x-dependent rows of the input map."""
        dtype = x.dtype
        q = C.state_to_q(x)
        base_dot = C.base_velocity_from_momentum(info, x)
        _, Jb, Jl = chainfk.foot_kinematics(model, q)
        c = jnp.asarray(flags, dtype=dtype)
        rhs = -jnp.einsum("fij,j->fi", Jb, base_dot)
        u_stance = _damped_solve(Jl, rhs)                    # (4,3)
        a = Jl[:, 2, :]
        b = zdot - Jb[:, 2, :] @ base_dot
        aa = jnp.sum(a * a, axis=1) + _DAMP
        u_swing = a * (b / aa)[:, None]
        w_legs = jnp.stack([w[12 + CONTACT_LEG_JOINTS[f][0]:
                              12 + CONTACT_LEG_JOINTS[f][0] + 3]
                            for f in range(4)])              # (4,3) foot order
        Pw = w_legs - a * (jnp.sum(a * w_legs, axis=1) / aa)[:, None]
        rows = (c[:, None] * u_stance
                + (1.0 - c[:, None]) * (u_swing + Pw))       # (4,3)
        return jnp.concatenate([rows[f] for f in foot_for_block])  # (12,)

    def param_and_jac(x, w, flags, zdot):
        """u (30,) plus the input map in COMPACT block form: the only
        x-dependent rows of du/dx are the 12 leg velocities -> Jlegs
        (12,30); N is block-diagonal [diag(cf12), Nl, I6] -> cf12 (12,)
        force-mask diagonal and Nl (12,12) swing-projector block. 21
        tangents through the leg chains."""
        dtype = x.dtype

        def f(p21):
            xx = jnp.concatenate([p21[:6], x[6:9], p21[6:9], p21[9:21],
                                  x[24:30]])
            return legvel_rows(xx, w, flags, zdot)

        p21 = jnp.concatenate([x[:6], x[9:12], x[12:24]])
        legs, jvp = jax.linearize(f, p21)
        J21 = jax.vmap(jvp)(jnp.eye(21, dtype=dtype)).T      # (12,21)
        Jlegs = jnp.concatenate(
            [J21[:, :6], z(12, 3, dtype), J21[:, 6:9], J21[:, 9:21],
             z(12, 6, dtype)], axis=1)                       # (12,30)

        c = jnp.asarray(flags, dtype=dtype)
        u_forces = jnp.concatenate(
            [c[f] * w[3 * f:3 * f + 3] for f in range(4)])
        u = jnp.concatenate([u_forces, legs, w[24:30]])

        # N blocks: force mask diag, swing projectors on leg blocks
        # (the arm block is the identity and stays implicit)
        _, _, Jl = chainfk.foot_kinematics(model, C.state_to_q(x))
        a = Jl[:, 2, :]
        aa = jnp.sum(a * a, axis=1) + _DAMP
        P_swing = (jnp.broadcast_to(jnp.eye(3, dtype=dtype), (4, 3, 3))
                   - a[:, :, None] * a[:, None, :] / aa[:, None, None])
        cf12 = jnp.repeat(c, 3)                              # (12,)
        blocks = []
        for b_ in range(4):
            f_ = int(foot_for_block[b_])
            row = [z(3, 3, dtype)] * 4
            row[b_] = (1.0 - c[f_]) * P_swing[f_]
            blocks.append(jnp.concatenate(row, axis=1))
        Nl = jnp.concatenate(blocks, axis=0)                 # (12,12)
        return u, Jlegs, cf12, Nl

    def ee_and_jac(x, p_ref, q_ref):
        """EE residual e(6), Je (6,30), and the EE position + (3,30)
        position Jacobian (12 tangents through the arm chain)."""
        dtype = x.dtype

        def f(p12):
            xx = jnp.concatenate([x[:6], p12[:6], x[12:24], p12[6:12]])
            return ee_residual(model, xx, p_ref, q_ref)

        p12 = jnp.concatenate([x[6:12], x[24:30]])
        e, jvp = jax.linearize(f, p12)
        J12 = jax.vmap(jvp)(jnp.eye(12, dtype=dtype)).T      # (6,12)
        Je = jnp.concatenate(
            [z(6, 6, dtype), J12[:, :6], z(6, 12, dtype), J12[:, 6:12]],
            axis=1)
        p_ee = e[:3] + p_ref
        return e, Je, p_ee, Je[:3]

    def stage_linearize(t, flags, zdot, x, w, target: TargetTrajectory,
                        ee_wrench=None):
        p_ref, q_ref = interpolate_ee_pose(target, t)
        e, Je, p_ee, J_ee_pos = ee_and_jac(x, p_ref, q_ref)
        u, Jlegs, cf12, Nl = param_and_jac(x, w, flags, zdot)

        ee_pJ = (p_ee, J_ee_pos) if ee_wrench is not None else None
        f0, R0, S0 = flow_and_jacs(x, u, ee_wrench, ee_pJ)
        x_mid = x + 0.5 * dt * f0
        if ee_wrench is not None:
            # the wrench's state Jacobian needs the EE Jacobian AT x_mid
            _, _, p_ee_m, J_ee_m = ee_and_jac(x_mid, p_ref, q_ref)
            ee_pJ_mid = (p_ee_m, J_ee_m)
        else:
            ee_pJ_mid = None
        f1, R1, S1 = flow_and_jacs(x_mid, u, ee_wrench, ee_pJ_mid)

        dtype = x.dtype
        I = jnp.eye(30, dtype=dtype)
        # F = x + dt f(x + dt/2 f(x,u), u): exact RK2 chain rule, composed
        # in ROW-BLOCK form. Jx has only 9 nonzero rows (3:12) and Ju only
        # 6 variable rows (0:6; 12:30 is the constant [0 I18]), so the
        # dense (30,30)x(30,30) products of the padded formulation carry
        # >3x redundant work AND — under the contraction-unrolled lowering
        # the (B,N)-vmapped solve needs (see round-4 note below) — >3x
        # redundant partial-sum bytes. Round-5 roofline: the dense form's
        # linearize stage ran at 760 GB/s, i.e. AT the v5e HBM roofline,
        # 77.8 MB/solve; cutting contraction dims (30 -> 9/12) and output
        # rows is the only way down.
        # (Round-4 note: a batched 30x30 dot_general lowers through XLA's
        # convolution path with (256,67,30,30) layout copies; the
        # unrolled forms fuse into lane-parallel VPU kernels.)
        M01 = mm_unrolled(R1[:, 3:12], R0)                   # (9,30)
        R_A = R1 + 0.5 * dt * M01                            # rows 3:12 of (A-I)/dt
        A = I.at[3:12, :].add(dt * R_A)

        # T = rows 3:12 of Jx1 @ Ju0  (Ju0 = rows 0:6 = S0, rows 12:30 = [0 I])
        T = mm_unrolled(R1[:, 0:6], S0)
        T = T.at[:, 12:30].add(R1[:, 12:30])                 # (9,30)
        # U = rows 0:12 of dFdu_x; rows 12:30 are dt*[0 I18] (constant)
        U = jnp.zeros((12, 30), dtype=dtype)
        U = U.at[0:6, :].set(dt * S1)
        U = U.at[3:12, :].add(0.5 * dt * dt * T)

        # A += dFdu_x @ Ju_param  (Ju_param rows nonzero only at 12:24)
        A = A.at[0:12, :].add(mm_unrolled(U[:, 12:24], Jlegs))
        A = A.at[12:24, :].add(dt * Jlegs)

        # B = dFdu_x @ N  (N = blockdiag(diag(cf12), Nl, I6))
        B = jnp.zeros((30, 30), dtype=dtype)
        B = B.at[0:12, 0:12].set(U[:, 0:12] * cf12[None, :])
        B = B.at[0:12, 12:24].set(mm_unrolled(U[:, 12:24], Nl))
        B = B.at[0:12, 24:30].set(U[:, 24:30])
        B = B.at[12:24, 12:24].set(dt * Nl)
        B = B.at[24:30, 24:30].set(dt * jnp.eye(6, dtype=dtype))

        L, Lx, Lu, Lxx, Luu, Lux = stage_q_xu(t, x, u, target, flags, e, Je)

        def NT_rows(G):
            """N' @ G for (30, m) G, using the block structure."""
            return jnp.concatenate([
                cf12[:, None] * G[0:12], mtm_unrolled(Nl, G[12:24]),
                G[24:30]], axis=0)

        lx = Lx + mtv_unrolled(Jlegs, Lu[12:24])
        lw = NT_rows(Lu[:, None])[:, 0]
        LuuJu = mm_unrolled(Luu[:, 12:24], Jlegs)            # (30,30), k=12
        JuLux = mtm_unrolled(Jlegs, Lux[12:24, :])           # (30,30), k=12
        lxx = (Lxx + JuLux + jnp.swapaxes(JuLux, -1, -2)
               + mtm_unrolled(Jlegs, LuuJu[12:24, :]))
        G = Lux + LuuJu
        lwx = NT_rows(G)
        # lww = N' Luu N: right-multiply by blocks, then N' by rows
        K = jnp.concatenate([
            Luu[:, 0:12] * cf12[None, :],
            mm_unrolled(Luu[:, 12:24], Nl), Luu[:, 24:30]], axis=1)
        lww = NT_rows(K)
        return (A, B, dt * L, dt * lx, dt * lw, dt * lxx, dt * lww,
                dt * lwx)

    return stage_linearize
