"""Per-stage roofline breakdown of the batched MPC solve (VERDICT r3 #3).

Compiles the three solver stages separately at a given batch size and
reports per-stage time, flops, and HBM bytes from XLA cost analysis:

  1. linearize  — vmapped fused stage_linearize over N nodes
  2. backward   — Riccati sweep (lax.scan)
  3. linesearch — 4-candidate linear forward + merit

The sum approximates the fused solve (the fused program fuses more, so
stage sums are an upper bound on bytes); the per-stage shares say where
bytes/solve reduction pays.

Usage (on the TPU host): python tools/profile_mpc_stages.py [B]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from qm_control_tpu.config import QmConfig
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models import load_model
from qm_control_tpu.ocp.problem import make_node_data, make_ocp
from qm_control_tpu.solver.sqp import SqpSettings
from __graft_entry__ import _setup


def timed(fn, args, iters=10, donate=()):
    jfn = jax.jit(fn, donate_argnums=donate)
    lowered = jfn.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else (ca or {})
    out = compiled(*args)
    jax.block_until_ready(out)
    if donate:
        # donated buffers: re-make args each call, time only a fresh run
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
    else:
        out = compiled(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
    return dt, float(ca.get("flops", 0)), float(ca.get("bytes accessed", 0)), out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg, model, info, x0, target, ms = _setup(QmConfig())
    N = cfg.mpc.num_nodes
    settings = SqpSettings(num_iterations=1)
    ocp = make_ocp(model, info, cfg)
    nx, nw = 30, 30

    tile = lambda a: jnp.tile(jnp.asarray(a)[None], (B,) + (1,) * jnp.ndim(a))
    tB = jnp.zeros(B, jnp.float32)
    xB = tile(x0)
    targetB = jax.tree_util.tree_map(tile, target)
    msB = jax.tree_util.tree_map(tile, ms)
    WB = jnp.zeros((B, N, nw), jnp.float32)
    XB = tile(jnp.tile(jnp.asarray(x0)[None], (N + 1, 1)))

    def node_data_of(t, x, target1, ms1):
        return make_node_data(ms1, target1, x, t, cfg)

    paramsB = jax.jit(jax.vmap(node_data_of))(tB, xB, targetB, msB)

    # ---- stage 1: linearize ----
    def linearize1(params, X, W, target1):
        def node(k):
            kd = (params.t_nodes[k], params.contact_flags[k],
                  params.swing_zdot[k])
            return ocp.stage_linearize(kd[0], kd[1], kd[2], X[k], W[k],
                                       target1)
        return jax.vmap(node)(jnp.arange(N))

    linB = jax.vmap(linearize1, in_axes=(0, 0, 0, 0))
    dt1, fl1, by1, linout = timed(linB, (paramsB, XB, WB, targetB))

    A, Bm, L, lx, lw, lxx, lww, lwx = linout

    # ---- stage 2: backward Riccati ----
    from qm_control_tpu.solver import sqp as S

    def backward1(A, Bm, lx, lw, lxx, lww, lwx, d, VxN, VxxN):
        # reproduce sqp.backward's serial scan with unrolled ops
        from qm_control_tpu.models.smallmat import (mm_unrolled, mtm_unrolled,
                                                    mtv_unrolled, mv_unrolled,
                                                    spd_solve_unrolled)
        reg = settings.reg

        def bstep(carry, inp):
            Vx, Vxx = carry
            A, B_, lx, lu, lxx, luu, lux, d = inp
            Vxd = Vx + mv_unrolled(Vxx, d)
            Qx = lx + mtv_unrolled(A, Vxd)
            Qu = lu + mtv_unrolled(B_, Vxd)
            VA = mm_unrolled(Vxx, A)
            Qxx = lxx + mtm_unrolled(A, VA)
            Quu = luu + mtm_unrolled(B_, mm_unrolled(Vxx, B_))
            Qux = lux + mtm_unrolled(B_, VA)
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
            return (Vx_new, 0.5 * (Vxx_new + jnp.swapaxes(Vxx_new, -1, -2))), \
                (kff, Kfb)

        (_, _), out = jax.lax.scan(bstep, (VxN, VxxN),
                                   (A, Bm, lx, lw, lxx, lww, lwx, d),
                                   reverse=True)
        return out

    dB = jnp.zeros((B, N, nx), jnp.float32)
    VxN = jnp.zeros((B, nx), jnp.float32)
    VxxN = jnp.tile(jnp.eye(nx, dtype=jnp.float32)[None], (B, 1, 1))
    bwB = jax.vmap(backward1)
    dt2, fl2, by2, bwout = timed(bwB, (A, Bm, lx, lw, lxx, lww, lwx, dB,
                                       VxN, VxxN))
    kff, Kfb = bwout

    # ---- stage 3: line search (4 candidates: forward + merit) ----
    def linesearch1(params, X, W, A, Bm, d, kff, Kfb, target1):
        from qm_control_tpu.models.smallmat import mv_unrolled

        def fwd(alpha):
            def step(dx, inp):
                A_, B_, dk, k_, K_ = inp
                dw = alpha * k_ + mv_unrolled(K_, dx)
                dxn = mv_unrolled(A_, dx) + mv_unrolled(B_, dw) + alpha * dk
                return dxn, (dx, dw)
            dxN, (dX, dW) = jax.lax.scan(step, jnp.zeros(nx, X.dtype),
                                         (A, Bm, d, kff, Kfb))
            Xc = X + jnp.concatenate([dX, dxN[None]], axis=0)
            Wc = W + dW
            node_data = (params.t_nodes[:-1], params.contact_flags[:-1],
                         params.swing_zdot[:-1])
            costs, f = jax.vmap(lambda kd, x, w: ocp.cost_and_dynamics(
                kd[0], kd[1], kd[2], x, w, target1))(node_data, Xc[:-1], Wc)
            return jnp.sum(costs), jnp.sum(jnp.abs(f - Xc[1:]))
        return jax.vmap(fwd)(jnp.asarray(settings.alphas, X.dtype))

    lsB = jax.vmap(linesearch1, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0))
    dt3, fl3, by3, _ = timed(lsB, (paramsB, XB, WB, A, Bm, dB, kff, Kfb,
                                   targetB))

    tot_dt = dt1 + dt2 + dt3
    print(f"B={B}  N={N}")
    for name, dt, fl, by in [("linearize", dt1, fl1, by1),
                             ("backward ", dt2, fl2, by2),
                             ("linesearch", dt3, fl3, by3)]:
        print(f"{name}: {dt*1e3:8.2f} ms  {fl/B/1e6:8.1f} MFLOP/solve  "
              f"{by/B/1e6:8.2f} MB/solve  AI={fl/max(by,1):.3f}  "
              f"BW={by/dt/1e9:6.1f} GB/s  share={dt/tot_dt*100:4.1f}%")
    print(f"stage-sum: {tot_dt*1e3:.2f} ms -> {B/tot_dt:.0f} solves/s "
          f"(fused full step measured separately)")


if __name__ == "__main__":
    main()
