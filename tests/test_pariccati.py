"""Parallel-scan Riccati (solver.pariccati) vs the serial sweep."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qm_control_tpu.solver.pariccati import (parallel_backward,
                                             parallel_linear_forward)


def _serial_backward(A, B, lx, lu, lxx, luu, lux, d, VxN, VxxN, reg):
    """Reference: the exact bstep recursion from solver.sqp.backward
    (plain matmul forms)."""
    nw = B.shape[-1]
    eye_w = jnp.eye(nw, dtype=A.dtype)

    def bstep(carry, inp):
        Vx, Vxx = carry
        A, B, lx, lu, lxx, luu, lux, d = inp
        Vxd = Vx + Vxx @ d
        Qx = lx + A.T @ Vxd
        Qu = lu + B.T @ Vxd
        VA = Vxx @ A
        Qxx = lxx + A.T @ VA
        Quu = luu + B.T @ (Vxx @ B)
        Qux = lux + B.T @ VA
        Quu_reg = 0.5 * (Quu + Quu.T) + reg * eye_w
        kK = jnp.linalg.solve(Quu_reg,
                              jnp.concatenate([Qu[:, None], Qux], axis=-1))
        kff, Kfb = -kK[:, 0], -kK[:, 1:]
        Quu_k = Quu @ kff
        Vx_new = Qx + Kfb.T @ Quu_k + Kfb.T @ Qu + Qux.T @ kff
        KQux = Kfb.T @ Qux
        Vxx_new = Qxx + Kfb.T @ (Quu @ Kfb) + KQux + KQux.T
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
        return (Vx_new, Vxx_new), (kff, Kfb)

    (_, _), (kffs, Kfbs) = jax.lax.scan(
        bstep, (VxN, VxxN), (A, B, lx, lu, lxx, luu, lux, d), reverse=True)
    return kffs, Kfbs


def _random_lq(rng, N=12, nx=5, nw=3, scale=0.3):
    A = jnp.asarray(np.eye(nx) + scale * rng.standard_normal((N, nx, nx)),
                    jnp.float32)
    B = jnp.asarray(scale * rng.standard_normal((N, nx, nw)), jnp.float32)
    lx = jnp.asarray(rng.standard_normal((N, nx)), jnp.float32)
    lu = jnp.asarray(rng.standard_normal((N, nw)), jnp.float32)
    q = rng.standard_normal((N, nx, nx))
    lxx = jnp.asarray(q @ q.transpose(0, 2, 1) * 0.1
                      + np.eye(nx), jnp.float32)
    r = rng.standard_normal((N, nw, nw))
    luu = jnp.asarray(r @ r.transpose(0, 2, 1) * 0.1
                      + np.eye(nw), jnp.float32)
    lux = jnp.asarray(0.1 * rng.standard_normal((N, nw, nx)), jnp.float32)
    d = jnp.asarray(0.05 * rng.standard_normal((N, nx)), jnp.float32)
    VxN = jnp.asarray(rng.standard_normal(nx), jnp.float32)
    p = rng.standard_normal((nx, nx))
    VxxN = jnp.asarray(p @ p.T * 0.1 + np.eye(nx), jnp.float32)
    return A, B, lx, lu, lxx, luu, lux, d, VxN, VxxN


def test_parallel_backward_matches_serial():
    rng = np.random.default_rng(0)
    args = _random_lq(rng)
    reg = 1e-6
    k_s, K_s = _serial_backward(*args, reg)
    k_p, K_p = parallel_backward(*args, reg)
    ks, Ks = np.asarray(k_s), np.asarray(K_s)
    kp, Kp = np.asarray(k_p), np.asarray(K_p)
    assert np.max(np.abs(ks - kp)) < 2e-3 * (1 + np.max(np.abs(ks))), (
        np.max(np.abs(ks - kp)))
    assert np.max(np.abs(Ks - Kp)) < 2e-3 * (1 + np.max(np.abs(Ks)))


def test_parallel_backward_long_horizon():
    rng = np.random.default_rng(1)
    args = _random_lq(rng, N=67, nx=6, nw=4, scale=0.15)
    reg = 1e-6
    k_s, K_s = _serial_backward(*args, reg)
    k_p, K_p = parallel_backward(*args, reg)
    rel = np.max(np.abs(np.asarray(k_s) - np.asarray(k_p))) / (
        1 + np.max(np.abs(np.asarray(k_s))))
    assert rel < 5e-3, rel


def test_parallel_forward_matches_serial():
    rng = np.random.default_rng(2)
    N, nx, nw = 15, 5, 3
    A, B, lx, lu, lxx, luu, lux, d, VxN, VxxN = _random_lq(rng, N, nx, nw)
    kffs = jnp.asarray(rng.standard_normal((N, nw)), jnp.float32)
    Kfbs = jnp.asarray(0.2 * rng.standard_normal((N, nw, nx)), jnp.float32)
    X = jnp.asarray(rng.standard_normal((N + 1, nx)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((N, nw)), jnp.float32)
    alpha = 0.7

    def step(dx, inp):
        A, B, dk, kff, Kfb = inp
        dw = alpha * kff + Kfb @ dx
        dx_next = A @ dx + B @ dw + alpha * dk
        return dx_next, (dx, dw)

    dxN, (dX, dW) = jax.lax.scan(step, jnp.zeros(nx, jnp.float32),
                                 (A, B, d, kffs, Kfbs))
    X_s = X + jnp.concatenate([dX, dxN[None]], axis=0)
    W_s = W + dW
    X_p, W_p = parallel_linear_forward(X, W, A, B, d, kffs, Kfbs, alpha)
    assert np.max(np.abs(np.asarray(X_s) - np.asarray(X_p))) < 1e-4 * (
        1 + np.max(np.abs(np.asarray(X_s))))
    assert np.max(np.abs(np.asarray(W_s) - np.asarray(W_p))) < 1e-4 * (
        1 + np.max(np.abs(np.asarray(W_s))))


@pytest.mark.heavy
def test_full_mpc_solve_parallel_vs_serial():
    """End-to-end: the full standing MPC solve with parallel_riccati
    gives the same policy as the serial sweep (small horizon)."""
    from qm_control_tpu.config import MpcConfig, QmConfig
    from qm_control_tpu.experiments import _standing_setup
    from qm_control_tpu.gaits.library import GAIT_LIBRARY, GaitSchedule
    from qm_control_tpu.mpc.mpc import mpc_step
    from qm_control_tpu.ocp.problem import make_ocp
    from qm_control_tpu.ocp.reference import target_from_knots
    from qm_control_tpu.runtime.estimator import (observation_from_rbd,
                                                  rbd_state_from_plant)
    from qm_control_tpu.runtime.plant import init_plant_state
    from qm_control_tpu.solver.sqp import SqpSettings
    import qm_control_tpu.models.centroidal as C

    cfg = QmConfig().with_(mpc=MpcConfig(time_horizon=0.3, dt=0.03,
                                         num_iterations=2))
    model, info, q0, s = _standing_setup(cfg)
    ocp = make_ocp(model, info, cfg)
    target = target_from_knots([0.0, 5.0], [s, s])
    ms = GaitSchedule(GAIT_LIBRARY["trot"]).mode_schedule(0.0, 5.0)
    plant = init_plant_state(q0, model=model)
    rbd = rbd_state_from_plant(model, plant.q, plant.v)
    x0 = observation_from_rbd(model, info, rbd)
    N = cfg.mpc.num_nodes
    w0 = C.weight_compensating_input(info, jnp.ones(4)).astype(jnp.float32)
    W = jnp.tile(w0[None], (N, 1))
    X = jnp.tile(x0[None].astype(jnp.float32), (N + 1, 1))

    pols = {}
    for par in (False, True):
        st = SqpSettings(num_iterations=2, unrolled_ops=False,
                         parallel_riccati=par)
        pols[par] = mpc_step(ocp, model, info, cfg, st, jnp.asarray(0.0),
                             x0, target, ms, W, X, jnp.asarray(0.0),
                             jnp.asarray(False))
    Ws = np.asarray(pols[False].W)
    Wp = np.asarray(pols[True].W)
    scale = 1 + np.max(np.abs(Ws))
    assert np.max(np.abs(Ws - Wp)) / scale < 5e-3, (
        np.max(np.abs(Ws - Wp)) / scale)
    assert abs(float(pols[False].cost) - float(pols[True].cost)) < 1e-2 * (
        1 + abs(float(pols[False].cost)))
