"""Structured vs autodiff stage linearization parity.

ocp/linearize.py assembles the stage LQ data analytically (flow linear in
u; RK2 chain rule; 21-tangent input-map derivative; 12-tangent EE
Jacobian). The autodiff path (one 60-tangent jax.linearize through the
whole stage, ocp/problem.py) is kept as the independent cross-check:
identical math evaluated by a different mechanism, so agreement must be
at f32 roundoff. Covers stance/swing flag mixes and the EE-wrench
feedthrough (cites QMDynamicsAD::linearApproximation,
qm_interface/src/dynamics/QMDynamicsAD.cpp:12-33, as the reference's
equivalent analytic-Jacobian contract)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qm_control_tpu.config import QmConfig
from qm_control_tpu.models import centroidal as C
from qm_control_tpu.models import load_model
from qm_control_tpu.models.spec import default_q
from qm_control_tpu.ocp.linearize import make_structured_linearize
from qm_control_tpu.ocp.problem import make_ocp
from qm_control_tpu.ocp.reference import target_from_knots

NAMES = ["A", "B", "L", "lx", "lw", "lxx", "lww", "lwx"]


@pytest.fixture(scope="module")
def setup():
    cfg = QmConfig()
    cfg_ad = cfg.with_(mpc=dataclasses.replace(
        cfg.mpc, structured_linearize=False))
    model = load_model()
    info = C.make_centroidal_info(model)
    ocp_ad = make_ocp(model, info, cfg_ad)
    slin = make_structured_linearize(model, info, cfg)
    q0 = default_q(base_pos=(0, 0, 0.38))
    s = np.zeros(37)
    s[6:30] = q0
    s[8] = 0.4
    s[30:33] = [0.52, 0.09, 0.78]
    s[33:37] = [0.5, -0.5, 0.5, -0.5]
    target = target_from_knots([0.0, 10.0], [s, s])
    return ocp_ad, slin, s, target


def _compare(ad, st):
    for n, a, b in zip(NAMES, ad, st):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max() / max(1.0, np.abs(a).max())
        assert err < 2e-4, (n, err)


def test_parity_random_states(setup):
    ocp_ad, slin, s, target = setup
    ad_j = jax.jit(lambda t, f, z, x, w: ocp_ad.stage_linearize(
        t, f, z, x, w, target))
    st_j = jax.jit(lambda t, f, z, x, w: slin(t, f, z, x, w, target))
    rng = np.random.default_rng(0)
    for trial in range(4):
        x = jnp.asarray(s[:30] + rng.normal(0, 0.05, 30), jnp.float32)
        w = jnp.asarray(rng.normal(0, 5, 30), jnp.float32)
        flags = (jnp.ones(4, jnp.float32) if trial < 2 else
                 jnp.asarray(rng.integers(0, 2, 4), jnp.float32))
        zdot = jnp.asarray(rng.normal(0, 0.1, 4), jnp.float32)
        _compare(ad_j(jnp.float32(0.3), flags, zdot, x, w),
                 st_j(jnp.float32(0.3), flags, zdot, x, w))


def test_parity_with_wrench(setup):
    ocp_ad, slin, s, target = setup
    wr = jnp.asarray([3.0, -5.0, 2.0, 0.5, -0.2, 0.1], jnp.float32)
    ad_w = jax.jit(lambda t, f, z, x, w: ocp_ad.stage_linearize(
        t, f, z, x, w, target, ee_wrench=wr))
    st_w = jax.jit(lambda t, f, z, x, w: slin(
        t, f, z, x, w, target, ee_wrench=wr))
    rng = np.random.default_rng(1)
    for trial in range(2):
        x = jnp.asarray(s[:30] + rng.normal(0, 0.05, 30), jnp.float32)
        w = jnp.asarray(rng.normal(0, 5, 30), jnp.float32)
        flags = jnp.asarray(rng.integers(0, 2, 4), jnp.float32)
        zdot = jnp.asarray(rng.normal(0, 0.1, 4), jnp.float32)
        _compare(ad_w(jnp.float32(0.3), flags, zdot, x, w),
                 st_w(jnp.float32(0.3), flags, zdot, x, w))


def test_default_ocp_uses_structured(setup):
    """The default OCP must pick the structured path (cfg flag on)."""
    cfg = QmConfig()
    assert cfg.mpc.structured_linearize
