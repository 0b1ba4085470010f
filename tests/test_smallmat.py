"""Unrolled small-matrix algebra vs numpy references."""
import jax.numpy as jnp
import numpy as np

from qm_control_tpu.models.smallmat import (det3, inv3, mm3, mtv3, mv3,
                                            solve3)


def test_mm3_mv3_batched(rng):
    A = rng.standard_normal((5, 7, 3, 3)).astype(np.float32)
    B = rng.standard_normal((5, 7, 3, 3)).astype(np.float32)
    v = rng.standard_normal((5, 7, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(mm3(jnp.asarray(A), jnp.asarray(B))),
                               A @ B, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mv3(jnp.asarray(A), jnp.asarray(v))),
                               np.einsum("...ij,...j->...i", A, v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mtv3(jnp.asarray(A), jnp.asarray(v))),
                               np.einsum("...ji,...j->...i", A, v), atol=1e-5)


def test_inv3_solve3(rng):
    A = rng.standard_normal((10, 3, 3)).astype(np.float32)
    A = A + 3.0 * np.eye(3)       # well-conditioned
    b = rng.standard_normal((10, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(inv3(jnp.asarray(A))),
                               np.linalg.inv(A), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(solve3(jnp.asarray(A), jnp.asarray(b))),
        np.linalg.solve(A, b[..., None])[..., 0], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(det3(jnp.asarray(A))),
                               np.linalg.det(A), rtol=1e-3)


def test_inv3_eps_regularizes_singular():
    A = jnp.zeros((3, 3))
    out = np.asarray(inv3(A, eps=1e-6))
    assert np.isfinite(out).all()


def test_unrolled_matmuls(rng):
    from qm_control_tpu.models.smallmat import (mm_unrolled, mtm_unrolled,
                                                mtv_unrolled, mv_unrolled)
    A = rng.standard_normal((4, 30, 30)).astype(np.float32)
    B = rng.standard_normal((4, 30, 30)).astype(np.float32)
    v = rng.standard_normal((4, 30)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(mm_unrolled(jnp.asarray(A),
                                                      jnp.asarray(B))),
                               A @ B, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mtm_unrolled(jnp.asarray(A),
                                                       jnp.asarray(B))),
                               np.swapaxes(A, -1, -2) @ B, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mv_unrolled(jnp.asarray(A),
                                                      jnp.asarray(v))),
                               np.einsum("bij,bj->bi", A, v), atol=2e-4)
    np.testing.assert_allclose(np.asarray(mtv_unrolled(jnp.asarray(A),
                                                       jnp.asarray(v))),
                               np.einsum("bji,bj->bi", A, v), atol=2e-4)


def test_spd_solve_unrolled(rng):
    from qm_control_tpu.models.smallmat import spd_solve_unrolled
    n = 30
    M = rng.standard_normal((3, n, n)).astype(np.float32)
    A = M @ np.swapaxes(M, -1, -2) + n * np.eye(n, dtype=np.float32)
    B = rng.standard_normal((3, n, 5)).astype(np.float32)
    X = np.asarray(spd_solve_unrolled(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(A @ X, B, atol=2e-3)
