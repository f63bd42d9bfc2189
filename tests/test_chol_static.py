"""Statically-blocked Cholesky/solve parity vs XLA's expander."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from nowcastautogp_tpu.ops.chol_static import (
    cho_solve_static, cholesky_static, solve_lower_static,
)


def _spd(P, n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((P, n, n)).astype(dtype)
    return jnp.asarray(M @ M.transpose(0, 2, 1) / n
                       + 2 * np.eye(n, dtype=dtype))


@pytest.mark.parametrize("n", [8, 16, 24, 40, 64, 192])
def test_cholesky_matches_xla(n):
    A = _spd(4, n, seed=n)
    np.testing.assert_allclose(
        np.asarray(cholesky_static(A)), np.asarray(jnp.linalg.cholesky(A)),
        rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n", [16, 64, 192])
def test_cho_solve_matches_xla(n):
    A = _spd(3, n, seed=n + 1)
    rng = np.random.default_rng(n)
    b = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    L = cholesky_static(A)
    x = cho_solve_static(L, b)
    resid = jnp.einsum("pij,pj->pi", A, x) - b
    assert float(jnp.max(jnp.abs(resid))) < 1e-3


def test_solve_lower_multi_rhs():
    A = _spd(2, 64, seed=7)
    L = cholesky_static(A)
    rng = np.random.default_rng(8)
    B = jnp.asarray(rng.standard_normal((2, 64, 5)).astype(np.float32))
    Y = solve_lower_static(L, B)
    np.testing.assert_allclose(
        np.asarray(jnp.matmul(L, Y)), np.asarray(B), rtol=1e-4, atol=1e-4)


def test_masked_identity_rows():
    # the LML's masked-capacity contract: identity rows factor exactly
    n, act = 64, 50
    A = np.array(_spd(2, n, seed=9))
    A[:, act:, :] = 0.0
    A[:, :, act:] = 0.0
    for i in range(act, n):
        A[:, i, i] = 1.0
    L = cholesky_static(jnp.asarray(A))
    Ln = np.asarray(L)
    np.testing.assert_allclose(Ln[:, act:, act:],
                               np.broadcast_to(np.eye(n - act), (2, n - act,
                                                                 n - act)),
                               atol=1e-6)
    np.testing.assert_allclose(
        Ln, np.asarray(jnp.linalg.cholesky(jnp.asarray(A))),
        rtol=2e-5, atol=2e-5)


def test_grad_symmetrized_matches_xla():
    # cotangent placement conventions differ (lower vs symmetric) but the
    # symmetrized gradient — what flows into a symmetric K constructor —
    # must match
    A = _spd(3, 64, seed=11)
    rng = np.random.default_rng(12)
    ym = jnp.asarray(rng.standard_normal((3, 64)).astype(np.float32))

    def lml(cholf, solvef):
        def f(A_):
            L = cholf(A_)
            al = solvef(L)
            return jnp.sum(-0.5 * (
                jnp.einsum("pn,pn->p", ym, al)
                + 2 * jnp.sum(jnp.log(
                    jnp.diagonal(L, axis1=-2, axis2=-1)), -1)))
        return f

    g1 = jax.grad(lml(cholesky_static, lambda L: cho_solve_static(L, ym)))(A)
    g2 = jax.grad(lml(
        jnp.linalg.cholesky,
        lambda L: jax.vmap(lambda l, b: jsl.cho_solve((l, True), b))(L, ym),
    ))(A)
    sym = lambda g: g + jnp.swapaxes(g, -1, -2)  # noqa: E731
    np.testing.assert_allclose(np.asarray(sym(g1)), np.asarray(sym(g2)),
                               rtol=1e-4, atol=1e-4)


def test_non_spd_rejected_via_nan():
    A = np.array(_spd(3, 16, seed=13))
    A[1, 0, 0] = -4.0
    L = cholesky_static(jnp.asarray(A))
    lml_like = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
    assert bool(jnp.isnan(lml_like[1]))
    assert bool(jnp.isfinite(lml_like[0])) and bool(jnp.isfinite(lml_like[2]))


def test_lml_from_K_static_impl_matches():
    from nowcastautogp_tpu.ops import lml as lml_mod

    A = _spd(4, 64, seed=21)
    # raw covariance without diag: _lml_from_K adds mask/noise/jitter itself
    rng = np.random.default_rng(22)
    K = A - 2 * jnp.eye(64)
    y = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    mask = jnp.broadcast_to((jnp.arange(64) < 50).astype(jnp.float32),
                            (4, 64))
    ln = jnp.asarray(rng.normal(-2, 0.2, 4).astype(np.float32))
    prior = lml_mod._CHOL_IMPL
    try:
        lml_mod.set_chol_impl("xla")
        v1 = lml_mod._lml_from_K(K, ln, y, mask, 1e-5)
        lml_mod.set_chol_impl("static")
        v2 = lml_mod._lml_from_K(K, ln, y, mask, 1e-5)
    finally:
        lml_mod.set_chol_impl(prior)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-4, atol=1e-3)
