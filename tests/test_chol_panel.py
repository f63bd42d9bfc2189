"""Layout-stable panel Cholesky parity vs XLA's expander."""

import numpy as np
import pytest

import jax.numpy as jnp

from nowcastautogp_tpu.ops.chol_panel import (
    PANEL, cholesky_panel, tri_inv_panel,
)


def _spd(P, n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((P, n, n)).astype(dtype)
    return jnp.asarray(M @ M.transpose(0, 2, 1) / n
                       + 2 * np.eye(n, dtype=dtype))


@pytest.mark.parametrize("n", [32, 64, 96, 192])
def test_cholesky_panel_matches_xla(n):
    A = _spd(4, n, seed=n)
    np.testing.assert_allclose(
        np.asarray(cholesky_panel(A)), np.asarray(jnp.linalg.cholesky(A)),
        rtol=2e-5, atol=2e-5)


def test_non_multiple_of_panel_rejected():
    A = _spd(2, PANEL + 8, seed=3)
    with pytest.raises(AssertionError):
        cholesky_panel(A)


def test_masked_identity_rows():
    # the LML's masked-capacity contract: identity rows factor exactly
    n, act = 64, 50
    A = np.array(_spd(2, n, seed=9))
    A[:, act:, :] = 0.0
    A[:, :, act:] = 0.0
    for i in range(act, n):
        A[:, i, i] = 1.0
    L = np.asarray(cholesky_panel(jnp.asarray(A)))
    np.testing.assert_allclose(
        L[:, act:, act:],
        np.broadcast_to(np.eye(n - act), (2, n - act, n - act)), atol=1e-6)
    np.testing.assert_allclose(
        L, np.asarray(jnp.linalg.cholesky(jnp.asarray(A))),
        rtol=2e-5, atol=2e-5)


def test_non_spd_rejected_via_nan():
    A = np.array(_spd(3, 64, seed=13))
    A[1, 0, 0] = -4.0
    L = cholesky_panel(jnp.asarray(A))
    lml_like = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
    assert bool(jnp.isnan(lml_like[1]))
    assert bool(jnp.isfinite(lml_like[0])) and bool(jnp.isfinite(lml_like[2]))


@pytest.mark.parametrize("n", [32, 96, 192])
def test_tri_inv_panel_matches_solve(n):
    import jax

    A = _spd(3, n, seed=n + 5)
    L = jnp.linalg.cholesky(A)
    W = tri_inv_panel(L)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
    ref = jax.lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)
    np.testing.assert_allclose(np.asarray(W), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)
    prod = jnp.einsum("pij,pjk->pik", W, L)
    np.testing.assert_allclose(np.asarray(prod), np.asarray(eye),
                               atol=2e-4)


def _lml_from_K_with_impl(impl, K, ln, y, mask):
    from nowcastautogp_tpu.ops import lml as lml_mod

    prior = lml_mod._CHOL_IMPL
    try:
        lml_mod.set_chol_impl(impl)
        return lml_mod._lml_from_K(K, ln, y, mask, 1e-5)
    finally:
        lml_mod.set_chol_impl(prior)


def _lml_inputs(n=64, P=4, act=50):
    rng = np.random.default_rng(22)
    K = np.array(_spd(P, n, seed=21)) - 2 * np.eye(n, dtype=np.float32)
    y = jnp.asarray(rng.standard_normal((P, n)).astype(np.float32))
    mask = jnp.broadcast_to((jnp.arange(n) < act).astype(jnp.float32), (P, n))
    ln = jnp.asarray(rng.normal(-2, 0.2, P).astype(np.float32))
    return jnp.asarray(K), ln, y, mask


def test_lml_from_K_panel_impl_matches():
    K, ln, y, mask = _lml_inputs()
    v1 = _lml_from_K_with_impl("xla", K, ln, y, mask)
    v2 = _lml_from_K_with_impl("panel", K, ln, y, mask)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-4, atol=1e-3)


def test_lml_from_K_panel_grad_matches():
    import jax

    K, ln, y, mask = _lml_inputs()

    def total(impl):
        return jax.grad(
            lambda K_, ln_: jnp.sum(
                _lml_from_K_with_impl(impl, K_, ln_, y, mask)),
            argnums=(0, 1))(K, ln)

    gK1, gl1 = total("xla")
    gK2, gl2 = total("panel")
    # cotangent placement conventions differ (autodiff puts the factor's
    # cotangent on the lower triangle); the symmetrized gradient — what a
    # symmetric K constructor consumes — must match
    sym = lambda g: g + jnp.swapaxes(g, -1, -2)  # noqa: E731
    np.testing.assert_allclose(np.asarray(sym(gK1)), np.asarray(sym(gK2)),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gl1), np.asarray(gl2),
                               rtol=2e-4, atol=2e-4)


def test_full_fit_under_panel_impl():
    """End-to-end fit + forecast with the panel core selected: guards the
    future TPU default flip.

    Runs in a SUBPROCESS with NGP_CHOL_IMPL=panel because the chol impl is
    resolved at trace time and is not part of any jit cache key — flipping
    it in-process could either reuse programs another test already traced
    under 'xla' (a vacuous pass) or bake 'panel' into the module-level jit
    caches every later same-shape test silently inherits.  The env knob
    gives a hermetic process where every program genuinely traces panel.
    """
    import os
    import subprocess
    import sys

    code = """
import jax; jax.config.update('jax_platforms', 'cpu')
import datetime as dtm
import numpy as np
import nowcastautogp_tpu as ngp
from nowcastautogp_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from nowcastautogp_tpu.ops import lml as lml_mod

assert lml_mod._CHOL_IMPL == 'panel', lml_mod._CHOL_IMPL
rng = np.random.default_rng(17)
n = 30
dates = [dtm.date(2023, 1, 2) + dtm.timedelta(weeks=i) for i in range(n)]
obs = 50 * np.exp(0.02 * np.arange(n) + 0.1 * rng.standard_normal(n))
data = ngp.create_transformed_data(dates, obs, transformation=np.log)
m = ngp.make_and_fit_model(
    data, n_particles=2, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2, seed=3)
fdates = [dates[-1] + dtm.timedelta(weeks=i + 1) for i in range(2)]
fc = ngp.forecast(m, fdates, 40, inv_transformation=np.exp)
assert fc.shape == (2, 40)
assert np.all(np.isfinite(fc)) and np.all(fc > 0)
assert np.all(np.isfinite(np.asarray(m.log_weight)))
print('PANEL-FIT-OK')
"""
    env = dict(os.environ)
    env["NGP_CHOL_IMPL"] = "panel"
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PANEL-FIT-OK" in proc.stdout


def test_lml_from_K_panel_falls_back_off_granule():
    # n = 40 is not a 32-multiple: "panel" must silently use the inv core
    K, ln, y, mask = _lml_inputs(n=40, act=30)
    v1 = _lml_from_K_with_impl("inv", K, ln, y, mask)
    v2 = _lml_from_K_with_impl("panel", K, ln, y, mask)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-5)
