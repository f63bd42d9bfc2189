"""Pallas blocked-Cholesky LML core: correctness vs the XLA path.

Runs in interpret mode on CPU (``ops/pallas_chol._interpret``), so the exact
kernel program the TPU executes is checked here, including the analytic
dK = 0.5(aa^T - K^{-1}) VJP and the non-PSD NaN rejection contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module", autouse=True)
def _no_persistent_cache():
    """Interpret-mode kernels serialize to enormous cache entries whose
    write/read has crashed XLA:CPU (SIGABRT) twice in full-suite runs —
    keep this module out of the persistent compilation cache."""
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)

from nowcastautogp_tpu.ops.pallas_chol import (
    chol_inverse_batched, chol_solve_batched, lml_core,
)
from nowcastautogp_tpu.ops import lml as lml_mod


def _spd(P, n, seed=0, mask_last=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((P, n, n)).astype(np.float32)
    K = np.einsum("pij,pkj->pik", A, A) / n + 2.0 * np.eye(n, dtype=np.float32)
    ym = rng.standard_normal((P, n)).astype(np.float32)
    if mask_last:
        K[:, -mask_last:, :] = 0
        K[:, :, -mask_last:] = 0
        for i in range(n - mask_last, n):
            K[:, i, i] = 1.0
        ym[:, -mask_last:] = 0
    return jnp.asarray(K), jnp.asarray(ym)


def _ref_core(K, ym):
    L = jnp.linalg.cholesky(K)
    alpha = jax.vmap(lambda L, b: jax.scipy.linalg.cho_solve((L, True), b))(
        L, ym)
    quad = jnp.sum(ym * alpha, -1)
    logdet = 2 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
    return -0.5 * (quad + logdet)


class TestCholSolve:
    @pytest.mark.parametrize("P,n", [(3, 64), (5, 128)])
    def test_factor_and_solve(self, P, n):
        K, ym = _spd(P, n, mask_last=7)
        L, alpha = chol_solve_batched(K, ym)
        L_ref = jnp.linalg.cholesky(K)
        np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                                   atol=2e-5)
        alpha_ref = jax.vmap(
            lambda L, b: jax.scipy.linalg.cho_solve((L, True), b)
        )(L_ref, ym)
        np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha_ref),
                                   atol=2e-5)

    def test_inverse(self):
        K, ym = _spd(4, 64, seed=3)
        L, _ = chol_solve_batched(K, ym)
        Kinv = chol_inverse_batched(L)
        eye = np.einsum("pij,pjk->pik", np.asarray(K), np.asarray(Kinv))
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(64), eye.shape), atol=5e-4
        )

    def test_particle_padding(self):
        # P not a multiple of the chunk: padded rows must not leak
        K, ym = _spd(9, 64, seed=5)
        v = lml_core(K, ym)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(_ref_core(K, ym)), rtol=2e-4, atol=1e-3
        )


class TestLmlCoreVJP:
    def test_value_and_grads_match_autodiff(self):
        K, ym = _spd(4, 64, seed=1, mask_last=5)
        g = jnp.asarray(np.random.default_rng(2).standard_normal(4)
                        .astype(np.float32))

        def loss_p(K, ym):
            return jnp.sum(lml_core(K, ym) * g)

        def loss_r(K, ym):
            return jnp.sum(_ref_core(K, ym) * g)

        dK1, dy1 = jax.grad(loss_p, argnums=(0, 1))(K, ym)
        dK2, dy2 = jax.grad(loss_r, argnums=(0, 1))(K, ym)
        sym = lambda M: 0.5 * (M + jnp.swapaxes(M, -1, -2))  # noqa: E731
        np.testing.assert_allclose(np.asarray(sym(dK1)), np.asarray(sym(dK2)),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(dy1), np.asarray(dy2),
                                   atol=3e-5)

    def test_non_psd_propagates_nan(self):
        K, ym = _spd(3, 64, seed=4)
        K = K.at[1, 0, 0].set(-5.0)
        v = lml_core(K, ym)
        assert bool(jnp.isnan(v[1]))
        assert bool(jnp.isfinite(v[0])) and bool(jnp.isfinite(v[2]))


class TestBackendParity:
    def test_gp_lml_batched_backends_agree(self):
        from nowcastautogp_tpu.models.config import GPConfig
        from nowcastautogp_tpu.models.structures import sample_particle

        cfg = GPConfig(max_depth=4)
        rng = np.random.default_rng(0)
        P, cap = 6, 64
        ts, ps, lns = [], [], []
        for _ in range(P):
            t, p, ln = sample_particle(rng, cfg)
            ts.append(t), ps.append(p), lns.append(ln)
        types = jnp.asarray(np.stack(ts).astype(np.int32))
        params = jnp.asarray(np.stack(ps).astype(np.float32))
        log_noise = jnp.asarray(np.asarray(lns, np.float32))
        x = jnp.broadcast_to(jnp.linspace(0, 1, cap), (P, cap)).astype(
            jnp.float32)
        y = jnp.sin(7 * x)
        mask = jnp.broadcast_to(
            (jnp.arange(cap) < 50).astype(jnp.float32), (P, cap))
        prior = lml_mod._LML_BACKEND
        try:
            lml_mod.set_lml_backend("pallas")
            v_pallas = lml_mod.gp_lml_batched(
                types, params, log_noise, x, y, mask)
        finally:
            # restore the shipped default, not 'auto' (which would silently
            # switch every later test in a TPU session onto pallas)
            lml_mod.set_lml_backend(prior)
        v_jnp = lml_mod.gp_lml_batched(types, params, log_noise, x, y, mask)
        np.testing.assert_allclose(np.asarray(v_pallas), np.asarray(v_jnp),
                                   rtol=5e-4, atol=5e-3)

    def test_small_fit_with_pallas_backend(self):
        import datetime as dt

        import nowcastautogp_tpu as ngp

        rng = np.random.default_rng(11)
        n = 30
        dates = [dt.date(2023, 1, 2) + dt.timedelta(weeks=i) for i in range(n)]
        obs = 50 * np.exp(0.02 * np.arange(n) + 0.1 * rng.standard_normal(n))
        data = ngp.create_transformed_data(dates, obs, transformation=np.log)
        prior = lml_mod._LML_BACKEND
        try:
            lml_mod.set_lml_backend("pallas")
            model = ngp.make_and_fit_model(
                data, n_particles=2, smc_data_proportion=0.5, n_mcmc=1,
                n_hmc=1, seed=0)
            fc = ngp.forecast(
                model, [dates[-1] + dt.timedelta(weeks=1)], 10,
                inv_transformation=np.exp)
        finally:
            lml_mod.set_lml_backend(prior)
        assert fc.shape == (1, 10)
        assert np.all(np.isfinite(fc)) and np.all(fc > 0)
