"""Golden-value parity vs a float64 numpy oracle (SURVEY.md §4 test note).

The engine's masked LML and predictive posterior are checked against a
straightforward float64 numpy implementation on the active subset — the
"CPU oracle" that pins down the masked-identity algebra independently of
JAX/XLA.
"""

import numpy as np

import jax.numpy as jnp

from nowcastautogp_tpu.models.config import GPConfig
from nowcastautogp_tpu.models.structures import sample_particle
from nowcastautogp_tpu.ops.kernels import eval_cov_impl
from nowcastautogp_tpu.ops.lml import (
    DEFAULT_JITTER, LOG_2PI, gp_lml, gp_predict,
)


def _oracle_lml(K_active, y_active, noise, jitter):
    """Dense float64 GP log marginal likelihood on the active subset."""
    n = K_active.shape[0]
    A = K_active + (noise + jitter) * np.eye(n)
    L = np.linalg.cholesky(A)
    alpha = np.linalg.solve(A, y_active)
    quad = float(y_active @ alpha)
    logdet = 2.0 * float(np.sum(np.log(np.diag(L))))
    return -0.5 * (quad + logdet + n * LOG_2PI)


def _setup(seed, n_active=40, cap=64):
    rng = np.random.default_rng(seed)
    cfg = GPConfig(max_depth=4)
    types, params, log_noise = sample_particle(rng, cfg)
    x = np.linspace(0, 1, cap).astype(np.float32)
    y = (np.sin(6 * x) + 0.2 * rng.standard_normal(cap)).astype(np.float32)
    mask = (np.arange(cap) < n_active).astype(np.float32)
    return types, params, log_noise, x, y, mask


class TestOracleParity:
    def test_masked_lml_matches_fp64_oracle(self):
        for seed in (0, 3, 11, 17):
            types, params, log_noise, x, y, mask = _setup(seed)
            got = float(gp_lml(
                jnp.asarray(types), jnp.asarray(params),
                jnp.asarray(log_noise), jnp.asarray(x), jnp.asarray(y),
                jnp.asarray(mask), DEFAULT_JITTER,
            ))
            if got <= -1e9:  # non-PSD sample rejected by the guard
                continue
            n_act = int(mask.sum())
            K = np.asarray(
                eval_cov_impl(jnp.asarray(types), jnp.asarray(params),
                              jnp.asarray(x), jnp.asarray(x)),
                dtype=np.float64,
            )[:n_act, :n_act]
            want = _oracle_lml(K, np.asarray(y, np.float64)[:n_act],
                               float(np.exp(log_noise)), DEFAULT_JITTER)
            assert abs(got - want) <= max(2e-3 * abs(want), 0.05), (
                seed, got, want)

    def test_predictive_matches_fp64_oracle(self):
        types, params, log_noise, x, y, mask = _setup(seed=3)
        xs = np.linspace(1.0, 1.1, 4).astype(np.float32)
        mu, cov = gp_predict(
            jnp.asarray(types), jnp.asarray(params), jnp.asarray(log_noise),
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask),
            jnp.asarray(xs), DEFAULT_JITTER, True,
        )
        n_act = int(mask.sum())
        noise = float(np.exp(log_noise))
        Kxx = np.asarray(eval_cov_impl(
            jnp.asarray(types), jnp.asarray(params), jnp.asarray(x),
            jnp.asarray(x)), np.float64)[:n_act, :n_act]
        Kxs = np.asarray(eval_cov_impl(
            jnp.asarray(types), jnp.asarray(params), jnp.asarray(x),
            jnp.asarray(xs)), np.float64)[:n_act]
        Kss = np.asarray(eval_cov_impl(
            jnp.asarray(types), jnp.asarray(params), jnp.asarray(xs),
            jnp.asarray(xs)), np.float64)
        A = Kxx + (noise + DEFAULT_JITTER) * np.eye(n_act)
        alpha = np.linalg.solve(A, np.asarray(y, np.float64)[:n_act])
        mu_want = Kxs.T @ alpha
        cov_want = (Kss - Kxs.T @ np.linalg.solve(A, Kxs)
                    + (noise + DEFAULT_JITTER) * np.eye(len(xs)))
        np.testing.assert_allclose(np.asarray(mu), mu_want,
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(cov), cov_want,
                                   rtol=5e-3, atol=5e-3)
