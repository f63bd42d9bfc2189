"""Fused per-draw-HMC forecasting: one device program for the whole loop.

The reference's ``forecast_n_hmc`` path interleaves model mutation and
sampling draw by draw (``/root/reference/src/forecasting.jl:63-68``).  A
Python loop costs two device round-trips per draw; here the whole loop is a
``lax.scan`` carrying the particle hyperparameters: each step runs the HMC
refresh, rebuilds the predictive mixture, picks a component, and draws one
joint sample — SURVEY.md §7's "map to ``lax.scan`` over draws carrying model
state".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..inference.hmc import _hmc_batched
from .lml import DEFAULT_JITTER, gp_predict_impl, sampling_cholesky

__all__ = ["forecast_hmc_scan", "nowcast_forecast_hmc_scan"]


@partial(jax.jit, static_argnames=("n_draws", "n_hmc", "n_leapfrog"))
def forecast_hmc_scan(
    types, params, log_noise, prior_mu, prior_sigma, prior_active,
    x, y, mask, xs, log_w, key, eps_scale, *,
    n_draws, n_hmc, n_leapfrog, step_size, step_jitter,
    jitter=DEFAULT_JITTER, noise_mu=-2.0, noise_sigma=1.0, infer_noise=1.0,
):
    """Draws ``n_draws`` joint samples with ``n_hmc`` HMC steps before each.

    All particle arrays carry the leading axis; ``x``/``y``/``mask`` are
    per-particle rows; ``xs`` (m,) shared.  Importance weights are unchanged
    by parameter-only HMC, so ``log_w`` is fixed across draws (matching the
    reference, where ``mcmc_parameters!`` does not reweight).

    Returns (samples (m, n_draws), params, log_noise, lml, eps_scale).
    """
    P = params.shape[0]
    m = xs.shape[0]
    predict_v = jax.vmap(
        gp_predict_impl, in_axes=(0, 0, 0, 0, 0, 0, None, None, None)
    )

    def draw(carry, key_d):
        params, log_noise, scale = carry
        k_hmc, k_comp, k_eps = jax.random.split(key_d, 3)
        params, log_noise, lml, _, scale, _ = _hmc_batched(
            types, params, log_noise, prior_mu, prior_sigma, prior_active,
            x, y, mask, k_hmc, scale, n_hmc, n_leapfrog, step_size,
            step_jitter, jitter, noise_mu, noise_sigma, infer_noise,
        )
        mu, cov = predict_v(
            types, params, log_noise, x, y, mask, xs, jitter, True
        )
        chol = sampling_cholesky(cov)
        comp = jax.random.categorical(k_comp, log_w)
        eps = jax.random.normal(k_eps, (m,), mu.dtype)
        sample = mu[comp] + chol[comp] @ eps
        return (params, log_noise, scale), (sample, lml)

    keys = jax.random.split(key, n_draws)
    (params, log_noise, eps_scale), (samples, lmls) = jax.lax.scan(
        draw, (params, log_noise, eps_scale), keys
    )
    return samples.T, params, log_noise, lmls[-1], eps_scale


@partial(jax.jit, static_argnames=("n_scenarios", "n_draws", "n_hmc",
                                   "n_leapfrog"))
def nowcast_forecast_hmc_scan(
    types, params, log_noise, prior_mu, prior_sigma, prior_active,
    x, y, mask, xs, log_w, key, eps_scale, *,
    n_scenarios, n_draws, n_hmc, n_leapfrog, step_size, step_jitter,
    jitter=DEFAULT_JITTER, noise_mu=-2.0, noise_sigma=1.0, infer_noise=1.0,
):
    """Scenario-batched per-draw-HMC forecasting as ONE device program.

    The flattened scenario x particle batch (R = S*P rows) replaces the
    reference's per-scenario thread loop (``src/forecasting.jl:63-68,131``);
    each scan step refreshes ALL rows with ``n_hmc`` HMC steps, rebuilds the
    R predictive posteriors, then draws one joint sample per scenario from
    its own particle mixture.  ``log_w`` is (S, P) per-scenario importance
    weights — unchanged by parameter-only HMC, matching the reference.

    Returns (samples (m, S*n_draws) with columns grouped by scenario,
    params, log_noise, eps_scale).
    """
    S = n_scenarios
    R = params.shape[0]
    P = R // S
    m = xs.shape[0]
    predict_v = jax.vmap(
        gp_predict_impl, in_axes=(0, 0, 0, 0, 0, 0, None, None, None)
    )

    def draw(carry, key_d):
        params, log_noise, scale = carry
        k_hmc, k_comp, k_eps = jax.random.split(key_d, 3)
        params, log_noise, lml, _, scale, _ = _hmc_batched(
            types, params, log_noise, prior_mu, prior_sigma, prior_active,
            x, y, mask, k_hmc, scale, n_hmc, n_leapfrog, step_size,
            step_jitter, jitter, noise_mu, noise_sigma, infer_noise,
        )
        mu, cov = predict_v(
            types, params, log_noise, x, y, mask, xs, jitter, True
        )
        chol = sampling_cholesky(cov)
        comp = jax.random.categorical(k_comp, log_w, axis=-1)  # (S,)
        flat = comp + jnp.arange(S) * P
        eps = jax.random.normal(k_eps, (S, m), mu.dtype)
        sample = mu[flat] + jnp.einsum("sij,sj->si", chol[flat], eps)
        return (params, log_noise, scale), sample

    keys = jax.random.split(key, n_draws)
    (params, log_noise, eps_scale), samples = jax.lax.scan(
        draw, (params, log_noise, eps_scale), keys
    )
    # (D, S, m) -> (m, S*D): scenario s's draws occupy columns s*D..(s+1)*D-1
    out = jnp.transpose(samples, (2, 1, 0)).reshape(m, S * n_draws)
    return out, params, log_noise, eps_scale
