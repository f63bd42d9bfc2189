"""Forecast sampling from a fitted GP particle ensemble.

TPU-native equivalent of the reference's plain forecaster
(``/root/reference/src/forecasting.jl:29-75``): draw joint samples from the
particle-mixture predictive posterior, optionally refreshing hyperparameters
with HMC before each draw (``forecast_n_hmc``), then map back to the original
scale with the inverse transformation.  The reference's BLAS single-thread
guard (``src/forecasting.jl:2-10``) has no analog here — XLA owns scheduling,
so that concurrency hazard class disappears (SURVEY.md §2.5).
"""

from __future__ import annotations

import numpy as np

from .models.gp_model import GPModel, mcmc_parameters, predict_mvn
from .utils.apply import apply_elementwise

__all__ = ["forecast"]


def forecast(
    model: GPModel, forecast_dates, forecast_draws: int, *,
    inv_transformation=lambda y: y, forecast_n_hmc: int | None = None,
) -> np.ndarray:
    """Sample forecasts; returns ``(n_dates, forecast_draws)``.

    ``forecast_n_hmc=None`` draws all samples from the current model state
    (one predictive build); an ``int`` runs that many HMC parameter steps
    before *each* draw, mutating the model between draws — both matching the
    dispatch semantics of the reference (``src/forecasting.jl:39-75``).
    """
    dates = list(forecast_dates)
    if forecast_n_hmc is None:
        dist = predict_mvn(model, dates)
        draws = dist.sample(model.rng, int(forecast_draws))
    else:
        forecast_n_hmc = int(forecast_n_hmc)
        assert forecast_n_hmc > 0, "forecast_n_hmc must be > 0 if specified"
        draws = _forecast_hmc_fused(model, dates, int(forecast_draws),
                                    forecast_n_hmc)
    return apply_elementwise(inv_transformation, draws)


def _forecast_hmc_fused(model: GPModel, dates, n_draws: int,
                        n_hmc: int) -> np.ndarray:
    """Whole HMC-refresh draw loop as one device scan (mutates the model's
    hyperparameters like the reference's per-draw loop does)."""
    import jax.numpy as jnp

    from .models.config import HMCConfig
    from .models.structures import prior_arrays
    from .ops.forecast_scan import forecast_hmc_scan
    from .ops.lml import DEFAULT_JITTER

    hmc_cfg = HMCConfig()
    noise_mu, noise_sigma, infer = model.noise_prior
    x, y, m = model._batched_data()
    xs = jnp.asarray(model._normalize_dates(dates), jnp.float32)
    mu_p, sg_p, act_p = (jnp.asarray(a) for a in
                         prior_arrays(model._host_types, model.config))
    lw = model.log_weight - model.log_weight.max()
    samples, params, log_noise, lml, scale = forecast_hmc_scan(
        jnp.asarray(model._host_types), model._params_d, model._log_noise_d,
        mu_p, sg_p, act_p, x, y, m, xs,
        jnp.asarray(lw.astype(np.float32)), model.next_key(),
        model._eps_scale_d,
        n_draws=n_draws, n_hmc=n_hmc, n_leapfrog=hmc_cfg.n_leapfrog,
        step_size=hmc_cfg.step_size, step_jitter=hmc_cfg.step_size_jitter,
        jitter=DEFAULT_JITTER, noise_mu=noise_mu, noise_sigma=noise_sigma,
        infer_noise=infer,
    )
    model._params_d, model._log_noise_d = params, log_noise
    model._lml_d, model._eps_scale_d = lml, scale
    out = np.asarray(samples, dtype=np.float64)
    return model._y_mean + model._y_std * out
