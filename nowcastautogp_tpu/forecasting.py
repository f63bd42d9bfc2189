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
    n_dates = len(dates)
    if forecast_n_hmc is None:
        dist = predict_mvn(model, dates)
        draws = dist.sample(model.rng, int(forecast_draws))
    else:
        forecast_n_hmc = int(forecast_n_hmc)
        assert forecast_n_hmc > 0, "forecast_n_hmc must be > 0 if specified"
        draws = np.empty((n_dates, int(forecast_draws)))
        for i in range(int(forecast_draws)):
            mcmc_parameters(model, forecast_n_hmc)
            dist = predict_mvn(model, dates)
            draws[:, i] = dist.sample(model.rng, 1)[:, 0]
    return apply_elementwise(inv_transformation, draws)
