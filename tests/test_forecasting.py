"""Forecast API tests.

Mirrors ``/root/reference/test/test_forecasting.jl``: output shape
``(n_dates, n_draws)`` across horizons/draw counts, inverse-transform
positivity (exp) and boundedness (scaled logistic), the ``forecast_n_hmc``
paths, and structure-only checks for stochastic output.
"""

import datetime as dt

import numpy as np
import pytest

pytestmark = pytest.mark.engine

import nowcastautogp_tpu as ngp


def _dates(n, start=dt.date(2023, 1, 2)):
    return [start + dt.timedelta(weeks=i) for i in range(n)]


@pytest.fixture(scope="module")
def fitted_log():
    rng = np.random.default_rng(11)
    n = 40
    dates = _dates(n)
    obs = 50 * np.exp(0.02 * np.arange(n) + 0.1 * rng.standard_normal(n))
    fwd, inv = ngp.get_transformations("positive", obs)
    data = ngp.create_transformed_data(dates, obs, transformation=fwd)
    model = ngp.make_and_fit_model(
        data, n_particles=2, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2, seed=2
    )
    return model, inv, dates


@pytest.fixture(scope="module")
def fitted_percentage():
    rng = np.random.default_rng(12)
    n = 40
    dates = _dates(n)
    obs = np.clip(30 + 10 * np.sin(np.arange(n) / 4) + rng.normal(0, 2, n), 1, 99)
    fwd, inv = ngp.get_transformations("percentage", obs)
    data = ngp.create_transformed_data(dates, obs, transformation=fwd)
    model = ngp.make_and_fit_model(
        data, n_particles=2, smc_data_proportion=0.34, n_mcmc=0, n_hmc=2, seed=4
    )
    return model, inv, dates


class TestForecastShapes:
    @pytest.mark.parametrize("horizon,draws", [(1, 10), (4, 25), (8, 5)])
    def test_shape(self, fitted_log, horizon, draws):
        model, inv, dates = fitted_log
        fdates = _dates(horizon, start=dates[-1] + dt.timedelta(weeks=1))
        fc = ngp.forecast(model, fdates, draws, inv_transformation=inv)
        assert fc.shape == (horizon, draws)
        assert np.all(np.isfinite(fc))

    def test_accepts_range_like(self, fitted_log):
        model, inv, dates = fitted_log
        fdates = np.array(
            [dates[-1] + dt.timedelta(weeks=i + 1) for i in range(3)], dtype=object
        )
        fc = ngp.forecast(model, fdates, 7, inv_transformation=inv)
        assert fc.shape == (3, 7)


class TestInverseTransforms:
    def test_positive_forecasts_nonnegative(self, fitted_log):
        model, inv, dates = fitted_log
        fdates = _dates(4, start=dates[-1] + dt.timedelta(weeks=1))
        fc = ngp.forecast(model, fdates, 50, inv_transformation=inv)
        assert np.all(fc >= 0)

    def test_percentage_forecasts_bounded(self, fitted_percentage):
        model, inv, dates = fitted_percentage
        fdates = _dates(4, start=dates[-1] + dt.timedelta(weeks=1))
        fc = ngp.forecast(model, fdates, 50, inv_transformation=inv)
        assert np.all(fc >= 0)
        assert np.all(fc <= 100)


class TestForecastNHmc:
    def test_hmc_refresh_path(self, fitted_log):
        model, inv, dates = fitted_log
        fdates = _dates(2, start=dates[-1] + dt.timedelta(weeks=1))
        fc = ngp.forecast(
            model, fdates, 4, inv_transformation=inv, forecast_n_hmc=1
        )
        assert fc.shape == (2, 4)
        assert np.all(np.isfinite(fc))

    def test_invalid_forecast_n_hmc(self, fitted_log):
        model, inv, dates = fitted_log
        fdates = _dates(2, start=dates[-1] + dt.timedelta(weeks=1))
        with pytest.raises(AssertionError):
            ngp.forecast(model, fdates, 4, forecast_n_hmc=0)


class TestStochasticity:
    def test_draws_vary(self, fitted_log):
        model, inv, dates = fitted_log
        fdates = _dates(4, start=dates[-1] + dt.timedelta(weeks=1))
        fc = ngp.forecast(model, fdates, 30, inv_transformation=inv)
        # draws differ across columns (non-degenerate sampling)
        assert np.std(fc, axis=1).min() > 0

    def test_plausible_location(self, fitted_log):
        model, inv, dates = fitted_log
        fdates = _dates(2, start=dates[-1] + dt.timedelta(weeks=1))
        fc = ngp.forecast(model, fdates, 200, inv_transformation=inv)
        # exp trend around 50*exp(0.02*41) ~ 113; very loose structural bound
        assert 20 < np.median(fc) < 600


class TestPredictMvn:
    def test_mixture_object(self, fitted_log):
        model, inv, dates = fitted_log
        fdates = _dates(3, start=dates[-1] + dt.timedelta(weeks=1))
        dist = ngp.predict_mvn(model, fdates)
        assert dist.n_points == 3
        assert dist.n_components == ngp.num_particles(model)
        assert dist.weights.sum() == pytest.approx(1.0)
        draws = dist.sample(np.random.default_rng(0), 11)
        assert draws.shape == (3, 11)
        qs = dist.marginal_quantiles([0.25, 0.5, 0.75])
        assert qs.shape == (3, 3)
        assert np.all(np.diff(qs, axis=0) >= 0)
