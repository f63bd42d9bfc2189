"""Integration tests of make_and_fit_model with the real SMC engine.

Mirrors ``/root/reference/test/test_model_fitting.jl``: minimized budgets
(n_particles<=2, n_mcmc<=5, n_hmc<=3, seeded), asserting types / shapes /
finiteness rather than values; plus the issue-#51 regression family (flat and
exactly-constant data must fit and forecast finite, non-negative values near
truth) and the `_stabilize_for_fit` identity/jitter contract.
"""

import datetime as dt

import numpy as np
import pytest

pytestmark = pytest.mark.engine

import nowcastautogp_tpu as ngp
from nowcastautogp_tpu.fitting import _stabilize_for_fit


def _weekly_dates(n, start=dt.date(2023, 1, 2)):
    return [start + dt.timedelta(weeks=i) for i in range(n)]


@pytest.fixture(scope="module")
def series():
    rng = np.random.default_rng(42)
    n = 40
    dates = _weekly_dates(n)
    truth = 100 * np.exp(0.01 * np.arange(n) + 0.3 * np.sin(2 * np.pi * np.arange(n) / 26))
    obs = truth * np.exp(0.08 * rng.standard_normal(n))
    return dates, obs


@pytest.fixture(scope="module")
def fitted(series):
    dates, obs = series
    fwd, inv = ngp.get_transformations("positive", obs)
    data = ngp.create_transformed_data(dates, obs, transformation=fwd)
    model = ngp.make_and_fit_model(
        data, n_particles=2, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2, seed=7
    )
    return model, inv, dates


class TestMakeAndFitModel:
    def test_returns_model(self, fitted):
        model, _, _ = fitted
        assert isinstance(model, ngp.GPModel)
        assert ngp.num_particles(model) == 2
        assert model.n_ingested == 40
        assert np.all(np.isfinite(model.log_weight))

    def test_single_particle(self, series):
        dates, obs = series
        data = ngp.create_transformed_data(dates, obs, transformation=np.log)
        model = ngp.make_and_fit_model(
            data, n_particles=1, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2, seed=0
        )
        assert ngp.num_particles(model) == 1

    def test_tiny_proportion_clamped(self):
        # a proportion far below 1/n must still produce a valid schedule
        from nowcastautogp_tpu.inference.schedule import linear_schedule

        assert linear_schedule(40, max(1e-6, 1 / 40)) == list(range(1, 41))
        dates = _weekly_dates(8)
        obs = np.exp(np.linspace(2, 3, 8))
        data = ngp.create_transformed_data(dates, obs, transformation=np.log)
        model = ngp.make_and_fit_model(
            data, n_particles=1, smc_data_proportion=1e-6, n_mcmc=0, n_hmc=1,
            seed=0,
        )
        assert model.n_ingested == len(obs)

    def test_model_holds_data(self, fitted, series):
        model, _, dates = fitted
        assert len(model.ds) == len(dates)
        assert len(model.y) == len(dates)


class TestIssue51Regression:
    """Flat data must fit and forecast finite, non-negative values near truth."""

    def test_boxcox_degenerate_flat_data(self):
        flat = np.array(
            [75000.0, 75100.0, 74950.0, 75050.0, 75000.0,
             74980.0, 75020.0, 75010.0, 74990.0, 75005.0] * 2
        )
        dates = _weekly_dates(len(flat))
        with pytest.warns(UserWarning):
            fwd, inv = ngp.get_transformations("boxcox", flat)
        data = ngp.create_transformed_data(dates, flat, transformation=fwd)
        model = ngp.make_and_fit_model(
            data, n_particles=1, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2, seed=3
        )
        fdates = _weekly_dates(3, start=dates[-1] + dt.timedelta(weeks=1))
        fc = ngp.forecast(model, fdates, 50, inv_transformation=inv)
        assert fc.shape == (3, 50)
        assert np.all(np.isfinite(fc))
        assert np.all(fc >= 0)
        # near truth: median within a factor ~2 of the flat level
        med = np.median(fc)
        assert 0.5 * 75000 < med < 2.0 * 75000

    def test_exactly_constant_data(self):
        const = np.full(20, 1234.0)
        dates = _weekly_dates(20)
        fwd, inv = ngp.get_transformations("positive", const)
        with pytest.warns(UserWarning, match="Near-constant"):
            data = ngp.create_transformed_data(dates, const, transformation=fwd)
            model = ngp.make_and_fit_model(
                data, n_particles=1, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2,
                seed=5,
            )
        fdates = _weekly_dates(2, start=dates[-1] + dt.timedelta(weeks=1))
        fc = ngp.forecast(model, fdates, 30, inv_transformation=inv)
        assert np.all(np.isfinite(fc))
        assert np.all(fc >= 0)
        assert 0.3 * 1234 < np.median(fc) < 3.0 * 1234


class TestStabilizeForFit:
    def test_identity_on_healthy_data(self):
        y = np.array([1.0, 2.0, 3.0, 2.5, 1.5])
        assert _stabilize_for_fit(y) is y  # identity, not a copy

    def test_jitter_on_flat_data(self):
        y = np.full(30, 7.0)
        with pytest.warns(UserWarning, match="Near-constant"):
            out = _stabilize_for_fit(y)
        assert out is not y
        assert out.std() > 0
        # jitter scale: flat_threshold * (|mean| + 1)
        assert out.std() < 10 * 1e-3 * 8.0

    def test_short_series_untouched(self):
        y = np.array([5.0])
        assert _stabilize_for_fit(y) is y
