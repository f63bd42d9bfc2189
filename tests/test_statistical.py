"""Statistical validation of the engine: structure recovery + calibration.

The reference's acceptance story is statistical (CRPS ratios computed in the
vignettes; SURVEY.md §6) and a Julia runtime is unavailable here, so these
tests validate the engine's *statistical* behavior directly: SMC discovers
the generating kernel family on synthetic GP draws, and predictive intervals
achieve sane empirical coverage on held-out points.
"""

import datetime as dt
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.engine

import nowcastautogp_tpu as ngp
from nowcastautogp_tpu.models.structures import LINEAR, PERIODIC


def _dates(n, start=dt.date(2022, 1, 3)):
    return [start + dt.timedelta(weeks=i) for i in range(n)]


@pytest.fixture(scope="module")
def periodic_fit():
    # strongly periodic signal + linear trend.  Four small independent fits
    # (same compiled program as the rest of the suite) stand in for one big
    # ensemble: pooled particles answer the structure-recovery question.
    rng = np.random.default_rng(99)
    n = 64
    t = np.arange(n)
    y = 1.5 * np.sin(2 * np.pi * t / 16.0) + 0.03 * t + 0.15 * rng.standard_normal(n)
    dates = _dates(n)
    data = ngp.create_transformed_data(dates, np.exp(y), transformation=np.log)
    models = [
        ngp.make_and_fit_model(
            data, n_particles=4, smc_data_proportion=0.34, n_mcmc=6, n_hmc=4,
            seed=3 + i,
        )
        for i in range(4)
    ]
    return models, dates, y, t


class TestStructureRecovery:
    def test_periodic_component_discovered(self, periodic_fit):
        models, dates, y, t = periodic_fit
        # pooled weight-weighted fraction of particles with a Periodic node
        num = den = 0.0
        for model in models:
            w = np.exp(model.log_weight - model.log_weight.max())
            w /= w.sum()
            has_periodic = np.array(
                [np.any(types == PERIODIC) for types in model._host_types],
                dtype=float,
            )
            num += (w * has_periodic).sum()
            den += 1.0
        assert num / den > 0.5, [m.structures() for m in models]

    def test_forecast_tracks_oscillation(self, periodic_fit):
        models, dates, y, t = periodic_fit
        # forecast 8 steps; pool draws over the four independent fits (the
        # pooled ensemble is the fixture's stand-in for one big ensemble —
        # any single 2-particle fit can land in a bad mode)
        f_dates = _dates(8, start=dates[-1] + dt.timedelta(weeks=1))
        fc = np.concatenate(
            [ngp.forecast(m, f_dates, 100, inv_transformation=lambda v: v)
             for m in models], axis=1,
        )
        pred = np.median(fc, axis=1)
        tt = np.arange(len(t), len(t) + 8)
        truth = 1.5 * np.sin(2 * np.pi * tt / 16.0) + 0.03 * tt
        corr = np.corrcoef(pred, truth)[0, 1]
        assert corr > 0.5, (pred, truth)


class TestDeepStructureRecovery:
    def test_times_composite_recovered(self):
        # amplitude-growing oscillation — the signature of a
        # Times(Linear, Periodic) composite; the mixed two-move sampler
        # should place most posterior mass on structures containing both
        rng = np.random.default_rng(7)
        n = 72
        t = np.arange(n)
        y = (0.5 + 0.03 * t) * np.sin(2 * np.pi * t / 12.0) + 2.0 + 0.01 * t
        y += 0.1 * rng.standard_normal(n)
        dates = _dates(n)
        data = ngp.create_transformed_data(dates, np.exp(y),
                                           transformation=np.log)
        num = den = 0.0
        for s in range(4):
            m = ngp.make_and_fit_model(
                data, n_particles=6, smc_data_proportion=0.34, n_mcmc=12,
                n_hmc=4, seed=100 + s)
            w = np.exp(m.log_weight - m.log_weight.max())
            w /= w.sum()
            has_both = np.array(
                [np.any(tt == PERIODIC) and np.any(tt == LINEAR)
                 for tt in m._host_types], dtype=float)
            num += (w * has_both).sum()
            den += 1.0
        assert num / den > 0.5, [mm for mm in (num, den)]


class TestChangepointRecovery:
    """End-to-end payoff of the ChangePoint machinery (VERDICT r3 item 4):
    on regime-shift data the engine places posterior mass on CP structure
    and forecasts at least as well as a matched changepoints=False fit.
    The committed TPU-scale companion is tools/changepoint_study.py."""

    def _regime_shift(self, n, seed):
        # hard mid-series break: upward level jump + growth->decline slope
        # reversal — the regime smooth kernels extrapolate worst
        rng = np.random.default_rng(seed)
        t = np.arange(n)
        t_cp = n // 2 + int(rng.integers(-4, 5))
        level = np.where(t < t_cp, 4.0, 6.0)
        slope = np.where(t < t_cp, 0.004, -0.03) * (t - t_cp)
        return np.exp(level + slope + 0.05 * rng.standard_normal(n))

    @pytest.mark.skipif(sys.platform != "linux", reason=(
        "pooled-mass/CRPS margins calibrated on linux f32; other platforms' "
        "BLAS differences alter the seeded SMC trajectories"))
    def test_changepoint_discovery_pays_off(self):
        from nowcastautogp_tpu.models.structures import CP

        n, hor = 72, 8
        masses = {"cp": [], "nocp": []}
        crps = {"cp": [], "nocp": []}
        for seed in range(4):
            obs = self._regime_shift(n + hor, seed)
            dates = _dates(n + hor)
            data = ngp.create_transformed_data(
                dates[:n], obs[:n], transformation=np.log)
            for label, cps in (("cp", True), ("nocp", False)):
                m = ngp.make_and_fit_model(
                    data, n_particles=16, smc_data_proportion=0.25,
                    n_mcmc=12, n_hmc=3, seed=100 + seed,
                    config=ngp.GPConfig(max_depth=4, changepoints=cps))
                w = np.exp(m.log_weight - m.log_weight.max())
                w /= w.sum()
                has_cp = np.array(
                    [np.any(tt == CP) for tt in m._host_types], dtype=float)
                masses[label].append(float((w * has_cp).sum()))
                fc = ngp.forecast(m, dates[n:], 600,
                                  inv_transformation=lambda v: v)
                crps[label].append(float(ngp.crps_matrix(
                    fc, np.log(obs[n:])).mean()))
        # gating is end-to-end airtight: no CP mass can appear when off
        assert max(masses["nocp"]) == 0.0, masses
        # discovery: pooled weighted CP mass appears when enabled
        # (measured 0.078 pooled over these seeds at this budget)
        assert float(np.mean(masses["cp"])) > 0.03, masses
        # payoff: CP-enabled forecasts the break at least as well pooled
        # (measured 0.125 vs 0.248 — smooth kernels extrapolate the broken
        # regime badly on some seeds)
        assert float(np.mean(crps["cp"])) <= float(np.mean(crps["nocp"])), crps


class TestCalibration:
    def test_interval_coverage_on_heldout(self):
        rng = np.random.default_rng(123)
        n, n_hold = 48, 10
        t = np.arange(n + n_hold)
        y = 0.8 * np.sin(2 * np.pi * t / 12.0) + 0.02 * t + 0.2 * rng.standard_normal(
            n + n_hold
        )
        dates = _dates(n + n_hold)
        data = ngp.create_transformed_data(dates[:n], y[:n])
        model = ngp.make_and_fit_model(
            data, n_particles=2, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2,
            seed=11,
        )
        fc = ngp.forecast(model, dates[n:], 500)
        lo, hi = np.quantile(fc, [0.05, 0.95], axis=1)
        covered = np.mean((y[n:] >= lo) & (y[n:] <= hi))
        # 90% interval: loose structural band (small sample, stochastic fit)
        assert covered >= 0.5, (covered, lo, hi, y[n:])

    def test_interpolation_tight_at_observed_points(self):
        rng = np.random.default_rng(7)
        n = 40
        t = np.arange(n)
        y = np.sin(2 * np.pi * t / 10.0) + 0.05 * rng.standard_normal(n)
        dates = _dates(n)
        data = ngp.create_transformed_data(dates, y)
        model = ngp.make_and_fit_model(
            data, n_particles=2, smc_data_proportion=0.34, n_mcmc=2, n_hmc=2,
            seed=13,
        )
        # predictive at training points should track the data closely
        dist = ngp.predict_mvn(model, dates)
        resid = np.abs(dist.mean() - y)
        assert np.median(resid) < 0.3, np.median(resid)
